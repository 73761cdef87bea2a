"""Fused Pallas warp kernel vs the f32 lax oracle (SURVEY.md §4 unit row).

CPU runs exercise the kernel in interpreter mode (same kernel code path);
``tpu``-marked tests run compiled on a real chip and are skipped otherwise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvsg_tpu.ops import grid as grid_ops
from dvsg_tpu.ops import warp as warp_dispatch
from dvsg_tpu.ops import warp_pallas, warp_ref

INTERPRET = jax.default_backend() != "tpu"


def _case(rng, b, h, w, scale, coarse=None):
    frames = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    base = np.asarray(grid_ops.identity_grid(h, w))
    if coarse:
        off = (rng.random((b, *coarse, 2), dtype=np.float32) - 0.5) * scale
        grids = jax.vmap(
            lambda o: grid_ops.grid_from_offsets(jnp.asarray(o), h, w)
        )(jnp.asarray(off))
    else:
        grids = jnp.asarray(
            base[None] + (rng.random((b, h, w, 2),
                                     dtype=np.float32) - 0.5) * scale)
    return frames, grids


def _check(frames, grids, max_dx_px=126, atol=2e-4):
    ours = np.asarray(warp_pallas.bilinear_warp_batch(
        frames, grids, max_dx_px=max_dx_px, interpret=INTERPRET))
    want = np.asarray(warp_ref.bilinear_warp_batch(frames, grids))
    np.testing.assert_allclose(ours, want, atol=atol)


class TestInterpretParity:
    def test_identity(self, rng):
        frames = jnp.asarray(rng.random((1, 24, 128, 3), dtype=np.float32))
        g = jnp.asarray(np.asarray(grid_ops.identity_grid(24, 128))[None])
        _check(frames, g)

    @pytest.mark.parametrize("h,w", [(16, 128), (48, 256), (40, 200),
                                     (30, 100)])
    def test_random_dense_grids(self, rng, h, w):
        _check(*_case(rng, 2, h, w, 0.4))

    def test_model_style_coarse_grids(self, rng):
        _check(*_case(rng, 2, 64, 256, 0.3, coarse=(8, 8)))

    def test_out_of_range_border_clamp(self, rng):
        frames, grids = _case(rng, 1, 32, 128, 0.1)
        _check(frames, grids * 3.0, max_dx_px=200)

    def test_wide_horizontal_displacement(self, rng):
        """|dx| > 126 px is covered by scalar stripe bases (3 stripes)."""
        assert warp_pallas.stripes_for_max_dx(200) == 3
        frames, grids = _case(rng, 1, 24, 384, 0.8)
        _check(frames, grids, max_dx_px=200)

    def test_large_constant_shift(self, rng):
        """A 300px constant horizontal shift — far beyond one stripe."""
        frames = jnp.asarray(rng.random((1, 32, 512, 3), dtype=np.float32))
        g = grid_ops.identity_grid(32, 512) + jnp.array(
            [300 * 2.0 / 511, 0.0])
        _check(frames, g[None], max_dx_px=310)

    def test_large_vertical_displacement(self, rng):
        """Vertical shifts are unbounded (adaptive candidate loop)."""
        frames = jnp.asarray(rng.random((1, 64, 128, 3), dtype=np.float32))
        g = grid_ops.identity_grid(64, 128) + jnp.array([0.0, 0.9])
        _check(frames, g[None])

    def test_non_square_output_resolution(self, rng):
        """Grid resolution != frame resolution (output follows grid)."""
        frames = jnp.asarray(rng.random((1, 40, 150, 3), dtype=np.float32))
        base = np.asarray(grid_ops.identity_grid(24, 100))
        grids = jnp.asarray(base[None]) * 0.7
        ours = np.asarray(warp_pallas.bilinear_warp_batch(
            frames, grids, interpret=INTERPRET))
        want = np.asarray(warp_ref.bilinear_warp_batch(frames, grids))
        np.testing.assert_allclose(ours, want, atol=2e-4)

    def test_dispatcher_max_dx(self):
        assert warp_dispatch.max_dx_px_for(0.2, 1280) == 129
        assert warp_pallas.stripes_for_max_dx(126) == 3
        assert warp_pallas.stripes_for_max_dx(129) == 3


@pytest.mark.tpu
class TestTPUCompiled:
    def test_720p_model_grid_parity(self, rng):
        frames, grids = _case(rng, 2, 720, 1280, 0.2, coarse=(16, 16))
        ours = np.asarray(warp_pallas.bilinear_warp_batch(
            frames, grids, max_dx_px=129))
        want = np.asarray(warp_ref.bilinear_warp_batch(frames, grids))
        err = np.abs(ours - want)
        assert err.max() < 1e-3, err.max()
        # PSNR gate far above the 45 dB requirement
        mse = float((err.astype(np.float64) ** 2).mean())
        psnr = 10 * np.log10(1.0 / mse)
        assert psnr > 60.0, psnr


def test_vmapped_guard_mixed_batch(rng):
    """The f32 kernel's guard_cond under vmap: a batched program with one
    covered and one contract-violating member must equal the per-member
    results (violator repaired via the oracle) — same property the wide
    kernel pins in test_warp_wide.py::TestVmappedGuard, here for the
    planar guard site (warp_pallas.bilinear_warp_batch)."""
    h, w = 32, 640
    frames, smooth = _case(rng, 1, h, w, 0.05, coarse=(4, 4))
    gx = np.asarray(grid_ops.identity_grid(h, w))
    wild = gx.copy()
    wild[..., 0] = np.sin(31.0 * gx[..., 0]) * 0.9   # dx varies too fast
    grids = jnp.stack([smooth[0], jnp.asarray(wild)])
    frames2 = jnp.concatenate([frames, frames], axis=0)

    fn = lambda f, g: warp_pallas.bilinear_warp_batch(
        f[None], g[None], max_dx_px=64, interpret=INTERPRET)[0]
    got = np.asarray(jax.vmap(fn)(frames2, grids))
    want = np.stack([np.asarray(fn(frames2[i], grids[i]))
                     for i in range(2)])
    np.testing.assert_array_equal(got, want)
    oracle = np.asarray(warp_ref.bilinear_warp_batch(
        frames.astype(jnp.float32), jnp.asarray(wild)[None]))[0]
    np.testing.assert_allclose(got[1], oracle, atol=1e-6)
