"""Grid-only custom VJP of the fused Pallas warp vs the lax oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvsg_tpu.ops import grid as grid_ops
from dvsg_tpu.ops import warp_pallas, warp_ref

INTERPRET = jax.default_backend() != "tpu"


def _case(rng, b=2, h=24, w=136, scale=0.3):
    frames = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    base = np.asarray(grid_ops.identity_grid(h, w))
    grids = jnp.asarray(
        base[None] + (rng.random((b, h, w, 2),
                                 dtype=np.float32) - 0.5) * scale)
    return frames, grids


def test_value_matches_oracle(rng):
    frames, grids = _case(rng)
    out = warp_pallas.bilinear_warp_batch_grids_diff(
        frames, grids, 126, warp_pallas.TILE_H, INTERPRET)
    want = warp_ref.bilinear_warp_batch(frames, grids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-4)


def test_grid_grad_matches_oracle(rng):
    frames, grids = _case(rng)
    tgt = jnp.asarray(rng.random(frames.shape, dtype=np.float32))

    def loss_pallas(g):
        o = warp_pallas.bilinear_warp_batch_grids_diff(
            frames, g, 126, warp_pallas.TILE_H, INTERPRET)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(g):
        return jnp.sum((warp_ref.bilinear_warp_batch(frames, g) - tgt) ** 2)

    g_pallas = np.asarray(jax.grad(loss_pallas)(grids))
    g_ref = np.asarray(jax.grad(loss_ref)(grids))
    # ties at exact integer coords differ in subgradient; exclude them
    x = (np.asarray(grids[..., 0]) + 1) * 0.5 * (frames.shape[2] - 1)
    y = (np.asarray(grids[..., 1]) + 1) * 0.5 * (frames.shape[1] - 1)
    interior = ((x % 1 > 1e-3) & (x % 1 < 1 - 1e-3)
                & (y % 1 > 1e-3) & (y % 1 < 1 - 1e-3)
                & (x > 0.5) & (x < frames.shape[2] - 1.5)
                & (y > 0.5) & (y < frames.shape[1] - 1.5))
    np.testing.assert_allclose(g_pallas[interior], g_ref[interior],
                               atol=5e-3, rtol=1e-3)


def test_frames_cotangent_is_zero(rng):
    frames, grids = _case(rng, b=1, h=16, w=128)

    def loss(f):
        return jnp.sum(warp_pallas.bilinear_warp_batch_grids_diff(
            f, grids, 126, warp_pallas.TILE_H, INTERPRET))

    g = np.asarray(jax.grad(loss)(frames))
    assert np.all(g == 0.0)  # documented grids-only contract


def test_guarded_diff_falls_back_on_violating_grid(rng):
    """ADVICE r2: the differentiable path enforces the coverage contract
    too — a violating grid takes the (differentiable) lax oracle, so
    values match the oracle and grid gradients stay finite and correct."""
    h, w = 32, 640
    frames = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    xs = jnp.linspace(-1, 1, w)
    ys = jnp.linspace(-1, 1, h)
    gx, gy = jnp.meshgrid(xs, ys)
    wild = jnp.stack([jnp.sin(gx * 31.0), gy], -1)[None]
    assert not bool(warp_pallas._coverage_ok(frames, wild, 64,
                                             warp_pallas.TILE_H))

    out = warp_pallas.bilinear_warp_batch_grids_diff(
        frames, wild, 64, warp_pallas.TILE_H, INTERPRET)
    want = warp_ref.bilinear_warp_batch(frames, wild)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5)

    tgt = jnp.asarray(rng.random(frames.shape, dtype=np.float32))

    def loss(g):
        o = warp_pallas.bilinear_warp_batch_grids_diff(
            frames, g, 64, warp_pallas.TILE_H, INTERPRET)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(g):
        return jnp.sum((warp_ref.bilinear_warp_batch(
            jax.lax.stop_gradient(frames), g) - tgt) ** 2)

    g_got = np.asarray(jax.grad(loss)(wild))
    g_ref = np.asarray(jax.grad(loss_ref)(wild))
    assert np.isfinite(g_got).all()
    np.testing.assert_allclose(g_got, g_ref, atol=1e-3, rtol=1e-3)
