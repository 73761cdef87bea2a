"""Wide-layout fused warp+quantize kernel vs the composed oracle path.

The oracle fixture is quantize(warp_ref(normalize(frames))) — the exact
semantics the fused uint8 kernel (ops/warp_wide.py) must reproduce within
1 uint8 LSB (the cancelled 1/255*255 scaling is the only rounding
difference). CPU runs use interpreter mode; ``tpu``-marked tests run
compiled on the real chip.

Also pins the runtime stripe-coverage guard (VERDICT.md round-1 item 4):
a contract-violating grid must produce EXACTLY the oracle output via the
on-device fallback — silent corruption is impossible by construction.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvsg_tpu.ops import grid as grid_ops
from dvsg_tpu.ops import warp as warp_dispatch
from dvsg_tpu.ops import warp_wide

INTERPRET = jax.default_backend() != "tpu"


def _frames(rng, b, h, w, c=3):
    return jnp.asarray(rng.integers(0, 256, (b, h, w, c), dtype=np.uint8))


def _affine_grids(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    grids = []
    for _ in range(b):
        ang = rng.uniform(-0.05, 0.05)
        tx, ty = rng.uniform(-0.1, 0.1, 2)
        theta = jnp.asarray(
            [[np.cos(ang), -np.sin(ang), tx],
             [np.sin(ang), np.cos(ang), ty]], jnp.float32)
        grids.append(grid_ops.affine_grid(theta, h, w))
    return jnp.stack(grids)


def _check(frames, grids, max_dx_px=32, atol=1):
    ours = np.asarray(warp_wide.warp_u8_batch(
        frames, grids, max_dx_px=max_dx_px, interpret=INTERPRET)
    ).astype(np.int32)
    want = np.asarray(warp_wide._oracle_u8(frames, grids)).astype(np.int32)
    assert np.abs(ours - want).max() <= atol


class TestParity:
    def test_identity_exact(self, rng):
        frames = _frames(rng, 1, 40, 128)
        g = grid_ops.identity_grid(40, 128)[None]
        out = warp_wide.warp_u8_batch(frames, g, max_dx_px=8,
                                      interpret=INTERPRET)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(frames))

    @pytest.mark.parametrize("h,w", [(40, 128), (96, 256), (130, 384)])
    def test_affine_grids(self, rng, h, w):
        _check(_frames(rng, 2, h, w), _affine_grids(2, h, w))

    def test_output_resolution_follows_grid(self, rng):
        frames = _frames(rng, 1, 64, 160)
        g = grid_ops.identity_grid(32, 128)[None]  # 128*3 lanes aligned
        out = warp_wide.warp_u8_batch(frames, g, max_dx_px=8,
                                      interpret=INTERPRET)
        assert out.shape == (1, 32, 128, 3)

    def test_coarse_offset_grids(self, rng):
        h, w = 96, 128
        off = (rng.random((2, 6, 8, 2), dtype=np.float32) - 0.5) * 0.2
        grids = jax.vmap(lambda o: grid_ops.grid_from_offsets(
            jnp.asarray(o), h, w))(jnp.asarray(off))
        _check(_frames(rng, 2, h, w), grids)

    def test_grayscale_single_channel(self, rng):
        # C=1 exercises the general-channel lane math (phase==0, +1 tap).
        frames = _frames(rng, 1, 48, 256, c=1)
        g = _affine_grids(1, 48, 256)
        _check(frames, g)

    def test_tall_output_multiple_subtile_blocks(self, rng):
        # ho > 256 exercises n_sub > 1 and block-padded coord rows.
        _check(_frames(rng, 1, 300, 128), _affine_grids(1, 300, 128))


class TestCoverageGuard:
    def test_violating_grid_falls_back_to_oracle(self, rng):
        """x oscillating with a ~16-px period swings the source column by
        half the frame width WITHIN one output block — outside any
        3-stripe window — so the guard must route to the oracle."""
        h, w = 32, 640
        frames = _frames(rng, 1, h, w)
        xs = jnp.linspace(-1, 1, w)
        ys = jnp.linspace(-1, 1, h)
        gx, gy = jnp.meshgrid(xs, ys)
        wild = jnp.stack([jnp.sin(gx * 31.0), gy], -1)[None]
        _, _, _, _, ok = warp_wide._wide_prep(
            frames, wild, 64, warp_wide.TILE_H, warp_wide.pick_n_sub(h))
        assert not bool(ok), "fixture must actually violate the contract"
        out = np.asarray(warp_wide.warp_u8_batch(
            frames, wild, max_dx_px=64, interpret=INTERPRET))
        want = np.asarray(warp_wide._oracle_u8(frames, wild))
        # The fallback IS the oracle, but fused inside the cond: XLA may
        # reassociate f32 ops, flipping a round() at the boundary — allow
        # 1 uint8 LSB, never more.
        assert np.abs(out.astype(int) - want.astype(int)).max() <= 1

    def test_smooth_grid_does_not_fall_back(self, rng):
        h, w = 64, 128
        grids = _affine_grids(1, h, w)
        _, _, _, _, ok = warp_wide._wide_prep(
            _frames(rng, 1, h, w), grids, 16, warp_wide.TILE_H, 1)
        assert bool(ok)

    def test_planar_f32_kernel_guarded_too(self, rng):
        """The f32 planar kernel's public API enforces the same contract.

        x oscillating with a ~16-px period swings the source column by
        half the frame width WITHIN one 128-column block — far outside
        any 3-stripe window — so the guard must route to the oracle.
        """
        from dvsg_tpu.ops import warp_pallas, warp_ref
        h, w = 32, 640
        frames = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
        xs = jnp.linspace(-1, 1, w)
        ys = jnp.linspace(-1, 1, h)
        gx, gy = jnp.meshgrid(xs, ys)
        wild = jnp.stack([jnp.sin(gx * 31.0), gy], -1)[None]
        _, ok = warp_pallas._run_warp(frames, wild, 64, 32, INTERPRET,
                                      False)
        assert not bool(ok), "fixture must actually violate the contract"
        out = np.asarray(warp_pallas.bilinear_warp_batch(
            frames, wild, max_dx_px=64, interpret=INTERPRET))
        want = np.asarray(warp_ref.bilinear_warp_batch(frames, wild))
        np.testing.assert_allclose(out, want, atol=1e-5)


class TestDispatch:
    def test_lax_path_matches_oracle(self, rng):
        frames = _frames(rng, 1, 40, 100)   # W*C not lane-aligned
        g = _affine_grids(1, 40, 100)
        out = warp_dispatch.warp_quantize_batch(frames, g, "lax")
        want = np.asarray(warp_wide._oracle_u8(frames, g))
        np.testing.assert_array_equal(np.asarray(out), want)

    def test_unaligned_width_pads_and_crops(self, rng):
        # Output width not a 128 multiple: the wide kernel pads the grid
        # with edge columns and crops — same semantics, same fast path.
        frames = _frames(rng, 1, 40, 100)
        g = _affine_grids(1, 40, 100)
        out = warp_wide.warp_u8_batch(frames, g, max_dx_px=16,
                                      interpret=INTERPRET)
        want = np.asarray(warp_wide._oracle_u8(frames, g)).astype(np.int32)
        assert out.shape == (1, 40, 100, 3) and out.dtype == jnp.uint8
        assert np.abs(np.asarray(out).astype(np.int32) - want).max() <= 1

    def test_odd_input_width_and_output_resize(self, rng):
        # Input width arbitrary; output follows the grid (here aligned).
        frames = _frames(rng, 1, 50, 137)
        g = grid_ops.identity_grid(48, 128)[None]
        out = warp_wide.warp_u8_batch(frames, g, max_dx_px=16,
                                      interpret=INTERPRET)
        want = np.asarray(warp_wide._oracle_u8(frames, g)).astype(np.int32)
        assert np.abs(np.asarray(out).astype(np.int32) - want).max() <= 1


class TestQuadPack:
    """The quad-packed plane layout (ops/warp_wide.py::_prep_planes):
    four exact 8-bit taps per int32 lane, edge-replicated +C-lane and
    +1-row shifts. Pinned bit-for-bit against an independent numpy
    construction so XLA-side fusion/layout changes can't silently alter
    the kernel's input."""

    @pytest.mark.parametrize("h,w,c", [(40, 100, 3), (33, 128, 3),
                                       (40, 64, 1), (24, 96, 4)])
    def test_pack_bit_exact_vs_numpy(self, rng, h, w, c):
        import math
        frames = _frames(rng, 2, h, w, c=c)
        tile_h = warp_wide.TILE_H
        got = np.asarray(
            warp_wide._prep_planes(frames, tile_h, packed=True)[0]
        ).view(np.uint32)

        f = np.asarray(frames)
        wmult = warp_wide.TILE_W // math.gcd(warp_wide.TILE_W, c)
        pad_r = (-w) % wmult
        if pad_r < 1:
            pad_r += wmult
        pad_h = tile_h
        hp = -(-(h + 2 * pad_h) // tile_h) * tile_h
        p = np.pad(f, ((0, 0), (pad_h, hp - h - pad_h + 1),
                       (0, pad_r + 1), (0, 0)), mode="edge")
        wide = p.reshape(2, hp + 1, -1).astype(np.uint32)
        want = ((wide[:, :-1, :-c] << 24) | (wide[:, :-1, c:] << 16)
                | (wide[:, 1:, :-c] << 8) | wide[:, 1:, c:])
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("c", [1, 4])
    def test_channel_generality(self, rng, c):
        """The wide kernel is generic in C: grayscale and RGBA frames
        take the same fused path within 1 LSB of the oracle."""
        frames = _frames(rng, 2, 64, 160, c=c)
        g = _affine_grids(2, 64, 160)
        out = warp_wide.warp_u8_batch(frames, g, interpret=INTERPRET)
        want = np.asarray(warp_wide._oracle_u8(frames, g)).astype(np.int32)
        assert out.shape == (2, 64, 160, c)
        assert np.abs(np.asarray(out).astype(np.int32) - want).max() <= 1


@pytest.mark.tpu
class TestTpuCompiled:
    def test_parity_720p(self, rng):
        frames = _frames(rng, 2, 720, 1280)
        grids = _affine_grids(2, 720, 1280)
        ours = np.asarray(warp_wide.warp_u8_batch(
            frames, grids, max_dx_px=97)).astype(np.int32)
        want = np.asarray(warp_wide._oracle_u8(frames, grids)
                          ).astype(np.int32)
        assert np.abs(ours - want).max() <= 1


def _offsets_oracle(frames, offsets, border_crop=0.0):
    h, w = frames.shape[1], frames.shape[2]
    grids = jax.vmap(lambda o: grid_ops.grid_from_offsets(
        o, h, w, border_crop=border_crop))(offsets)
    return np.asarray(warp_wide._oracle_u8(frames, grids)).astype(int)


class TestOffsetsKernel:
    """warp_u8_offsets: in-kernel coordinate synthesis from coarse
    offsets (VERDICT.md round-2 item 1). Parity is vs the dense path
    quantize(warp_ref(normalize, grid_from_offsets)); the only rounding
    difference is f32 coordinate evaluation order, so <= 1 LSB."""

    def _check(self, rng, h, w, gh, gw, crop=0.0, amp=0.15):
        frames = _frames(rng, 2, h, w)
        off = jnp.asarray(
            (rng.random((2, gh, gw, 2), dtype=np.float32) - 0.5) * amp)
        ours = np.asarray(warp_wide.warp_u8_offsets(
            frames, off, border_crop=crop, interpret=INTERPRET)).astype(int)
        want = _offsets_oracle(frames, off, crop)
        assert np.abs(ours - want).max() <= 1

    @pytest.mark.parametrize("h,w,gh,gw", [(96, 128, 6, 8),
                                           (130, 384, 8, 16),
                                           (64, 100, 4, 4)])
    def test_parity(self, rng, h, w, gh, gw):
        self._check(rng, h, w, gh, gw)

    def test_border_crop_zoom_folded(self, rng):
        self._check(rng, 96, 256, 6, 8, crop=0.03)

    def test_zero_offsets_identity_exact(self, rng):
        frames = _frames(rng, 1, 64, 128)
        zero = jnp.zeros((1, 4, 4, 2), jnp.float32)
        out = warp_wide.warp_u8_offsets(frames, zero, interpret=INTERPRET)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(frames))

    def test_tall_frame_multiple_row_blocks(self, rng):
        self._check(rng, 300, 128, 8, 8)

    def test_guard_smooth_offsets_pass(self, rng):
        h, w = 96, 256
        off = jnp.asarray(
            (rng.random((1, 6, 8, 2), dtype=np.float32) - 0.5) * 0.15)
        n_sub = warp_wide.pick_n_sub(h)
        blk = warp_wide.TILE_H * n_sub
        hop = -(-h // blk) * blk
        wop = -(-w // warp_wide.TILE_W) * warp_wide.TILE_W
        planes, _, _ = warp_wide._prep_planes(
            jnp.zeros((1, h, w, 3), jnp.uint8), warp_wide.TILE_H)
        _, ok = warp_wide._offsets_bounds(
            off, h, w, 3, 1.0, blk, hop, wop,
            planes.shape[2] // warp_wide.TILE_W)
        assert bool(ok)

    def test_guard_violating_offsets_fall_back_to_oracle(self, rng):
        """Alternate-sign column offsets swing the source column by most
        of the frame width within one block — outside any 3-stripe
        window — so the coarse-control-point guard must route to the
        oracle."""
        h, w = 32, 640
        frames = _frames(rng, 1, h, w)
        off = np.zeros((1, 4, 16, 2), np.float32)
        off[..., 0] = np.where(np.arange(16) % 2 == 0, 0.9, -0.9)
        off = jnp.asarray(off)
        n_sub = warp_wide.pick_n_sub(h)
        blk = warp_wide.TILE_H * n_sub
        hop = -(-h // blk) * blk
        wop = -(-w // warp_wide.TILE_W) * warp_wide.TILE_W
        planes, _, _ = warp_wide._prep_planes(frames, warp_wide.TILE_H)
        _, ok = warp_wide._offsets_bounds(
            off, h, w, 3, 1.0, blk, hop, wop,
            planes.shape[2] // warp_wide.TILE_W)
        assert not bool(ok), "fixture must actually violate the contract"
        out = np.asarray(warp_wide.warp_u8_offsets(
            frames, off, interpret=INTERPRET)).astype(int)
        want = _offsets_oracle(frames, off)
        assert np.abs(out - want).max() <= 1

    def test_dispatch_offsets_only_lax(self, rng):
        """warp_quantize_batch with offsets and no grids builds the dense
        grid itself on the lax path."""
        frames = _frames(rng, 1, 40, 100)
        off = jnp.asarray(
            (rng.random((1, 4, 4, 2), dtype=np.float32) - 0.5) * 0.1)
        out = warp_dispatch.warp_quantize_batch(
            frames, warp_impl="lax", offsets=off, border_crop=0.01)
        want = _offsets_oracle(frames, off, 0.01)
        np.testing.assert_array_equal(np.asarray(out).astype(int), want)

    def test_dispatch_offsets_only_pallas(self, rng):
        """The production dispatch (offsets, no grids) runs the
        offsets-native kernel and the guard fallback end to end.
        ``pallas_interpret`` is the same program in interpret mode so it
        runs on the CPU suite (VERDICT.md round-2 item 2)."""
        impl = "pallas" if not INTERPRET else "pallas_interpret"
        frames = _frames(rng, 1, 64, 128)
        off = jnp.asarray(
            (rng.random((1, 4, 4, 2), dtype=np.float32) - 0.5) * 0.1)
        out = warp_dispatch.warp_quantize_batch(
            frames, warp_impl=impl, offsets=off)
        want = _offsets_oracle(frames, off)
        assert np.abs(np.asarray(out).astype(int) - want).max() <= 1


class TestVmappedGuard:
    """The coverage guard must stay off the oracle path under vmap.

    Every production multi-clip surface (pipeline/multiclip.py,
    parallel/dp.py, the serving batch engine) vmaps the chunk program
    over clips. jax.vmap's rule for a bare lax.cond with a batched
    predicate is select_n — BOTH branches execute per batch member, so
    the guarded warp would run the slow gather oracle for every clip
    (measured 97x on the 8-clip 720p program). ops/guard.py installs a
    custom_vmap rule; these tests pin its semantics and structure.
    """

    def _clips(self, rng):
        h, w = 32, 640
        frames = _frames(rng, 2, h, w).reshape(2, 1, h, w, 3)
        smooth = (rng.random((1, 4, 16, 2), dtype=np.float32) - 0.5) * 0.1
        wild = np.zeros((1, 4, 16, 2), np.float32)
        wild[..., 0] = np.where(np.arange(16) % 2 == 0, 0.9, -0.9)
        return frames, jnp.asarray(np.stack([smooth, wild]))

    def test_vmapped_mixed_batch_matches_per_clip(self, rng):
        """One covered clip + one contract-violating clip: the batched
        program must match the per-clip results (violator repaired via
        the oracle, covered clip kept on the kernel path) within 1 LSB.

        Not bit-exact by construction: the batched and per-clip programs
        are compiled separately, and XLA's FMA-contraction choices can
        differ between them, shifting quantization at exact-half f32
        boundaries by one uint8 level (~1 pixel per megapixel on the CPU
        interpret path; seeds probed 13/40 show one such pixel). The
        guard SEMANTICS (one batched cond, violators only repaired) are
        pinned structurally by test_vmapped_guard_keeps_cond."""
        frames, offs = self._clips(rng)
        fn = lambda f, o: warp_wide.warp_u8_offsets(f, o,
                                                    interpret=INTERPRET)
        got = np.asarray(jax.vmap(fn)(frames, offs))
        want = np.stack([np.asarray(fn(frames[i], offs[i]))
                         for i in range(2)])
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.max() <= 1, d.max()
        # Rounding-boundary hits are isolated pixels, not structure.
        assert (d > 0).mean() < 1e-3, (d > 0).mean()

    def test_vmapped_guard_keeps_cond(self, rng):
        """Structural: the vmapped guarded program still contains a cond
        (the custom_vmap rule's all(ok) hoist). A bare lax.cond would
        have been rewritten to select_n with the oracle inlined
        unconditionally."""
        frames, offs = self._clips(rng)
        fn = lambda f, o: warp_wide.warp_u8_offsets(f, o,
                                                    interpret=INTERPRET)
        jaxpr = jax.make_jaxpr(jax.vmap(fn))(frames, offs)
        prims = set()

        def walk(jx):
            for eqn in jx.eqns:
                prims.add(eqn.primitive.name)
                for v in eqn.params.values():
                    if hasattr(v, "jaxpr"):
                        walk(v.jaxpr)
                    elif isinstance(v, (list, tuple)):
                        for vi in v:
                            if hasattr(vi, "jaxpr"):
                                walk(vi.jaxpr)
        walk(jaxpr.jaxpr)
        assert "cond" in prims, sorted(prims)

    def test_vmapped_grids_variant(self, rng):
        """Same property for the dense-grid kernel's guard (same 1-LSB
        bound as the mixed-batch test — separately compiled programs)."""
        h, w = 40, 128
        frames = _frames(rng, 2, h, w).reshape(2, 1, h, w, 3)
        grids = _affine_grids(2, h, w).reshape(2, 1, h, w, 2)
        fn = lambda f, g: warp_wide.warp_u8_batch(f, g, max_dx_px=16,
                                                  interpret=INTERPRET)
        got = np.asarray(jax.vmap(fn)(frames, grids))
        want = np.stack([np.asarray(fn(frames[i], grids[i]))
                         for i in range(2)])
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.max() <= 1, d.max()
        assert (d > 0).mean() < 1e-3, (d > 0).mean()


class TestRandomizedConfigs:
    """Seeded fuzz sweep over the kernel's static-shape space.

    The fixtures above pin specific geometries; production sees arbitrary
    ones (any resolution, any coarse grid, any crop). Each case derives
    its whole config from one seed — resolution (odd widths included),
    control-grid size, border crop, offset amplitude — and checks the
    PUBLIC contract: warp_u8_offsets equals the dense-path oracle within
    1 LSB whether the input satisfies the stripe-coverage contract (fast
    path) or not (guard reroutes to the oracle). Large amplitudes are
    deliberately in range so both branches get fuzzed.
    """

    @pytest.mark.parametrize("seed", range(8))
    def test_offsets_parity_random_config(self, seed):
        r = np.random.default_rng(1000 + seed)
        h = int(r.integers(33, 200))
        w = int(r.integers(65, 400))
        gh = int(r.integers(3, 20))
        gw = int(r.integers(3, 20))
        crop = float(r.choice([0.0, 0.02, 0.05]))
        amp = float(r.uniform(0.05, 0.35))
        b = int(r.integers(1, 3))
        frames = _frames(r, b, h, w)
        off = jnp.asarray((r.random((b, gh, gw, 2),
                                    dtype=np.float32) - 0.5) * amp)
        ours = np.asarray(warp_wide.warp_u8_offsets(
            frames, off, border_crop=crop,
            interpret=INTERPRET)).astype(int)
        want = _offsets_oracle(frames, off, crop)
        assert np.abs(ours - want).max() <= 1, (
            f"seed={seed} h={h} w={w} gh={gh} gw={gw} "
            f"crop={crop} amp={amp:.3f}")

    @pytest.mark.parametrize("seed", range(4))
    def test_grids_parity_random_config(self, seed):
        r = np.random.default_rng(2000 + seed)
        h = int(r.integers(33, 180))
        w = int(r.integers(65, 300))
        ho = int(r.integers(33, 180))
        wo = int(r.integers(65, 300))
        frames = _frames(r, 1, h, w)
        ang = float(r.uniform(-0.04, 0.04))
        tx, ty = (float(x) for x in r.uniform(-0.08, 0.08, 2))
        theta = jnp.asarray([[np.cos(ang), -np.sin(ang), tx],
                             [np.sin(ang), np.cos(ang), ty]], jnp.float32)
        grids = grid_ops.affine_grid(theta, ho, wo)[None]
        ours = np.asarray(warp_wide.warp_u8_batch(
            frames, grids, max_dx_px=48, interpret=INTERPRET)).astype(int)
        want = np.asarray(warp_wide._oracle_u8(frames, grids)).astype(int)
        assert np.abs(ours - want).max() <= 1, (
            f"seed={seed} {h}x{w}->{ho}x{wo} ang={ang:.4f}")


class TestPickNSub:
    """pick_n_sub invariants: minimal row padding, bounded block height.

    Padded rows cost full candidate work (scripts/kexp_nsub.py measured
    the legacy tuple's 6.7% dead rows as ~10% wall at 720p/1080p/480p),
    and block height is the stripe-anchoring granularity — a single
    1088-row block at 1080p failed coverage on the 0.05-rad fixture
    where two 544-row blocks were exact.
    """

    def test_minimal_hop(self):
        # hop achieved must equal the minimum possible (n_sub=1's hop).
        for h in (33, 100, 128, 240, 256, 480, 544, 720, 1080, 1440, 2160):
            n = warp_wide.pick_n_sub(h)
            blk = warp_wide.TILE_H * n
            hop = -(-h // blk) * blk
            hop_min = -(-h // warp_wide.TILE_H) * warp_wide.TILE_H
            assert hop == hop_min, (h, n, hop, hop_min)

    def test_block_height_capped(self):
        for h in (720, 1080, 2160, 4320):
            assert warp_wide.TILE_H * warp_wide.pick_n_sub(h) <= 768

    def test_known_picks(self):
        # The measured-on-chip picks of record (kexp_nsub medians):
        # 720p 23 (579 vs 642 us/frame at 24), 1080p 17 (1246 vs 1448
        # at 12), 480p 15 (266 vs 303 at 8).
        assert warp_wide.pick_n_sub(720) == 23
        assert warp_wide.pick_n_sub(1080) == 17
        assert warp_wide.pick_n_sub(480) == 15
        assert warp_wide.pick_n_sub(2160) == 17


class TestCoverageMirror:
    """offsets_coverage_ok: the host-side numpy mirror of the device
    coverage guard (pipeline observability — Stabilizer counts oracle
    fallbacks with it). One body serves both backends
    (_offsets_bounds(xp=...)), so the mirror must agree with the
    internal predicate at the exact kernel-launch geometry for passing
    AND violating fields, across shapes and crops."""

    def _internal_ok(self, off, h, w, crop=0.0):
        scale = 1.0 - 2.0 * crop
        n_sub = warp_wide.pick_n_sub(h)
        blk = warp_wide.TILE_H * n_sub
        hop = -(-h // blk) * blk
        wop = -(-w // warp_wide.TILE_W) * warp_wide.TILE_W
        planes, _, _ = warp_wide._prep_planes(
            jnp.zeros((off.shape[0], h, w, 3), jnp.uint8),
            warp_wide.TILE_H, packed=True)
        _, ok = warp_wide._offsets_bounds(
            jnp.asarray(off), h, w, 3, scale, blk, hop, wop,
            planes.shape[2] // warp_wide.TILE_W)
        return bool(ok)

    @pytest.mark.parametrize("h,w", [(96, 256), (300, 130), (720, 1280)])
    def test_agrees_with_device_predicate(self, rng, h, w):
        for amp, crop in [(0.15, 0.0), (0.15, 0.05), (1.8, 0.0)]:
            off = (rng.random((2, 6, 8, 2), dtype=np.float32) - 0.5) * amp
            want = self._internal_ok(off, h, w, crop)
            got = warp_wide.offsets_coverage_ok(off, h, w,
                                                border_crop=crop)
            assert got == want, (h, w, amp, crop)

    def test_flags_the_violating_field(self):
        # The alternate-sign column fixture of
        # test_guard_violating_offsets_fall_back_to_oracle.
        off = np.zeros((1, 4, 16, 2), np.float32)
        off[..., 0] = np.where(np.arange(16) % 2 == 0, 0.9, -0.9)
        assert not warp_wide.offsets_coverage_ok(off, 32, 640)
        assert warp_wide.offsets_coverage_ok(
            np.zeros((1, 4, 4, 2), np.float32), 32, 640)
