"""Streaming pipeline tests: windowing, chunk-halo carry, edge cases
(SURVEY.md §4 rows "window stacker" and "Integration: config 2")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.pipeline.stabilize import (Stabilizer, build_windows,
                                         initial_halo, stabilize_chunk)
from dvsg_tpu.train import synthetic
from dvsg_tpu.utils.metrics import psnr

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)
CFG = StabilizeConfig(model=MCFG, chunk_frames=4, warp_impl="lax")


@pytest.fixture(scope="module")
def params():
    return motion_cnn.init_params(MCFG, jax.random.key(0))


class TestBuildWindows:
    def test_semantics(self):
        seq = jnp.arange(6, dtype=jnp.float32).reshape(6, 1, 1, 1)
        seq = jnp.tile(seq, (1, 2, 2, 1))  # (6, 2, 2, 1)
        win = build_windows(seq, num_out=4, window=3)
        assert win.shape == (4, 2, 2, 3)
        # window t = seq[t : t+3] stacked on channels
        np.testing.assert_allclose(np.asarray(win[0, 0, 0]), [0, 1, 2])
        np.testing.assert_allclose(np.asarray(win[3, 0, 0]), [3, 4, 5])


class TestStabilizeClip:
    def test_untrained_model_is_identity(self, params, rng):
        frames = (rng.random((7, 40, 48, 3)) * 255).astype(np.uint8)
        stab = Stabilizer(CFG, params)
        out = stab.stabilize_clip(frames)
        assert out.shape == frames.shape and out.dtype == np.uint8
        # identity warp + u8 round-trip: off by at most 1 LSB
        assert np.max(np.abs(out.astype(int) - frames.astype(int))) <= 1

    def test_chunking_invariant(self, params, rng):
        """Halo carry must make chunk size invisible in the output."""
        frames = (rng.random((11, 32, 40, 3)) * 255).astype(np.uint8)
        out_small = Stabilizer(CFG.replace(chunk_frames=2),
                               params).stabilize_clip(frames)
        out_big = Stabilizer(CFG.replace(chunk_frames=8),
                             params).stabilize_clip(frames)
        np.testing.assert_array_equal(out_small, out_big)

    def test_video_shorter_than_window(self, params, rng):
        frames = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
        out = Stabilizer(CFG, params).stabilize_clip(frames)
        assert out.shape == frames.shape

    def test_empty_clip(self, params):
        frames = np.zeros((0, 32, 32, 3), np.uint8)
        out = Stabilizer(CFG, params).stabilize_clip(frames)
        assert out.shape == frames.shape

    def test_initial_halo_replicates_first_frame(self, params, rng):
        frame = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        halo = initial_halo(CFG, frame)
        assert halo.shape == (MCFG.window - 1, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(halo[0]), np.asarray(halo[1]))


class TestStrength:
    @pytest.fixture(scope="class")
    def moving_params(self):
        """Params whose head actually predicts nonzero offsets: bump the
        zero-init head bias so the untrained-identity property goes away."""
        p = motion_cnn.init_params(MCFG, jax.random.key(0))

        def bump(t):
            leaves, treedef = jax.tree_util.tree_flatten(t)
            leaves = [l + 0.35 if l.ndim == 1 and l.shape[0] == 2 else l
                      for l in leaves]
            return jax.tree_util.tree_unflatten(treedef, leaves)

        return bump(p)

    def test_zero_strength_is_passthrough(self, moving_params, rng):
        frames = (rng.random((5, 32, 40, 3)) * 255).astype(np.uint8)
        out_full = Stabilizer(CFG, moving_params).stabilize_clip(frames)
        out_zero = Stabilizer(CFG.replace(strength=0.0),
                              moving_params).stabilize_clip(frames)
        # Full strength must move pixels; zero strength must not.
        assert np.abs(out_full.astype(int) - frames.astype(int)).max() > 2
        assert np.abs(out_zero.astype(int) - frames.astype(int)).max() <= 1

    def test_partial_strength_scales_offsets(self, moving_params, rng):
        from dvsg_tpu.pipeline.stabilize import put_frames
        frames = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
        halo = initial_halo(CFG, frames[0])
        _, _, offs1 = stabilize_chunk(CFG, moving_params,
                                      put_frames(frames), halo)
        halo = initial_halo(CFG, frames[0])
        _, _, offs_h = stabilize_chunk(CFG.replace(strength=0.5),
                                       moving_params, put_frames(frames),
                                       halo)
        np.testing.assert_allclose(np.asarray(offs_h),
                                   np.asarray(offs1) * 0.5, atol=1e-6)

    def test_cli_rejects_bad_strength(self, tmp_path, rng):
        import cv2
        from dvsg_tpu import cli
        d = tmp_path / "in"
        d.mkdir()
        cv2.imwrite(str(d / "f0.png"),
                    (rng.random((32, 32, 3)) * 255).astype(np.uint8))
        rc = cli.stabilize_main([
            "--input", str(d), "--output", str(tmp_path / "o"),
            "--strength", "3.0", "--platform", "cpu"])
        assert rc == 2


class TestDeterminism:
    def test_two_runs_bitwise_equal(self, params, rng):
        """SURVEY.md §5.2: determinism gate against buffer-reuse races."""
        frames = (rng.random((9, 32, 32, 3)) * 255).astype(np.uint8)
        stab = Stabilizer(CFG, params)
        np.testing.assert_array_equal(stab.stabilize_clip(frames),
                                      stab.stabilize_clip(frames))


class TestSyntheticFixture:
    def test_clip_shapes_and_range(self):
        frames, still, path = synthetic.synthetic_clip(
            jax.random.key(1), 8, 48, 64)
        assert frames.shape == (8, 48, 64, 3)
        assert still.shape == (48, 64, 3)
        assert path.shape == (8, 5)
        f = np.asarray(frames)
        assert f.min() >= 0.0 and f.max() <= 1.0
        # jitter must actually move pixels
        assert np.abs(f[0] - f[4]).max() > 0.05

    def test_known_jitter_is_invertible(self):
        """Warping a jittered frame by the inverse affine recovers the
        still — the ground-truth construction the trained model must
        learn (SURVEY.md §4 'key insight')."""
        from dvsg_tpu.ops import grid as grid_ops
        from dvsg_tpu.ops.warp_ref import bilinear_warp

        frames, still, path = synthetic.synthetic_clip(
            jax.random.key(2), 4, 64, 64)
        t = 2
        theta_inv = synthetic.invert_theta(synthetic.jitter_theta(path[t]))
        g = grid_ops.homography_grid(theta_inv, 64, 64)
        rec = np.asarray(bilinear_warp(frames[t], g))
        interior = (slice(10, -10), slice(10, -10))
        p = psnr(rec[interior], np.asarray(still)[interior])
        assert p > 32.0, f"inverse-jitter PSNR too low: {p:.1f} dB"


class TestBorderCropValidation:
    """border_crop >= 0.5 flips the identity-scale sign (1 - 2*crop),
    which would invert the Pallas coverage guard's corner-derived
    per-block bounds — every entry must reject it up front."""

    def test_config_rejects(self):
        with pytest.raises(ValueError, match="border_crop"):
            StabilizeConfig(model=MCFG, border_crop=0.5)
        with pytest.raises(ValueError, match="border_crop"):
            StabilizeConfig(model=MCFG, border_crop=-0.01)
        StabilizeConfig(model=MCFG, border_crop=0.49)  # boundary ok

    def test_grid_rejects(self):
        from dvsg_tpu.ops import grid as grid_ops
        with pytest.raises(ValueError, match="border_crop"):
            grid_ops.grid_from_offsets(jnp.zeros((4, 4, 2)), 32, 32,
                                       border_crop=0.6)

    def test_offsets_kernel_rejects(self):
        from dvsg_tpu.ops import warp_wide
        frames = np.zeros((1, 32, 128, 3), np.uint8)
        offsets = np.zeros((1, 4, 4, 2), np.float32)
        with pytest.raises(ValueError, match="border_crop"):
            warp_wide.warp_u8_offsets(frames, offsets, border_crop=0.5,
                                      interpret=True)


class TestOverlappedFailureCleanup:
    def test_device_step_failure_retires_workers(self, tmp_path):
        """A mid-run device-step failure must still retire the decode and
        encode workers (no leaked threads blocked on the queues, no race
        against the caller's writer.close) and propagate the error."""
        import threading
        import jax
        from dvsg_tpu.config import ModelConfig, StabilizeConfig
        from dvsg_tpu.models import motion_cnn
        from dvsg_tpu.pipeline.overlap import stabilize_stream_overlapped
        from dvsg_tpu.pipeline.stabilize import Stabilizer
        from dvsg_tpu.utils import video_io

        mcfg = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                           base_features=8, blocks_per_level=1)
        cfg = StabilizeConfig(model=mcfg, chunk_frames=2, warp_impl="lax",
                              queue_depth=1)
        params = motion_cnn.init_params(mcfg, jax.random.key(0))

        class Boom(RuntimeError):
            pass

        class FailingStabilizer(Stabilizer):
            calls = 0

            def _chunk(self, dev_chunk, halo):
                FailingStabilizer.calls += 1
                if FailingStabilizer.calls >= 2:
                    raise Boom("injected device failure")
                return super()._chunk(dev_chunk, halo)

        frames = np.random.default_rng(0).integers(
            0, 255, (12, 32, 48, 3), np.uint8)
        src = str(tmp_path / "in")
        with video_io.VideoWriter(src, 48, 32) as w:
            w.write_batch(frames)

        before = threading.active_count()
        stab = FailingStabilizer(cfg, params)
        with video_io.VideoReader(src) as r, \
                video_io.VideoWriter(str(tmp_path / "out"), 48, 32) as w:
            with pytest.raises(Boom):
                stabilize_stream_overlapped(stab, r, w)
        # Both workers joined: thread count returns to the baseline.
        assert threading.active_count() == before


class TestCoverageObservability:
    """Stabilizer surfaces device-guard fallbacks: chunks whose offsets
    exceed the fused kernel's stripe-coverage band ride the exact lax
    oracle (correct, ~40x slower) — the drivers count them host-side
    (ops/warp_wide.offsets_coverage_ok) so the CLI can say WHY a clip
    was slow instead of leaving a silent 40x mystery."""

    W = 256   # wide enough that alternating +-0.9 column offsets
    H = 32    # overflow the 3-stripe window (>= ~83 px dx variation)

    def _bad_offsets(self, t):
        off = np.zeros((t, 4, 16, 2), np.float32)
        off[..., 0] = np.where(np.arange(16) % 2 == 0, 0.9, -0.9)
        return jnp.asarray(off)

    def _rigged(self, cfg, params):
        bad = self._bad_offsets(cfg.chunk_frames)

        class Rigged(Stabilizer):
            def _chunk(self, dev_chunk, halo):
                out, new_halo, _ = super()._chunk(dev_chunk, halo)
                return out, new_halo, bad

        return Rigged(cfg, params)

    def test_counts_fallback_chunks(self, params, rng):
        from dvsg_tpu.ops import warp_wide
        cfg = CFG.replace(warp_impl="pallas_interpret")
        frames = (rng.random((8, self.H, self.W, 3)) * 255
                  ).astype(np.uint8)
        assert not warp_wide.offsets_coverage_ok(
            np.asarray(self._bad_offsets(1)), self.H, self.W)

        stab = self._rigged(cfg, params)
        stab.stabilize_clip(frames)
        assert stab.chunks_seen == 2
        assert stab.coverage_fallbacks == 2

    def test_smooth_offsets_do_not_count(self, params, rng):
        cfg = CFG.replace(warp_impl="pallas_interpret")
        frames = (rng.random((8, self.H, self.W, 3)) * 255
                  ).astype(np.uint8)
        stab = Stabilizer(cfg, params)   # untrained model: ~0 offsets
        stab.stabilize_clip(frames)
        assert stab.chunks_seen == 2
        assert stab.coverage_fallbacks == 0

    def test_lax_impl_has_no_coverage_contract(self, params, rng):
        frames = (rng.random((4, self.H, self.W, 3)) * 255
                  ).astype(np.uint8)
        stab = self._rigged(CFG, params)   # CFG is warp_impl="lax"
        stab.stabilize_clip(frames)
        assert stab.chunks_seen == 1
        assert stab.coverage_fallbacks == 0

    def test_stream_driver_counts_too(self, params, rng, tmp_path):
        from dvsg_tpu.utils import video_io
        cfg = CFG.replace(warp_impl="pallas_interpret")
        frames = (rng.random((8, self.H, self.W, 3)) * 255
                  ).astype(np.uint8)
        import cv2
        src = tmp_path / "in"
        src.mkdir()
        for i, f in enumerate(frames):
            cv2.imwrite(str(src / f"{i:04d}.png"),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        reader = video_io.VideoReader(str(src))
        out_dir = tmp_path / "out"
        out_dir.mkdir()
        writer = video_io.VideoWriter(str(out_dir), self.W, self.H)
        stab = self._rigged(cfg, params)
        n = stab.stabilize_stream(reader, writer)
        reader.close()
        writer.close()
        assert n == 8
        assert stab.chunks_seen == 2
        assert stab.coverage_fallbacks == 2


class TestBatchDriverCoverage:
    """drive_chunked_batch(coverage_out=...): per-clip fallback counts
    for the clip-batch surfaces (dp, serve batching, multiclip)."""

    def test_per_clip_counts(self, params):
        from dvsg_tpu.pipeline.stabilize import drive_chunked_batch
        cfg = CFG.replace(warp_impl="pallas_interpret")
        t = cfg.chunk_frames
        bad = np.zeros((t, 4, 16, 2), np.float32)
        bad[..., 0] = np.where(np.arange(16) % 2 == 0, 0.9, -0.9)
        offs = jnp.stack([jnp.asarray(bad), jnp.zeros((t, 4, 16, 2))])

        def fn(p, frames, halos):     # rigged chunk fn: clip 0 violates
            return frames, halos, offs

        clips = np.zeros((2, 2 * t, 32, 256, 3), np.uint8)
        cov = []
        out = drive_chunked_batch(fn, params, cfg, clips,
                                  coverage_out=cov)
        assert out.shape == clips.shape
        assert cov == [2, 0]

    def test_lax_impl_counts_nothing(self, params):
        from dvsg_tpu.pipeline.stabilize import drive_chunked_batch
        t = CFG.chunk_frames
        bad = np.zeros((t, 4, 16, 2), np.float32)
        bad[..., 0] = np.where(np.arange(16) % 2 == 0, 0.9, -0.9)
        offs = jnp.stack([jnp.asarray(bad)] * 2)

        def fn(p, frames, halos):
            return frames, halos, offs

        clips = np.zeros((2, t, 32, 256, 3), np.uint8)
        cov = []
        drive_chunked_batch(fn, params, CFG, clips, coverage_out=cov)
        assert cov == [0, 0]
