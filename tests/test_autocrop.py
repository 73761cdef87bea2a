"""Auto border-crop: two-pass detect→transform (pipeline/autocrop.py).

The reference exposes a fixed, hand-chosen crop parameter (SURVEY.md §1;
mount empty — citation unavailable); `--border-crop auto` adds the
standard production two-pass: a predict-only scan picks the minimal
quantized crop that keeps every warp sampling coordinate in-frame.
"""

import numpy as np
import jax
import pytest

from dvsg_tpu import cli
from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.ops import grid as grid_ops
from dvsg_tpu.pipeline import autocrop
from dvsg_tpu.pipeline.stabilize import initial_halo, put_frames, \
    stabilize_chunk_impl
from dvsg_tpu.train import synthetic
from dvsg_tpu.utils import checkpoint as ckpt
from dvsg_tpu.utils import video_io


class TestCropMath:
    def test_zero_motion_zero_crop(self):
        assert autocrop.crop_for_max_offset(0.0) == (0.0, False)

    def test_rounds_up_to_sixtyfourths(self):
        crop, capped = autocrop.crop_for_max_offset(0.1)   # needs 0.05
        assert not capped
        assert crop == 4 / 64                              # ceil(3.2)/64
        assert crop >= 0.05

    def test_exact_multiple_not_bumped(self):
        crop, _ = autocrop.crop_for_max_offset(0.125)      # needs 4/64
        assert crop == 4 / 64

    def test_caps_below_half(self):
        crop, capped = autocrop.crop_for_max_offset(1.5)
        assert capped
        assert crop == 31 / 64 < 0.5

    def test_monotone(self):
        crops = [autocrop.crop_for_max_offset(m)[0]
                 for m in np.linspace(0, 1.0, 33)]
        assert all(b >= a for a, b in zip(crops, crops[1:]))


@pytest.fixture(scope="module")
def trained_setup():
    """Trained small flagship + a genuinely shaky clip: predicted offsets
    are real (nonzero), so the picked crop is nontrivial."""
    params, mcfg = ckpt.load_npz("checkpoints/small.npz")
    cfg = StabilizeConfig(model=mcfg, chunk_frames=8, warp_impl="lax")
    frames, _, _ = synthetic.synthetic_clip_u8(jax.random.key(7), 20, 96,
                                               128)
    return cfg, params, np.asarray(frames)


class _ArrayReader:
    """Minimal read_batch source for the streaming scan."""

    def __init__(self, frames):
        self.frames = frames
        self.pos = 0
        self.height, self.width = frames.shape[1:3]

    def read_batch(self, k):
        out = self.frames[self.pos:self.pos + k]
        self.pos += out.shape[0]
        return out


class TestScan:
    def test_stream_matches_clip_scan(self, trained_setup):
        cfg, params, frames = trained_setup
        m_clip = autocrop.scan_clip_max_offset(cfg, params, frames)
        m_stream = autocrop.scan_stream_max_offset(cfg, params,
                                                   _ArrayReader(frames))
        assert m_clip == pytest.approx(m_stream, rel=1e-6)
        assert m_clip > 0.0          # trained model on a shaky clip

    def test_scan_matches_pass2_offsets(self, trained_setup):
        """Pass 1's max equals the max |offset| the full pipeline
        (pass 2) actually warps with — same chunking, same halo math."""
        cfg, params, frames = trained_setup
        m_scan = autocrop.scan_clip_max_offset(cfg, params, frames)
        halo = initial_halo(cfg, frames[0])
        t = cfg.chunk_frames
        m_ref = 0.0
        for s in range(0, frames.shape[0], t):
            chunk = frames[s:s + t]
            if chunk.shape[0] < t:
                pad = np.repeat(chunk[-1:], t - chunk.shape[0], axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            _, halo, offs = stabilize_chunk_impl(cfg, params,
                                                 put_frames(chunk), halo)
            m_ref = max(m_ref, float(np.max(np.abs(np.asarray(offs)))))
        assert m_scan == pytest.approx(m_ref, rel=1e-6)

    def test_picked_crop_keeps_grids_in_frame(self, trained_setup):
        """The whole point: with the picked crop, every dense sampling
        coordinate stays inside the frame (normalized grid in [-1, 1])."""
        cfg, params, frames = trained_setup
        crop, m, capped = autocrop.pick_border_crop(cfg, params, frames)
        assert not capped
        h, w = frames.shape[1:3]
        halo = initial_halo(cfg, frames[0])
        t = cfg.chunk_frames
        for s in range(0, frames.shape[0] - t + 1, t):
            _, halo, offs = stabilize_chunk_impl(
                cfg, params, put_frames(frames[s:s + t]), halo)
            g = jax.vmap(lambda o: grid_ops.grid_from_offsets(
                o, h, w, border_crop=crop))(offs)
            g = np.asarray(g)
            assert g.min() >= -1.0 - 1e-5
            assert g.max() <= 1.0 + 1e-5

    def test_empty_clip(self, trained_setup):
        cfg, params, _ = trained_setup
        empty = np.zeros((0, 96, 128, 3), np.uint8)
        assert autocrop.scan_clip_max_offset(cfg, params, empty) == 0.0

    def test_batched_scan_matches_per_clip(self, trained_setup):
        """Ragged-length batch through the vmapped lockstep scan equals
        the max of independent per-clip scans: exhausted clips repeat
        their last chunk masked out, active clips see identical chunks."""
        cfg, params, frames = trained_setup
        clips = [frames, frames[:11], frames[5:17]]   # ragged lengths
        per_clip = [autocrop.scan_clip_max_offset(cfg, params, c)
                    for c in clips]
        batched = autocrop.scan_readers_max_offset(
            cfg, params, [_ArrayReader(c) for c in clips])
        assert batched == pytest.approx(max(per_clip), rel=1e-5)

    def test_batched_scan_with_empty_member(self, trained_setup):
        cfg, params, frames = trained_setup
        empty = np.zeros((0, 96, 128, 3), np.uint8)
        batched = autocrop.scan_readers_max_offset(
            cfg, params, [_ArrayReader(frames[:9]), _ArrayReader(empty)])
        solo = autocrop.scan_clip_max_offset(cfg, params, frames[:9])
        assert batched == pytest.approx(solo, rel=1e-5)


class TestCLI:
    def _write_clip(self, tmp_path, name="in", n=10):
        frames, _, _ = synthetic.synthetic_clip_u8(jax.random.key(3), n,
                                                   48, 64)
        frames = np.asarray(frames)
        src = str(tmp_path / name)
        with video_io.VideoWriter(src, 64, 48) as w:
            w.write_batch(frames)
        return src, frames

    def test_stabilize_auto(self, tmp_path, capsys):
        src, frames = self._write_clip(tmp_path)
        dst = str(tmp_path / "out")
        rc = cli.stabilize_main([
            "--input", src, "--output", dst, "--preset", "fast",
            "--chunk-frames", "4", "--warp-impl", "lax",
            "--platform", "cpu", "--border-crop", "auto"])
        assert rc == 0
        assert "auto border-crop" in capsys.readouterr().err
        with video_io.VideoReader(dst) as r:
            assert r.read_batch(32).shape == frames.shape

    def test_bad_value_rejected(self, tmp_path, capsys):
        rc = cli.stabilize_main([
            "--input", str(tmp_path), "--output", str(tmp_path / "o"),
            "--border-crop", "wide"])
        assert rc == 2
        assert "border-crop" in capsys.readouterr().err

    def test_out_of_range_fails_fast(self, capsys):
        """Range enforced at parse time, before any reader/checkpoint
        work — the input path doesn't even exist."""
        rc = cli.stabilize_main([
            "--input", "/nonexistent", "--output", "/nonexistent2",
            "--border-crop", "0.9"])
        assert rc == 2
        assert "[0, 0.5)" in capsys.readouterr().err

    def test_artifact_with_explicit_crop_rejected(self, tmp_path, capsys):
        """An explicit numeric crop must not be silently dropped in
        favor of the artifact's baked value."""
        rc = cli.stabilize_main([
            "--input", str(tmp_path), "--output", str(tmp_path / "o"),
            "--artifact", str(tmp_path / "missing.dvsgx"),
            "--border-crop", "0.1"])
        assert rc == 2
        assert "baked at export" in capsys.readouterr().err

    def test_auto_with_artifact_rejected(self, tmp_path, capsys):
        rc = cli.stabilize_main([
            "--input", str(tmp_path), "--output", str(tmp_path / "o"),
            "--artifact", str(tmp_path / "missing.dvsgx"),
            "--border-crop", "auto"])
        assert rc == 2
        assert "auto" in capsys.readouterr().err

    def test_batch_auto(self, tmp_path, capsys):
        src1, f1 = self._write_clip(tmp_path, "in1")
        src2, f2 = self._write_clip(tmp_path, "in2")
        out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
        rc = cli.stabilize_batch_main([
            "--inputs", src1, src2, "--outputs", out1, out2,
            "--preset", "fast", "--chunk-frames", "4",
            "--warp-impl", "lax", "--platform", "cpu", "--no-mesh",
            "--border-crop", "auto"])
        assert rc == 0
        assert "auto border-crop" in capsys.readouterr().err
        for out, f in ((out1, f1), (out2, f2)):
            with video_io.VideoReader(out) as r:
                assert r.read_batch(32).shape == f.shape
