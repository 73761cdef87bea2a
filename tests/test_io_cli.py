"""Video I/O and CLI entry-point tests (config 2 plumbing; SURVEY.md §4).

The CLI must preserve the reference's public surface: stabilize a video
file OR a frame directory into stabilized output (BASELINE.json).
"""

import os

import numpy as np
import jax
import pytest

from dvsg_tpu import cli
from dvsg_tpu.train import synthetic
from dvsg_tpu.utils import video_io
from dvsg_tpu.utils.metrics import psnr


@pytest.fixture(scope="module")
def clip_u8():
    frames, still, path = synthetic.synthetic_clip_u8(
        jax.random.key(3), 10, 48, 64)
    return np.asarray(frames), np.asarray(still)


class TestFrameDirIO:
    def test_roundtrip(self, tmp_path, clip_u8):
        frames, _ = clip_u8
        d = str(tmp_path / "frames")
        with video_io.VideoWriter(d, 64, 48) as w:
            w.write_batch(frames)
        with video_io.VideoReader(d) as r:
            assert r.num_frames == 10
            assert r.shape == (48, 64)
            back = r.read_batch(32)
        np.testing.assert_array_equal(back, frames)  # png is lossless

    def test_missing_input(self):
        with pytest.raises(FileNotFoundError):
            video_io.VideoReader("/nonexistent/path.mp4")

    def test_unpadded_numeric_names_sort_temporally(self, tmp_path):
        """frame1, frame2, ..., frame10 must read in temporal order, not
        lexicographic (frame1, frame10, frame2) — ADVICE r1."""
        import cv2
        d = tmp_path / "frames"
        d.mkdir()
        for i in range(1, 12):
            img = np.full((8, 8, 3), i, np.uint8)
            cv2.imwrite(str(d / f"frame{i}.png"), img)
        with video_io.VideoReader(str(d)) as r:
            frames = r.read_batch(11)
        np.testing.assert_array_equal(frames[:, 0, 0, 0],
                                      np.arange(1, 12, dtype=np.uint8))

    def test_empty_dir(self, tmp_path):
        d = tmp_path / "empty"
        d.mkdir()
        with pytest.raises(FileNotFoundError):
            video_io.VideoReader(str(d))


class TestVideoFileIO:
    def test_mp4_roundtrip(self, tmp_path, clip_u8):
        frames, _ = clip_u8
        p = str(tmp_path / "clip.mp4")
        with video_io.VideoWriter(p, 64, 48, fps=24.0) as w:
            w.write_batch(frames)
        with video_io.VideoReader(p) as r:
            assert r.shape == (48, 64)
            assert abs(r.fps - 24.0) < 0.5
            back = r.read_batch(32)
        assert back.shape == frames.shape
        # lossy codec: content preserved approximately
        assert psnr(back, frames) > 28.0


class TestCLI:
    def test_stabilize_frame_dir(self, tmp_path, clip_u8):
        frames, _ = clip_u8
        src = str(tmp_path / "in")
        dst = str(tmp_path / "out")
        with video_io.VideoWriter(src, 64, 48) as w:
            w.write_batch(frames)
        rc = cli.stabilize_main([
            "--input", src, "--output", dst,
            "--window", "3", "--model-size", "32", "32",
            "--grid-size", "8", "8", "--chunk-frames", "4",
            "--warp-impl", "lax", "--platform", "cpu",
            "--metrics-out", str(tmp_path / "m.jsonl"),
        ])
        assert rc == 0
        with video_io.VideoReader(dst) as r:
            out = r.read_batch(32)
        assert out.shape == frames.shape
        # untrained model == identity warp (±1 LSB from u8 quantization)
        assert np.max(np.abs(out.astype(int) - frames.astype(int))) <= 1
        assert os.path.exists(tmp_path / "m.jsonl")

    def test_stabilize_lag_cli_matches_library(self, tmp_path, clip_u8):
        """--path-smooth-lag rides the sync stream driver end-to-end and
        matches Stabilizer.stabilize_clip byte-for-byte; with --overlap
        it must error out cleanly (live/overlap drivers are causal)."""
        from dvsg_tpu.config import ModelConfig, StabilizeConfig
        from dvsg_tpu.models import motion_cnn
        from dvsg_tpu.pipeline.stabilize import Stabilizer
        frames, _ = clip_u8
        src = str(tmp_path / "in_lag")
        dst = str(tmp_path / "out_lag")
        with video_io.VideoWriter(src, 64, 48) as w:
            w.write_batch(frames)
        args = ["--input", src, "--output", dst,
                "--window", "3", "--model-size", "32", "32",
                "--grid-size", "8", "8", "--chunk-frames", "4",
                "--warp-impl", "lax", "--platform", "cpu",
                "--path-smooth", "8", "--path-smooth-lag", "4"]
        assert cli.stabilize_main(args) == 0
        with video_io.VideoReader(dst) as r:
            out = r.read_batch(32)
        mcfg = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8))
        cfg = StabilizeConfig(model=mcfg, chunk_frames=4, warp_impl="lax",
                              path_smooth=8, path_smooth_lag=4)
        ref = Stabilizer(cfg, motion_cnn.init_params(
            mcfg, __import__("jax").random.key(0))).stabilize_clip(frames)
        np.testing.assert_array_equal(out, ref)
        rc = cli.stabilize_main(args[:-4] + ["--path-smooth", "8",
                                             "--path-smooth-lag", "4",
                                             "--overlap"])
        assert rc != 0

    def test_stabilize_overlapped_matches_sync(self, tmp_path, clip_u8):
        """Overlapped driver must be output-identical to the sync loop
        (SURVEY.md §5.2 determinism discipline)."""
        frames, _ = clip_u8
        src = str(tmp_path / "in2")
        with video_io.VideoWriter(src, 64, 48) as w:
            w.write_batch(frames)
        args = ["--input", src, "--window", "3", "--model-size", "32", "32",
                "--grid-size", "8", "8", "--chunk-frames", "4",
                "--warp-impl", "lax", "--platform", "cpu"]
        d_sync, d_ovl = str(tmp_path / "o_sync"), str(tmp_path / "o_ovl")
        assert cli.stabilize_main(args + ["--output", d_sync]) == 0
        assert cli.stabilize_main(args + ["--output", d_ovl,
                                          "--overlap"]) == 0
        with video_io.VideoReader(d_sync) as r:
            a = r.read_batch(32)
        with video_io.VideoReader(d_ovl) as r:
            b = r.read_batch(32)
        np.testing.assert_array_equal(a, b)

    def test_train_then_stabilize_checkpoint(self, tmp_path, clip_u8):
        frames, _ = clip_u8
        ck = str(tmp_path / "ck")
        rc = cli.train_main([
            "--checkpoint", ck, "--steps", "2", "--batch-size", "2",
            "--window", "3", "--model-size", "32", "32",
            "--grid-size", "8", "8", "--platform", "cpu",
        ])
        assert rc == 0
        src, dst = str(tmp_path / "in3"), str(tmp_path / "out3")
        with video_io.VideoWriter(src, 64, 48) as w:
            w.write_batch(frames)
        rc = cli.stabilize_main(["--input", src, "--output", dst,
                                 "--checkpoint", ck, "--chunk-frames", "4",
                                 "--warp-impl", "lax", "--platform", "cpu"])
        assert rc == 0
        with video_io.VideoReader(dst) as r:
            assert r.read_batch(32).shape == frames.shape

    def test_overlap_with_resume_rejected(self, tmp_path, capsys):
        rc = cli.stabilize_main([
            "--input", "whatever", "--output", "whatever2",
            "--overlap", "--resume-dir", str(tmp_path / "r")])
        assert rc == 2
        assert "no resume support" in capsys.readouterr().err

    def test_resume_into_container_rejected_before_truncation(
            self, tmp_path, capsys):
        """--resume-dir with a container output must fail BEFORE the
        writer opens: cv2.VideoWriter truncates on open, so a resumed
        job would destroy the partial output it came to finish."""
        out = tmp_path / "partial.mp4"
        out.write_bytes(b"partial output from the crashed run")
        rc = cli.stabilize_main([
            "--input", "whatever", "--output", str(out),
            "--resume-dir", str(tmp_path / "r")])
        assert rc == 2
        assert "frame-directory" in capsys.readouterr().err
        assert out.read_bytes() == b"partial output from the crashed run"

    def test_batch_mixed_resolution_rejected_before_writers(
            self, tmp_path, clip_u8, capsys):
        """A mixed-resolution batch must fail before ANY output file is
        created/truncated (writers would clobber pre-existing outputs
        for a run that does no work)."""
        frames, _ = clip_u8
        a = str(tmp_path / "a_in")
        b = str(tmp_path / "b_in")
        with video_io.VideoWriter(a, 64, 48) as w:
            w.write_batch(frames)
        with video_io.VideoWriter(b, 32, 32) as w:
            w.write_batch(np.zeros((4, 32, 32, 3), np.uint8))
        out_a, out_b = tmp_path / "a.avi", tmp_path / "b.avi"
        out_a.write_bytes(b"keep me")
        rc = cli.stabilize_batch_main([
            "--inputs", a, b, "--outputs", str(out_a), str(out_b),
            "--platform", "cpu",
            "--model-size", "32", "32", "--grid-size", "8", "8",
            "--window", "3", "--chunk-frames", "4", "--warp-impl", "lax"])
        assert rc == 2
        assert "share one resolution" in capsys.readouterr().err
        assert out_a.read_bytes() == b"keep me"
        assert not out_b.exists()

    def test_unknown_command(self):
        assert cli.main(["frobnicate"]) == 2


class TestCLIErrors:
    def test_missing_input_clean_error(self, capsys):
        rc = cli.stabilize_main(["--input", "/nonexistent.mp4",
                                 "--output", "/tmp/x.mp4",
                                 "--platform", "cpu"])
        assert rc == 2
        assert "ERROR" in capsys.readouterr().err


def test_preset_resolves_committed_checkpoint(tmp_path):
    """--preset fast resolves checkpoints/flagship_fast.npz; explicit
    --checkpoint wins over --preset."""
    import os
    import types
    from dvsg_tpu import cli

    a = types.SimpleNamespace(checkpoint=None, preset="fast")
    cli._resolve_preset(a)
    assert a.checkpoint and a.checkpoint.endswith("flagship_fast.npz")
    assert os.path.exists(a.checkpoint)

    b = types.SimpleNamespace(checkpoint="/explicit/path", preset="fast")
    cli._resolve_preset(b)
    assert b.checkpoint == "/explicit/path"


def test_no_args_defaults_to_fast_preset():
    """A bare invocation (no checkpoint, no preset, no custom arch)
    defaults to the committed fast pretrained model; any explicit
    architecture flag keeps the untrained model instead (preset weights
    cannot fit a custom arch)."""
    import types
    from dvsg_tpu import cli

    bare = types.SimpleNamespace(checkpoint=None, preset=None)
    cli._resolve_preset(bare)
    assert bare.checkpoint and bare.checkpoint.endswith("flagship_fast.npz")

    custom = types.SimpleNamespace(checkpoint=None, preset=None,
                                   model_size=(32, 32))
    cli._resolve_preset(custom)
    assert custom.checkpoint is None


class TestAutoChunkFrames:
    """Resolution-keyed chunk_frames auto-pick (on-chip sweep values,
    scripts/probe_chunk_sizes.py)."""

    def test_bands_match_measured_sweep(self):
        from dvsg_tpu.config import auto_chunk_frames
        # Re-swept 2026-08-20 after the exact-fit row-blocking kernel
        # win: 480p moved 16 -> 64 (3050 vs 2645 fps); the rest held.
        assert auto_chunk_frames(480, 854) == 64
        assert auto_chunk_frames(720, 1280) == 32
        assert auto_chunk_frames(1080, 1920) == 16
        assert auto_chunk_frames(2160, 3840) == 4

    def test_cpu_keeps_default(self):
        from dvsg_tpu.config import auto_chunk_frames
        for h, w in [(480, 854), (720, 1280), (2160, 3840)]:
            assert auto_chunk_frames(h, w, on_tpu=False) == 16

    def test_batch_scales_down_per_clip_chunk(self):
        from dvsg_tpu.config import auto_chunk_frames
        # 8-clip 720p measured fastest at T=16 (1487 fps aggregate vs
        # 1375 at T=8, 1310 at T=4, re-swept on-chip 2026-08-20).
        assert auto_chunk_frames(720, 1280, n_clips=8) == 16
        # never below 2, even for very large batches
        assert auto_chunk_frames(2160, 3840, n_clips=64) == 2

    def test_cli_auto_pick_runs(self, tmp_path, capsys):
        """Omitting --chunk-frames picks automatically and still
        stabilizes (CPU -> T=16)."""
        frames, _, _ = synthetic.synthetic_clip_u8(
            jax.random.key(5), 6, 48, 64)
        src, dst = str(tmp_path / "in"), str(tmp_path / "out")
        with video_io.VideoWriter(src, 64, 48) as w:
            w.write_batch(np.asarray(frames))
        rc = cli.stabilize_main([
            "--input", src, "--output", dst,
            "--window", "3", "--model-size", "32", "32",
            "--grid-size", "8", "8",
            "--warp-impl", "lax", "--platform", "cpu",
        ])
        assert rc == 0
        err = capsys.readouterr().err
        assert "auto-picked T=16" in err
        with video_io.VideoReader(dst) as r:
            assert r.read_batch(32).shape[0] == 6


def test_writer_rejects_wrong_size_frame(tmp_path):
    """cv2.VideoWriter.write silently drops wrong-size frames (short
    container, overstated resume point) — the wrapper must raise."""
    p = str(tmp_path / "x.mp4")
    with video_io.VideoWriter(p, 64, 48) as w:
        w.write(np.zeros((48, 64, 3), np.uint8))
        with pytest.raises(ValueError, match="shape"):
            w.write(np.zeros((32, 32, 3), np.uint8))


def test_writer_webm_container(tmp_path):
    """.webm needs a VP8/VP9 fourcc (MJPG fails isOpened with the
    FFmpeg backend)."""
    p = str(tmp_path / "x.webm")
    frames = (np.random.default_rng(0).random((4, 32, 48, 3)) * 255
              ).astype(np.uint8)
    with video_io.VideoWriter(p, 48, 32) as w:
        w.write_batch(frames)
    with video_io.VideoReader(p) as r:
        assert r.read_batch(8).shape == frames.shape
