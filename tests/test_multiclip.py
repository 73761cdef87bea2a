"""Batched multi-clip streaming tests (BASELINE.json configs 4-5 shape)."""

import numpy as np
import jax
import pytest

from dvsg_tpu import cli
from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.parallel import mesh as mesh_lib
from dvsg_tpu.pipeline.multiclip import stabilize_multi
from dvsg_tpu.pipeline.stabilize import Stabilizer
from dvsg_tpu.utils import video_io

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)
CFG = StabilizeConfig(model=MCFG, chunk_frames=4, warp_impl="lax")


@pytest.fixture(scope="module")
def params():
    return motion_cnn.init_params(MCFG, jax.random.key(0))


def _make_clips(tmp_path, rng, lengths, h=32, w=40):
    dirs, clips = [], []
    for i, n in enumerate(lengths):
        frames = (rng.random((n, h, w, 3)) * 255).astype(np.uint8)
        d = str(tmp_path / f"in{i}")
        with video_io.VideoWriter(d, w, h) as wr:
            wr.write_batch(frames)
        dirs.append(d)
        clips.append(frames)
    return dirs, clips


def test_multi_matches_single(tmp_path, params, rng):
    """Unequal-length clips through the batched driver must match the
    single-clip pipeline exactly, per clip."""
    dirs, clips = _make_clips(tmp_path, rng, [10, 6, 4, 8])
    outs = [str(tmp_path / f"out{i}") for i in range(4)]
    readers = [video_io.VideoReader(d) for d in dirs]
    writers = [video_io.VideoWriter(o, 40, 32) for o in outs]
    result = stabilize_multi(CFG, params, readers, writers)
    for w_ in writers:
        w_.close()
    assert result.ok and result.frames_written == [10, 6, 4, 8]

    single = Stabilizer(CFG, params)
    for i, frames in enumerate(clips):
        with video_io.VideoReader(outs[i]) as r:
            got = r.read_batch(64)
        np.testing.assert_array_equal(got, single.stabilize_clip(frames))


def test_multi_with_mesh(tmp_path, params, rng):
    dirs, clips = _make_clips(tmp_path, rng, [6] * 8)
    outs = [str(tmp_path / f"mout{i}") for i in range(8)]
    readers = [video_io.VideoReader(d) for d in dirs]
    writers = [video_io.VideoWriter(o, 40, 32) for o in outs]
    mesh = mesh_lib.make_mesh()
    result = stabilize_multi(CFG, params, readers, writers, mesh=mesh)
    for w_ in writers:
        w_.close()
    assert result.ok and result.frames_written == [6] * 8
    single = Stabilizer(CFG, params)
    for i, frames in enumerate(clips):
        with video_io.VideoReader(outs[i]) as r:
            got = r.read_batch(64)
        np.testing.assert_array_equal(got, single.stabilize_clip(frames))


def test_mismatched_resolutions_rejected(tmp_path, params, rng):
    d1, _ = _make_clips(tmp_path, rng, [4], h=32, w=40)
    frames = (rng.random((4, 48, 40, 3)) * 255).astype(np.uint8)
    d2 = str(tmp_path / "in_other")
    with video_io.VideoWriter(d2, 40, 48) as wr:
        wr.write_batch(frames)
    readers = [video_io.VideoReader(d1[0]), video_io.VideoReader(d2)]
    writers = [video_io.VideoWriter(str(tmp_path / f"x{i}"), 40, 32)
               for i in range(2)]
    with pytest.raises(ValueError):
        stabilize_multi(CFG, params, readers, writers)


def test_cli_stabilize_batch(tmp_path, params, rng):
    dirs, clips = _make_clips(tmp_path, rng, [5, 7])
    outs = [str(tmp_path / f"co{i}") for i in range(2)]
    rc = cli.stabilize_batch_main([
        "--inputs", *dirs, "--outputs", *outs,
        "--window", "3", "--model-size", "32", "32",
        "--grid-size", "8", "8", "--chunk-frames", "4",
        "--warp-impl", "lax", "--platform", "cpu", "--no-mesh",
    ])
    assert rc == 0
    for i, frames in enumerate(clips):
        with video_io.VideoReader(outs[i]) as r:
            assert r.read_batch(64).shape[0] == len(frames)


class _FailingReader:
    """VideoReader lookalike whose decode dies mid-stream."""

    def __init__(self, inner, fail_after):
        self._inner = inner
        self._left = fail_after
        self.shape = inner.shape
        self.height = inner.height
        self.width = inner.width
        self.fps = inner.fps

    def read_batch(self, n):
        if self._left <= 0:
            raise IOError("injected mid-stream decode failure")
        take = min(n, self._left)
        self._left -= take
        out = self._inner.read_batch(take)
        if out.shape[0] == 0:
            raise IOError("injected mid-stream decode failure")
        return out

    def close(self):
        self._inner.close()


class _FailingWriter:
    def __init__(self, inner, fail_after):
        self._inner = inner
        self._left = fail_after

    def write_batch(self, frames):
        if self._left <= 0:
            raise IOError("injected mid-stream encode failure")
        self._left -= frames.shape[0]
        self._inner.write_batch(frames)

    def close(self):
        self._inner.close()


def test_failed_clip_is_isolated(tmp_path, params, rng):
    """SURVEY.md §5.3 / VERDICT.md round-2 item 5: one clip's mid-stream
    decode failure must not contaminate the batch — the other clips
    finish with byte-identical output and the result names the failure
    and its resume point."""
    dirs, clips = _make_clips(tmp_path, rng, [10, 10, 10, 10])
    outs = [str(tmp_path / f"fo{i}") for i in range(4)]
    readers = [video_io.VideoReader(d) for d in dirs]
    readers[1] = _FailingReader(readers[1], fail_after=4)
    writers = [video_io.VideoWriter(o, 40, 32) for o in outs]
    result = stabilize_multi(CFG, params, readers, writers)
    for w_ in writers:
        w_.close()

    assert result.failed_clips == [1]
    assert isinstance(result.errors[1], IOError)
    assert result.frames_written[1] == 4       # resume point
    single = Stabilizer(CFG, params)
    for i in (0, 2, 3):
        assert result.frames_written[i] == 10
        with video_io.VideoReader(outs[i]) as r:
            got = r.read_batch(64)
        np.testing.assert_array_equal(got, single.stabilize_clip(clips[i]))


def test_failed_encoder_is_isolated(tmp_path, params, rng):
    dirs, clips = _make_clips(tmp_path, rng, [8, 8])
    outs = [str(tmp_path / f"eo{i}") for i in range(2)]
    readers = [video_io.VideoReader(d) for d in dirs]
    writers = [video_io.VideoWriter(o, 40, 32) for o in outs]
    writers[0] = _FailingWriter(writers[0], fail_after=4)
    result = stabilize_multi(CFG, params, readers, writers)
    for w_ in writers:
        w_.close()
    assert result.failed_clips == [0]
    assert result.frames_written[1] == 8
    # The failed clip's count must equal frames ACTUALLY on disk (the
    # resume point), not frames enqueued to the dead encoder: the main
    # loop can be chunks ahead of the writer when it dies.
    with video_io.VideoReader(outs[0]) as r:
        on_disk = r.read_batch(64).shape[0]
    assert result.frames_written[0] == on_disk == 4
    single = Stabilizer(CFG, params)
    with video_io.VideoReader(outs[1]) as r:
        got = r.read_batch(64)
    np.testing.assert_array_equal(got, single.stabilize_clip(clips[1]))


class _CountingReader:
    """VideoReader lookalike counting read_batch calls."""

    def __init__(self, inner):
        self._inner = inner
        self.calls = 0
        self.shape = inner.shape
        self.height = inner.height
        self.width = inner.width
        self.fps = inner.fps

    def read_batch(self, n):
        self.calls += 1
        return self._inner.read_batch(n)

    def close(self):
        self._inner.close()


def test_failed_encoder_stops_decode_early(tmp_path, params, rng):
    """A clip abandoned by its encoder's failure must stop DECODING too:
    the worker's per-clip stop event ends it at the next read_batch
    boundary instead of decoding the rest of the clip into the drain
    (an hour-long clip would otherwise burn a core and delay the whole
    batch's return by its full decode time)."""
    dirs, _ = _make_clips(tmp_path, rng, [200, 12])
    outs = [str(tmp_path / f"so{i}") for i in range(2)]
    readers = [_CountingReader(video_io.VideoReader(d)) for d in dirs]
    writers = [video_io.VideoWriter(o, 40, 32) for o in outs]
    writers[0] = _FailingWriter(writers[0], fail_after=4)
    result = stabilize_multi(CFG, params, readers, writers)
    for w_ in writers:
        w_.close()
    assert result.failed_clips == [0]
    assert result.frames_written[1] == 12
    # 200 frames = 50 chunk-4 batches; the abandoned clip must stop far
    # short of EOF (bound: chunks consumed before the failure is seen
    # + queue_depth in flight + one read racing the stop event).
    assert readers[0].calls < 25, readers[0].calls


def test_cli_batch_closes_writers_on_device_failure(tmp_path, params, rng,
                                                    monkeypatch):
    """stabilize-batch must close (finalize) every writer even when
    stabilize_multi raises — partial outputs are the advertised resume
    point, and an unclosed container is unreadable."""
    dirs, _ = _make_clips(tmp_path, rng, [6, 6])
    closed = []
    real_writer = video_io.VideoWriter

    class SpyWriter(real_writer):
        def close(self):
            closed.append(self)
            super().close()

    monkeypatch.setattr(video_io, "VideoWriter", SpyWriter)

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    monkeypatch.setattr("dvsg_tpu.pipeline.multiclip.stabilize_multi",
                        boom)
    outs = [str(tmp_path / f"wo{i}") for i in range(2)]
    with pytest.raises(RuntimeError, match="injected device failure"):
        cli.stabilize_batch_main([
            "--inputs", *dirs, "--outputs", *outs,
            "--window", "3", "--model-size", "32", "32",
            "--grid-size", "8", "8", "--chunk-frames", "4",
            "--warp-impl", "lax", "--platform", "cpu", "--no-mesh",
        ])
    assert len(closed) == 2


def test_all_clips_failing_raises(tmp_path, params, rng):
    dirs, _ = _make_clips(tmp_path, rng, [8])
    readers = [_FailingReader(video_io.VideoReader(dirs[0]), 0)]
    writers = [video_io.VideoWriter(str(tmp_path / "ao"), 40, 32)]
    with pytest.raises(IOError):
        stabilize_multi(CFG, params, readers, writers)


def test_device_failure_cleans_up_workers(tmp_path, params, rng,
                                          monkeypatch):
    """A device-step exception must stop and join every worker thread
    BEFORE escaping: the caller's writer.close() must not race in-flight
    write_batch calls (review finding)."""
    import threading as _threading

    from dvsg_tpu.pipeline import multiclip as mc

    dirs, _ = _make_clips(tmp_path, rng, [12, 12])
    outs = [str(tmp_path / f"dfo{i}") for i in range(2)]
    readers = [video_io.VideoReader(d) for d in dirs]
    writers = [video_io.VideoWriter(o, 40, 32) for o in outs]
    calls = {"n": 0}
    real_put = mc.put_frames

    def failing_put(x):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected device failure")
        return real_put(x)

    monkeypatch.setattr(mc, "put_frames", failing_put)
    before = set(_threading.enumerate())
    with pytest.raises(RuntimeError, match="injected device failure"):
        stabilize_multi(CFG, params, readers, writers)
    leftover = [t for t in _threading.enumerate()
                if t not in before and t.is_alive()]
    assert not leftover, f"driver leaked worker threads: {leftover}"
    for w_ in writers:
        w_.close()          # safe: no in-flight writes remain
    for r_ in readers:
        r_.close()


def test_mesh_indivisible_clip_count_rejected(tmp_path, params, rng):
    """The sharded path must reject n % devices != 0 up front with a
    clear error, before any worker thread starts (review finding)."""
    dirs, _ = _make_clips(tmp_path, rng, [4, 4, 4])
    readers = [video_io.VideoReader(d) for d in dirs]
    writers = [video_io.VideoWriter(str(tmp_path / f"mi{i}"), 40, 32)
               for i in range(3)]
    with pytest.raises(ValueError, match="divisible"):
        stabilize_multi(CFG, params, readers, writers,
                        mesh=mesh_lib.make_mesh())
    for r_ in readers:
        r_.close()
