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
    written = stabilize_multi(CFG, params, readers, writers)
    for w_ in writers:
        w_.close()
    assert written == [10, 6, 4, 8]

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
    written = stabilize_multi(CFG, params, readers, writers, mesh=mesh)
    for w_ in writers:
        w_.close()
    assert written == [6] * 8
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
