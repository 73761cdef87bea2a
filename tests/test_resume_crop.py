"""Streaming resume (SURVEY.md §5.3) and border-crop tests."""

import numpy as np
import jax
import pytest

from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.pipeline.stabilize import Stabilizer
from dvsg_tpu.utils import video_io

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)
CFG = StabilizeConfig(model=MCFG, chunk_frames=4, warp_impl="lax")


@pytest.fixture(scope="module")
def params():
    return motion_cnn.init_params(MCFG, jax.random.key(0))


@pytest.fixture()
def frame_dir(tmp_path, rng):
    frames = (rng.random((11, 32, 48, 3)) * 255).astype(np.uint8)
    d = str(tmp_path / "in")
    with video_io.VideoWriter(d, 48, 32) as w:
        w.write_batch(frames)
    return d, frames


class TestResume:
    def test_interrupted_stream_resumes_identically(self, tmp_path, params,
                                                    frame_dir):
        src, frames = frame_dir
        stab = Stabilizer(CFG, params)

        # Full uninterrupted run = ground truth.
        full_out = str(tmp_path / "full")
        with video_io.VideoReader(src) as r, \
                video_io.VideoWriter(full_out, 48, 32) as w:
            stab.stabilize_stream(r, w)

        # Interrupted run: process only 2 chunks (8 frames), then "crash".
        part_out = str(tmp_path / "part")
        resume = str(tmp_path / "resume")

        class TruncatedReader(video_io.VideoReader):
            def read_batch(self, n, out=None):
                if self._pos >= 8:
                    return np.zeros((0, self.height, self.width, 3),
                                    np.uint8)
                return super().read_batch(n, out)

        with TruncatedReader(src) as r, \
                video_io.VideoWriter(part_out, 48, 32) as w:
            n1 = stab.stabilize_stream(r, w, resume_dir=resume)
        assert n1 == 8

        # Restart: must resume at chunk 3 and complete.
        with video_io.VideoReader(src) as r, \
                video_io.VideoWriter(part_out, 48, 32) as w:
            n2 = stab.stabilize_stream(r, w, resume_dir=resume)
        assert n2 == 11

        with video_io.VideoReader(full_out) as r:
            want = r.read_batch(32)
        with video_io.VideoReader(part_out) as r:
            got = r.read_batch(32)
        np.testing.assert_array_equal(got, want)

    def test_resume_into_container_rejected(self, tmp_path):
        w = video_io.VideoWriter(str(tmp_path / "o.mp4"), 48, 32)
        assert not w.appendable
        with pytest.raises(ValueError):
            w.seek(4)
        w.close()

    def test_reader_skip(self, frame_dir):
        src, frames = frame_dir
        with video_io.VideoReader(src) as r:
            assert r.skip(4) == 4
            nxt = r.read()
        np.testing.assert_array_equal(nxt, frames[4])


class TestBorderCrop:
    def test_crop_zooms_center(self, params):
        # Smooth gradient image so sub-pixel zoom effects are measurable.
        gy = np.linspace(0, 255, 32, dtype=np.float32)[:, None]
        gx = np.linspace(0, 255, 48, dtype=np.float32)[None, :]
        img = np.stack([gy + 0 * gx, 0 * gy + gx, (gy + gx) / 2],
                       axis=-1).astype(np.uint8)
        frames = np.repeat(img[None], 4, axis=0)
        plain = Stabilizer(CFG, params).stabilize_clip(frames)
        cropped = Stabilizer(CFG.replace(border_crop=0.1),
                             params).stabilize_clip(frames)
        assert cropped.shape == plain.shape
        # Center stays put under a center zoom...
        assert abs(int(cropped[0, 16, 24, 1]) - int(plain[0, 16, 24, 1])) <= 3
        # ...edges move toward the center: the first column now samples
        # 10% inside, so its green (x-gradient) value rises.
        assert int(cropped[0, 16, 0, 1]) > int(plain[0, 16, 0, 1]) + 10
