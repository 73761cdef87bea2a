"""Online push API: must match the batch pipeline exactly."""

import numpy as np
import jax
import pytest

from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.pipeline.online import OnlineStabilizer
from dvsg_tpu.pipeline.stabilize import Stabilizer

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)
CFG = StabilizeConfig(model=MCFG, chunk_frames=4, warp_impl="lax")


@pytest.fixture(scope="module")
def params():
    return motion_cnn.init_params(MCFG, jax.random.key(0))


def test_push_matches_batch(params, rng):
    frames = (rng.random((11, 32, 40, 3)) * 255).astype(np.uint8)
    online = OnlineStabilizer(CFG, params)
    got = []
    for f in frames:
        got.extend(online.push(f))
    got.extend(online.flush())
    want = Stabilizer(CFG, params).stabilize_clip(frames)
    np.testing.assert_array_equal(np.stack(got), want)


def test_chunk_of_one_low_latency(params, rng):
    cfg1 = CFG.replace(chunk_frames=1)
    frames = (rng.random((5, 32, 32, 3)) * 255).astype(np.uint8)
    online = OnlineStabilizer(cfg1, params)
    outs = []
    for f in frames:
        res = online.push(f)
        assert len(res) == 1          # frame-level latency
        outs.extend(res)
    want = Stabilizer(cfg1, params).stabilize_clip(frames)
    np.testing.assert_array_equal(np.stack(outs), want)


def test_reset(params, rng):
    frames = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    online = OnlineStabilizer(CFG, params)
    online.push(frames[0])
    online.reset()
    assert online.flush() == []


SMOOTH_CFG = CFG.replace(path_smooth=8)


def _drive(cfg, params, frames):
    online = OnlineStabilizer(cfg, params)
    got = []
    for f in frames:
        got.extend(online.push(f))
    got.extend(online.flush())
    return np.stack(got), online


class TestSmoothedOnline:
    """Path smoothing on the live surface (VERDICT round-4 item 1): the
    causal EMA's natural home. Output must be byte-identical to the
    offline pipeline for chunk-aligned AND non-aligned push patterns."""

    def _clip(self, n):
        import jax as _jax
        from dvsg_tpu.train import synthetic
        return np.asarray(synthetic.synthetic_clip_u8(
            _jax.random.key(7), n, 32, 40)[0])

    def test_smoothed_matches_offline_aligned(self, params):
        frames = self._clip(8)                      # 2 exact chunks
        got, _ = _drive(SMOOTH_CFG, params, frames)
        want = Stabilizer(SMOOTH_CFG, params).stabilize_clip(frames)
        np.testing.assert_array_equal(got, want)

    def test_smoothed_matches_offline_nonaligned(self, params):
        frames = self._clip(11)                     # flush pads 1 frame
        got, _ = _drive(SMOOTH_CFG, params, frames)
        want = Stabilizer(SMOOTH_CFG, params).stabilize_clip(frames)
        np.testing.assert_array_equal(got, want)

    def test_push_after_flush_raises(self, params):
        frames = self._clip(5)
        online = OnlineStabilizer(SMOOTH_CFG, params)
        for f in frames:
            online.push(f)
        online.flush()                              # padded partial chunk
        with pytest.raises(RuntimeError, match="reset"):
            online.push(frames[0])

    def test_flush_on_chunk_boundary_keeps_stream_open(self, params):
        """An empty-buffer flush pads nothing and must not end the
        stream (live sources may flush opportunistically)."""
        frames = self._clip(8)
        online = OnlineStabilizer(SMOOTH_CFG, params)
        got = []
        for f in frames[:4]:
            got.extend(online.push(f))
        assert online.flush() == []                 # aligned: no-op
        for f in frames[4:]:
            got.extend(online.push(f))
        want = Stabilizer(SMOOTH_CFG, params).stabilize_clip(frames)
        np.testing.assert_array_equal(np.stack(got), want)

    def test_reset_clears_smoothing_state(self, params):
        frames = self._clip(8)
        online = OnlineStabilizer(SMOOTH_CFG, params)
        first = []
        for f in frames:
            first.extend(online.push(f))
        online.reset()
        second = []
        for f in frames:
            second.extend(online.push(f))
        np.testing.assert_array_equal(np.stack(first), np.stack(second))


def test_push_rejects_non_uint8():
    import numpy as _np
    import pytest as _pytest

    from dvsg_tpu.config import ModelConfig, StabilizeConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.pipeline.online import OnlineStabilizer

    mcfg = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                       base_features=8, blocks_per_level=1)
    cfg = StabilizeConfig(model=mcfg, chunk_frames=4, warp_impl="lax")
    stab = OnlineStabilizer(cfg, motion_cnn.init_params(
        mcfg, __import__("jax").random.key(0)))
    with _pytest.raises(TypeError, match="uint8"):
        stab.push(_np.zeros((32, 40, 3), _np.float32))
    with _pytest.raises(ValueError, match="one .H, W, C. frame"):
        stab.push(_np.zeros((2, 32, 40, 3), _np.uint8))
