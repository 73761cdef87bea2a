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
