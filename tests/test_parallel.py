"""Data-parallel sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4 'Distributed w/o cluster': shard-count-invariant outputs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvsg_tpu.config import ModelConfig, StabilizeConfig, TrainConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.parallel import dp, mesh as mesh_lib
from dvsg_tpu.pipeline.stabilize import Stabilizer
from dvsg_tpu.train import loop

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)
CFG = StabilizeConfig(model=MCFG, chunk_frames=4, warp_impl="lax")


@pytest.fixture(scope="module")
def params():
    return motion_cnn.init_params(MCFG, jax.random.key(0))


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = mesh_lib.make_mesh()
    assert m.devices.shape == (8,) and m.axis_names == ("data",)
    m2 = mesh_lib.make_mesh((4,))
    assert m2.devices.size == 4
    with pytest.raises(ValueError):
        mesh_lib.make_mesh((16,))


class TestShardedClips:
    def test_matches_single_device_stabilizer(self, params, rng):
        clips = (rng.random((8, 6, 32, 40, 3)) * 255).astype(np.uint8)
        m = mesh_lib.make_mesh()
        sharded = dp.ShardedClipStabilizer(CFG, params, m)
        out_sharded = sharded.stabilize_clips(clips)

        single = Stabilizer(CFG, params)
        for i in range(clips.shape[0]):
            np.testing.assert_array_equal(out_sharded[i],
                                          single.stabilize_clip(clips[i]))

    def test_uneven_batch_rejected(self, params, rng):
        clips = (rng.random((3, 6, 32, 32, 3)) * 255).astype(np.uint8)
        m = mesh_lib.make_mesh()
        with pytest.raises(ValueError):
            dp.ShardedClipStabilizer(CFG, params, m).stabilize_clips(clips)


class TestDPTraining:
    def test_dp_step_matches_single_device(self):
        tcfg = TrainConfig(model=MCFG, batch_size=8, steps=20,
                           warmup_steps=2, learning_rate=1e-3)
        m = mesh_lib.make_mesh()
        state_a = loop.init_state(tcfg, jax.random.key(1))
        state_b = dp.replicate_state(loop.init_state(tcfg, jax.random.key(1)),
                                     m)
        key = jax.random.key(42)

        step_fn, shard_keys = dp.make_dp_train_step(tcfg, m)
        state_b2, aux_b = step_fn(state_b, shard_keys(key))
        state_a2, aux_a = loop.train_step(state_a, key, tcfg)

        np.testing.assert_allclose(float(aux_a["total"]),
                                   float(aux_b["total"]), rtol=1e-5)
        a_leaves = jax.tree_util.tree_leaves(jax.device_get(state_a2.params))
        b_leaves = jax.tree_util.tree_leaves(jax.device_get(state_b2.params))
        for la, lb in zip(a_leaves, b_leaves):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-6)

    def test_bad_batch_divisibility(self):
        tcfg = TrainConfig(model=MCFG, batch_size=6)
        with pytest.raises(ValueError):
            dp.make_dp_train_step(tcfg, mesh_lib.make_mesh())
