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


class TestShardedPallasKernel:
    """VERDICT.md round-2 item 2: the deployed program must be the tested
    one. Run the PRODUCTION Pallas kernel (interpret mode, same Mosaic
    program structure: scalar-prefetched stripe BlockSpecs, lax.cond
    guard, in-kernel coordinate synthesis) inside the sharded+vmapped
    pjit program on the virtual 8-device mesh and match the lax path."""

    def test_sharded_clips_pallas_matches_lax(self, params, rng):
        clips = (rng.random((8, 4, 32, 40, 3)) * 255).astype(np.uint8)
        m = mesh_lib.make_mesh()
        out_p = dp.ShardedClipStabilizer(
            CFG.replace(warp_impl="pallas_interpret"), params, m
        ).stabilize_clips(clips)
        out_l = dp.ShardedClipStabilizer(CFG, params, m
                                         ).stabilize_clips(clips)
        assert np.abs(out_p.astype(int) - out_l.astype(int)).max() <= 1


class TestTensorParallel:
    """SURVEY.md §2.3 TP row: enabling TP is a mesh-spec change, not a
    rewrite — conv output channels shard over a "model" axis and GSPMD
    emits the collectives; outputs match the unsharded model."""

    def test_conv_channel_sharding_matches_unsharded(self, params, rng):
        m = mesh_lib.make_mesh((4, 2), axis_names=("data", "model"))
        p_shard = mesh_lib.tp_param_sharding(m, params)
        # The spec must actually shard something (conv kernels), and at
        # least one leaf must be replicated (biases).
        specs = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda s: s.spec, p_shard,
                                   is_leaf=lambda x: hasattr(x, "spec")))
        assert any(mesh_lib.MODEL_AXIS in str(s) for s in specs)

        windows = jnp.asarray(
            rng.random((8, 32, 32, 3 * MCFG.window), np.float32) - 0.5)
        ref = motion_cnn.predict_offsets(MCFG, params, windows)

        params_tp = jax.device_put(params, p_shard)
        fn = jax.jit(
            lambda p, w: motion_cnn.predict_offsets(MCFG, p, w),
            in_shardings=(p_shard, mesh_lib.data_sharding(m, ndim=4)),
        )
        out = fn(params_tp, windows)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_tp_sharding_requires_model_axis(self, params):
        m = mesh_lib.make_mesh()        # data-only mesh
        with pytest.raises(ValueError):
            mesh_lib.tp_param_sharding(m, params)


class TestInitDistributed:
    def test_single_process_noop(self):
        # No coordinator → single-process path must be a no-op (the
        # multi-host jax.distributed bring-up itself needs a real cluster;
        # arg plumbing is covered by inspection of the call signature).
        assert mesh_lib.init_distributed() is None

    def test_arg_plumbing(self, monkeypatch):
        seen = {}

        def fake_init(coordinator_address=None, num_processes=None,
                      process_id=None):
            seen.update(coordinator_address=coordinator_address,
                        num_processes=num_processes, process_id=process_id)

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        mesh_lib.init_distributed("10.0.0.1:1234", num_processes=4,
                                  process_id=1)
        assert seen == {"coordinator_address": "10.0.0.1:1234",
                        "num_processes": 4, "process_id": 1}


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
