"""Temporal (single-clip) sharding across the mesh (SURVEY.md §5.7)."""

import numpy as np
import jax
import pytest

from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.parallel import mesh as mesh_lib
from dvsg_tpu.parallel.temporal import TemporalShardedStabilizer
from dvsg_tpu.pipeline.stabilize import Stabilizer

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)
CFG = StabilizeConfig(model=MCFG, chunk_frames=16, warp_impl="lax")


@pytest.fixture(scope="module")
def params():
    return motion_cnn.init_params(MCFG, jax.random.key(0))


def test_matches_single_device(params, rng):
    """Halo exchange over the mesh must be invisible in the output."""
    frames = (rng.random((40, 32, 40, 3)) * 255).astype(np.uint8)
    mesh = mesh_lib.make_mesh()
    sharded = TemporalShardedStabilizer(CFG, params, mesh)
    single = Stabilizer(CFG, params)
    np.testing.assert_array_equal(sharded.stabilize_clip(frames),
                                  single.stabilize_clip(frames))


def test_strength_respected(params, rng):
    """The temporal body shares predict_chunk_offsets with the
    single-device chunk, so config knobs like strength cannot diverge
    (a review found an earlier copy silently ignored it)."""
    frames = (rng.random((16, 32, 40, 3)) * 255).astype(np.uint8)
    mesh = mesh_lib.make_mesh()
    cfg = CFG.replace(strength=0.5)
    sharded = TemporalShardedStabilizer(cfg, params, mesh)
    single = Stabilizer(cfg, params)
    np.testing.assert_array_equal(sharded.stabilize_clip(frames),
                                  single.stabilize_clip(frames))
    # strength=0 is an exact passthrough on every surface.
    passthrough = TemporalShardedStabilizer(
        CFG.replace(strength=0.0), params, mesh)
    np.testing.assert_array_equal(passthrough.stabilize_clip(frames),
                                  frames)


def test_partial_last_chunk(params, rng):
    frames = (rng.random((21, 32, 32, 3)) * 255).astype(np.uint8)
    mesh = mesh_lib.make_mesh()
    sharded = TemporalShardedStabilizer(CFG, params, mesh)
    single = Stabilizer(CFG, params)
    np.testing.assert_array_equal(sharded.stabilize_clip(frames),
                                  single.stabilize_clip(frames))


def test_pallas_kernel_inside_shard_map(params, rng):
    """The production Pallas warp (interpret mode) must compile and run
    under shard_map with the ppermute halo exchange and match the lax
    path (VERDICT.md round-2 item 2)."""
    frames = (rng.random((16, 32, 40, 3)) * 255).astype(np.uint8)
    mesh = mesh_lib.make_mesh()
    out_p = TemporalShardedStabilizer(
        CFG.replace(warp_impl="pallas_interpret"), params, mesh
    ).stabilize_clip(frames)
    out_l = TemporalShardedStabilizer(CFG, params, mesh
                                      ).stabilize_clip(frames)
    assert np.abs(out_p.astype(int) - out_l.astype(int)).max() <= 1


def test_chunk_divisibility_enforced(params):
    mesh = mesh_lib.make_mesh()
    with pytest.raises(ValueError):
        TemporalShardedStabilizer(CFG.replace(chunk_frames=12), params,
                                  mesh)


def test_local_shard_shorter_than_halo_rejected():
    """Default config (chunk_frames=16, window=5) on 8 devices gives
    2 local frames < window-1=4: the single-left-neighbor halo exchange
    cannot supply the history, so the constructor must reject it with a
    clear message instead of a deep shard_map broadcast error."""
    import jax
    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.parallel import mesh as mesh_lib
    from dvsg_tpu.parallel.temporal import TemporalShardedStabilizer

    cfg = StabilizeConfig()        # window=5, chunk_frames=16
    params = motion_cnn.init_params(cfg.model, jax.random.key(0))
    mesh = mesh_lib.make_mesh()
    if mesh.devices.size < 8:
        pytest.skip("needs the 8-device virtual mesh")
    with pytest.raises(ValueError, match="window-1"):
        TemporalShardedStabilizer(cfg, params, mesh)


class TestSmoothedTemporal:
    """Path smoothing under temporal sharding (VERDICT round-4 item 7):
    per-shard measurement + one tiny all_gather + a redundant identical
    scan on every device — output must be byte-identical to the
    single-device smoothed pipeline."""

    def _clip(self, n, key=7):
        from dvsg_tpu.train import synthetic
        return np.asarray(synthetic.synthetic_clip_u8(
            jax.random.key(key), n, 32, 40)[0])

    def test_smoothed_matches_single_device(self, params):
        cfg = CFG.replace(path_smooth=8)
        frames = self._clip(40)
        mesh = mesh_lib.make_mesh()
        sharded = TemporalShardedStabilizer(cfg, params, mesh)
        single = Stabilizer(cfg, params)
        np.testing.assert_array_equal(sharded.stabilize_clip(frames),
                                      single.stabilize_clip(frames))

    def test_smoothed_partial_last_chunk(self, params):
        cfg = CFG.replace(path_smooth=8)
        frames = self._clip(21, key=9)
        mesh = mesh_lib.make_mesh()
        np.testing.assert_array_equal(
            TemporalShardedStabilizer(cfg, params,
                                      mesh).stabilize_clip(frames),
            Stabilizer(cfg, params).stabilize_clip(frames))

    def test_smoothed_with_pallas_interpret(self, params):
        """The production kernel + smoothing + all_gather all inside the
        same shard_map program."""
        cfg = CFG.replace(path_smooth=8, warp_impl="pallas_interpret")
        frames = self._clip(16, key=11)
        mesh = mesh_lib.make_mesh()
        out_p = TemporalShardedStabilizer(cfg, params,
                                          mesh).stabilize_clip(frames)
        out_l = TemporalShardedStabilizer(
            cfg.replace(warp_impl="lax"), params,
            mesh).stabilize_clip(frames)
        assert np.abs(out_p.astype(int) - out_l.astype(int)).max() <= 1
