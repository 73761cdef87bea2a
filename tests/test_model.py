"""Motion-estimation CNN shape/semantics tests (SURVEY.md §3.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvsg_tpu.config import ModelConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.ops import grid as grid_ops


CFG = ModelConfig(model_size=(64, 64), grid_size=(8, 8), base_features=8,
                  blocks_per_level=1)


@pytest.fixture(scope="module")
def params():
    return motion_cnn.init_params(CFG, jax.random.key(0))


def _window(rng, b=2):
    mh, mw = CFG.model_size
    return jnp.asarray(
        rng.random((b, mh, mw, CFG.window * CFG.channels),
                   dtype=np.float32) - 0.5)


def test_offsets_shape_and_bound(params, rng):
    off = motion_cnn.predict_offsets(CFG, params, _window(rng))
    assert off.shape == (2, 8, 8, 2)
    assert np.all(np.abs(np.asarray(off)) <= CFG.max_offset + 1e-6)


def test_zero_init_head_gives_identity_grid(params, rng):
    """Freshly initialized model predicts zero offsets → identity warp."""
    off = motion_cnn.predict_offsets(CFG, params, _window(rng))
    np.testing.assert_allclose(np.asarray(off), 0.0, atol=1e-6)
    g = motion_cnn.predict_grid(CFG, params, _window(rng), 48, 56)
    ident = np.asarray(grid_ops.identity_grid(48, 56))
    np.testing.assert_allclose(np.asarray(g[0]), ident, atol=1e-6)


def test_grid_upsample_resolution_independent(params, rng):
    """Dense grids at two resolutions come from the same coarse offsets."""
    w = _window(rng, b=1)
    g_small = motion_cnn.predict_grid(CFG, params, w, 32, 32)
    g_big = motion_cnn.predict_grid(CFG, params, w, 128, 128)
    assert g_small.shape == (1, 32, 32, 2)
    assert g_big.shape == (1, 128, 128, 2)


def test_differentiable(params, rng):
    w = _window(rng, b=1)

    def loss(p):
        off = motion_cnn.predict_offsets(CFG, p, w)
        return jnp.sum(off ** 2)

    g = jax.grad(loss)(params)
    # zero-init head → zero offsets → zero grad through tanh*off^2 is fine;
    # instead check grads flow for a non-trivial loss on pre-head features.
    def loss2(p):
        g_ = motion_cnn.predict_grid(CFG, p, w, 16, 16)
        return jnp.sum(jnp.sin(g_ * 3.0))

    g2 = jax.grad(loss2)(params)
    leaves = jax.tree_util.tree_leaves(g2)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_bf16_config_runs(rng):
    cfg = ModelConfig(model_size=(64, 64), grid_size=(8, 8), base_features=8,
                      blocks_per_level=1, dtype="bfloat16")
    params = motion_cnn.init_params(cfg, jax.random.key(1))
    off = motion_cnn.predict_offsets(cfg, params, _window(rng, b=1))
    assert off.dtype == jnp.float32  # head stays f32 (SURVEY.md §7 bf16 rule)
    assert np.all(np.isfinite(np.asarray(off)))


def test_upsample_offsets_constant_preserved():
    off = jnp.full((4, 4, 2), 0.03, jnp.float32)
    up = grid_ops.upsample_offsets(off, 64, 64)
    np.testing.assert_allclose(np.asarray(up), 0.03, atol=1e-6)


def test_feature_cached_path_matches_fused(params, rng):
    """encode_frames + offsets_from_feature_windows == predict_offsets."""
    w = _window(rng, b=2)
    fused = motion_cnn.predict_offsets(CFG, params, w)
    mh, mw = CFG.model_size
    frames = w.reshape(2, mh, mw, CFG.window, CFG.channels)
    flat = jnp.transpose(frames, (0, 3, 1, 2, 4)).reshape(
        2 * CFG.window, mh, mw, CFG.channels)
    feats = motion_cnn.encode_frames(CFG, params, flat)
    fwins = feats.reshape((2, CFG.window) + feats.shape[1:])
    cached = motion_cnn.offsets_from_feature_windows(CFG, params, fwins)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(cached),
                               atol=1e-6)


def test_stacked_legacy_arch_still_works(rng):
    cfg = ModelConfig(window=3, model_size=(64, 64), grid_size=(8, 8),
                      base_features=8, blocks_per_level=1, arch="stacked")
    params = motion_cnn.init_params(cfg, jax.random.key(2))
    win = jnp.asarray(rng.random((1, 64, 64, 9), dtype=np.float32) - 0.5)
    off = motion_cnn.predict_offsets(cfg, params, win)
    assert off.shape == (1, 8, 8, 2)
    # feature caching must refuse the stacked arch explicitly
    import pytest
    with pytest.raises(ValueError):
        motion_cnn.encode_frames(cfg, params, jnp.zeros((1, 64, 64, 3)))


def test_stacked_arch_pipeline(rng):
    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.pipeline.stabilize import Stabilizer
    cfg = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                      base_features=8, blocks_per_level=1, arch="stacked")
    params = motion_cnn.init_params(cfg, jax.random.key(3))
    frames = (rng.random((5, 32, 32, 3)) * 255).astype(np.uint8)
    out = Stabilizer(StabilizeConfig(model=cfg, chunk_frames=4,
                                     warp_impl="lax"),
                     params).stabilize_clip(frames)
    assert out.shape == frames.shape
