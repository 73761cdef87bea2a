"""Training loop and checkpoint tests (SURVEY.md §3.2, §5.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvsg_tpu.config import ModelConfig, TrainConfig
from dvsg_tpu.train import loop
from dvsg_tpu.utils import checkpoint as ckpt

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1, max_offset=0.15)
TCFG = TrainConfig(model=MCFG, batch_size=4, steps=60, warmup_steps=5,
                   learning_rate=1e-3, checkpoint_every=0)


def test_loss_decreases_overfit_one_batch():
    """Gradient/supervision machinery check: the net must overfit a fixed
    batch fast (generalization across fresh batches is a real-training
    concern, exercised by scripts/train_flagship.py, not unit tests)."""
    state = loop.init_state(TCFG, jax.random.key(0))
    fixed_key = jax.random.key(7)
    first = None
    for _ in range(60):
        state, aux = loop.train_step(state, fixed_key, TCFG)
        if first is None:
            first = float(aux["offset"])
    last = float(aux["offset"])
    assert last < first * 0.3, (first, last)


def test_train_step_updates_params():
    state = loop.init_state(TCFG, jax.random.key(1))
    before = jax.device_get(state.params)
    state2 = state
    for i in range(3):  # warmup lr starts at 0, so step once is a no-op
        state2, aux = loop.train_step(state2, jax.random.key(2 + i), TCFG)
    assert int(state2.step) == 3
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, jax.device_get(state2.params))
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    assert np.isfinite(float(aux["total"]))


def test_checkpoint_roundtrip(tmp_path):
    state = loop.init_state(TCFG, jax.random.key(3))
    params = jax.device_get(state.params)
    ckpt.save_checkpoint(str(tmp_path / "c"), params, MCFG, step=7)
    restored, cfg2, step = ckpt.load_checkpoint(str(tmp_path / "c"))
    assert cfg2 == MCFG and step == 7
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_checkpoint_latest_step(tmp_path):
    state = loop.init_state(TCFG, jax.random.key(4))
    params = jax.device_get(state.params)
    ckpt.save_checkpoint(str(tmp_path / "c"), params, MCFG, step=1)
    ckpt.save_checkpoint(str(tmp_path / "c"), params, MCFG, step=5)
    assert ckpt.latest_step(str(tmp_path / "c")) == 5


def test_full_train_state_resume_keeps_optimizer(tmp_path):
    """--resume must restore Adam moments + schedule position, not rebuild
    them (ADVICE r1): a resumed state is bit-identical to the uninterrupted
    one."""
    cfg = TrainConfig(model=MCFG, batch_size=4, steps=6, warmup_steps=2,
                      learning_rate=1e-3, checkpoint_every=3)
    d = str(tmp_path / "c")
    # Uninterrupted run.
    full = loop.train(cfg, checkpoint_dir=d, log_every=0)
    # load_train_state picks the latest full-state checkpoint by default.
    latest = loop.load_train_state(cfg, d)
    assert int(latest.step) == 6
    # Resume from the intermediate step-3 checkpoint and finish the run.
    state3, _ = ckpt.load_train_state(
        d, jax.eval_shape(lambda: loop.init_state(
            cfg, jax.random.key(0)))._asdict(), step=3)
    resumed = loop.TrainState(**state3)
    assert int(resumed.step) == 3
    # opt_state must carry nonzero Adam moments (not re-initialized).
    mu_leaves = jax.tree_util.tree_leaves(resumed.opt_state)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in mu_leaves
               if hasattr(l, "shape") and np.ndim(l) > 0)
    out = loop.train(cfg, checkpoint_dir=None, state=resumed, log_every=0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0),
        jax.device_get(full.params), jax.device_get(out.params))


