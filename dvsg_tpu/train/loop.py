"""Self-supervised training loop on synthetic-jitter clips.

Loss (SURVEY.md §3.2): masked pixel L2 between the warped unstable frame
and the ground-truth still, temporal smoothness between consecutive frame
grids, and an offset-magnitude regularizer. The bilinear sampler is
differentiable end-to-end (tests pin its grad against torch), so this is
plain jax.grad + optax.

All data is generated on device inside the jitted step — zero host input
pipeline, which is the idiomatic TPU shape for procedural data.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dvsg_tpu.config import TrainConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.ops import grid as grid_ops
from dvsg_tpu.pipeline.stabilize import build_windows
from dvsg_tpu.train import synthetic

# Consecutive windows per sample for the temporal-smoothness term.
_STEPS_PER_CLIP = 2
# Fraction of the border excluded from pixel loss (jitter makes the
# outermost band unrecoverable under border-clamped sampling).
_LOSS_BORDER = 0.125


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    warmup = min(cfg.warmup_steps, max(cfg.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.learning_rate,
        warmup_steps=warmup, decay_steps=max(cfg.steps, warmup + 1),
        end_value=cfg.learning_rate * 0.05)
    return optax.adamw(sched, weight_decay=cfg.weight_decay)


def init_state(cfg: TrainConfig, rng: jax.Array) -> TrainState:
    params = motion_cnn.init_params(cfg.model, rng)
    opt = make_optimizer(cfg)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


def _draw_stills(keys: jax.Array, cfg: TrainConfig, bank):
    """Base images for the batch: procedural noise, or random augmented
    draws from a real-footage bank (train/data.py) when one is given."""
    mh, mw = cfg.model.model_size
    if bank is None:
        return jax.vmap(lambda k: synthetic.random_still(k, mh, mw))(keys)

    bank = jnp.asarray(bank)

    def draw(k):
        ki, kf = jax.random.split(k)
        img = bank[jax.random.randint(ki, (), 0, bank.shape[0])]
        fh, fv = jax.random.bernoulli(kf, shape=(2,))
        img = jnp.where(fh, img[:, ::-1, :], img)
        return jnp.where(fv, img[::-1, :, :], img)

    return jax.vmap(draw)(keys)


def _sample_batch(keys: jax.Array, cfg: TrainConfig, bank=None):
    """Render a batch of short synthetic clips at model resolution.

    Per window (ending at frame t) the learnable target is the warp taking
    frame t to the WINDOW-MEAN camera position (synthetic.stabilizing_theta)
    — the still's absolute position is unobservable from a short window, so
    supervision is window-relative, like a stabilizer's path smoothing.

    All data-gen warps are flattened into ONE batched call routed through
    the fused Pallas kernel on TPU (XLA's gather lowering made data gen
    dominate the train step); everything here is data, so the whole batch
    is stop-gradient'd — gradients never touch the (VJP-less) kernel.

    Returns (input_frames (B,clip_len,mh,mw,C) — flickered, centered at 0,
             lasts (B,S,mh,mw,C), target_frames (B,S,mh,mw,C),
             target_offsets (B,S,gh,gw,2)) with S = _STEPS_PER_CLIP.
    """
    from dvsg_tpu.ops import warp as warp_ops

    mcfg = cfg.model
    mh, mw = mcfg.model_size
    gh, gw = mcfg.grid_size
    n = mcfg.window
    s_steps = _STEPS_PER_CLIP
    clip_len = n + s_steps - 1
    b = keys.shape[0]

    k_img = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
    k_path = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    stills = _draw_stills(k_img, cfg, bank)                      # (B,mh,mw,C)
    paths = jax.vmap(
        lambda k: synthetic.random_camera_path(k, clip_len))(k_path)

    # Window-mean poses and ground-truth stabilizing offsets per step.
    win_paths = jnp.stack([paths[:, s:s + n] for s in range(s_steps)],
                          axis=1)                                # (B,S,n,3)
    mean_params = win_paths.mean(axis=2)                         # (B,S,3)
    t_offs = jax.vmap(jax.vmap(lambda wp: synthetic.theta_to_offsets(
        synthetic.stabilizing_theta(wp), gh, gw)))(win_paths)

    # ONE flattened warp for all jittered frames + all target frames.
    jit_thetas = jax.vmap(jax.vmap(synthetic.jitter_theta))(paths)
    tgt_thetas = jax.vmap(jax.vmap(synthetic.jitter_theta))(mean_params)
    all_thetas = jnp.concatenate(
        [jit_thetas.reshape(-1, 3, 3), tgt_thetas.reshape(-1, 3, 3)])
    all_grids = jax.vmap(
        lambda t: grid_ops.homography_grid(t, mh, mw))(all_thetas)
    src = jnp.concatenate([
        jnp.repeat(stills, clip_len, axis=0),
        jnp.repeat(stills, s_steps, axis=0)])
    warped = warp_ops.warp_batch(
        src, all_grids, "auto",
        max_dx_px=warp_ops.max_dx_px_for(0.25, mw))
    frames = warped[:b * clip_len].reshape(b, clip_len, mh, mw, -1)
    t_frames = warped[b * clip_len:].reshape(b, s_steps, mh, mw, -1)

    # Photometric flicker on the model's INPUT frames only: motion
    # estimation must be exposure-robust; the frame being warped and the
    # targets stay clean (a stabilizer doesn't correct exposure).
    k_flick = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
    gains = 1.0 + 0.03 * jax.vmap(lambda k: jax.random.uniform(
        k, (clip_len,), minval=-1.0, maxval=1.0))(k_flick)
    flicked = frames * gains[..., None, None, None] - 0.5
    lasts = frames[:, n - 1:]

    return jax.lax.stop_gradient((flicked, lasts, t_frames, t_offs))


def batch_keys(key: jax.Array, cfg: TrainConfig) -> jax.Array:
    """Per-sample key batch, shape (B,) — the data-parallel shard axis.

    Sharding this array over the mesh "data" axis makes each device render
    and train on its own slice of the batch (SURVEY.md §2.3 DP row).
    """
    return jax.random.split(key, cfg.batch_size)


def loss_fn(params, keys: jax.Array, cfg: TrainConfig, bank=None):
    mcfg = cfg.model
    mh, mw = mcfg.model_size
    n = mcfg.window
    in_frames, lasts, t_frames, t_offs = _sample_batch(keys, cfg, bank)
    b, s = lasts.shape[:2]
    clip_len = in_frames.shape[1]

    from dvsg_tpu.ops import warp as warp_ops

    if mcfg.arch == "corr":
        # Encode each unique frame once; windows share window-1 frames.
        flat_f = in_frames.reshape((b * clip_len,) + in_frames.shape[2:])
        feats = motion_cnn.encode_frames(mcfg, params, flat_f)
        feats = feats.reshape((b, clip_len) + feats.shape[1:])
        fwins = jnp.stack([feats[:, k:k + n] for k in range(s)], axis=1)
        flat_fw = fwins.reshape((b * s,) + fwins.shape[2:])
        offsets = motion_cnn.offsets_from_feature_windows(mcfg, params,
                                                          flat_fw)
    else:
        wins = jax.vmap(lambda f: build_windows(f, s, n))(in_frames)
        flat_w = wins.reshape((b * s,) + wins.shape[2:])
        offsets = motion_cnn.predict_offsets(mcfg, params, flat_w)
    grids = jax.vmap(lambda o: grid_ops.grid_from_offsets(o, mh, mw))(offsets)
    flat_l = lasts.reshape((b * s,) + lasts.shape[2:])
    # Grid-differentiable fused warp (Pallas on TPU); frames are data, so
    # grid-only gradients are exactly what the loss needs.
    warped = warp_ops.warp_batch_diff(
        flat_l, grids, "auto",
        max_dx_px=warp_ops.max_dx_px_for(mcfg.max_offset, mw))
    warped = warped.reshape((b, s) + warped.shape[1:])

    bh, bw = int(mh * _LOSS_BORDER), int(mw * _LOSS_BORDER)
    diff = warped - t_frames
    interior = diff[:, :, bh:mh - bh, bw:mw - bw, :]
    pixel = jnp.mean(interior ** 2)

    offs = offsets.reshape((b, s) + offsets.shape[1:])
    offset_l2 = jnp.mean((offs - t_offs) ** 2)
    smooth = jnp.mean((offs[:, 1:] - offs[:, :-1]) ** 2)
    reg = jnp.mean(offsets ** 2)

    total = (cfg.pixel_weight * pixel + cfg.offset_weight * offset_l2
             + cfg.smooth_weight * smooth + cfg.reg_weight * reg)
    aux = {"pixel": pixel, "offset": offset_l2, "smooth": smooth,
           "reg": reg, "total": total}
    return total, aux


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def train_step(state: TrainState, key: jax.Array, cfg: TrainConfig,
               bank=None):
    keys = batch_keys(key, cfg)
    (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, keys, cfg, bank)
    opt = make_optimizer(cfg)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), aux


def train(cfg: TrainConfig, checkpoint_dir: Optional[str] = None,
          log_every: int = 50, state: Optional[TrainState] = None,
          print_fn=print, bank=None) -> TrainState:
    rng = jax.random.key(cfg.seed)
    if state is None:
        state = init_state(cfg, rng)
    if bank is not None:
        bank = jnp.asarray(bank, jnp.float32)  # upload once, reuse per step
    t0 = time.perf_counter()
    for step in range(int(state.step), cfg.steps):
        key = jax.random.fold_in(rng, step)
        state, aux = train_step(state, key, cfg, bank)
        if log_every and (step % log_every == 0 or step == cfg.steps - 1):
            aux = jax.device_get(aux)
            print_fn(
                f"step {step:5d}  pixel={aux['pixel']:.5f} "
                f"offset={aux['offset']:.6f} smooth={aux['smooth']:.6f} "
                f"reg={aux['reg']:.6f} ({time.perf_counter() - t0:.1f}s)")
        if checkpoint_dir and cfg.checkpoint_every and (
                (step + 1) % cfg.checkpoint_every == 0
                or step == cfg.steps - 1):
            from dvsg_tpu.utils import checkpoint as ckpt
            host_state = jax.device_get(state)
            ckpt.save_checkpoint(checkpoint_dir, host_state.params,
                                 cfg.model, step=step + 1)
            # Full state too, so --resume restores optimizer moments and
            # schedule position instead of re-warming the LR.
            ckpt.save_train_state(checkpoint_dir, host_state._asdict(),
                                  step=step + 1)
    return state


def load_train_state(cfg: TrainConfig, checkpoint_dir: str) -> TrainState:
    """Restore the full TrainState saved by train(); falls back to a
    params-only checkpoint (fresh optimizer, old behavior) when only the
    legacy format exists."""
    from dvsg_tpu.utils import checkpoint as ckpt

    target = jax.eval_shape(
        lambda: init_state(cfg, jax.random.key(0)))._asdict()
    if ckpt.latest_train_state_step(checkpoint_dir) is not None:
        state, _ = ckpt.load_train_state(checkpoint_dir, target)
        return TrainState(**state)
    params, mcfg, step = ckpt.load_checkpoint(checkpoint_dir)
    if mcfg != cfg.model:
        raise ValueError("checkpoint model config mismatch")
    opt = make_optimizer(cfg)
    return TrainState(params, opt.init(params),
                      jnp.asarray(step, jnp.int32))
