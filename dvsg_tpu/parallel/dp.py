"""Data-parallel execution: per-clip sharded stabilization and DP training.

BASELINE.json config 5: "1080p long-video streaming stabilization sharded
across v5e-8 with per-clip data parallelism". Steady-state inference needs
ZERO inter-chip collectives (clips are independent); training gradients are
psum'd automatically by GSPMD because params are replicated while the batch
is sharded (SURVEY.md §2.3, §5.8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dvsg_tpu.config import StabilizeConfig, TrainConfig
from dvsg_tpu.parallel.mesh import DATA_AXIS
from dvsg_tpu.pipeline.stabilize import stabilize_chunk_impl
from dvsg_tpu.train import loop as train_loop


# ---------------------------------------------------------------------------
# Sharded batched stabilization (a batch of clips, one shard per device)
# ---------------------------------------------------------------------------

def _stabilize_chunk_batch(cfg: StabilizeConfig, params, frames_u8, halos):
    """vmap of the single-clip chunk step over a leading clip axis.

    frames_u8: (B, T, H, W, C) uint8; halos: (B, window-1, mh, mw, C) f32.
    """
    out, new_halos, offs = jax.vmap(
        lambda f, h: stabilize_chunk_impl(cfg, params, f, h)
    )(frames_u8, halos)
    return out, new_halos, offs


def _stabilize_chunk_batch_smooth(cfg: StabilizeConfig, params, frames_u8,
                                  halos, states):
    """Path-smoothed batched chunk step: per-clip (B, 4) EMA states ride
    the same vmap (each clip's camera path is independent)."""
    from dvsg_tpu.pipeline.stabilize import stabilize_chunk_smooth_impl
    out, new_halos, new_states, offs = jax.vmap(
        lambda f, h, s: stabilize_chunk_smooth_impl(cfg, params, f, h, s)
    )(frames_u8, halos, states)
    return out, new_halos, new_states, offs


def _stabilize_chunk_batch_lag(cfg: StabilizeConfig, params, frames_u8,
                               halos, carries):
    """Fixed-lag batched chunk step: the per-clip carries (D raw frames,
    D offset grids, measurement window) ride the vmap; emission is
    shifted by D like the single-clip lag program."""
    from dvsg_tpu.pipeline.stabilize import stabilize_chunk_lag_impl
    out, new_halos, cf, co, cd, cc, offs = jax.vmap(
        lambda f, h, a, b_, c, d: stabilize_chunk_lag_impl(
            cfg, params, f, h, a, b_, c, d)
    )(frames_u8, halos, *carries)
    return out, new_halos, (cf, co, cd, cc), offs


def make_sharded_chunk_fn(cfg: StabilizeConfig, mesh: Mesh):
    """jit the batched chunk step with clips sharded over the data axis.

    With cfg.path_smooth > 0 the returned fn takes and returns a fourth
    (B, 4) per-clip smoothing-state array, sharded like the clips (use
    ``pathsmooth.thread_batch_state`` to adapt it to the 3-arg drive
    loop contract). With cfg.path_smooth_lag > 0 it is instead the
    4-arg lag step fn(params, frames, halos, carries) for
    ``drive_chunked_batch_lag`` (carries = init_lag_carries 4-tuple,
    each clip-sharded)."""
    clip_sharded_u8 = NamedSharding(mesh, P(DATA_AXIS))
    clip_sharded_f = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    if cfg.path_smooth_lag > 0:
        shard4 = (clip_sharded_f,) * 4
        return jax.jit(
            functools.partial(_stabilize_chunk_batch_lag, cfg),
            in_shardings=(repl, clip_sharded_u8, clip_sharded_f, shard4),
            out_shardings=(clip_sharded_u8, clip_sharded_f, shard4,
                           clip_sharded_f),
        )
    if cfg.path_smooth > 0:
        return jax.jit(
            functools.partial(_stabilize_chunk_batch_smooth, cfg),
            in_shardings=(repl, clip_sharded_u8, clip_sharded_f,
                          clip_sharded_f),
            out_shardings=(clip_sharded_u8, clip_sharded_f,
                           clip_sharded_f, clip_sharded_f),
        )
    return jax.jit(
        functools.partial(_stabilize_chunk_batch, cfg),
        in_shardings=(repl, clip_sharded_u8, clip_sharded_f),
        out_shardings=(clip_sharded_u8, clip_sharded_f, clip_sharded_f),
    )


class ShardedClipStabilizer:
    """Stabilize a batch of equal-length clips, one mesh shard per clip
    group. Host-side chunking mirrors pipeline.Stabilizer but over a
    leading clip axis (BASELINE.json config 4/5 workload shape)."""

    def __init__(self, cfg: StabilizeConfig, params, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        self.params = params
        self._fn = make_sharded_chunk_fn(cfg, mesh)

    def stabilize_clips(self, clips_u8: np.ndarray) -> np.ndarray:
        """clips_u8 (B, T_total, H, W, C) uint8 → same-shape stabilized."""
        from dvsg_tpu.pipeline.stabilize import (drive_chunked_batch,
                                                 drive_chunked_batch_lag)
        b = clips_u8.shape[0]
        if b % self.mesh.devices.size:
            raise ValueError(
                f"clip batch {b} must divide evenly over "
                f"{self.mesh.devices.size} devices")
        if self.cfg.path_smooth_lag > 0:
            return drive_chunked_batch_lag(
                self._fn, self.params, self.cfg, clips_u8,
                carry_sharding=NamedSharding(self.mesh, P(DATA_AXIS)))
        fn = self._fn
        if self.cfg.path_smooth > 0:
            from dvsg_tpu.pipeline import pathsmooth
            fn = pathsmooth.thread_batch_state(
                fn, b, sharding=NamedSharding(self.mesh, P(DATA_AXIS)))
        return drive_chunked_batch(fn, self.params, self.cfg, clips_u8)


# ---------------------------------------------------------------------------
# Data-parallel training step
# ---------------------------------------------------------------------------

def make_dp_train_step(cfg: TrainConfig, mesh: Mesh, bank=None):
    """DP train step: params/opt-state replicated, per-sample key batch
    sharded on ``data``. GSPMD inserts the gradient all-reduce.

    ``bank`` (optional, train/data.py) is a real-footage image bank; it is
    replicated — every device gathers its own random rows, so adding it
    costs zero collectives.

    Returns (step_fn, shard_keys) where step_fn(state, keys) → (state, aux)
    and shard_keys places a (B,) key batch onto the mesh.
    """
    if cfg.batch_size % mesh.devices.size:
        raise ValueError(
            f"batch_size {cfg.batch_size} must divide over "
            f"{mesh.devices.size} devices")
    repl = NamedSharding(mesh, P())
    keys_sharded = NamedSharding(mesh, P(DATA_AXIS))
    if bank is not None:
        bank = jax.device_put(jnp.asarray(bank, jnp.float32), repl)

    def _step(state, keys):
        (_, aux), grads = jax.value_and_grad(
            train_loop.loss_fn, has_aux=True)(state.params, keys, cfg, bank)
        opt = train_loop.make_optimizer(cfg)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        # optax.apply_updates, same as the single-device train_step: it
        # casts updates to each param's dtype before adding, where a raw
        # p + u would silently promote under JAX type rules.
        import optax
        params = optax.apply_updates(state.params, updates)
        return train_loop.TrainState(params, opt_state, state.step + 1), aux

    step_fn = jax.jit(
        _step,
        in_shardings=(repl, keys_sharded),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    def shard_keys(key: jax.Array) -> jax.Array:
        return jax.device_put(train_loop.batch_keys(key, cfg), keys_sharded)

    return step_fn, shard_keys


def replicate_state(state: train_loop.TrainState,
                    mesh: Mesh) -> train_loop.TrainState:
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)
