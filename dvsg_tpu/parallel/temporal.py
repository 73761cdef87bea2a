"""Temporal (sequence-parallel analog) sharding of a SINGLE clip.

SURVEY.md §5.7/§2.3: the model has no attention, so ring-attention/Ulysses
don't apply — the "sequence" axis is TIME. For one long clip, the chunk's
frame axis is sharded over the mesh's ``data`` axis and each device
stabilizes its own temporal shard; the only communication is the
(window-1)-frame model-resolution halo each device sends its right
neighbor, a single ``lax.ppermute`` over ICI per chunk. Everything else
(CNN, grid, warp) is local — the structural equivalent of context-parallel
halo exchange.

Implemented with ``shard_map`` so the collective is explicit; outputs are
bitwise-identical to the single-device pipeline (tested on the virtual
8-device mesh).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dvsg_tpu.config import StabilizeConfig
from dvsg_tpu.ops import resize as resize_ops
from dvsg_tpu.ops import warp as warp_ops
from dvsg_tpu.parallel.mesh import DATA_AXIS
from dvsg_tpu.pipeline.stabilize import predict_chunk_offsets


def _local_chunk(cfg: StabilizeConfig, params, frames_u8, chunk_halo,
                 smooth_state=None):
    """Per-device body under shard_map.

    frames_u8: (T_local, H, W, C) this device's temporal shard.
    chunk_halo: (window-1, mh, mw, C) — the chunk-level carry, used by
      device 0 only; other devices use their left neighbor's tail.
    smooth_state: optional (4,) carried path-smoothing state (the
      chunk-level carry, same value on every device).
    Returns (stabilized_u8 local shard, this device's tail (window-1 model
    frames), stacked so the host can pick the LAST shard's tail as the
    next chunk's halo) — plus the new smoothing state when smoothing is
    on.
    """
    mcfg = cfg.model
    t_local, h, w, _ = frames_u8.shape
    mh, mw = mcfg.model_size
    n = mcfg.window

    # Same fused compute as the single-device chunk (pipeline/stabilize):
    # matrix-form resize+normalize, warp+quantize straight on uint8.
    small = resize_ops.downscale_norm(frames_u8, mh, mw)
    tail = small[t_local - (n - 1):]            # (n-1, mh, mw, C)

    # Halo exchange: every device sends its tail to its RIGHT neighbor
    # (one ICI hop); device 0 substitutes the chunk-level carry.
    n_dev = jax.lax.axis_size(DATA_AXIS)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    prev_tail = jax.lax.ppermute(tail, DATA_AXIS, perm)
    idx = jax.lax.axis_index(DATA_AXIS)
    prev = jnp.where(idx == 0, chunk_halo, prev_tail)

    seq = jnp.concatenate([prev, small], axis=0)
    offsets = predict_chunk_offsets(cfg, params, seq, t_local)

    new_state = None
    if smooth_state is not None:
        # Path smoothing under temporal sharding, EXACTLY (VERDICT
        # round-4 item 7): the EMA is sequential over time, but its
        # inputs — per-pair deltas — are tiny ((T, 4) f32). Each device
        # measures its LOCAL pairs (the expensive FFT part, perfectly
        # parallel), one all_gather over ICI assembles the chunk-global
        # delta sequence, and every device runs the identical gating +
        # scan redundantly (nanoseconds) then slices its own shard's
        # corrections. Device i's local delta entry m is global entry
        # i*T_local + m, so device 0 contributes its full local array
        # and each later device its last T_local entries — a contiguous
        # exact reconstruction of the single-device measurement.
        from dvsg_tpu.pipeline import pathsmooth
        d_loc, c_loc = pathsmooth.measure(cfg, seq)   # (T_l+n-2, 4)
        gd = jax.lax.all_gather(d_loc, DATA_AXIS)     # (n_dev, T_l+n-2, 4)
        gc = jax.lax.all_gather(c_loc, DATA_AXIS)
        parts_d = [gd[0]] + [gd[i, n - 2:] for i in range(1, n_dev)]
        parts_c = [gc[0]] + [gc[i, n - 2:] for i in range(1, n_dev)]
        gdeltas = jnp.concatenate(parts_d, axis=0)    # (T+n-2, 4)
        gconf = jnp.concatenate(parts_c, axis=0)
        e, new_state = pathsmooth.corrections_from_measured(
            cfg, gdeltas, gconf, t_local * n_dev, smooth_state)
        e_loc = jax.lax.dynamic_slice_in_dim(e, idx * t_local, t_local)
        offsets = pathsmooth.apply_corrections(cfg, offsets, e_loc)

    out_u8 = warp_ops.warp_quantize_batch(
        frames_u8, warp_impl=cfg.warp_impl,
        offsets=offsets, border_crop=cfg.border_crop)
    if new_state is not None:
        return out_u8, tail[None], new_state         # leading shard axis
    return out_u8, tail[None]


def make_temporal_chunk_fn(cfg: StabilizeConfig, mesh: Mesh):
    """jit'd chunk step with the FRAME axis sharded over ``data``.

    fn(params, frames (T, H, W, C) u8, halo (window-1, mh, mw, C)) →
    (stabilized (T, H, W, C) u8 sharded on T, tails (n_dev, window-1, ...)
    — take tails[-1] as the next chunk's halo). T % n_dev must be 0.

    With cfg.path_smooth > 0 the fn takes and returns an extra (4,)
    replicated smoothing state (see _local_chunk: per-shard measurement
    + one tiny all_gather + a redundant identical scan — output is
    byte-identical to the single-device smoothed pipeline, pinned by
    tests/test_temporal.py).
    """
    from jax import shard_map

    from dvsg_tpu.pipeline import pathsmooth
    pathsmooth.lag_reject(cfg, "the temporal-sharded surface")
    repl = NamedSharding(mesh, P())
    t_sharded = NamedSharding(mesh, P(DATA_AXIS))
    smooth = cfg.path_smooth > 0

    # check_vma=False: the pallas_call inside the body declares no
    # varying-mesh-axes metadata on its out_shape (the kernel is shared
    # with unsharded callers), which the vma checker would reject.
    body = shard_map(
        functools.partial(_local_chunk, cfg),
        mesh=mesh,
        in_specs=((P(), P(DATA_AXIS), P(), P()) if smooth
                  else (P(), P(DATA_AXIS), P())),
        out_specs=((P(DATA_AXIS), P(DATA_AXIS), P()) if smooth
                   else (P(DATA_AXIS), P(DATA_AXIS))),
        check_vma=False,
    )
    if smooth:
        return jax.jit(body,
                       in_shardings=(repl, t_sharded, repl, repl),
                       out_shardings=(t_sharded, t_sharded, repl))
    return jax.jit(body,
                   in_shardings=(repl, t_sharded, repl),
                   out_shardings=(t_sharded, t_sharded))


class TemporalShardedStabilizer:
    """Long-video single-clip stabilization with the time axis sharded
    across devices (BASELINE.json config 5, one-clip variant)."""

    def __init__(self, cfg: StabilizeConfig, params, mesh: Mesh):
        n_dev = mesh.devices.size
        if cfg.chunk_frames % n_dev:
            raise ValueError(
                f"chunk_frames {cfg.chunk_frames} must divide over "
                f"{n_dev} devices")
        t_local = cfg.chunk_frames // n_dev
        if t_local < cfg.model.window - 1:
            # The halo exchange passes ONE left-neighbor tail of
            # window-1 frames; a shorter local shard cannot supply it
            # (the ppermute would need frames from two neighbors) and
            # fails deep inside shard_map with a broadcast error.
            raise ValueError(
                f"chunk_frames/n_dev = {t_local} local frames is shorter "
                f"than the model's halo (window-1 = "
                f"{cfg.model.window - 1}); raise chunk_frames to at "
                f"least {(cfg.model.window - 1) * n_dev} for "
                f"{n_dev} devices")
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self._fn = make_temporal_chunk_fn(cfg, mesh)

    def stabilize_clip(self, frames_u8: np.ndarray) -> np.ndarray:
        from dvsg_tpu.pipeline.stabilize import drive_chunked_batch
        if frames_u8.shape[0] == 0:
            return frames_u8
        # Ride the shared chunk/pad/dispatch/fetch driver as a batch of
        # one clip (and inherit its one-chunk D2H pipelining); the adapter
        # maps the driver's (B, ...) halo-carry convention onto this
        # surface's (shard-stacked tails → take the LAST shard's tail).
        if self.cfg.path_smooth > 0:
            from dvsg_tpu.pipeline import pathsmooth
            box = [pathsmooth.initial_state()]

            def fn(params, frames_dev, halos):
                out, tails, box[0] = self._fn(params, frames_dev[0],
                                              halos[0], box[0])
                return out[None], tails[-1][None]
        else:
            def fn(params, frames_dev, halos):
                out, tails = self._fn(params, frames_dev[0], halos[0])
                return out[None], tails[-1][None]
        return drive_chunked_batch(fn, self.params, self.cfg,
                                   frames_u8[None])[0]
