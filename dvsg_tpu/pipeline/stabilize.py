"""Streaming stabilization pipeline: the device-side compute core.

Replaces the reference's per-frame Python loop with two synchronous
host↔device hops per frame (SURVEY.md §3.1; reference mount empty — citation
unavailable) by a single jit-compiled program per T-frame chunk:

    uint8 chunk → normalize → resize to model res → temporal window stack
      → CNN offsets → fused offsets-to-warp bilinear resample → uint8 chunk

All intermediate state stays on device. Long videos stream in chunks of T
frames carrying a (window-1)-frame model-resolution halo between chunks —
the temporal analog of context-parallel halo exchange (SURVEY.md §5.7),
giving O(T) HBM use for unbounded video length.

Static shapes everywhere: the last partial chunk is padded to T by
replicating its final frame and trimmed host-side, so XLA compiles exactly
one program per (T, H, W) regardless of video length.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvsg_tpu.config import StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.ops import resize as resize_ops
from dvsg_tpu.ops import warp as warp_ops
from dvsg_tpu.utils import video_io
from dvsg_tpu.utils.metrics import StageTimer


def build_windows(seq: jax.Array, num_out: int, window: int) -> jax.Array:
    """Stack sliding windows: seq (T+N-1, h, w, C) → (T, h, w, N*C).

    Window for output t is seq[t : t+N] (causal over the carried halo).
    Implemented as a static gather so XLA fuses it with the consumers.
    """
    t_idx = jnp.arange(num_out)[:, None]
    n_idx = jnp.arange(window)[None, :]
    win = seq[t_idx + n_idx]                       # (T, N, h, w, C)
    t, n, h, w, c = win.shape
    return jnp.transpose(win, (0, 2, 3, 1, 4)).reshape(t, h, w, n * c)


def normalize_frames(frames_u8: jax.Array) -> jax.Array:
    """uint8 [0,255] → f32 [0,1]; on-device (SURVEY.md §2.2)."""
    return frames_u8.astype(jnp.float32) * (1.0 / 255.0)


def quantize_frames(frames: jax.Array) -> jax.Array:
    """f32 [0,1] → uint8, round-to-nearest; minimizes D2H bytes."""
    return jnp.clip(jnp.round(frames * 255.0), 0, 255).astype(jnp.uint8)


def predict_chunk_offsets(cfg: StabilizeConfig, params, seq: jax.Array,
                          t: int) -> jax.Array:
    """Coarse offsets for ``t`` output frames from the (t+window-1)-frame
    model-resolution sequence.

    The shared predict tail of EVERY chunk surface (the single-device
    chunk below and the temporal-sharded body in parallel/temporal.py) —
    kept in one place so per-config behavior like ``strength`` cannot
    diverge between copies (a review found the temporal copy had).
    """
    mcfg = cfg.model
    if mcfg.arch == "corr":
        # Sliding windows share window-1 frames: encode each unique frame
        # ONCE and assemble feature windows (window-fold encoder saving).
        feats = motion_cnn.encode_frames(mcfg, params, seq)
        t_idx = jnp.arange(t)[:, None]
        n_idx = jnp.arange(mcfg.window)[None, :]
        fwins = feats[t_idx + n_idx]               # (T, N, gh, gw, F)
        offsets = motion_cnn.offsets_from_feature_windows(
            mcfg, params, fwins)
    else:
        windows = build_windows(seq, t, mcfg.window)
        offsets = motion_cnn.predict_offsets(mcfg, params, windows)
    if cfg.strength != 1.0:
        # Partial stabilization: scale the predicted correction. Static
        # config branch — strength is baked into the compiled program, and
        # the guard/stripe bounds downstream see the scaled field.
        offsets = offsets * jnp.float32(cfg.strength)
    return offsets


def _chunk_body(cfg: StabilizeConfig, params, frames_u8: jax.Array,
                halo: jax.Array, smooth_state):
    """Shared body of the plain and path-smoothed chunk steps."""
    mcfg = cfg.model
    t, h, w, _ = frames_u8.shape
    mh, mw = mcfg.model_size

    # Matrix-form resize with normalize folded in (ops/resize.py): the
    # model input comes straight off the uint8 chunk via two MXU matmuls;
    # no full-resolution f32 frame is materialized anywhere in the chunk.
    small = resize_ops.downscale_norm(frames_u8, mh, mw)
    seq = jnp.concatenate([halo, small], axis=0)   # (T+N-1, mh, mw, C)

    offsets = predict_chunk_offsets(cfg, params, seq, t)
    new_state = smooth_state
    if smooth_state is not None:
        # Cross-chunk camera-path smoothing (pipeline/pathsmooth.py):
        # add the measured low-frequency path correction the CNN's short
        # window cannot see. Downstream (warp + coverage guard + the
        # host-side coverage mirror) sees the FINAL offsets.
        from dvsg_tpu.pipeline import pathsmooth
        offsets, new_state = pathsmooth.apply_path_smoothing(
            cfg, seq, offsets, smooth_state)
    # Fused upsample+warp+quantize on the ORIGINAL uint8 frames straight
    # from the coarse offsets: the Pallas path synthesizes sampling
    # coordinates in-kernel, so no dense (T, H, W, 2) grid is ever
    # materialized, and the 1/255 and 255 scales cancel inside the
    # bilinear lerp — the warp payload never round-trips through f32 HBM
    # (ops/warp_wide.py). The lax path builds the dense grid internally.
    out_u8 = warp_ops.warp_quantize_batch(
        frames_u8, warp_impl=cfg.warp_impl,
        offsets=offsets, border_crop=cfg.border_crop)

    new_halo = seq[t:]                              # last window-1 frames
    return out_u8, new_halo, new_state, offsets


def stabilize_chunk_impl(cfg: StabilizeConfig, params, frames_u8: jax.Array,
                         halo: jax.Array) -> Tuple[jax.Array, jax.Array,
                                                   jax.Array]:
    """One device step over a T-frame chunk.

    Args:
      cfg: static pipeline config (hashable dataclass).
      params: CNN parameters.
      frames_u8: (T, H, W, C) uint8 RGB chunk (donated).
      halo: (window-1, hm, wm, C) f32 model-res history, centered at 0
        (donated; returned updated for the next chunk).

    Returns:
      (stabilized_u8 (T, H, W, C), new_halo, offsets (T, gh, gw, 2)).
    """
    out_u8, new_halo, _, offsets = _chunk_body(cfg, params, frames_u8,
                                               halo, None)
    return out_u8, new_halo, offsets


def stabilize_chunk_smooth_impl(cfg: StabilizeConfig, params,
                                frames_u8: jax.Array, halo: jax.Array,
                                smooth_state: jax.Array):
    """Path-smoothed device step (cfg.path_smooth > 0).

    Same contract as ``stabilize_chunk_impl`` plus a carried (4,) f32
    smoothing state (pipeline/pathsmooth.py). Returns
    (stabilized_u8, new_halo, new_smooth_state, offsets) — the offsets
    are the APPLIED (smoothed) ones, so the host-side coverage mirror
    stays exact.
    """
    return _chunk_body(cfg, params, frames_u8, halo, smooth_state)


stabilize_chunk = functools.partial(
    jax.jit, static_argnums=(0,), donate_argnums=(2, 3))(stabilize_chunk_impl)

stabilize_chunk_smooth = functools.partial(
    jax.jit, static_argnums=(0,),
    donate_argnums=(2, 3, 4))(stabilize_chunk_smooth_impl)


def stabilize_chunk_lag_impl(cfg: StabilizeConfig, params,
                             frames_u8: jax.Array, halo: jax.Array,
                             carry_frames: jax.Array,
                             carry_offsets: jax.Array,
                             carry_d: jax.Array, carry_c: jax.Array):
    """Fixed-lag smoothed device step (cfg.path_smooth_lag = D > 0).

    Consumes input frames [kT, (k+1)T) and EMITS output frames
    [kT−D, (k+1)T−D): the last D input frames of every chunk are warped
    one chunk LATER, once their D-frame delta lookahead exists, through
    the zero-phase FIR smoother (pathsmooth.lag_corrections). Carried
    between chunks: the model-res halo (as always), the D delayed raw
    frames, their D CNN offset grids (computed this chunk, applied
    next — ~2 KB), and the trailing measurement window (deltas + conf,
    tiny). Returns (emitted_u8 (T, H, W, C), new_halo, new_carry_frames,
    new_carry_offsets, new_carry_d, new_carry_c, emitted_offsets).

    The driver drops the first D emitted frames of a stream (they
    pre-date frame 0) and feeds replicate-pad chunks after EOF until the
    tail drains — pad transitions measure as exact zero deltas, so
    chunk-size invariance holds exactly as in the causal mode.
    """
    from dvsg_tpu.pipeline import pathsmooth
    mcfg = cfg.model
    d_lag = cfg.path_smooth_lag
    t, h, w, _ = frames_u8.shape
    mh, mw = mcfg.model_size

    small = resize_ops.downscale_norm(frames_u8, mh, mw)
    seq = jnp.concatenate([halo, small], axis=0)
    offsets_cur = predict_chunk_offsets(cfg, params, seq, t)

    deltas_cur, conf_cur = pathsmooth.measure(cfg, seq)
    deltas_ext = jnp.concatenate([carry_d, deltas_cur], axis=0)
    conf_ext = jnp.concatenate([carry_c, conf_cur], axis=0)
    e = pathsmooth.lag_corrections(cfg, deltas_ext, conf_ext, t)

    emit_frames = jnp.concatenate([carry_frames, frames_u8[:t - d_lag]],
                                  axis=0)
    emit_offsets = jnp.concatenate(
        [carry_offsets, offsets_cur[:t - d_lag]], axis=0)
    emit_offsets = pathsmooth.apply_corrections(cfg, emit_offsets, e)
    out_u8 = warp_ops.warp_quantize_batch(
        emit_frames, warp_impl=cfg.warp_impl,
        offsets=emit_offsets, border_crop=cfg.border_crop)

    c_len = carry_d.shape[0]
    return (out_u8, seq[t:], frames_u8[t - d_lag:],
            offsets_cur[t - d_lag:], deltas_ext[t:t + c_len],
            conf_ext[t:t + c_len], emit_offsets)


stabilize_chunk_lag = functools.partial(
    jax.jit, static_argnums=(0,),
    donate_argnums=(2, 3, 4, 5, 6, 7))(stabilize_chunk_lag_impl)


def drive_chunked_batch(fn, params, cfg: StabilizeConfig,
                        clips_u8: np.ndarray,
                        fetch_clips: Optional[int] = None,
                        coverage_out: Optional[list] = None,
                        initial_halos=None,
                        return_halos: bool = False):
    """Drive a vmapped/sharded chunk ``fn`` over an in-memory clip batch.

    The shared chunk/pad/dispatch/fetch loop of the clip-batch surfaces
    (parallel/dp.py, pipeline/batching.py) — kept in ONE place so its
    invariants can't diverge between copies (an earlier review found the
    hand-rolled copies already had). ``fn(params, frames_dev, halos)``
    must return ``(out, new_halos, ...)``.

    One-chunk D2H pipelining: chunk k+1 is dispatched before chunk k is
    fetched, so the device-to-host transfer overlaps the next chunk's
    compute. ``fetch_clips`` limits the fetch to the first k clips
    (pow2-padding dummies must be computed, never transferred).

    ``coverage_out``: pass a list to receive per-clip coverage-fallback
    chunk counts (the host-side guard mirror, see
    Stabilizer._note_coverage) for the first ``fetch_clips`` clips; it
    is extended to k zeros and only counted on the Pallas path. ``fn``
    must then return the chunk offsets as its third output.

    ``initial_halos`` ((B, window-1, mh, mw, C) f32, optional) seeds the
    carried input history instead of the replicate-pad start — the
    mid-stream carry the serving engine threads across a long upload's
    segments; ``return_halos=True`` additionally returns the final
    (B, ...) halos, so the result is ``(out, final_halos)``. Callers
    that seed mid-stream halos must feed chunk-aligned segments: the
    tail-padding frames of a non-aligned segment would advance the halo
    past the true stream position.

    clips_u8 (B, T_total, H, W, C) uint8 → (fetch_clips, T_total, ...).
    """
    b, total = clips_u8.shape[:2]
    k = b if fetch_clips is None else fetch_clips
    t_chunk = cfg.chunk_frames
    check_cov = coverage_out is not None
    if check_cov:
        from dvsg_tpu.ops.warp import resolve_impl
        while len(coverage_out) < k:
            coverage_out.append(0)
        check_cov = resolve_impl(cfg.warp_impl).startswith("pallas")
    h, w = clips_u8.shape[2], clips_u8.shape[3]

    def note_cov(offs_dev):
        from dvsg_tpu.ops import warp_wide
        offs = np.asarray(offs_dev)
        for i in range(k):
            if not warp_wide.offsets_coverage_ok(
                    offs[i], h, w, border_crop=cfg.border_crop):
                coverage_out[i] += 1

    if initial_halos is not None:
        halos = jnp.asarray(initial_halos)
    else:
        # Replicate-pad start (pure input history) — a fresh stream.
        halos = jnp.stack([initial_halo(cfg, clips_u8[i, 0])
                           for i in range(b)])
    outs = []
    pending = None       # (device out, offsets, n_valid): fetch AFTER
    for start in range(0, total, t_chunk):     # the next chunk dispatches
        chunk = clips_u8[:, start:start + t_chunk]
        n_valid = chunk.shape[1]
        if n_valid < t_chunk:
            pad = np.repeat(chunk[:, -1:], t_chunk - n_valid, axis=1)
            chunk = np.concatenate([chunk, pad], axis=1)
        res = fn(params, put_frames(chunk), halos)
        out, halos = res[0], res[1]
        if pending is not None:
            outs.append(fetch_frames(pending[0][:k, :pending[2]]))
            if check_cov:
                note_cov(pending[1])
        pending = (out, res[2] if check_cov else None, n_valid)
    if pending is not None:
        outs.append(fetch_frames(pending[0][:k, :pending[2]]))
        if check_cov:
            note_cov(pending[1])
    result = np.concatenate(outs, axis=1)
    if return_halos:
        return result, halos
    return result


def init_lag_carries(cfg: StabilizeConfig, first_frames: np.ndarray):
    """Fresh per-clip lag-mode carries for a (B, H, W, C) batch of first
    frames: (frames (B, D, H, W, C) u8, offsets (B, D, gh, gw, 2) f32,
    deltas (B, C_len, 4) f32, conf (B, C_len) f32) — the batched analog
    of Stabilizer._init_lag_carry (same replicate-pad semantics)."""
    from dvsg_tpu.pipeline import pathsmooth
    d_lag = cfg.path_smooth_lag
    gh, gw = cfg.model.grid_size
    c_len = pathsmooth.lag_carry_len(cfg)
    b = first_frames.shape[0]
    f = jnp.tile(jnp.asarray(first_frames, jnp.uint8)[:, None],
                 (1, d_lag, 1, 1, 1))
    return (f, jnp.zeros((b, d_lag, gh, gw, 2), jnp.float32),
            jnp.zeros((b, c_len, pathsmooth.STATE_DIM), jnp.float32),
            jnp.full((b, c_len), 1e6, jnp.float32))


def drive_chunked_batch_lag(fn, params, cfg: StabilizeConfig,
                            clips_u8: np.ndarray,
                            fetch_clips: Optional[int] = None,
                            coverage_out: Optional[list] = None,
                            carry_sharding=None):
    """Lag-mode sibling of ``drive_chunked_batch``: emission is shifted
    by D frames, so the loop extends D frames past the input (per-clip
    replicate pad via index clipping) and trims the emitted stream to
    [0, total) — exactly Stabilizer._stabilize_clip_lag, batched.

    ``fn(params, frames (B, T, ...), halos, carries)`` must return
    ``(out, new_halos, new_carries, offsets)`` where carries is the
    4-tuple of init_lag_carries. Keeps the one-chunk-behind fetch.
    Whole-clip batches only (no mid-stream halo/state seeding): the lag
    carries include D raw frames, which segmented callers would have to
    thread — the serving engine instead rejects segment carries with lag
    (pipeline/batching.py).
    """
    b, total = clips_u8.shape[:2]
    k = b if fetch_clips is None else fetch_clips
    t_chunk = cfg.chunk_frames
    d_lag = cfg.path_smooth_lag
    check_cov = coverage_out is not None
    if check_cov:
        from dvsg_tpu.ops.warp import resolve_impl
        while len(coverage_out) < k:
            coverage_out.append(0)
        check_cov = resolve_impl(cfg.warp_impl).startswith("pallas")
    h, w = clips_u8.shape[2], clips_u8.shape[3]

    def note_cov(offs_dev):
        from dvsg_tpu.ops import warp_wide
        offs = np.asarray(offs_dev)
        for i in range(k):
            if not warp_wide.offsets_coverage_ok(
                    offs[i], h, w, border_crop=cfg.border_crop):
                coverage_out[i] += 1

    halos = jnp.stack([initial_halo(cfg, clips_u8[i, 0])
                       for i in range(b)])
    carries = init_lag_carries(cfg, clips_u8[:, 0])
    if carry_sharding is not None:
        halos = jax.device_put(halos, carry_sharding)
        carries = tuple(jax.device_put(c, carry_sharding)
                        for c in carries)
    outs = []
    pending = None           # (device out, offsets, lo, hi)
    base = -d_lag
    for start in range(0, total + d_lag, t_chunk):
        idx = np.clip(np.arange(start, start + t_chunk), 0, total - 1)
        chunk = np.ascontiguousarray(clips_u8[:, idx])
        out, halos, carries, offs = fn(params, put_frames(chunk), halos,
                                       carries)
        if pending is not None:
            outs.append(fetch_frames(pending[0][:k, pending[2]:pending[3]]))
            if check_cov:
                note_cov(pending[1])
        lo = max(0, -base)
        hi = min(t_chunk, total - base)
        pending = (out, offs if check_cov else None, lo, hi)
        base += t_chunk
    if pending is not None:
        outs.append(fetch_frames(pending[0][:k, pending[2]:pending[3]]))
        if check_cov:
            note_cov(pending[1])
    return np.concatenate([o for o in outs if o.shape[1]], axis=1)


def put_frames(host_frames: np.ndarray) -> jax.Array:
    """Host→device upload of (..., H, W, C) uint8 frames.

    Mirror of fetch_frames: uploads through a (..., H, W*C) view to avoid
    the tiny-last-dimension uint8 slow path of some PJRT transports; both
    reshapes are free (contiguous views).
    """
    *lead, h, w, c = host_frames.shape
    dev = jnp.asarray(np.ascontiguousarray(host_frames).reshape(
        *lead, h, w * c))
    return dev.reshape(*lead, h, w, c)


def fetch_frames(dev_frames: jax.Array) -> np.ndarray:
    """Device→host fetch of (..., H, W, C) uint8 frames.

    Fetches through a (..., H, W*C) view: tiny-last-dimension uint8 arrays
    transfer pathologically slowly on some PJRT transports (30x measured on
    the axon tunnel); the reshape is free on device and on host.
    """
    *lead, h, w, c = dev_frames.shape
    flat = dev_frames.reshape(*lead, h, w * c)
    return np.asarray(flat).reshape(*lead, h, w, c)


def initial_halo(cfg: StabilizeConfig, first_frame_u8: np.ndarray) -> jax.Array:
    """Replicate-pad history for the start of a stream (SURVEY.md §4).

    INVARIANT (load-bearing): the carried halo is PURE INPUT HISTORY —
    the downscaled last window-1 raw frames, nothing else. serve.py's
    segmented long-upload path relies on it (prefixing a segment with
    the previous window-1 raw frames reproduces the continuous stream
    exactly; tests/test_serve.py::test_long_upload_streams_in_segments
    pins it). Cross-chunk state beyond input history exists exactly once
    — the path-smoothing EMA (cfg.path_smooth > 0) — and it is carried
    SEPARATELY, never in the halo; the two surfaces that depend on the
    halo-only invariant handle it explicitly: the resume record stores
    the state alongside the halo, and serve's segmented long-upload
    path switches from the stateless prefix-replay (which would
    double-consume the prefix frames' motion deltas) to the batch
    engine's explicit carry API when smoothing is on.
    """
    mcfg = cfg.model
    mh, mw = mcfg.model_size
    f = jnp.asarray(first_frame_u8, jnp.uint8)[None]
    small = resize_ops.downscale_norm(f, mh, mw)
    return jnp.tile(small, (mcfg.window - 1, 1, 1, 1))


class Stabilizer:
    """User-facing stabilization engine: arrays in, arrays out.

    ``stabilize_clip`` handles a full in-memory clip; ``stabilize_stream``
    drives a VideoReader→VideoWriter pair chunk by chunk.
    """

    def __init__(self, cfg: StabilizeConfig, params):
        self.cfg = cfg
        self.params = params
        # Coverage observability (see _note_coverage): how many chunks'
        # offsets exceeded the fused kernel's stripe-coverage band and
        # therefore rode the exact-but-~40x-slower lax oracle via the
        # device guard. Output stays correct either way; surfacing the
        # count turns "mysteriously slow clip" into a diagnosis.
        self.chunks_seen = 0
        self.coverage_fallbacks = 0
        # Path-smoothing EMA state (pipeline/pathsmooth.py), reset at
        # every stream start by begin_stream(). _chunk calls are strictly
        # sequential in every driver (clip loop, sync stream, overlapped
        # stream — the overlap is D2H-fetch-vs-compute, never
        # chunk-vs-chunk dispatch), so instance-held state is safe.
        self._smooth_state = None

    def begin_stream(self, smooth_state=None) -> None:
        """Reset per-stream state. Called by every driver at stream
        start; ``smooth_state`` restores a resumed stream's carried
        path-smoothing state."""
        if self.cfg.path_smooth > 0:
            from dvsg_tpu.pipeline import pathsmooth
            if smooth_state is not None:
                s = jnp.asarray(smooth_state, jnp.float32)
                if s.shape[0] < pathsmooth.STATE_DIM:
                    # Resume record from before rotation (2,) or scale
                    # (3,) landed: missing components start at zero,
                    # exactly a fresh EMA for those axes.
                    pad = pathsmooth.STATE_DIM - s.shape[0]
                    s = jnp.concatenate([s, jnp.zeros((pad,),
                                                      jnp.float32)])
                self._smooth_state = s
            else:
                self._smooth_state = pathsmooth.initial_state()
        else:
            self._smooth_state = None

    def _note_coverage(self, offsets, h: int, w: int, c: int) -> None:
        """Host-side mirror of the device coverage guard, per chunk.

        Pure numpy on the already-computed coarse offsets
        (ops/warp_wide.offsets_coverage_ok) — one small D2H fetch, no
        device dispatch. Only meaningful when the Pallas path is in use;
        the lax path has no coverage contract.
        """
        self.chunks_seen += 1
        from dvsg_tpu.ops.warp import resolve_impl
        if not resolve_impl(self.cfg.warp_impl).startswith("pallas"):
            return
        from dvsg_tpu.ops import warp_wide
        if not warp_wide.offsets_coverage_ok(
                np.asarray(offsets), h, w, c=c,
                border_crop=self.cfg.border_crop):
            self.coverage_fallbacks += 1

    def _chunk(self, dev_chunk, halo):
        """One device step. The single dispatch point for every driver
        (clip, sync stream, overlapped stream): subclasses that swap the
        program — e.g. export.ExportedStabilizer.engine()'s
        artifact-backed engine — override ONLY this."""
        if self.cfg.path_smooth > 0:
            if self._smooth_state is None:      # direct _chunk callers
                self.begin_stream()
            out, halo, self._smooth_state, offs = stabilize_chunk_smooth(
                self.cfg, self.params, dev_chunk, halo, self._smooth_state)
            return out, halo, offs
        return stabilize_chunk(self.cfg, self.params, dev_chunk, halo)

    def _init_lag_carry(self, first_frame_u8):
        """Fresh lag-mode carries: D replicated first frames (their
        emissions are dropped), zero offsets, zero-delta measurement
        window with replicate-pad confidence (huge → 'healthy, no
        motion', matching the causal mode's halo-start semantics)."""
        from dvsg_tpu.pipeline import pathsmooth
        cfg = self.cfg
        d_lag = cfg.path_smooth_lag
        gh, gw = cfg.model.grid_size
        c_len = pathsmooth.lag_carry_len(cfg)
        f = jnp.tile(jnp.asarray(first_frame_u8, jnp.uint8)[None],
                     (d_lag, 1, 1, 1))
        return (f, jnp.zeros((d_lag, gh, gw, 2), jnp.float32),
                jnp.zeros((c_len, pathsmooth.STATE_DIM), jnp.float32),
                jnp.full((c_len,), 1e6, jnp.float32))

    def _stabilize_clip_lag(self, frames_u8: np.ndarray) -> np.ndarray:
        """Clip driver for the fixed-lag mode: emission is shifted by D
        frames, so the loop extends D frames past the input (replicate
        pad) and trims the emitted stream to [0, total)."""
        cfg = self.cfg
        d_lag = cfg.path_smooth_lag
        t_chunk = cfg.chunk_frames
        total = frames_u8.shape[0]
        halo = initial_halo(cfg, frames_u8[0])
        carry = self._init_lag_carry(frames_u8[0])
        outs = []
        emitted = -d_lag        # global index of out[0] for next chunk
        for start in range(0, total + d_lag, t_chunk):
            idx = np.clip(np.arange(start, start + t_chunk), 0, total - 1)
            chunk = np.ascontiguousarray(frames_u8[idx])
            res = stabilize_chunk_lag(cfg, self.params, put_frames(chunk),
                                      halo, *carry)
            out, halo, carry = res[0], res[1], res[2:6]
            lo = max(0, -emitted)
            hi = min(t_chunk, total - emitted)
            if hi > lo:
                outs.append(fetch_frames(out[lo:hi]))
            self._note_coverage(res[6], chunk.shape[1], chunk.shape[2],
                                chunk.shape[3])
            emitted += t_chunk
        return np.concatenate(outs, axis=0)

    def stabilize_clip(self, frames_u8: np.ndarray) -> np.ndarray:
        """frames_u8 (T, H, W, C) uint8 → stabilized (T, H, W, C) uint8."""
        total = frames_u8.shape[0]
        if total == 0:
            return frames_u8
        if self.cfg.path_smooth_lag > 0:
            return self._stabilize_clip_lag(frames_u8)
        self.begin_stream()
        halo = initial_halo(self.cfg, frames_u8[0])
        t_chunk = self.cfg.chunk_frames
        outs = []
        for start in range(0, total, t_chunk):
            chunk = frames_u8[start:start + t_chunk]
            n_valid = chunk.shape[0]
            if n_valid < t_chunk:  # pad to the static chunk shape
                pad = np.repeat(chunk[-1:], t_chunk - n_valid, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            out, halo, offs = self._chunk(put_frames(chunk), halo)
            outs.append(fetch_frames(out[:n_valid]))
            self._note_coverage(offs, chunk.shape[1], chunk.shape[2],
                                chunk.shape[3])
        return np.concatenate(outs, axis=0)

    def _stabilize_stream_lag(self, reader, writer, timer,
                              resume_dir) -> int:
        """Stream driver for the fixed-lag mode (emission shifted by D).

        Invariants: input position pos = emission base + D after every
        chunk; frames flushed so far = max(0, base). Resume records
        store the TINY carries (offset grids + measurement window) plus
        ``lag_real`` = how many of the D carried raw frames are real
        input (< D only when the record was written in the end-of-stream
        drain region); the raw frames themselves are re-read from the
        input on resume instead of writing D full-res frames per flush.
        """
        import os
        cfg = self.cfg
        d_lag = cfg.path_smooth_lag
        t_chunk = cfg.chunk_frames
        written = 0
        halo = None
        carry = None
        last_host = None
        base = -d_lag
        total = None
        if resume_dir:
            os.makedirs(resume_dir, exist_ok=True)
            state_path = os.path.join(resume_dir, "resume_state.npz")
            if os.path.exists(state_path):
                with np.load(state_path) as z:
                    written = int(z["frames_written"])
                    rec = {k: np.array(z[k]) for k in z.files}
                if written > 0:
                    if "lag_offsets" not in rec:
                        raise ValueError(
                            "resume record was written without the lag "
                            "smoother's carries but cfg.path_smooth_lag "
                            "> 0; restart the job (or point --resume-dir "
                            "elsewhere)")
                    lag_real = int(rec["lag_real"])
                    if lag_real == 0:
                        return written          # job already complete
                    skipped = reader.skip(written)
                    if skipped != written:
                        raise ValueError(
                            f"resume record says {written} frames but "
                            f"input only has {skipped} to skip")
                    cf = reader.read_batch(lag_real)
                    if cf.shape[0] != lag_real:
                        raise ValueError(
                            f"resume record expects {lag_real} carry "
                            f"frames after frame {written}; input "
                            f"yielded {cf.shape[0]} — did the input "
                            "change?")
                    if lag_real < d_lag:
                        cf = np.concatenate(
                            [cf, np.repeat(cf[-1:], d_lag - lag_real,
                                           axis=0)], axis=0)
                    writer.seek(written)
                    halo = jnp.asarray(rec["halo"])
                    carry = (put_frames(cf),
                             jnp.asarray(rec["lag_offsets"]),
                             jnp.asarray(rec["lag_d"]),
                             jnp.asarray(rec["lag_c"]))
                    last_host = cf[-1:]
                    base = written
                    if lag_real < d_lag:
                        # The record was written in the drain region:
                        # the stream's true end is already known.
                        total = written + lag_real
        while total is None or base < total:
            n_in = 0
            if total is None:
                with timer.stage("decode"):
                    chunk = reader.read_batch(t_chunk)
                n_in = chunk.shape[0]
            if n_in:
                last_host = chunk[-1:]
                if halo is None:
                    halo = initial_halo(cfg, chunk[0])
                    carry = self._init_lag_carry(chunk[0])
            if n_in < t_chunk:
                if total is None:
                    total = base + d_lag + n_in     # pos + n_in
                if last_host is None:
                    break                           # empty stream
                if base >= total:
                    break
                pad = np.repeat(last_host, t_chunk - n_in, axis=0)
                chunk = (np.concatenate([chunk, pad], axis=0)
                         if n_in else pad)
            with timer.stage("h2d"):
                dev_chunk = put_frames(chunk)
            with timer.stage("compute"):
                res = stabilize_chunk_lag(cfg, self.params, dev_chunk,
                                          halo, *carry)
                out, halo, carry = res[0], res[1], res[2:6]
                out.block_until_ready()
            lo = max(0, -base)
            hi = t_chunk if total is None else min(t_chunk, total - base)
            if hi > lo:
                with timer.stage("d2h"):
                    host_out = fetch_frames(out[lo:hi])
                with timer.stage("encode"):
                    writer.write_batch(host_out)
                written += hi - lo
            self._note_coverage(res[6], chunk.shape[1], chunk.shape[2],
                                chunk.shape[3])
            base += t_chunk
            if resume_dir and written > 0:
                lag_real = (d_lag if total is None
                            else max(0, min(d_lag, total - base)))
                tmp = os.path.join(resume_dir, "resume_state.tmp.npz")
                np.savez(tmp, halo=np.asarray(halo),
                         frames_written=written,
                         lag_offsets=np.asarray(carry[1]),
                         lag_d=np.asarray(carry[2]),
                         lag_c=np.asarray(carry[3]),
                         lag_real=lag_real)
                os.replace(tmp, state_path)
        return written

    def stabilize_stream(self, reader: video_io.VideoReader,
                         writer: video_io.VideoWriter,
                         timer: Optional[StageTimer] = None,
                         resume_dir: Optional[str] = None) -> int:
        """Stream reader → writer; returns number of frames written.

        Synchronous reference loop; the overlapped (double-buffered)
        driver lives in dvsg_tpu/pipeline/overlap.py.

        ``resume_dir``: if given, a resume record (frames written + the
        streaming halo) is flushed at every chunk boundary, and an
        interrupted job restarts from the last flushed chunk
        (SURVEY.md §5.3). Requires a frame-directory output.

        Stage-timer caveat: the "compute" stage ends at
        ``block_until_ready``, which some transports (the axon tunnel)
        release EARLY — residual device time then lands in the following
        "d2h" stage. Per-stage numbers are exact on standard PJRT
        backends; on such transports read compute+d2h as one bucket
        (bench.py times the device program by fetching a dependent value
        for this reason).
        """
        timer = timer or StageTimer()
        if self.cfg.path_smooth_lag > 0:
            return self._stabilize_stream_lag(reader, writer, timer,
                                              resume_dir)
        t_chunk = self.cfg.chunk_frames
        halo = None
        written = 0
        self.begin_stream()
        if resume_dir:
            import os
            os.makedirs(resume_dir, exist_ok=True)
            # ONE atomic artifact (halo + frames_written + smoothing
            # state together): separate files left a crash window where
            # one piece was a chunk newer than the rest — a resumed job
            # would then stabilize its first chunk with the wrong
            # history.
            state_path = os.path.join(resume_dir, "resume_state.npz")
            if os.path.exists(state_path):
                with np.load(state_path) as z:
                    written = int(z["frames_written"])
                    halo_np = np.array(z["halo"])
                    smooth_np = (np.array(z["smooth_state"])
                                 if "smooth_state" in z else None)
                    rec_lag = "lag_offsets" in z
                if written > 0:
                    if rec_lag:
                        # A lag-mode record resumed without the lag
                        # would shift every subsequent frame by D.
                        raise ValueError(
                            "resume record was written by a "
                            "--path-smooth-lag run but "
                            "cfg.path_smooth_lag == 0; resume with the "
                            "original lag setting")
                    if self.cfg.path_smooth > 0 and smooth_np is None:
                        # A record from a run without smoothing cannot
                        # seed the EMA; resuming would silently jump the
                        # camera path at the resume point.
                        raise ValueError(
                            "resume record was written without path "
                            "smoothing but cfg.path_smooth > 0; restart "
                            "the job (or point --resume-dir elsewhere)")
                    if self.cfg.path_smooth == 0 and smooth_np is not None:
                        # Mirror check: dropping a record's smoothing
                        # state would switch the output from smoothed to
                        # unsmoothed mid-stream without a word.
                        raise ValueError(
                            "resume record carries a path-smoothing "
                            "state but cfg.path_smooth == 0; resume with "
                            "the original --path-smooth setting (or "
                            "restart the job elsewhere)")
                    skipped = reader.skip(written)
                    if skipped != written:
                        raise ValueError(
                            f"resume record says {written} frames but "
                            f"input only has {skipped} to skip")
                    writer.seek(written)
                    halo = jnp.asarray(halo_np)
                    if smooth_np is not None:
                        self.begin_stream(smooth_state=smooth_np)
        while True:
            with timer.stage("decode"):
                chunk = reader.read_batch(t_chunk)
            n_valid = chunk.shape[0]
            if n_valid == 0:
                break
            if halo is None:
                halo = initial_halo(self.cfg, chunk[0])
            if n_valid < t_chunk:
                pad = np.repeat(chunk[-1:], t_chunk - n_valid, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            with timer.stage("h2d"):
                dev_chunk = put_frames(chunk)
            with timer.stage("compute"):
                out, halo, offs = self._chunk(dev_chunk, halo)
                out.block_until_ready()
            with timer.stage("d2h"):
                host_out = fetch_frames(out[:n_valid])
            with timer.stage("encode"):
                writer.write_batch(host_out)
            self._note_coverage(offs, chunk.shape[1], chunk.shape[2],
                                chunk.shape[3])
            written += n_valid
            if resume_dir:
                tmp = os.path.join(resume_dir, "resume_state.tmp.npz")
                extra = ({"smooth_state": np.asarray(self._smooth_state)}
                         if self.cfg.path_smooth > 0 else {})
                np.savez(tmp, halo=np.asarray(halo),
                         frames_written=written, **extra)
                os.replace(tmp, state_path)    # atomic flush
            if n_valid < t_chunk:
                break
        return written
