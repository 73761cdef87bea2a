"""Two-pass auto border-crop: scan predicted offsets, pick the minimal
zoom that keeps every warp sampling coordinate in-frame.

The reference class exposes a fixed, hand-chosen crop/zoom parameter
(reference mount empty — SURVEY.md §1; production stabilizers such as
ffmpeg's vidstab standardize the two-pass detect→transform shape). Here
pass 1 is device-cheap: resize + CNN only — no warp, which is ~75% of
the full chunk program — and the running max stays ON DEVICE across
chunks, so a whole clip costs one scalar fetch at the end (the axon
tunnel charges ~56 ms per fetch; see ARCHITECTURE.md quirks).

Crop math. The warp samples x = s*px + (1-s)/2*(W-1) + xoff_px with
s = 1-2*crop (ops/grid.py:48, ops/warp_wide.py identity FMA): the
identity term keeps crop*(W-1) of margin at both edges, so every
coordinate stays inside [0, W-1] iff |xoff_px| <= crop*(W-1). With
xoff_px = off_x * (W-1)/2 (normalized offsets) that is
crop >= |off_x| / 2 — resolution-independent; same for y. The dense
offset field is a bilinear (convex) upsample of the coarse control
points, so the control-point max bounds the dense max exactly, and
pass 2 predicts the SAME offsets (identical chunking, halo math, and
strength scaling), so round-up quantization is the only margin needed.

Compile-cache discipline: ``border_crop`` is a STATIC argument of the
chunk program (the crop zoom is baked into kernel constants), so every
distinct value compiles a fresh program. The picked crop is therefore
quantized UP to a multiple of 1/64: the cache stays bounded (at most 32
crop programs per shape) and quantization error is in the conservative
(more crop) direction.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvsg_tpu.config import StabilizeConfig
from dvsg_tpu.ops import resize as resize_ops
from dvsg_tpu.pipeline.stabilize import (initial_halo, predict_chunk_offsets,
                                         put_frames)

CROP_DENOM = 64          # crop quantization grid (see module docstring)
MAX_CROP_STEPS = CROP_DENOM // 2 - 1   # largest multiple < 0.5


def predict_scan_chunk_impl(cfg: StabilizeConfig, params,
                            frames_u8: jax.Array, halo: jax.Array,
                            running_max: jax.Array):
    """Predict-only device step: fold a chunk's max |offset| into the
    device-resident running max. Returns (new_max, new_halo)."""
    mcfg = cfg.model
    t = frames_u8.shape[0]
    mh, mw = mcfg.model_size
    small = resize_ops.downscale_norm(frames_u8, mh, mw)
    seq = jnp.concatenate([halo, small], axis=0)
    offsets = predict_chunk_offsets(cfg, params, seq, t)
    m = jnp.maximum(running_max, jnp.max(jnp.abs(offsets)))
    return m, seq[t:]


# frames_u8 is NOT donated: the predict-only program has no output of
# its shape to alias (the full chunk program donates it into out_u8).
predict_scan_chunk = functools.partial(
    jax.jit, static_argnums=(0,),
    donate_argnums=(3, 4))(predict_scan_chunk_impl)


def scan_stream_max_offset(cfg: StabilizeConfig, params, reader) -> float:
    """Pass 1 over a VideoReader: max |normalized offset| of the clip.

    Chunking, padding, and halo carry mirror Stabilizer.stabilize_stream
    exactly, so pass 2 reproduces the same offsets bit-for-bit. The last
    partial chunk's replicate-padding frames are included in the max —
    conservative (pass 2 computes but trims them)."""
    t_chunk = cfg.chunk_frames
    halo = None
    m = jnp.zeros((), jnp.float32)
    while True:
        chunk = reader.read_batch(t_chunk)
        n_valid = chunk.shape[0]
        if n_valid == 0:
            break
        if halo is None:
            halo = initial_halo(cfg, chunk[0])
        if n_valid < t_chunk:
            pad = np.repeat(chunk[-1:], t_chunk - n_valid, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        m, halo = predict_scan_chunk(cfg, params, put_frames(chunk), halo, m)
        if n_valid < t_chunk:
            break
    return float(m)


def scan_clip_max_offset(cfg: StabilizeConfig, params,
                         frames_u8: np.ndarray) -> float:
    """Pass 1 over an in-memory (T, H, W, C) uint8 clip."""
    total = frames_u8.shape[0]
    if total == 0:
        return 0.0
    t_chunk = cfg.chunk_frames
    halo = initial_halo(cfg, frames_u8[0])
    m = jnp.zeros((), jnp.float32)
    for start in range(0, total, t_chunk):
        chunk = frames_u8[start:start + t_chunk]
        if chunk.shape[0] < t_chunk:
            pad = np.repeat(chunk[-1:], t_chunk - chunk.shape[0], axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        m, halo = predict_scan_chunk(cfg, params, put_frames(chunk), halo, m)
    return float(m)


def _scan_batch_impl(cfg: StabilizeConfig, params, frames: jax.Array,
                     halos: jax.Array, active: jax.Array,
                     running_max: jax.Array):
    """Vmapped predict-only step over a clip batch: fold each ACTIVE
    clip's chunk max into the device-resident running max. ``active``
    is a (B,) f32 mask; exhausted clips repeat their last chunk with the
    contribution masked out (offsets are non-negative after abs)."""
    zero = jnp.zeros((), jnp.float32)
    m_b, new_halos = jax.vmap(
        lambda f, h: predict_scan_chunk_impl(cfg, params, f, h, zero))(
            frames, halos)
    return jnp.maximum(running_max, jnp.max(m_b * active)), new_halos


predict_scan_batch = functools.partial(
    jax.jit, static_argnums=(0,),
    donate_argnums=(3, 5))(_scan_batch_impl)


def scan_readers_max_offset(cfg: StabilizeConfig, params, readers) -> float:
    """Batched pass 1 over N same-resolution readers: lockstep chunks
    through ONE vmapped device program — mirroring how the batched
    pass 2 (multiclip/DP) drives clips, instead of N sequential
    single-clip scans. Matches the max of per-clip scans: while a clip
    is active its fed chunks are identical to the single-clip scan's
    (including the final replicate-padded partial chunk); after
    exhaustion its slot repeats the last chunk, masked out of the max.
    """
    n = len(readers)
    if n == 0:
        return 0.0
    if n == 1:
        # Single clip: the scalar program (bit-identical to pass 2).
        return scan_stream_max_offset(cfg, params, readers[0])
    t = cfg.chunk_frames
    m = jnp.zeros((), jnp.float32)
    halos = None
    last_chunks = [None] * n
    exhausted = [False] * n
    while True:
        step_active = np.zeros((n,), np.float32)
        chunks = []
        for i, r in enumerate(readers):
            c = None
            if not exhausted[i]:
                c = r.read_batch(t)
                nv = c.shape[0]
                if nv == 0:
                    exhausted[i] = True
                    c = None
                else:
                    if nv < t:
                        pad = np.repeat(c[-1:], t - nv, axis=0)
                        c = np.concatenate([c, pad], axis=0)
                        exhausted[i] = True   # after this (padded) step
                    last_chunks[i] = c
                    step_active[i] = 1.0
            if c is None:
                c = last_chunks[i]
                if c is None:   # clip empty from the start
                    c = np.zeros((t, r.height, r.width, 3), np.uint8)
                    last_chunks[i] = c
            chunks.append(c)
        if not step_active.any():
            break
        batch = np.stack(chunks)
        if halos is None:
            halos = jnp.stack([initial_halo(cfg, chunks[i][0])
                               for i in range(n)])
        m, halos = predict_scan_batch(cfg, params, put_frames(batch),
                                      halos, jnp.asarray(step_active), m)
    return float(m)


def smoothing_margin(cfg: StabilizeConfig) -> float:
    """Extra |offset| the path-smoothing stage can add beyond what the
    predict-only scan sees: each component's correction is clamped to
    ±path_smooth_max (pipeline/pathsmooth.py anti-windup), and the
    rotation and scale components each contribute at most
    path_smooth_max per axis at the frame corners (|(-Y, X)| ≤ 1 and
    |(X, Y)| ≤ 1 per component in normalized units). EVERY auto-crop
    caller must add this to the scanned max — the CLI scan path once
    bypassed it (round-4 review finding) and under-cropped smoothed
    runs."""
    if cfg.path_smooth <= 0:
        return 0.0
    terms = (1.0 + (1.0 if cfg.path_smooth_rotation else 0.0)
             + (1.0 if cfg.path_smooth_scale else 0.0))
    return cfg.path_smooth_max * terms


def crop_for_max_offset(max_abs_offset: float) -> Tuple[float, bool]:
    """Minimal quantized border crop hiding offsets up to the given max.

    Returns (crop, capped): crop is the smallest multiple of 1/64 with
    crop >= max_abs_offset / 2 (see module docstring for the bound);
    ``capped`` flags a clip so shaky that even the largest valid crop
    (31/64) cannot hide every border — the caller should warn, the warp
    still border-clamps safely."""
    needed = max(0.0, float(max_abs_offset)) * 0.5
    steps = math.ceil(needed * CROP_DENOM - 1e-9)
    if steps > MAX_CROP_STEPS:
        return MAX_CROP_STEPS / CROP_DENOM, True
    return steps / CROP_DENOM, False


def pick_border_crop(cfg: StabilizeConfig, params,
                     source) -> Tuple[float, float, bool]:
    """One-call pass 1: scan ``source`` (VideoReader or (T, H, W, C)
    uint8 ndarray) and return (border_crop, max_abs_offset, capped).

    With path smoothing on (cfg.path_smooth > 0) the applied offsets are
    the predicted ones plus a per-frame correction the predict-only scan
    does not compute; ``smoothing_margin`` bounds it, keeping the crop
    exact-and-conservative."""
    if isinstance(source, np.ndarray):
        m = scan_clip_max_offset(cfg, params, source)
    else:
        m = scan_stream_max_offset(cfg, params, source)
    m += smoothing_margin(cfg)
    crop, capped = crop_for_max_offset(m)
    return crop, m, capped
