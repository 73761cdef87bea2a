"""Stabilization quality evaluation on synthetic-jitter clips.

Ground truth is constructible without the reference (SURVEY.md §4): frame t
of a synthetic clip is the still seen through jitter A_t; the ideal
stabilizer output for the pipeline's causal window is the still seen
through the window-MEAN pose Ā_t (the smoothed camera path). We report:

  * psnr_vs_target: PSNR(output_t, still ∘ Ā_t) over interior pixels —
    fidelity to the achievable ground truth.
  * psnr_identity: PSNR(input_t, still ∘ Ā_t) — the do-nothing baseline;
    a working model must beat it.
  * stability_gain: mean interior frame-to-frame pixel change of the
    output relative to the input (< 1 means steadier video).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dvsg_tpu.ops import grid as grid_ops
from dvsg_tpu.ops.warp_ref import bilinear_warp
from dvsg_tpu.pipeline.stabilize import Stabilizer
from dvsg_tpu.train import synthetic
from dvsg_tpu.utils.metrics import psnr

_BORDER = 0.125


def smoothed_targets(still: jax.Array, path: jax.Array, window: int
                     ) -> jax.Array:
    """Per-frame achievable targets: still ∘ (window-mean jitter).

    Mirrors the pipeline's causal window (frames t-N+1..t, replicate-padded
    at the start), matching train/loop.py supervision.
    """
    t_total = path.shape[0]
    h, w, _ = still.shape
    pad = jnp.tile(path[:1], (window - 1, 1))
    padded = jnp.concatenate([pad, path], axis=0)

    def one(t):
        win = jax.lax.dynamic_slice_in_dim(padded, t, window, axis=0)
        theta = synthetic.jitter_theta(win.mean(axis=0))
        return bilinear_warp(still, grid_ops.homography_grid(theta, h, w))

    return jax.vmap(one)(jnp.arange(t_total))


def _interior(a: np.ndarray) -> np.ndarray:
    h, w = a.shape[-3], a.shape[-2]
    bh, bw = int(h * _BORDER), int(w * _BORDER)
    return a[..., bh:h - bh, bw:w - bw, :]


def _steadiness(frames: np.ndarray) -> float:
    """Mean interior frame-to-frame absolute change (lower = steadier)."""
    f = _interior(frames).astype(np.float64) / 255.0
    return float(np.abs(np.diff(f, axis=0)).mean())


def evaluate_synthetic(stab: Stabilizer, key: jax.Array, num_frames: int,
                       height: int, width: int,
                       track_metrics: bool = False,
                       still=None) -> Dict[str, float]:
    """Synthetic-jitter quality report (ground-truth PSNR + steadiness).

    ``track_metrics`` adds the literature's no-ground-truth trio —
    stability score, cropping ratio, distortion value — estimated by
    feature tracking (utils/stab_metrics.py); host-side cv2 work, so
    off by default in tight loops.

    ``still`` (optional, (height, width, 3) f32 in [0,1]) replaces the
    procedural base image, so quality is measurable on USER imagery with
    the same exact ground truth — the evaluation side of the --data
    fine-tuning story (train/data.py).
    """
    if still is None:
        frames_u8, still_u8, path = synthetic.synthetic_clip_u8(
            key, num_frames, height, width)
    else:
        still = jnp.asarray(still, jnp.float32)
        if still.shape != (height, width, 3):
            raise ValueError(f"still must be ({height}, {width}, 3), "
                             f"got {still.shape}")
        path = synthetic.random_camera_path(
            jax.random.fold_in(key, 1), num_frames)
        frames = jax.vmap(
            lambda p: synthetic.jitter_frame(still, p))(path)
        to8 = lambda x: jnp.clip(jnp.round(x * 255.0), 0, 255
                                 ).astype(jnp.uint8)
        frames_u8, still_u8 = to8(frames), to8(still)
    frames_np = np.asarray(frames_u8)

    out = stab.stabilize_clip(frames_np)

    targets = smoothed_targets(jnp.asarray(still_u8, jnp.float32) / 255.0,
                               path, stab.cfg.model.window)
    targets_np = np.asarray(
        jnp.clip(jnp.round(targets * 255.0), 0, 255).astype(jnp.uint8))

    psnr_out = psnr(_interior(out), _interior(targets_np))
    psnr_in = psnr(_interior(frames_np), _interior(targets_np))
    steadiness_in = _steadiness(frames_np)
    steadiness_out = _steadiness(out)
    report = {
        "psnr_vs_target": psnr_out,
        "psnr_identity": psnr_in,
        "psnr_gain_db": psnr_out - psnr_in,
        "steadiness_in": steadiness_in,
        "steadiness_out": steadiness_out,
        "stability_gain": (steadiness_out / steadiness_in
                           if steadiness_in > 0 else 1.0),
        "frames": float(num_frames),
    }
    if track_metrics:
        from dvsg_tpu.utils import stab_metrics
        report.update(stab_metrics.stability_report(frames_np, out))
    return report
