"""Warp dispatch: choose between the fused Pallas kernel and the lax oracle.

``warp_impl``:
  * ``"lax"``    — pure jax.lax oracle (ops/warp_ref.py), runs anywhere.
  * ``"pallas"`` — fused gather-interpolate TPU kernel (ops/warp_pallas.py).
  * ``"auto"``   — pallas on TPU backends, lax elsewhere.
"""

from __future__ import annotations

import jax

from dvsg_tpu.ops import warp_ref


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def resolve_impl(warp_impl: str) -> str:
    if warp_impl == "auto":
        return "pallas" if _on_tpu() else "lax"
    if warp_impl not in ("lax", "pallas"):
        raise ValueError(f"unknown warp_impl {warp_impl!r}")
    return warp_impl


def warp_batch(frames: jax.Array, grids: jax.Array,
               warp_impl: str = "auto",
               max_dx_px: int | None = None) -> jax.Array:
    """frames (B, H, W, C) × grids (B, H, W, 2) → warped (B, H, W, C).

    ``max_dx_px``: static bound on horizontal displacement in pixels —
    sizes the Pallas kernel's stripe halo. Defaults to a conservative
    half-frame bound (always correct, larger halo).
    """
    impl = resolve_impl(warp_impl)
    if impl == "pallas":
        from dvsg_tpu.ops import warp_pallas
        if max_dx_px is None:
            max_dx_px = (grids.shape[2] - 1) // 2
        return warp_pallas.bilinear_warp_batch(frames, grids,
                                               max_dx_px=max_dx_px)
    return warp_ref.bilinear_warp_batch(frames, grids)


def warp_batch_diff(frames: jax.Array, grids: jax.Array,
                    warp_impl: str = "auto",
                    max_dx_px: int | None = None) -> jax.Array:
    """Training-path warp: differentiable w.r.t. GRIDS (frames constant).

    Pallas (grid-only custom VJP) on TPU, full-autodiff lax oracle
    elsewhere. Callers must not rely on frame gradients through this op.
    """
    impl = resolve_impl(warp_impl)
    if impl == "pallas":
        from dvsg_tpu.ops import warp_pallas
        if max_dx_px is None:
            max_dx_px = (grids.shape[2] - 1) // 2
        return warp_pallas.bilinear_warp_batch_grids_diff(
            frames, grids, max_dx_px)
    return warp_ref.bilinear_warp_batch(frames, grids)


def max_dx_px_for(max_offset_norm: float, width: int) -> int:
    """Horizontal displacement bound (px) for a normalized offset bound."""
    import math
    return int(math.ceil(max_offset_norm * (width - 1) / 2.0)) + 1
