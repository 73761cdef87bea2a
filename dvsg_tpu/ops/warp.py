"""Warp dispatch: choose between the fused Pallas kernel and the lax oracle.

``warp_impl``:
  * ``"lax"``    — pure jax.lax oracle (ops/warp_ref.py), runs anywhere.
  * ``"pallas"`` — fused gather-interpolate TPU kernel (ops/warp_pallas.py).
  * ``"pallas_interpret"`` — the SAME Pallas program in interpret mode:
    runs on CPU, so the virtual-mesh test suite and the multi-chip dryrun
    can compile and execute the production kernel inside sharded programs
    (pjit/shard_map/vmap) without TPU hardware (VERDICT.md round-2 item 2).
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
    if warp_impl not in ("lax", "pallas", "pallas_interpret"):
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
    if impl.startswith("pallas"):
        from dvsg_tpu.ops import warp_pallas
        if max_dx_px is None:
            max_dx_px = (grids.shape[2] - 1) // 2
        return warp_pallas.bilinear_warp_batch(
            frames, grids, max_dx_px=max_dx_px,
            interpret=(impl == "pallas_interpret"))
    return warp_ref.bilinear_warp_batch(frames, grids)


def warp_quantize_batch(frames_u8: jax.Array, grids: jax.Array | None = None,
                        warp_impl: str = "auto",
                        max_dx_px: int | None = None,
                        offsets: jax.Array | None = None,
                        border_crop: float = 0.0) -> jax.Array:
    """Fused normalize+warp+quantize: uint8 frames in, uint8 frames out.

    The inference hot path. On TPU this is ONE wide-layout Pallas pass
    (ops/warp_wide.py) with zero layout changes and the stripe-coverage
    contract enforced on device (oracle fallback on violation); elsewhere
    it composes the lax oracle with explicit normalize/quantize — same
    semantics within 1 LSB.

    Callers holding coarse offsets (the pipeline case) should pass
    ``offsets`` (+ ``border_crop``) and OMIT ``grids``: the Pallas path
    then synthesizes sampling coordinates in-kernel from the offset field
    (warp_u8_offsets) — no dense (B, H, W, 2) grid is ever materialized —
    and the lax path builds the dense grid itself. Passing ``grids``
    selects the dense-grid kernel (arbitrary output resolution,
    non-lane-aligned widths padded and cropped inside).
    """
    if grids is None and offsets is None:
        raise ValueError("warp_quantize_batch needs `grids` or `offsets`")
    impl = resolve_impl(warp_impl)
    if impl.startswith("pallas"):
        from dvsg_tpu.ops import warp_wide
        interp = impl == "pallas_interpret"
        if grids is None:
            return warp_wide.warp_u8_offsets(frames_u8, offsets,
                                             border_crop=border_crop,
                                             interpret=interp)
        if max_dx_px is None:
            max_dx_px = (grids.shape[2] - 1) // 2
        return warp_wide.warp_u8_batch(frames_u8, grids,
                                       max_dx_px=max_dx_px,
                                       interpret=interp)
    if grids is None:
        from dvsg_tpu.ops import grid as grid_ops
        h, w = frames_u8.shape[1], frames_u8.shape[2]
        grids = jax.vmap(lambda o: grid_ops.grid_from_offsets(
            o, h, w, border_crop=border_crop))(offsets)
    return warp_ref.warp_quantize_oracle(frames_u8, grids)


def warp_batch_diff(frames: jax.Array, grids: jax.Array,
                    warp_impl: str = "auto",
                    max_dx_px: int | None = None) -> jax.Array:
    """Training-path warp: differentiable w.r.t. GRIDS (frames constant).

    Pallas (grid-only custom VJP) on TPU, full-autodiff lax oracle
    elsewhere. Callers must not rely on frame gradients through this op.
    """
    impl = resolve_impl(warp_impl)
    if impl.startswith("pallas"):
        from dvsg_tpu.ops import warp_pallas
        if max_dx_px is None:
            max_dx_px = (grids.shape[2] - 1) // 2
        return warp_pallas.bilinear_warp_batch_grids_diff(
            frames, grids, max_dx_px,
            interpret=(impl == "pallas_interpret"))
    return warp_ref.bilinear_warp_batch(frames, grids)


def max_dx_px_for(max_offset_norm: float, width: int) -> int:
    """Horizontal displacement bound (px) for a normalized offset bound."""
    import math
    return int(math.ceil(max_offset_norm * (width - 1) / 2.0)) + 1
