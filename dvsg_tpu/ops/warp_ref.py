"""Reference bilinear grid-sample warp in pure ``jax.lax`` — the f32 oracle.

This is the permanent correctness oracle for the fused Pallas warp kernel
(SURVEY.md §4, §7 stage 0) and the fallback path when the kernel's
assumptions don't hold. Semantics match
``torch.nn.functional.grid_sample(..., mode="bilinear",
padding_mode="border", align_corners=True)`` — pinned by
``tests/test_warp_oracle.py``.

The reference repo performs this step with its framework's ``grid_sample``
(SURVEY.md §1 L3; reference mount empty — citation unavailable); here it is a
first-party op so the whole warp path is self-contained and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_warp(frame: jax.Array, grid: jax.Array) -> jax.Array:
    """Warp a single frame by a sampling grid.

    Args:
      frame: (H, W, C) source image, any float dtype.
      grid: (Ho, Wo, 2) normalized sampling coords, last dim (x, y) in
        [-1, 1], align_corners=True. Output resolution follows the grid.

    Returns:
      (Ho, Wo, C) warped frame in frame.dtype; interpolation in f32.
    """
    h, w, _ = frame.shape
    src = frame.astype(jnp.float32)

    x = (grid[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (h - 1)
    # Border padding: clamp the sampling location itself, then the +1
    # neighbor index; matches torch's padding_mode="border".
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    # Four-neighbor gather; XLA lowers this to a TPU gather. The fused
    # Pallas kernel (ops/warp_pallas.py) replaces exactly this block.
    v00 = src[y0i, x0i]
    v01 = src[y0i, x1i]
    v10 = src[y1i, x0i]
    v11 = src[y1i, x1i]

    top = v00 + (v01 - v00) * fx
    bot = v10 + (v11 - v10) * fx
    out = top + (bot - top) * fy
    return out.astype(frame.dtype)


def bilinear_warp_batch(frames: jax.Array, grids: jax.Array) -> jax.Array:
    """Batched warp: frames (B, H, W, C), grids (B, Ho, Wo, 2)."""
    return jax.vmap(bilinear_warp)(frames, grids)


def warp_quantize_oracle(frames_u8: jax.Array, grids: jax.Array) -> jax.Array:
    """quantize(warp(normalize(frames_u8))): the ONE reference definition
    of the fused uint8 path's semantics. The Pallas kernels' guarded
    fallback branch, the lax dispatch path, and the parity fixtures all
    call this — the 1-LSB-sensitive rounding convention (round-to-nearest,
    clip to [0, 255]) must not fork across copies."""
    out = bilinear_warp_batch(frames_u8.astype(jnp.float32) * (1.0 / 255.0),
                              grids)
    return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)
