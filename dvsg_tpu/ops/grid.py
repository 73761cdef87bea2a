"""Warp-grid construction utilities.

Convention (pinned by tests against ``torch.nn.functional.grid_sample``):

* a sampling grid has shape ``(H, W, 2)`` with last dim ``(x, y)``,
* coordinates are normalized to ``[-1, 1]`` with ``align_corners=True``
  semantics: ``-1`` maps to pixel ``0`` and ``+1`` to pixel ``S - 1``,
* out-of-range coordinates sample with border clamping.

The reference builds its grid as identity-meshgrid + predicted offsets
(SURVEY.md §3.3; reference mount empty — citation unavailable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 1))
def identity_grid(height: int, width: int) -> jax.Array:
    """Identity sampling grid, shape (H, W, 2), last dim (x, y) in [-1, 1]."""
    # align_corners=True: endpoints land exactly on pixel centers 0 and S-1.
    xs = jnp.linspace(-1.0, 1.0, width, dtype=jnp.float32)
    ys = jnp.linspace(-1.0, 1.0, height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # each (H, W)
    return jnp.stack([gx, gy], axis=-1)


def upsample_offsets(offsets: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinearly upsample coarse control offsets (..., gh, gw, 2) → (..., H, W, 2).

    Offsets are in normalized units, so upsampling does not rescale
    values. Matrix form (ops/resize.py): exact jax.image.resize semantics
    as two MXU matmuls instead of a gather fusion, at "highest" precision
    so the coordinates are true f32 on TPU and agree with the warp
    kernel's in-register coordinate synthesis (ops/warp_wide.py).
    """
    from dvsg_tpu.ops import resize as resize_ops
    return resize_ops.downscale_bilinear(offsets.astype(jnp.float32),
                                         height, width,
                                         precision="highest")


def grid_from_offsets(offsets: jax.Array, height: int, width: int,
                      border_crop: float = 0.0) -> jax.Array:
    """Full-resolution sampling grid from coarse offsets: identity + upsample.

    ``border_crop``: fraction of each border hidden by zooming the sampling
    grid toward the center (scale identity by 1-2*crop) — the standard
    stabilized-border crop, folded into the same warp for free.
    """
    if not 0.0 <= border_crop < 0.5:
        raise ValueError(
            f"border_crop must be in [0, 0.5), got {border_crop}")
    dense = upsample_offsets(offsets.astype(jnp.float32), height, width)
    scale = 1.0 - 2.0 * border_crop
    return identity_grid(height, width) * scale + dense


def grid_to_pixel_coords(grid: jax.Array, height: int, width: int):
    """Unnormalize an align_corners=True grid to pixel coordinates (x, y)."""
    x = (grid[..., 0] + 1.0) * 0.5 * (width - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (height - 1)
    return x, y


def affine_grid(theta: jax.Array, height: int, width: int) -> jax.Array:
    """Sampling grid for a 2x3 affine matrix acting on normalized coords.

    ``theta`` maps output coords to input coords (same convention as
    ``torch.nn.functional.affine_grid``): shape (2, 3).
    """
    base = identity_grid(height, width)  # (H, W, 2) in (x, y)
    ones = jnp.ones((height, width, 1), dtype=base.dtype)
    homo = jnp.concatenate([base, ones], axis=-1)  # (H, W, 3)
    return jnp.einsum("hwk,ck->hwc", homo, theta.astype(base.dtype))


def homography_grid(hmat: jax.Array, height: int, width: int) -> jax.Array:
    """Sampling grid for a 3x3 homography on normalized coords.

    Projective: (x', y', w') = H @ (x, y, 1); grid = (x'/w', y'/w').
    """
    base = identity_grid(height, width)
    ones = jnp.ones((height, width, 1), dtype=base.dtype)
    homo = jnp.concatenate([base, ones], axis=-1)
    out = jnp.einsum("hwk,ck->hwc", homo, hmat.astype(base.dtype))
    # Mild camera perspectives keep w' near 1; no sign handling needed.
    return out[..., :2] / out[..., 2:]
