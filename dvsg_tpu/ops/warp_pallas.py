"""Fused Pallas gather-interpolate warp kernel — the hot op of the framework.

Replaces the framework ``grid_sample`` the reference relies on (SURVEY.md §1
L3, §3.4; reference mount empty — citation unavailable) with a single TPU
pass. Measured context: XLA's own gather lowering of the lax oracle costs
~38 ms/frame at 720p on v5e — generic gathers don't vectorize on TPU — so
this kernel is the framework's main performance lever.

Design (constraints discovered by probing Mosaic on v5e):
  * ``take_along_axis`` is supported only as a 2D, f32, lane-dimension
    gather on exactly-128-lane tiles, addressing within each 128-lane
    register row. Sublane-dimension gathers are unsupported.
  * Therefore: process output tiles of (TILE_H, 128) per (batch, channel)
    plane. HORIZONTAL sampling is exact via a 3-register decomposition —
    the source row segment [c*128, c*128+384) is sliced into left/mid/right
    registers, each lane-gathered at the pixel's local index and selected
    by its register id; both bilinear x-neighbors are gathered. This covers
    |x displacement| < 128 px (checked statically by the dispatcher).
  * VERTICAL sampling is exact and ADAPTIVE: the kernel computes the tile's
    residual row range [dmin, dmax] on the fly and runs a dynamic
    ``fori_loop`` over only the row candidates actually present, slicing a
    (TILE_H, 384) band per candidate and accumulating masked bilinear
    contributions. Smooth stabilization grids have tiny in-tile residuals,
    so the loop is short; pathological grids stay correct, just slower.
  * Frames are edge-padded by (TILE_H, 128) rows/cols outside the kernel so
    border-clamped coordinates never clamp a slice (no duplicate-candidate
    accounting), and the whole padded plane sits in VMEM (4.5 MB at 720p
    f32; revisited blocks are not refetched across grid steps).

Semantics match ops/warp_ref.bilinear_warp exactly (same align_corners=True
border-clamped bilinear), pinned by tests/test_warp_pallas.py on both the
interpreter and real TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8          # f32 sublane tile
TILE_W = 128        # lane width (hard TPU constraint for gathers)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def stripes_for_max_dx(max_dx_px: int) -> int:
    """Number of 128-column stripes covering |x displacement| <= max_dx_px."""
    halo = _cdiv(max_dx_px + 2, TILE_W)   # +1 for x1, +1 safety
    return 2 * halo + 1


def _make_warp_kernel(n_stripes: int):
    """Kernel over (TILE_H, 128) output tiles of one (batch, chan) plane.

    Args seen by the kernel:
      y_ref/x_ref: (1, TILE_H, 128) f32 source coords in PADDED pixel space.
      stripe refs (n_stripes of them): (1, 1, Hp, 128) — consecutive
        128-column stripes of the padded plane centered on the tile's own
        columns, selected by BlockSpec index maps (pipelined; nothing
        plane-resident in VMEM).
      out_ref: (1, 1, TILE_H, 128) f32.
    """

    def kernel(y_ref, x_ref, *refs):
        stripes, out_ref = refs[:-1], refs[-1]
        cb = pl.program_id(2)
        rt = pl.program_id(3)

        y = y_ref[0]                        # (TILE_H, 128)
        x = x_ref[0]
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        fy = y - y0
        fx = x - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        # Output row in padded space; vertical residual per pixel.
        r0p = rt * TILE_H + TILE_H          # PAD_H == TILE_H
        row_p = (r0p
                 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0))
        resid = y0i - row_p
        dmin = jnp.min(resid)
        dmax = jnp.max(resid)

        # Horizontal: stripe id and local lane index for both x-neighbors.
        col_base = cb * TILE_W              # first stripe's start (padded)
        lx0 = x0i - col_base                # in [0, n_stripes*128)
        lx1 = lx0 + 1
        reg0 = lx0 // TILE_W
        reg1 = lx1 // TILE_W
        loc0 = lx0 - reg0 * TILE_W
        loc1 = lx1 - reg1 * TILE_W
        w1 = fx
        w0 = 1.0 - fx

        def candidate(d, acc):
            # Vertical bilinear weight of candidate d: the candidate row
            # serves as y0 (weight 1-fy) and/or y0+1 (weight fy).
            wv = (jnp.where(resid == d, 1.0 - fy, 0.0)
                  + jnp.where(resid + 1 == d, fy, 0.0))

            hval = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            for s in range(n_stripes):      # static stripe loop
                seg = stripes[s][0, 0, pl.ds(r0p + d, TILE_H), :]
                g0 = jnp.take_along_axis(
                    seg, jnp.where(reg0 == s, loc0, 0), axis=1)
                g1 = jnp.take_along_axis(
                    seg, jnp.where(reg1 == s, loc1, 0), axis=1)
                hval += (jnp.where(reg0 == s, w0 * g0, 0.0)
                         + jnp.where(reg1 == s, w1 * g1, 0.0))
            return acc + wv * hval

        acc = jax.lax.fori_loop(dmin, dmax + 2, candidate,
                                jnp.zeros((TILE_H, TILE_W), jnp.float32))
        out_ref[0, 0] = acc

    return kernel


def _pad_to_multiple(arr, mult, axis):
    size = arr.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return arr
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (0, rem)
    return jnp.pad(arr, pads, mode="edge")


@functools.partial(jax.jit,
                   static_argnames=("max_dx_px", "interpret"))
def bilinear_warp_batch(frames: jax.Array, grids: jax.Array,
                        max_dx_px: int = 126,
                        interpret: bool = False) -> jax.Array:
    """Fused warp: frames (B, H, W, C) × grids (B, Ho, Wo, 2) → (B, Ho, Wo, C).

    Drop-in for ops/warp_ref.bilinear_warp_batch. ``max_dx_px`` is the
    STATIC bound on horizontal displacement |x_src - x_out| the caller
    guarantees (the framework derives it from ModelConfig.max_offset); it
    sizes the stripe halo. Vertical displacement is unbounded (adaptive
    candidate loop).
    """
    b, h, w, c = frames.shape
    _, ho, wo, _ = grids.shape
    orig_dtype = frames.dtype
    n_stripes = stripes_for_max_dx(max_dx_px)
    pad_w = TILE_W * (n_stripes // 2)
    pad_h = TILE_H

    # Planar layout: gathers want (rows, lanes) 2D tiles per channel plane.
    planes = jnp.transpose(frames.astype(jnp.float32), (0, 3, 1, 2))

    # Edge padding: replicate == border-clamp semantics; padded so
    # border-clamped coords never clamp a kernel slice. Bottom/right extra
    # for tile alignment only.
    planes = jnp.pad(planes, ((0, 0), (0, 0), (pad_h, pad_h),
                              (pad_w, pad_w)), mode="edge")
    planes = _pad_to_multiple(planes, TILE_H, 2)
    planes = _pad_to_multiple(planes, TILE_W, 3)
    hp = planes.shape[2]

    # Source coords in padded pixel space, border-clamped like the oracle.
    x = (grids[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (w - 1)
    y = (grids[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (h - 1)
    x = jnp.clip(x, 0.0, w - 1) + pad_w
    y = jnp.clip(y, 0.0, h - 1) + pad_h

    # Pad the OUTPUT tiling (coords replicate; extra tiles are cropped).
    y = _pad_to_multiple(_pad_to_multiple(y, TILE_H, 1), TILE_W, 2)
    x = _pad_to_multiple(_pad_to_multiple(x, TILE_H, 1), TILE_W, 2)
    hop, wop = y.shape[1], y.shape[2]

    # Grid order (b, c, cb, rt): the column stripes stay constant across
    # all row tiles of a column block, so Pallas fetches each stripe once
    # per (b, c, cb) and pipelines the fetches.
    grid = (b, c, wop // TILE_W, hop // TILE_H)
    coord_spec = pl.BlockSpec((1, TILE_H, TILE_W),
                              lambda b_, c_, cb, r: (b_, r, cb),
                              memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        # Output tile cb covers padded columns
        # [cb*128 + pad_w, cb*128 + pad_w + 128); stripes cb+0..cb+NS-1 in
        # padded indexing center on it — always in range via the halo.
        return pl.BlockSpec((1, 1, hp, TILE_W),
                            lambda b_, c_, cb, r, o=offset: (b_, c_, 0,
                                                             cb + o),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_warp_kernel(n_stripes),
        grid=grid,
        in_specs=[coord_spec, coord_spec,
                  *(stripe_spec(o) for o in range(n_stripes))],
        out_specs=pl.BlockSpec((1, 1, TILE_H, TILE_W),
                               lambda b_, c_, cb, r: (b_, c_, r, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, hop, wop), jnp.float32),
        interpret=interpret,
    )(y, x, *([planes] * n_stripes))

    out = out[:, :, :ho, :wo]
    return jnp.transpose(out, (0, 2, 3, 1)).astype(orig_dtype)
