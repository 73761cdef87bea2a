"""Wide-layout fused warp+quantize kernel: uint8 in, uint8 out, no transpose.

The hot op of the inference pipeline (SURVEY.md §3.4): replaces the
planar kernel's normalize -> NHWC->planar transpose -> warp -> quantize
chain with ONE pass over the frame in its natural interleaved layout.

Layout. A (H, W, C) uint8 frame is VIEWED as (H, W*C): lanes are channel-
interleaved pixels and both reshapes are free. The horizontal bilinear
neighbor of source lane C*x+c is lane C*(x+1)+c = +C lanes, so the
3-stripe scalar-prefetched lane-gather decomposition of the planar kernel
(ops/warp_pallas.py) carries over with lx1 = lx0 + C. Sampling coords are passed
COMPACT (per pixel, 1/C the bytes): an output lane-block's pixels always
fit one aligned 128-px coord block (C*128 lanes == 128 px), so the kernel
expands them with one lane gather and reconstructs the source lane as
C*floor(x) + lane%C — in f32 (exact here; TPU has no vector integer
divide, and packing C*x0+frac into one f32 loses the tap to rounding).

Scale fusion. Payload values stay 0..255 end to end: the pipeline's
1/255 normalize and *255 quantize cancel inside the bilinear lerp, so the
kernel rounds its f32 accumulator straight back to uint8 (parity with
quantize(warp_ref(normalize(.))) within 1 LSB, pinned by tests).

Schedule (measured on v5e, scripts/kexp_wide.py): the kernel is LATENCY-
bound, not bandwidth- or flops-bound. Three rules shaped the final form:
  * accumulate in REGISTERS (loop-carried values), never scratch-ref
    read-modify-write — the serial VMEM chain made the first gather cost
    ~7x its pipelined throughput cost;
  * macro-unroll the vertical candidate loop with INDEPENDENT
    contributions summed pairwise — overlaps gather latencies (UNROLL /
    UNROLL_QUAD, on-chip sweeps in the constants' comments);
  * quad-pack the payload (production offsets path): one int32 lane
    carries four exact 8-bit taps — both horizontal taps of two
    consecutive source rows — so one gather serves a candidate PAIR
    (scripts/kexp_quad.py: 580 vs 704 µs/frame at 720p);
  * no stripe predication — a marginal overlapped gather costs ~17 ns,
    while in-kernel lax.cond control flow serializes the pipeline.
Several grid steps' row tiles are batched per step (n_sub) to amortize
per-block DMA bookkeeping; tile_h stays 32 because the candidate spread
(and with it redundant masked work) grows with tile area.

Contract and guard: each (128-lane, row-block) output tile's source
lanes must fit a 384-lane window (<= ~126 px of x-displacement VARIATION
per ~43-px-wide, n_sub*32-row-tall output tile at C=3 — all smooth
stabilization warps qualify; the per-ROW-BLOCK anchoring absorbs the
~theta*H px of rotation-induced dx drift across the frame height). The contract is
ENFORCED: `warp_u8_batch` computes the exact per-block coverage predicate
from the same lane math the kernel uses and falls back to the lax oracle
via `jax.lax.cond` when any block violates it — never silent corruption
(VERDICT.md round-1 item 4).

Two public entries share the schedule:
  * `warp_u8_offsets` — the PRODUCTION path (round-3): takes the CNN's
    coarse (gh, gw, 2) offsets and synthesizes each tile's sampling
    coordinates in-register (vertical upsample by a tiny matmul outside,
    horizontal lerp + identity FMA inside), so the dense (T, H, W, 2)
    grid is never materialized; guard and stripe bases derive from the
    coarse control points (`_offsets_bounds`).
  * `warp_u8_batch` — arbitrary dense grids (any output resolution),
    with the dense coverage predicate of `_wide_prep`.

The reference performs this step through its framework's grid_sample on
normalized f32 and quantizes on the host (SURVEY.md §1 L3, §3.1;
reference mount empty — citation unavailable).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvsg_tpu.ops import warp_ref

TILE_H = 32         # row-tile height; candidate spread grows with area
_EPS_PX = 1e-3      # coverage-bound widening, see _offsets_bounds
TILE_W = 128        # lane width (hard TPU constraint for gathers)
N_STRIPES = 3       # fixed; see ops/warp_pallas.py (Mosaic >3-stripe cliff)
UNROLL = 3          # candidate macro-unroll (ILP over gather latency);
                    # round-3 on-chip sweep at 720p b=8 (kexp_offsets):
                    # 2→753, 3→672, 4→695, 5→736, 6→780 us/frame
UNROLL_QUAD = 2     # candidate-PAIR macro-unroll for the quad-packed
                    # loop (scripts/kexp_quad.py, 720p b=8): 1→637,
                    # 2→580, 3→628 us/frame (pair-packed full: 704)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pick_n_sub(ho: int, tile_h: int = TILE_H, max_blk: int = 768) -> int:
    """Row-subtiles per grid step: minimize hop = ceil(ho/blk)*blk first,
    then prefer the LARGEST n_sub at that hop with blk <= max_blk.

    Padded rows are pure waste — the kernel runs the full candidate loop
    on them before the crop — so minimal hop wins outright (n_sub=1
    always attains it, so the tie set is never empty): the legacy fixed
    tuple (24, 12, 8, 4, 2, 1) computed 6.7% dead rows at 720p (hop 768
    vs 736), 1080p (1152 vs 1088), and 480p (512 vs 480). On-chip
    interleaved A/B (scripts/kexp_nsub.py, medians of 4 rounds):
    720p n_sub 23 vs 24 → 579 vs 642 µs/frame; 1080p 17 vs 12 → 1246
    vs 1448; 480p 15 vs 8 → 266 vs 303 (all parity-exact vs the legacy
    pick). Among equal-hop choices, bigger blocks amortize per-step
    DMA bookkeeping (n_sub=24 measured 692 vs 714 µs/frame at 720p vs
    n_sub=12 at the same hop, dma_only 178 vs 251).

    ``max_blk`` bounds the row-block height, which is the granularity of
    per-row-block stripe ANCHORING: rotation drifts dx by ~theta*blk px
    within one block, so one tall block per frame can overflow the
    3-stripe window — at 1080p a single 1088-row block (n_sub=34)
    failed coverage on the 0.05-rad probe fixture (production would
    route to the oracle fallback; the probe's unguarded launch showed
    the raw mismatch) while 544-row blocks (n_sub=17) were bit-exact at
    the SAME speed (1241 vs 1246 µs/frame). 768 keeps anchoring at
    least as fine as the proven legacy picks at every resolution and
    bounds kernel code size (the sub loop is python-unrolled); the
    coverage guard still catches any violation."""
    max_n = max(max_blk // tile_h, 1)
    best, best_hop = 1, _cdiv(ho, tile_h) * tile_h * 2
    for n_sub in range(1, min(max_n, _cdiv(ho, tile_h)) + 1):
        blk = tile_h * n_sub
        hop = _cdiv(ho, blk) * blk
        if hop < best_hop or (hop == best_hop and n_sub > best):
            best, best_hop = n_sub, hop
    return best


def _lane_geometry(cb, tile_h: int, channels: int):
    """Per-lane geometry shared by both kernel bodies.

    Returns (lane_f, phase, px_f): the global lane index, lane % C (both
    via exact f32 multiply-by-reciprocal floor division — TPU has no
    vector integer divide), and the global PIXEL index of each lane.
    """
    lane_f = (jnp.float32(cb * TILE_W)
              + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                         1).astype(jnp.float32))
    phase = lane_f - channels * jnp.floor(lane_f * (1.0 / channels))
    px_f = (lane_f - phase) * (1.0 / channels)
    return lane_f, phase, px_f


def _sub_accumulate(stripes, y, xpx, phase, lane_base, r0p, tile_h: int,
                    channels: int, unroll: int, packed: bool = False,
                    adaptive_tail: bool = False,
                    stripe_fold: bool = True,
                    fold_select: bool = False,
                    tent_wv: bool = False):
    """Bilinear accumulation for one (tile_h, 128) sub-tile.

    ``y``/``xpx`` are source coordinates in padded-plane space (y includes
    pad_h; x in pixel units, phase added here). The candidate loop, stripe
    decomposition, and ILP schedule are the measured design of record —
    see the module docstring. Returns the f32 accumulator (payload stays
    0..255; the caller quantizes).

    ``packed``: the stripes hold QUAD-PACKED int32 planes
    (``_prep_planes``): v[y,l]<<24 | v[y,l+C]<<16 | v[y+1,l]<<8 |
    v[y+1,l+C] — four exact 8-bit payloads per 32-bit lane. ONE gather
    then yields both horizontal taps of TWO consecutive source rows
    (unpack = 3 logical shifts + 3 ands + 4 converts, cheap VPU ops;
    Mosaic lowers i32 lane gathers fine — scripts/kexp_quadprobe.py),
    so the candidate loop steps by 2 and ``unroll`` counts candidate
    PAIRS. Measured 580 vs 704 µs/frame at 720p against the previous
    f32 pair-pack (both horizontal taps of one row per lane), which the
    24-bit f32 mantissa capped at two payloads (scripts/kexp_quad.py).
    The x1 tap rides the x0 lane, so x1 stripe coverage is no longer a
    constraint.

    ``stripe_fold`` (packed path, ADOPTED round-3): each lane's tap
    lives in EXACTLY one stripe, so the three per-stripe gather results
    are disjoint after masking non-selected lanes to 0 — OR-combine
    them and unpack ONCE instead of per stripe, applying the plain
    (unmasked) horizontal weights to the combined payload.
    Bit-identical to the per-stripe form (the zeroed terms are exact in
    f32) with ~2/3 of the unpack and weight-mask VPU ops removed from
    the candidate loop. On-chip (scripts/kexp_offsets.py, b=8,
    back-to-back interleaved runs): 545-547 vs 550-561 µs/frame at
    720p, 1173 vs 1183 at 1080p — a small consistent win; UNROLL_QUAD
    re-swept under fold (2→545, 3→578), 2 stays. A first measurement
    taken right after an unrelated chip run read 784 — re-measure
    interleaved before trusting any single probe.

    ``fold_select`` / ``tent_wv`` are kexp_offsets probe variants of the
    folded loop's VPU op mix (not production defaults): a 2-select chain
    instead of 3 where + 2 OR for the stripe combine, and vertical
    weights as the tent max(1 - |rf - d|, 0) (4 ops/candidate instead of
    5; rf = resid + fy rounds, so quantization ties can flip by 1 ulp —
    parity-risky, measure before considering)."""
    y0 = jnp.floor(y)
    x0 = jnp.floor(xpx)
    fy = y - y0
    fx = xpx - x0
    y0i = y0.astype(jnp.int32)
    x0i = (channels * x0 + phase).astype(jnp.int32)

    row_p = (r0p + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, TILE_W), 0))
    resid = y0i - row_p          # vertical candidate residual
    dmin = jnp.min(resid)
    dmax = jnp.max(resid)

    lx0 = x0i - lane_base
    reg0 = lx0 // TILE_W         # stripe of each tap
    loc0 = lx0 - reg0 * TILE_W
    w1 = fx
    w0 = 1.0 - fx
    loc0m = [jnp.where(reg0 == s, loc0, 0) for s in range(N_STRIPES)]
    if packed and stripe_fold:
        eqs = [reg0 == s for s in range(N_STRIPES)]
    elif packed:
        w0m = [jnp.where(reg0 == s, w0, 0.0) for s in range(N_STRIPES)]
        w1m = [jnp.where(reg0 == s, w1, 0.0) for s in range(N_STRIPES)]
    else:
        w0m = [jnp.where(reg0 == s, w0, 0.0) for s in range(N_STRIPES)]
        lx1 = lx0 + channels     # x1 tap: +C lanes
        reg1 = lx1 // TILE_W
        loc1 = lx1 - reg1 * TILE_W
        loc1m = [jnp.where(reg1 == s, loc1, 0) for s in range(N_STRIPES)]
        w1m = [jnp.where(reg1 == s, w1, 0.0) for s in range(N_STRIPES)]

    def contribution(d):
        # One candidate row's masked bilinear contribution — pure
        # values, no ref writes, so instances pipeline. wv uses the
        # TRUE candidate index (zero when out of range); only the
        # slice start is clamped in-bounds.
        wv = (jnp.where(resid == d, 1.0 - fy, 0.0)
              + jnp.where(resid + 1 == d, fy, 0.0))
        ds_ = jnp.minimum(d, dmax + 1)
        hv = None
        for s in range(N_STRIPES):
            seg = stripes[s][0, pl.ds(r0p + ds_, tile_h), :]
            g0 = jnp.take_along_axis(seg, loc0m[s], axis=1)
            g1 = jnp.take_along_axis(seg, loc1m[s], axis=1)
            t = w0m[s] * g0 + w1m[s] * g1
            hv = t if hv is None else hv + t
        return wv * hv

    if tent_wv:
        rf = resid.astype(jnp.float32) + fy    # rounds; ties can flip

    def contribution_quad(dp):
        # One candidate PAIR (source rows dp, dp+1) from the quad-packed
        # stripes: one gather per stripe yields all four taps. Weights
        # use the TRUE row indices (zero when out of range); only the
        # slice start is clamped in-bounds.
        if tent_wv:
            dpf = jnp.float32(0) + dp          # scalar i32 -> f32
            wv_a = jnp.maximum(1.0 - jnp.abs(rf - dpf), 0.0)
            wv_b = jnp.maximum(1.0 - jnp.abs(rf - (dpf + 1.0)), 0.0)
        else:
            wv_a = (jnp.where(resid == dp, 1.0 - fy, 0.0)
                    + jnp.where(resid + 1 == dp, fy, 0.0))
            wv_b = (jnp.where(resid == dp + 1, 1.0 - fy, 0.0)
                    + jnp.where(resid + 1 == dp + 1, fy, 0.0))
        ds_ = jnp.minimum(dp, dmax + 1)
        if stripe_fold and fold_select:
            # 2-select chain: each lane owned by exactly one stripe.
            gs = [jnp.take_along_axis(
                      stripes[s][0, pl.ds(r0p + ds_, tile_h), :],
                      loc0m[s], axis=1) for s in range(N_STRIPES)]
            g = jnp.where(eqs[0], gs[0],
                          jnp.where(eqs[1], gs[1], gs[2]))
        elif stripe_fold:
            # Disjoint after masking (one stripe owns each lane): OR-
            # combine the gathers and unpack ONCE; plain weights apply.
            g = None
            for s in range(N_STRIPES):
                seg = stripes[s][0, pl.ds(r0p + ds_, tile_h), :]
                gs = jnp.where(eqs[s],
                               jnp.take_along_axis(seg, loc0m[s], axis=1),
                               0)
                g = gs if g is None else g | gs
        if stripe_fold:
            b3 = jax.lax.shift_right_logical(g, 24).astype(jnp.float32)
            b2 = jnp.bitwise_and(jax.lax.shift_right_logical(g, 16),
                                 0xFF).astype(jnp.float32)
            b1 = jnp.bitwise_and(jax.lax.shift_right_logical(g, 8),
                                 0xFF).astype(jnp.float32)
            b0 = jnp.bitwise_and(g, 0xFF).astype(jnp.float32)
            hv_a = w0 * b3 + w1 * b2
            hv_b = w0 * b1 + w1 * b0
            return wv_a * hv_a + wv_b * hv_b
        hv_a = None
        hv_b = None
        for s in range(N_STRIPES):
            seg = stripes[s][0, pl.ds(r0p + ds_, tile_h), :]
            g = jnp.take_along_axis(seg, loc0m[s], axis=1)
            b3 = jax.lax.shift_right_logical(g, 24).astype(jnp.float32)
            b2 = jnp.bitwise_and(jax.lax.shift_right_logical(g, 16),
                                 0xFF).astype(jnp.float32)
            b1 = jnp.bitwise_and(jax.lax.shift_right_logical(g, 8),
                                 0xFF).astype(jnp.float32)
            b0 = jnp.bitwise_and(g, 0xFF).astype(jnp.float32)
            ta = w0m[s] * b3 + w1m[s] * b2
            tb = w0m[s] * b1 + w1m[s] * b0
            hv_a = ta if hv_a is None else hv_a + ta
            hv_b = tb if hv_b is None else hv_b + tb
        return wv_a * hv_a + wv_b * hv_b

    n_cand = dmax + 2 - dmin     # candidates dmin .. dmax+1 inclusive
    step = 2 if packed else 1
    contrib = contribution_quad if packed else contribution
    n_steps = (n_cand + step - 1) // step

    def macro(m, acc):
        d0 = dmin + m * (unroll * step)
        cs = [contrib(d0 + off * step) for off in range(unroll)]
        while len(cs) > 1:       # pairwise tree sum (ILP)
            cs = [cs[i] + cs[i + 1] if i + 1 < len(cs) else cs[i]
                  for i in range(0, len(cs), 2)]
        return acc + cs[0]

    zero = jnp.zeros((tile_h, TILE_W), jnp.float32)
    if not adaptive_tail:
        n_macro = (n_steps + unroll - 1) // unroll
        return jax.lax.fori_loop(0, n_macro, macro, zero)

    # Spread-adaptive schedule: full-ILP macro groups for the part of the
    # candidate range that fills them, then an EXACT-count tail loop of
    # single contributions — the constant-unroll schedule rounds the
    # per-tile candidate count up to a multiple of ``unroll``, wasting up
    # to unroll-1 gather rounds on tiles whose spread isn't a multiple
    # (e.g. 5 candidates cost 8 contributions; here they cost 5, three of
    # them still pairwise-pipelined).
    n_main = n_steps // unroll

    def tail(i, acc):
        return acc + contrib(dmin + (n_main * unroll + i) * step)

    acc = jax.lax.fori_loop(0, n_main, macro, zero)
    return jax.lax.fori_loop(0, n_steps - n_main * unroll, tail, acc)


def _quantize_u8(acc):
    # Quantize and pack to u8 in-register (i32 hop: no direct cast).
    return jnp.clip(jnp.round(acc), 0.0, 255.0
                    ).astype(jnp.int32).astype(jnp.uint8)


def _make_wide_kernel(tile_h: int, channels: int, pad_h: int, n_sub: int,
                      unroll: int, packed: bool = True):
    def kernel(sbase_ref, y_ref, x_ref, *refs):
        stripes = refs[:N_STRIPES]
        out_ref = refs[N_STRIPES]
        rt = pl.program_id(2)
        cb = pl.program_id(1)
        lane_f, phase, px_f = _lane_geometry(cb, tile_h, channels)
        # Stripe base per (batch, column-block, ROW-block): rotation makes
        # dx drift with row (~theta*H px over the frame), so one base per
        # column would overflow the 3-stripe window at 1080p.
        lane_base = sbase_ref[pl.program_id(0), cb, rt] * TILE_W

        # Per-lane pixel index LOCAL to the compact coord block: one
        # aligned 128-px block always covers an out lane-block's pixels
        # (c*128 lanes == 128 px exactly), so coords are fetched compact
        # (1/C the bytes) and expanded by one cheap lane gather.
        pl_idx = (px_f - jnp.float32((cb // channels) * TILE_W)
                  ).astype(jnp.int32)

        for sub in range(n_sub):
            rows = slice(sub * tile_h, (sub + 1) * tile_h)
            y = jnp.take_along_axis(y_ref[0, rows, :], pl_idx, axis=1)
            xpx = jnp.take_along_axis(x_ref[0, rows, :], pl_idx, axis=1)
            r0p = (rt * n_sub + sub) * tile_h + pad_h
            acc = _sub_accumulate(stripes, y, xpx, phase, lane_base, r0p,
                                  tile_h, channels, unroll, packed=packed)
            out_ref[0, rows, :] = _quantize_u8(acc)

    return kernel


def _make_offsets_kernel(tile_h: int, channels: int, pad_h: int, n_sub: int,
                         unroll: int, h: int, w: int, gw: int, scale: float,
                         packed: bool):
    """Kernel body that SYNTHESIZES sampling coordinates in-register from
    the row-upsampled coarse offsets (VERDICT.md round-2 item 1).

    Instead of reading precomputed dense pixel coords, each tile fetches a
    (blk, 128) block of the VERTICALLY-upsampled offset field (lanes =
    coarse columns, edge-padded to 128) and finishes the bilinear upsample
    horizontally itself: the jax.image.resize sample position for output
    pixel px is clamp((px+0.5)*gw/W - 0.5, 0, gw-1) — two lane gathers and
    a lerp per field. The identity-grid term is a per-lane FMA. This kills
    the dense (T, H, W, 2) grid materialization, the coord prep pass, and
    the dense coverage reduction of the grids-based path.

    Semantics match grid_from_offsets + _wide_prep exactly up to f32
    rounding (the dense path evaluates the same clamped-triangle weights
    through a matmul): output res == frame res, align_corners identity,
    border-crop zoom folded via ``scale``, border clamp in pixel space.
    """
    a_x = np.float32(scale)                      # d(x_px)/d(px); W == w
    b_x = np.float32((1.0 - scale) * 0.5 * (w - 1))
    a_y = np.float32(scale)
    b_y = np.float32((1.0 - scale) * 0.5 * (h - 1))
    gx_scale = np.float32(gw / w)

    def kernel(sbase_ref, yoff_ref, xoff_ref, *refs):
        stripes = refs[:N_STRIPES]
        out_ref = refs[N_STRIPES]
        rt = pl.program_id(2)
        cb = pl.program_id(1)
        lane_f, phase, px_f = _lane_geometry(cb, tile_h, channels)
        lane_base = sbase_ref[pl.program_id(0), cb, rt] * TILE_W

        # Horizontal resample position into the coarse-column lanes —
        # static per lane, hoisted out of the row loop.
        gx = jnp.clip((px_f + 0.5) * gx_scale - 0.5, 0.0,
                      jnp.float32(gw - 1))
        c0f = jnp.floor(gx)
        fg = gx - c0f
        c0 = c0f.astype(jnp.int32)
        c1 = c0 + 1            # <= gw <= 127: edge-padded lane, weight->0
        x_id = a_x * px_f + b_x

        for sub in range(n_sub):
            rows = slice(sub * tile_h, (sub + 1) * tile_h)
            yo_rows = yoff_ref[0, rows, :]
            xo_rows = xoff_ref[0, rows, :]
            xoff = ((1.0 - fg) * jnp.take_along_axis(xo_rows, c0, axis=1)
                    + fg * jnp.take_along_axis(xo_rows, c1, axis=1))
            yoff = ((1.0 - fg) * jnp.take_along_axis(yo_rows, c0, axis=1)
                    + fg * jnp.take_along_axis(yo_rows, c1, axis=1))
            r0 = (rt * n_sub + sub) * tile_h
            r_f = (jnp.float32(r0)
                   + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                              0).astype(jnp.float32))
            y = jnp.clip(a_y * r_f + b_y + yoff, 0.0,
                         jnp.float32(h - 1)) + pad_h
            xpx = jnp.clip(x_id + xoff, 0.0, jnp.float32(w - 1))
            acc = _sub_accumulate(stripes, y, xpx, phase, lane_base,
                                  r0 + pad_h, tile_h, channels, unroll,
                                  packed=packed)
            out_ref[0, rows, :] = _quantize_u8(acc)

    return kernel


def _pad_rows_to_multiple(arr, mult, axis):
    size = arr.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return arr
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (0, rem)
    return jnp.pad(arr, pads, mode="edge")


def _prep_planes(frames_u8, tile_h, packed=False):
    """Edge-pad a (B, H, W, C) uint8 batch into the (B, Hp, Lp) f32 wide
    plane both kernels gather from. No dx halo is needed: stripe bases are
    anchored at each block's own minimum source lane, and border clamp
    already bounds coords to [0, w-1] — only the +1-neighbor pixel and
    lane alignment need padding, on the right.

    ``packed``: emit the QUAD pack v[y,l]<<24 | v[y,l+C]<<16 |
    v[y+1,l]<<8 | v[y+1,l+C] as int32 (four exact 8-bit payloads) so one
    in-kernel gather yields both horizontal bilinear taps of TWO
    consecutive source rows (see _sub_accumulate). The +C lane shift and
    the +1 row shift are edge-replicated: shifted lanes are only sampled
    at fx == 0, shifted rows only at fy == 0, where the replica is
    exact."""
    b, h, w, c = frames_u8.shape
    pad_h = tile_h
    pad_l = 0
    wmult = TILE_W // math.gcd(TILE_W, c)
    pad_r = (-w) % wmult
    if pad_r < 1:
        pad_r += wmult

    if packed:
        # Pad ONE extra row and pixel so all four taps are SLICES of a
        # single padded array feeding one pack fusion — concat-built
        # shifted copies materialized ~1.3 ms/chunk of layout copies at
        # 720p T=16 (trace-verified; slice form is bit-identical and
        # measured 3.3 vs 4.1 ms standalone).
        hp = _cdiv(h + 2 * pad_h, tile_h) * tile_h
        p = jnp.pad(frames_u8, ((0, 0), (pad_h, hp - h - pad_h + 1),
                                (pad_l, pad_r + 1), (0, 0)), mode="edge")
        wide = p.reshape(b, hp + 1, p.shape[2] * c)       # free view
        quad = (jax.lax.shift_left(wide[:, :-1, :-c].astype(jnp.int32), 24)
                | jax.lax.shift_left(wide[:, :-1, c:].astype(jnp.int32), 16)
                | jax.lax.shift_left(wide[:, 1:, :-c].astype(jnp.int32), 8)
                | wide[:, 1:, c:].astype(jnp.int32))
        return quad, pad_h, pad_l

    planes = jnp.pad(frames_u8, ((0, 0), (pad_h, pad_h), (pad_l, pad_r),
                                 (0, 0)), mode="edge")
    planes = _pad_rows_to_multiple(planes, tile_h, 1)
    hp = planes.shape[1]
    planes = planes.reshape(b, hp, planes.shape[2] * c)   # free view
    # u8 -> f32 OUTSIDE the kernel: elementwise (no transpose!) and XLA-
    # fused; Mosaic's in-kernel u8 unpack is a pathological relayout.
    return planes.astype(jnp.float32), pad_h, pad_l


def _wide_prep(frames_u8, grids, max_dx_px, tile_h, n_sub, packed=True):
    """Layout prep shared by the kernel launch and the coverage predicate.

    Returns (planes, y_wide, x_wide, sbase, ok): the edge-padded
    (B, Hp, Lp) f32 wide plane, pixel-space coords padded to block
    multiples, the per-(batch, lane-block, row-block) first-stripe base,
    and the exact scalar coverage predicate.
    """
    b, h, w, c = frames_u8.shape
    _, ho, wo, _ = grids.shape
    if wo % TILE_W != 0:   # warp_u8_batch pads the grid before calling
        raise ValueError(
            f"_wide_prep needs output W ({wo}) divisible by {TILE_W}")
    del max_dx_px   # wide kernel needs no dx halo (see _prep_planes)
    planes, pad_h, pad_l = _prep_planes(frames_u8, tile_h, packed=packed)
    lp = planes.shape[2]
    n_lb = lp // TILE_W

    # Source coords in padded space, border-clamped like the oracle. x is
    # replicated per-lane in PIXEL units; the kernel reconstructs the
    # source lane as C*floor(x) + lane%C.
    x = (grids[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (w - 1)
    y = (grids[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (h - 1)
    x = jnp.clip(x, 0.0, w - 1) + pad_l
    y = jnp.clip(y, 0.0, h - 1) + pad_h

    blk = tile_h * n_sub
    x = _pad_rows_to_multiple(x, blk, 1)
    y = _pad_rows_to_multiple(y, blk, 1)
    hop = x.shape[1]
    n_cb = (wo * c) // TILE_W

    # Per-(batch, lane-block, ROW-block) coverage: every needed source
    # lane (x0 tap and its +C neighbor) must fall inside the 3-stripe
    # window anchored at that row block's sbase. Per-row-block anchoring
    # matters: rotation drifts dx by ~theta*H px across the frame height,
    # which overflows a single per-column window at 1080p. Bounds come
    # from the compact coords over each out block's (static, slightly
    # overlapping) pixel slice — conservative by <= 1 boundary pixel,
    # which can only widen the window check, so a pass still guarantees
    # the kernel's gathers are in range.
    n_rt = hop // blk
    x0 = jnp.floor(x).astype(jnp.int32).reshape(b, n_rt, blk,
                                                wo // TILE_W, TILE_W)
    mins, maxs = [], []
    for j in range(c):
        lo = (TILE_W * j) // c
        hi = (TILE_W * (j + 1) - 1) // c + 1
        seg = x0[:, :, :, :, lo:hi]
        mins.append(c * jnp.min(seg, axis=(2, 4)))        # + phase >= 0
        maxs.append(c * jnp.max(seg, axis=(2, 4)) + (c - 1))
    # Interleave per-out-block bounds: out block 3k+j <- slice j of k;
    # result axes (b, n_cb, n_rt) to match sref[b, cb, rt].
    lmin = jnp.transpose(jnp.stack(mins, axis=3).reshape(b, n_rt, n_cb),
                         (0, 2, 1))
    lmax = jnp.transpose(jnp.stack(maxs, axis=3).reshape(b, n_rt, n_cb),
                         (0, 2, 1)) + c                    # +C: x1 tap
    sbase = jnp.clip(lmin // TILE_W, 0, n_lb - N_STRIPES)
    ok = jnp.all(lmax - sbase * TILE_W < N_STRIPES * TILE_W)
    return planes, y, x, sbase, ok


def _launch(planes, y_wide, x_wide, sbase, ho, wo, c, tile_h,
            n_sub, interpret, packed=True):
    b, hp, lp = planes.shape
    hop = y_wide.shape[1]
    n_cb = (wo * c) // TILE_W
    blk = tile_h * n_sub
    # Compact (per-pixel) coords: out lane-block cb reads the aligned
    # 128-px coord block cb // C (3*128 lanes == 128 px exactly).
    coord_spec = pl.BlockSpec((1, blk, TILE_W),
                              lambda b_, cb, r, sref, c_=c: (b_, r,
                                                             cb // c_),
                              memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        return pl.BlockSpec(
            (1, hp, TILE_W),
            lambda b_, cb, r, sref, o=offset: (b_, 0,
                                               sref[b_, cb, r] + o),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, blk, TILE_W),
                            lambda b_, cb, r, sref: (b_, r, cb),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_cb, hop // blk),
        in_specs=[coord_spec, coord_spec,
                  *(stripe_spec(o) for o in range(N_STRIPES))],
        out_specs=out_spec)
    out = pl.pallas_call(
        _make_wide_kernel(tile_h, c, tile_h, n_sub,
                          UNROLL_QUAD if packed else UNROLL, packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.uint8),
        interpret=interpret,
    )(sbase, y_wide, x_wide, *([planes] * N_STRIPES))
    return out[:, :ho, :].reshape(b, ho, wo, c)


def _oracle_u8(frames_u8, grids):
    """quantize(warp(normalize(...))) through the lax oracle — the guarded
    fallback branch and the parity fixture for tests. The semantics live
    in warp_ref.warp_quantize_oracle (one home for the rounding rule)."""
    return warp_ref.warp_quantize_oracle(frames_u8, grids)


def _offsets_rows(offsets, h, w, blk):
    """Vertically upsample coarse offsets to per-output-row fields.

    (B, gh, gw, 2) → two (B, hop, 128) f32 arrays in PIXEL units (y then
    x), rows edge-padded to the block multiple and lanes (coarse columns)
    edge-padded to 128 so the kernel's horizontal lerp can read tap c0+1
    at the right edge with weight 0. Uses the SAME resize operator matrix
    as the dense grid_from_offsets path (ops/resize.py), so vertical
    weights are bit-identical between the two paths."""
    from dvsg_tpu.ops import resize as resize_ops
    b, gh, gw, _ = offsets.shape
    r = jnp.asarray(resize_ops._resize_matrix(gh, h))       # (h, gh)
    roff = jnp.einsum("ph,bhwk->bpwk", r, offsets.astype(jnp.float32),
                      precision="highest")   # true-f32 coords on TPU
    yoffr = roff[..., 1] * np.float32(0.5 * (h - 1))
    xoffr = roff[..., 0] * np.float32(0.5 * (w - 1))
    yoffr = _pad_rows_to_multiple(yoffr, blk, 1)
    xoffr = _pad_rows_to_multiple(xoffr, blk, 1)
    lane_pad = ((0, 0), (0, 0), (0, TILE_W - gw))
    return (jnp.pad(yoffr, lane_pad, mode="edge"),
            jnp.pad(xoffr, lane_pad, mode="edge"))


def _offsets_bounds(offsets, h, w, c, scale, blk, hop, wop, n_lb, xp=jnp):
    """Coverage guard + stripe bases from the COARSE offsets alone.

    The dense x-coordinate field is a bilinear upsample of the (gh, gw)
    control points, so over any output block its value is a convex
    combination of the control points whose support overlaps the block —
    per-block extrema are bounded by the extrema of that (static) control
    sub-rectangle. This replaces the dense ~H*W-element reduction of
    `_wide_prep` with a few dozen reductions over the (gh, gw) field
    (VERDICT.md round-2 items 1/4). Conservative (can only widen the
    window check), so a pass still guarantees in-range kernel gathers;
    the slack is <= the offset field's variation across one pixel-block's
    coarse support, negligible for smooth stabilization warps.

    ``xp`` selects the array backend: jnp on the device path (default);
    `offsets_coverage_ok` passes numpy so pipeline drivers can mirror
    the guard on host without a device round trip — one body, two
    backends, no semantic fork.

    Returns (sbase (B, n_cb, n_rt) i32, ok scalar bool).
    """
    b, gh, gw, _ = offsets.shape
    s = 0.5 * (w - 1)
    xc = offsets[..., 0].astype(xp.float32) * np.float32(s)  # px units
    a_x = scale
    b_x = (1.0 - scale) * 0.5 * (w - 1)
    n_rt = hop // blk
    n_cb = (wop * c) // TILE_W

    def gy_idx(r_):
        return min(max(math.floor((r_ + 0.5) * gh / h - 0.5), 0), gh - 1)

    def gx_idx(p_):
        return min(max(math.floor((p_ + 0.5) * gw / w - 0.5), 0), gw - 1)

    lmin_cols, lmax_cols = [], []
    for rt in range(n_rt):
        r_lo, r_hi = rt * blk, min((rt + 1) * blk - 1, h - 1)
        k_lo = gy_idx(r_lo)
        k_hi = min(gy_idx(r_hi) + 1, gh - 1)
        seg = xc[:, k_lo:k_hi + 1, :]
        rmin = xp.min(seg, axis=1)                 # (b, gw)
        rmax = xp.max(seg, axis=1)
        lmins, lmaxs = [], []
        for cb in range(n_cb):
            p0 = (cb * TILE_W) // c
            p1 = (cb * TILE_W + TILE_W - 1) // c
            c_lo = gx_idx(p0)
            c_hi = min(gx_idx(p1) + 1, gw - 1)
            omin = xp.min(rmin[:, c_lo:c_hi + 1], axis=1)   # (b,)
            omax = xp.max(rmax[:, c_lo:c_hi + 1], axis=1)
            # EPS_PX widens the bound before floor: the kernel evaluates
            # the same coordinate through a different f32 op order (matmul
            # upsample + in-register lerp), so its value can sit a few
            # ULPs past this closed-form bound; without the margin a bound
            # landing just below an integer could under-count the stripe
            # window by one lane while ok stays True. 1e-3 px is orders of
            # magnitude above f32 rounding at any real resolution and only
            # ever WIDENS the window check (conservative direction).
            xmin = xp.clip(a_x * p0 + b_x + omin - _EPS_PX, 0.0, w - 1)
            xmax = xp.clip(a_x * p1 + b_x + omax + _EPS_PX, 0.0, w - 1)
            lmins.append(c * xp.floor(xmin))                # + phase >= 0
            lmaxs.append(c * xp.floor(xmax) + (c - 1) + c)  # +C: x1 tap
        lmin_cols.append(xp.stack(lmins, axis=1))           # (b, n_cb)
        lmax_cols.append(xp.stack(lmaxs, axis=1))
    lmin = xp.stack(lmin_cols, axis=2).astype(xp.int32)    # (b,n_cb,n_rt)
    lmax = xp.stack(lmax_cols, axis=2).astype(xp.int32)
    sbase = xp.clip(lmin // TILE_W, 0, n_lb - N_STRIPES)
    ok = xp.all(lmax - sbase * TILE_W < N_STRIPES * TILE_W)
    return sbase, ok


def offsets_coverage_ok(offsets, h: int, w: int, c: int = 3,
                        border_crop: float = 0.0,
                        tile_h: int = TILE_H) -> bool:
    """Host-side mirror of ``warp_u8_offsets``' runtime coverage guard.

    Pure numpy — no device dispatch (the axon tunnel makes even a scalar
    round trip cost milliseconds), same body as the device predicate
    (`_offsets_bounds` with ``xp=np``), same geometry formulas as the
    kernel launch (pinned by tests/test_warp_wide.py).

    Returns True iff the guard keeps the fused kernel's output for this
    (offsets, geometry); False means the chunk rides the exact lax
    oracle — same pixels, ~40x slower. Pipeline drivers use it to
    SURFACE fallbacks (Stabilizer.coverage_fallbacks, CLI warning);
    the device-side guard stays authoritative for correctness.
    """
    offsets = np.asarray(offsets, np.float32)
    scale = 1.0 - 2.0 * border_crop
    n_sub = pick_n_sub(h, tile_h)
    blk = tile_h * n_sub
    hop = _cdiv(h, blk) * blk
    wop = _cdiv(w, TILE_W) * TILE_W
    # Lane count of the padded wide plane, mirroring _prep_planes: both
    # the packed and unpacked layouts end at (w + pad_r) * c lanes.
    wmult = TILE_W // math.gcd(TILE_W, c)
    pad_r = (-w) % wmult
    if pad_r < 1:
        pad_r += wmult
    n_lb = ((w + pad_r) * c) // TILE_W
    _, ok = _offsets_bounds(offsets, h, w, c, scale, blk, hop, wop, n_lb,
                            xp=np)
    return bool(ok)


def _launch_offsets(planes, yoffr, xoffr, sbase, h, w, wop, c, gw, scale,
                    tile_h, n_sub, pad_h, interpret, packed):
    b, hp, lp = planes.shape
    hop = yoffr.shape[1]
    n_cb = (wop * c) // TILE_W
    blk = tile_h * n_sub
    # Row-upsampled offset block: lanes are coarse columns (one block
    # covers all of them), so the index map depends only on the row block.
    off_spec = pl.BlockSpec((1, blk, TILE_W),
                            lambda b_, cb, r, sref: (b_, r, 0),
                            memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        return pl.BlockSpec(
            (1, hp, TILE_W),
            lambda b_, cb, r, sref, o=offset: (b_, 0,
                                               sref[b_, cb, r] + o),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, blk, TILE_W),
                            lambda b_, cb, r, sref: (b_, r, cb),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_cb, hop // blk),
        in_specs=[off_spec, off_spec,
                  *(stripe_spec(o) for o in range(N_STRIPES))],
        out_specs=out_spec)
    out = pl.pallas_call(
        _make_offsets_kernel(tile_h, c, pad_h, n_sub,
                             UNROLL_QUAD if packed else UNROLL,
                             h, w, gw, scale, packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.uint8),
        interpret=interpret,
    )(sbase, yoffr, xoffr, *([planes] * N_STRIPES))
    return out[:, :h, :].reshape(b, h, wop, c)


@functools.partial(jax.jit, static_argnames=("border_crop", "tile_h",
                                             "interpret", "guarded",
                                             "packed"))
def warp_u8_offsets(frames_u8: jax.Array, offsets: jax.Array,
                    border_crop: float = 0.0,
                    tile_h: int = TILE_H,
                    interpret: bool = False,
                    guarded: bool = True,
                    packed: bool = True) -> jax.Array:
    """Fused upsample+warp+quantize straight from coarse offsets: the
    production inference hot path.

    (B, H, W, C) uint8 frames × (B, gh, gw, 2) normalized offsets →
    (B, H, W, C) uint8, equivalent within 1 LSB to
    quantize(warp_ref(normalize(frames), grid_from_offsets(offsets))) —
    but the dense (B, H, W, 2) grid is NEVER materialized: offsets are
    vertically upsampled by a tiny matmul and the kernel synthesizes each
    tile's sampling coordinates in-register (see _make_offsets_kernel).
    The coverage guard and stripe bases come from the coarse control
    points (_offsets_bounds); ``guarded`` routes violating inputs to the
    lax oracle via lax.cond, whose false branch captures only the tiny
    offset field — wrong pixels are impossible and the dense-grid rebuild
    cost of the grids-based guard is gone.
    """
    b, h, w, c = frames_u8.shape
    gw = offsets.shape[2]
    if gw >= TILE_W:
        raise ValueError(f"coarse grid width {gw} must be < {TILE_W}")
    if not 0.0 <= border_crop < 0.5:
        # crop >= 0.5 flips the identity scale's sign: x would DECREASE
        # with pixel index, inverting the corner-derived per-block
        # bounds below — the guard could report ok on uncovered taps.
        raise ValueError(
            f"border_crop must be in [0, 0.5), got {border_crop}")
    scale = 1.0 - 2.0 * border_crop
    n_sub = pick_n_sub(h, tile_h)
    blk = tile_h * n_sub
    wop = _cdiv(w, TILE_W) * TILE_W
    planes, pad_h, _ = _prep_planes(frames_u8, tile_h, packed=packed)
    yoffr, xoffr = _offsets_rows(offsets, h, w, blk)
    hop = yoffr.shape[1]
    sbase, ok = _offsets_bounds(offsets, h, w, c, scale, blk, hop, wop,
                                planes.shape[2] // TILE_W)
    out = _launch_offsets(planes, yoffr, xoffr, sbase, h, w, wop, c, gw,
                          scale, tile_h, n_sub, pad_h, interpret, packed)
    if wop != w:
        out = out[:, :, :w, :]
    if not guarded:
        return out

    def oracle(fr, offs):
        from dvsg_tpu.ops import grid as grid_ops
        g = jax.vmap(lambda o: grid_ops.grid_from_offsets(
            o, h, w, border_crop=border_crop))(offs)
        return _oracle_u8(fr, g)

    # The kernel always runs; the cond only selects the small u8 outputs
    # (see warp_u8_batch). The false branch captures frames + the tiny
    # offset field only. guard_cond (not a bare lax.cond) so vmapped
    # callers — every multi-clip surface — don't execute the oracle
    # branch per clip (ops/guard.py).
    from dvsg_tpu.ops.guard import guard_cond
    return guard_cond(ok, out, oracle, frames_u8, offsets)


@functools.partial(jax.jit, static_argnames=("max_dx_px", "tile_h",
                                             "interpret", "guarded"))
def warp_u8_batch(frames_u8: jax.Array, grids: jax.Array,
                  max_dx_px: int = 126,
                  tile_h: int = TILE_H,
                  interpret: bool = False,
                  guarded: bool = True) -> jax.Array:
    """Fused warp+quantize: (B, H, W, C) uint8 x (B, Ho, Wo, 2) grids →
    (B, Ho, Wo, C) uint8.

    Equivalent to quantize(bilinear_warp(normalize(frames), grids)) in one
    pass with zero layout changes, any input width, any output
    resolution. ``max_dx_px`` is accepted for API parity with the planar
    kernel but IGNORED: the min-anchored per-(column, row-block) stripe
    bases need no dx halo, and border clamp already bounds coordinates.

    ``guarded`` (default): the per-block stripe-coverage contract is
    checked on device and violating inputs take the exact lax-oracle path
    instead — wrong pixels are impossible, the check is a cheap fused
    reduction, and the fallback branch costs nothing unless taken.
    """
    ho, wo = grids.shape[1], grids.shape[2]
    c = frames_u8.shape[3]
    n_sub = pick_n_sub(ho, tile_h)
    # Arbitrary output width: pad the GRID to the next 128-px multiple
    # with edge-replicated columns (they sample valid coords and are
    # cropped after). The input width is unconstrained either way.
    wop = _cdiv(wo, TILE_W) * TILE_W
    grids_p = grids if wop == wo else jnp.pad(
        grids, ((0, 0), (0, 0), (0, wop - wo), (0, 0)), mode="edge")
    planes, y_wide, x_wide, sbase, ok = _wide_prep(
        frames_u8, grids_p, max_dx_px, tile_h, n_sub)
    out = _launch(planes, y_wide, x_wide, sbase, ho, wop, c,
                  tile_h, n_sub, interpret)
    if wop != wo:
        out = out[:, :, :wo, :]
    if not guarded:
        return out

    # The kernel ALWAYS runs and the cond only selects its (small, uint8)
    # output vs the oracle branch: putting the launch inside the branch
    # made XLA copy the large f32 planes/coords operands into the cond
    # (~180 us/frame measured); selecting outputs costs ~a u8 copy.
    # Callers holding coarse offsets should use warp_u8_offsets instead —
    # its fallback branch captures only the tiny offset field. guard_cond
    # keeps the oracle branch off the path for vmapped callers.
    from dvsg_tpu.ops.guard import guard_cond
    return guard_cond(ok, out, _oracle_u8, frames_u8, grids)
