#!/usr/bin/env python
"""Wide-warp kernel cost attribution: progressively stripped variants.

Times (on the real chip) the wide kernel with pieces removed to locate
the dominant cost: full / no-gather / single-candidate / dma-only.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvsg_tpu.ops import warp_wide, grid as grid_ops   # noqa: E402
from dvsg_tpu.train import synthetic                   # noqa: E402

TILE_W = 128
N_STRIPES = 3


def make_kernel(tile_h, channels, mode):
    def kernel(sbase_ref, y_ref, x_ref, s0, s1, s2, out_ref, acc_ref,
               hval_ref):
        rt = pl.program_id(2)
        stripes = (s0, s1, s2)
        if mode == "dma_only":
            out_ref[0] = y_ref[0]
            return
        y = y_ref[0]
        xpx = x_ref[0]
        y0 = jnp.floor(y)
        x0 = jnp.floor(xpx)
        fy = y - y0
        fx = xpx - x0
        y0i = y0.astype(jnp.int32)
        cb = pl.program_id(1)
        lane_f = (jnp.float32(cb * TILE_W)
                  + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                             1).astype(jnp.float32))
        phase = lane_f - channels * jnp.floor(lane_f * (1.0 / channels))
        x0i = (channels * x0 + phase).astype(jnp.int32)

        r0p = rt * tile_h + tile_h
        row_p = (r0p
                 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0))
        resid = y0i - row_p
        if mode == "one_candidate":
            dmin = jnp.int32(0)
            dmax = jnp.int32(-1)
        else:
            dmin = jnp.min(resid)
            dmax = jnp.max(resid)

        lane_base = sbase_ref[pl.program_id(0), pl.program_id(1)] * TILE_W
        lx0 = x0i - lane_base
        lx1 = lx0 + channels
        reg0 = lx0 // TILE_W
        reg1 = lx1 // TILE_W
        loc0 = lx0 - reg0 * TILE_W
        loc1 = lx1 - reg1 * TILE_W
        w1 = fx
        w0 = 1.0 - fx
        need = [jnp.any((reg0 == s) | (reg1 == s)) for s in range(N_STRIPES)]

        acc_ref[...] = jnp.zeros((tile_h, TILE_W), jnp.float32)

        def candidate(d, _):
            wv = (jnp.where(resid == d, 1.0 - fy, 0.0)
                  + jnp.where(resid + 1 == d, fy, 0.0))
            hval_ref[...] = jnp.zeros((tile_h, TILE_W), jnp.float32)
            for s in range(N_STRIPES):
                @pl.when(need[s])
                def _(s=s):
                    seg = stripes[s][0, pl.ds(r0p + d, tile_h), :]
                    if mode == "no_gather":
                        g0 = seg
                        g1 = seg
                    else:
                        g0 = jnp.take_along_axis(
                            seg, jnp.where(reg0 == s, loc0, 0), axis=1)
                        g1 = jnp.take_along_axis(
                            seg, jnp.where(reg1 == s, loc1, 0), axis=1)
                    hval_ref[...] += (jnp.where(reg0 == s, w0 * g0, 0.0)
                                      + jnp.where(reg1 == s, w1 * g1, 0.0))
            acc_ref[...] += wv * hval_ref[...]
            return 0

        jax.lax.fori_loop(dmin, dmax + 2, candidate, 0)
        out_ref[0] = jnp.clip(jnp.round(acc_ref[...]), 0.0, 255.0)

    return kernel


def make_kernel_v2(tile_h, channels, mode, n_stripes=N_STRIPES):
    """x1 tap comes from a pre-shifted plane at the SAME index/stripe as
    the x0 tap: one index vector, one stripe predicate, hoisted masks."""

    def kernel(sbase_ref, y_ref, x_ref, *refs):
        stripes = refs[:n_stripes]
        shifted = refs[n_stripes:2 * n_stripes]
        out_ref, acc_ref = refs[2 * n_stripes:]
        rt = pl.program_id(2)
        y = y_ref[0]
        xpx = x_ref[0]
        y0 = jnp.floor(y)
        x0 = jnp.floor(xpx)
        fy = y - y0
        fx = xpx - x0
        y0i = y0.astype(jnp.int32)
        cb = pl.program_id(1)
        lane_f = (jnp.float32(cb * TILE_W)
                  + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                             1).astype(jnp.float32))
        phase = lane_f - channels * jnp.floor(lane_f * (1.0 / channels))
        x0i = (channels * x0 + phase).astype(jnp.int32)

        r0p = rt * tile_h + tile_h
        row_p = (r0p
                 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0))
        resid = y0i - row_p
        dmin = jnp.min(resid)
        dmax = jnp.max(resid)

        lane_base = sbase_ref[pl.program_id(0), pl.program_id(1)] * TILE_W
        lx0 = x0i - lane_base
        reg0 = lx0 // TILE_W
        loc0 = lx0 - reg0 * TILE_W
        w1 = fx
        w0 = 1.0 - fx
        # Hoisted per-stripe state: index, membership mask, any-hit flag.
        locm = [jnp.where(reg0 == s, loc0, 0) for s in range(n_stripes)]
        w0m = [jnp.where(reg0 == s, w0, 0.0) for s in range(n_stripes)]
        w1m = [jnp.where(reg0 == s, w1, 0.0) for s in range(n_stripes)]
        need = [jnp.any(reg0 == s) for s in range(n_stripes)]

        acc_ref[...] = jnp.zeros((tile_h, TILE_W), jnp.float32)

        def candidate(d, _):
            wv = (jnp.where(resid == d, 1.0 - fy, 0.0)
                  + jnp.where(resid + 1 == d, fy, 0.0))
            for s in range(n_stripes):
                @pl.when(need[s])
                def _(s=s):
                    seg = stripes[s][0, pl.ds(r0p + d, tile_h), :]
                    sh = shifted[s][0, pl.ds(r0p + d, tile_h), :]
                    g0 = jnp.take_along_axis(seg, locm[s], axis=1)
                    if "1gather" in mode:
                        g1 = g0
                    elif "0gather" in mode:
                        g0 = seg
                        g1 = sh
                    else:
                        g1 = jnp.take_along_axis(sh, locm[s], axis=1)
                    acc_ref[...] += wv * (w0m[s] * g0 + w1m[s] * g1)
            return 0

        if mode.startswith("v2_unroll"):
            n_unroll = int(mode.split("unroll")[1])
            # Static unroll over dmin..dmin+n_unroll-1 (timing probe: wrong
            # when the spread exceeds n_unroll; masks cover the rest).
            for off in range(n_unroll):
                candidate(jnp.minimum(dmin + off, dmax + 1), 0)
        else:
            jax.lax.fori_loop(dmin, dmax + 2, candidate, 0)
        out_ref[0] = jnp.clip(jnp.round(acc_ref[...]), 0.0, 255.0)

    return kernel


def launch_v2(planes, planes_sh, y_wide, x_wide, sbase, tile_h, mode,
              n_stripes=N_STRIPES):
    b, hp, lp = planes.shape
    hop = y_wide.shape[1]
    n_cb = y_wide.shape[2] // TILE_W
    coord_spec = pl.BlockSpec((1, tile_h, TILE_W),
                              lambda b_, cb, r, sref: (b_, r, cb),
                              memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        return pl.BlockSpec(
            (1, hp, TILE_W),
            lambda b_, cb, r, sref, o=offset: (b_, 0, sref[b_, cb] + o),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, tile_h, TILE_W),
                            lambda b_, cb, r, sref: (b_, r, cb),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_cb, hop // tile_h),
        in_specs=[coord_spec, coord_spec,
                  *(stripe_spec(o) for o in range(n_stripes)),
                  *(stripe_spec(o) for o in range(n_stripes))],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((tile_h, TILE_W), jnp.float32)])
    return pl.pallas_call(
        make_kernel_v2(tile_h, 3, mode, n_stripes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.float32),
    )(sbase, y_wide, x_wide, *([planes] * n_stripes),
      *([planes_sh] * n_stripes))


def make_kernel_v5(tile_h, channels, mode, pad_h=32, unroll=4):
    """Latency-oriented: register-carried accumulator (no scratch RMW),
    macro-unrolled candidate loop with independent gathers for ILP, no
    stripe predication (marginal overlapped gathers are ~free)."""

    def kernel(sbase_ref, y_ref, x_ref, *refs):
        stripes = refs[:N_STRIPES]
        shifted = refs[N_STRIPES:2 * N_STRIPES]
        out_ref = refs[2 * N_STRIPES]
        rt = pl.program_id(2)
        cb = pl.program_id(1)
        y = y_ref[0]
        xpx = x_ref[0]
        y0 = jnp.floor(y)
        x0 = jnp.floor(xpx)
        fy = y - y0
        fx = xpx - x0
        y0i = y0.astype(jnp.int32)
        lane_f = (jnp.float32(cb * TILE_W)
                  + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                             1).astype(jnp.float32))
        phase = lane_f - channels * jnp.floor(lane_f * (1.0 / channels))
        x0i = (channels * x0 + phase).astype(jnp.int32)

        r0p = rt * tile_h + pad_h
        row_p = (r0p
                 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0))
        resid = y0i - row_p
        dmin = jnp.min(resid)
        dmax = jnp.max(resid)

        lane_base = sbase_ref[pl.program_id(0), cb] * TILE_W
        lx0 = x0i - lane_base
        reg0 = lx0 // TILE_W
        loc0 = lx0 - reg0 * TILE_W
        w1 = fx
        w0 = 1.0 - fx
        locm = [jnp.where(reg0 == s, loc0, 0) for s in range(N_STRIPES)]
        w0m = [jnp.where(reg0 == s, w0, 0.0) for s in range(N_STRIPES)]
        w1m = [jnp.where(reg0 == s, w1, 0.0) for s in range(N_STRIPES)]

        def contribution(d):
            # One candidate's masked bilinear contribution — pure values,
            # no ref writes: independent instances overlap in the pipeline.
            # wv uses the TRUE candidate index (zero when out of range);
            # only the slice start is clamped in-bounds.
            wv = (jnp.where(resid == d, 1.0 - fy, 0.0)
                  + jnp.where(resid + 1 == d, fy, 0.0))
            ds_ = jnp.minimum(d, dmax + 1)
            hv = None
            for s in range(N_STRIPES):
                seg = stripes[s][0, pl.ds(r0p + ds_, tile_h), :]
                sh = shifted[s][0, pl.ds(r0p + ds_, tile_h), :]
                g0 = jnp.take_along_axis(seg, locm[s], axis=1)
                g1 = jnp.take_along_axis(sh, locm[s], axis=1)
                t = w0m[s] * g0 + w1m[s] * g1
                hv = t if hv is None else hv + t
            return wv * hv

        n_macro = (dmax + 2 - dmin + unroll - 1) // unroll

        def macro(m, acc):
            d0 = dmin + m * unroll
            cs = [contribution(d0 + off) for off in range(unroll)]
            while len(cs) > 1:  # pairwise tree sum
                cs = [cs[i] + cs[i + 1] if i + 1 < len(cs) else cs[i]
                      for i in range(0, len(cs), 2)]
            return acc + cs[0]

        acc = jax.lax.fori_loop(
            0, n_macro, macro, jnp.zeros((tile_h, TILE_W), jnp.float32))
        out_ref[0] = jnp.clip(jnp.round(acc), 0.0, 255.0)

    return kernel


def launch_v5(planes, planes_sh, y_wide, x_wide, sbase, tile_h, mode):
    b, hp, lp = planes.shape
    hop = y_wide.shape[1]
    n_cb = y_wide.shape[2] // TILE_W
    coord_spec = pl.BlockSpec((1, tile_h, TILE_W),
                              lambda b_, cb, r, sref: (b_, r, cb),
                              memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        return pl.BlockSpec(
            (1, hp, TILE_W),
            lambda b_, cb, r, sref, o=offset: (b_, 0, sref[b_, cb] + o),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, tile_h, TILE_W),
                            lambda b_, cb, r, sref: (b_, r, cb),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_cb, hop // tile_h),
        in_specs=[coord_spec, coord_spec,
                  *(stripe_spec(o) for o in range(N_STRIPES)),
                  *(stripe_spec(o) for o in range(N_STRIPES))],
        out_specs=out_spec)
    return pl.pallas_call(
        make_kernel_v5(tile_h, 3, mode, unroll=(2 if "_u2" in mode else
                                                6 if "_u6" in mode else 4)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.float32),
    )(sbase, y_wide, x_wide, *([planes] * N_STRIPES),
      *([planes_sh] * N_STRIPES))




def make_kernel_v6(tile_h, channels, pad_h=32, unroll=4, n_sub=4):
    """v5 register/ILP body, n_sub row-subtiles per grid step."""

    def kernel(sbase_ref, y_ref, x_ref, *refs):
        stripes = refs[:N_STRIPES]
        shifted = refs[N_STRIPES:2 * N_STRIPES]
        out_ref = refs[2 * N_STRIPES]
        rt = pl.program_id(2)
        cb = pl.program_id(1)
        lane_f = (jnp.float32(cb * TILE_W)
                  + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                             1).astype(jnp.float32))
        phase = lane_f - channels * jnp.floor(lane_f * (1.0 / channels))
        lane_base = sbase_ref[pl.program_id(0), cb] * TILE_W

        for sub in range(n_sub):
            rows = slice(sub * tile_h, (sub + 1) * tile_h)
            y = y_ref[0, rows, :]
            xpx = x_ref[0, rows, :]
            y0 = jnp.floor(y)
            x0 = jnp.floor(xpx)
            fy = y - y0
            fx = xpx - x0
            y0i = y0.astype(jnp.int32)
            x0i = (channels * x0 + phase).astype(jnp.int32)

            r0p = (rt * n_sub + sub) * tile_h + pad_h
            row_p = (r0p + jax.lax.broadcasted_iota(
                jnp.int32, (tile_h, TILE_W), 0))
            resid = y0i - row_p
            dmin = jnp.min(resid)
            dmax = jnp.max(resid)

            lx0 = x0i - lane_base
            reg0 = lx0 // TILE_W
            loc0 = lx0 - reg0 * TILE_W
            w1 = fx
            w0 = 1.0 - fx
            locm = [jnp.where(reg0 == s, loc0, 0) for s in range(N_STRIPES)]
            w0m = [jnp.where(reg0 == s, w0, 0.0) for s in range(N_STRIPES)]
            w1m = [jnp.where(reg0 == s, w1, 0.0) for s in range(N_STRIPES)]

            need = [jnp.any(reg0 == s) for s in range(N_STRIPES)]

            def contribution(d, dmax=dmax, locm=locm, w0m=w0m, w1m=w1m,
                             resid=resid, fy=fy, r0p=r0p, need=need):
                wv = (jnp.where(resid == d, 1.0 - fy, 0.0)
                      + jnp.where(resid + 1 == d, fy, 0.0))
                ds_ = jnp.minimum(d, dmax + 1)
                hv = None
                for s in range(N_STRIPES):
                    def hit(s=s):
                        seg = stripes[s][0, pl.ds(r0p + ds_, tile_h), :]
                        sh = shifted[s][0, pl.ds(r0p + ds_, tile_h), :]
                        g0 = jnp.take_along_axis(seg, locm[s], axis=1)
                        g1 = jnp.take_along_axis(sh, locm[s], axis=1)
                        return w0m[s] * g0 + w1m[s] * g1
                    t = jax.lax.cond(
                        need[s], hit,
                        lambda: jnp.zeros((tile_h, TILE_W), jnp.float32))
                    hv = t if hv is None else hv + t
                return wv * hv

            n_macro = (dmax + 2 - dmin + unroll - 1) // unroll

            def macro(m, acc, dmin=dmin, contribution=contribution):
                d0 = dmin + m * unroll
                cs = [contribution(d0 + off) for off in range(unroll)]
                while len(cs) > 1:
                    cs = [cs[i] + cs[i + 1] if i + 1 < len(cs) else cs[i]
                          for i in range(0, len(cs), 2)]
                return acc + cs[0]

            acc = jax.lax.fori_loop(
                0, n_macro, macro, jnp.zeros((tile_h, TILE_W), jnp.float32))
            out_ref[0, rows, :] = jnp.clip(jnp.round(acc), 0.0, 255.0)

    return kernel


def launch_v6(planes, planes_sh, y_wide, x_wide, sbase, tile_h, n_sub):
    b, hp, lp = planes.shape
    hop = y_wide.shape[1]
    n_cb = y_wide.shape[2] // TILE_W
    blk = tile_h * n_sub
    coord_spec = pl.BlockSpec((1, blk, TILE_W),
                              lambda b_, cb, r, sref: (b_, r, cb),
                              memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        return pl.BlockSpec(
            (1, hp, TILE_W),
            lambda b_, cb, r, sref, o=offset: (b_, 0, sref[b_, cb] + o),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, blk, TILE_W),
                            lambda b_, cb, r, sref: (b_, r, cb),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_cb, hop // blk),
        in_specs=[coord_spec, coord_spec,
                  *(stripe_spec(o) for o in range(N_STRIPES)),
                  *(stripe_spec(o) for o in range(N_STRIPES))],
        out_specs=out_spec)
    return pl.pallas_call(
        make_kernel_v6(tile_h, 3, n_sub=n_sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.float32),
    )(sbase, y_wide, x_wide, *([planes] * N_STRIPES),
      *([planes_sh] * N_STRIPES))




def make_kernel_v9(tile_h, channels, pad_h=32, unroll=4, n_sub=8):
    """Pair-interleaved stripes: rows 2k/2k+1 hold plane[k]/plane_shifted[k],
    so BOTH bilinear x-taps come from ONE gather per candidate-stripe at
    the same index; an MXU pairing matmul sums the pairs at the end."""

    def kernel(sbase_ref, y_ref, x_ref, *refs):
        stripes = refs[:N_STRIPES]
        out_ref = refs[N_STRIPES]
        rt = pl.program_id(2)
        cb = pl.program_id(1)
        lane_f = (jnp.float32(cb * TILE_W)
                  + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                             1).astype(jnp.float32))
        phase = lane_f - channels * jnp.floor(lane_f * (1.0 / channels))
        lane_base = sbase_ref[pl.program_id(0), cb] * TILE_W
        pl_idx = (((lane_f - phase) * (1.0 / channels))
                  - jnp.float32((cb // channels) * TILE_W)
                  ).astype(jnp.int32)
        # Pairing matrix: out[r] = acc2[2r] + acc2[2r+1] on the MXU.
        rr = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 2 * tile_h), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 2 * tile_h), 1)
        pair = jnp.where(jj // 2 == rr, 1.0, 0.0)

        for sub in range(n_sub):
            rows = slice(sub * tile_h, (sub + 1) * tile_h)
            y = jnp.take_along_axis(y_ref[0, rows, :], pl_idx, axis=1)
            xpx = jnp.take_along_axis(x_ref[0, rows, :], pl_idx, axis=1)
            y0 = jnp.floor(y)
            x0 = jnp.floor(xpx)
            fy = y - y0
            fx = xpx - x0
            y0i = y0.astype(jnp.int32)
            x0i = (channels * x0 + phase).astype(jnp.int32)

            r0p = (rt * n_sub + sub) * tile_h + pad_h
            row_p = (r0p + jax.lax.broadcasted_iota(
                jnp.int32, (tile_h, TILE_W), 0))
            resid = y0i - row_p
            dmin = jnp.min(resid)
            dmax = jnp.max(resid)

            lx0 = x0i - lane_base
            reg0 = lx0 // TILE_W
            loc0 = lx0 - reg0 * TILE_W
            # Pair-space (2*tile_h, 128) hoisted state: indices duplicate
            # per pair; weights interleave w0 (even) / w1 (odd).
            even = (jax.lax.broadcasted_iota(
                jnp.int32, (2 * tile_h, TILE_W), 0) % 2) == 0
            loc2 = [pltpu.repeat(jnp.where(reg0 == s, loc0, 0), 2, axis=0)
                    for s in range(N_STRIPES)]
            w2 = []
            for s in range(N_STRIPES):
                m0 = jnp.where(reg0 == s, 1.0 - fx, 0.0)
                m1 = jnp.where(reg0 == s, fx, 0.0)
                w2.append(jnp.where(even, pltpu.repeat(m0, 2, axis=0),
                                    pltpu.repeat(m1, 2, axis=0)))
            resid2 = pltpu.repeat(resid, 2, axis=0)
            fy2 = pltpu.repeat(fy, 2, axis=0)

            def contribution(d, dmax=dmax, loc2=loc2, w2=w2,
                             resid2=resid2, fy2=fy2, r0p=r0p):
                wv2 = (jnp.where(resid2 == d, 1.0 - fy2, 0.0)
                       + jnp.where(resid2 + 1 == d, fy2, 0.0))
                ds_ = jnp.minimum(d, dmax + 1)
                hv = None
                for s in range(N_STRIPES):
                    seg2 = stripes[s][0, pl.ds(2 * (r0p + ds_),
                                               2 * tile_h), :]
                    g = jnp.take_along_axis(seg2, loc2[s], axis=1)
                    t = w2[s] * g
                    hv = t if hv is None else hv + t
                return wv2 * hv

            n_macro = (dmax + 2 - dmin + unroll - 1) // unroll

            def macro(m, acc, dmin=dmin, contribution=contribution):
                d0 = dmin + m * unroll
                cs = [contribution(d0 + off) for off in range(unroll)]
                while len(cs) > 1:
                    cs = [cs[i] + cs[i + 1] if i + 1 < len(cs) else cs[i]
                          for i in range(0, len(cs), 2)]
                return acc + cs[0]

            acc2 = jax.lax.fori_loop(
                0, n_macro, macro,
                jnp.zeros((2 * tile_h, TILE_W), jnp.float32))
            acc = jax.lax.dot_general(
                pair, acc2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, rows, :] = jnp.clip(jnp.round(acc), 0.0, 255.0
                                           ).astype(jnp.int32
                                                    ).astype(jnp.uint8)

    return kernel


def launch_v9(planes_int, y_c, x_c, sbase, ho, wo, c, tile_h, n_sub):
    b, hp2, lp = planes_int.shape
    hop = y_c.shape[1]
    n_cb = (wo * c) // TILE_W
    blk = tile_h * n_sub
    coord_spec = pl.BlockSpec((1, blk, TILE_W),
                              lambda b_, cb, r, sref, c_=c: (b_, r,
                                                             cb // c_),
                              memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        return pl.BlockSpec(
            (1, hp2, TILE_W),
            lambda b_, cb, r, sref, o=offset: (b_, 0, sref[b_, cb] + o),
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
        make_kernel_v9(tile_h, c, n_sub=n_sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.uint8),
    )(sbase, y_c, x_c, *([planes_int] * N_STRIPES))
    return out[:, :ho, :].reshape(b, ho, wo, c)


def make_kernel_v3(tile_h, channels, n_sub):
    """v2 plus: one grid step covers n_sub row-subtiles of tile_h rows —
    same inner loop structure, 1/n_sub the grid steps."""

    def kernel(sbase_ref, y_ref, x_ref, s0, s1, s2, t0, t1, t2, out_ref,
               acc_ref):
        rt = pl.program_id(2)
        stripes = (s0, s1, s2)
        shifted = (t0, t1, t2)
        cb = pl.program_id(1)
        lane_f = (jnp.float32(cb * TILE_W)
                  + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                             1).astype(jnp.float32))
        phase = lane_f - channels * jnp.floor(lane_f * (1.0 / channels))
        lane_base = sbase_ref[pl.program_id(0), pl.program_id(1)] * TILE_W

        for sub in range(n_sub):
            rows = slice(sub * tile_h, (sub + 1) * tile_h)
            y = y_ref[0, rows, :]
            xpx = x_ref[0, rows, :]
            y0 = jnp.floor(y)
            x0 = jnp.floor(xpx)
            fy = y - y0
            fx = xpx - x0
            y0i = y0.astype(jnp.int32)
            x0i = (channels * x0 + phase).astype(jnp.int32)

            r0p = (rt * n_sub + sub) * tile_h + tile_h
            row_p = (r0p + jax.lax.broadcasted_iota(
                jnp.int32, (tile_h, TILE_W), 0))
            resid = y0i - row_p
            dmin = jnp.min(resid)
            dmax = jnp.max(resid)

            lx0 = x0i - lane_base
            reg0 = lx0 // TILE_W
            loc0 = lx0 - reg0 * TILE_W
            w1 = fx
            w0 = 1.0 - fx
            locm = [jnp.where(reg0 == s, loc0, 0) for s in range(N_STRIPES)]
            w0m = [jnp.where(reg0 == s, w0, 0.0) for s in range(N_STRIPES)]
            w1m = [jnp.where(reg0 == s, w1, 0.0) for s in range(N_STRIPES)]
            need = [jnp.any(reg0 == s) for s in range(N_STRIPES)]

            acc_ref[...] = jnp.zeros((tile_h, TILE_W), jnp.float32)

            def candidate(d, _, locm=locm, w0m=w0m, w1m=w1m, need=need,
                          resid=resid, fy=fy, r0p=r0p):
                wv = (jnp.where(resid == d, 1.0 - fy, 0.0)
                      + jnp.where(resid + 1 == d, fy, 0.0))
                for s in range(N_STRIPES):
                    @pl.when(need[s])
                    def _(s=s):
                        seg = stripes[s][0, pl.ds(r0p + d, tile_h), :]
                        sh = shifted[s][0, pl.ds(r0p + d, tile_h), :]
                        g0 = jnp.take_along_axis(seg, locm[s], axis=1)
                        g1 = jnp.take_along_axis(sh, locm[s], axis=1)
                        acc_ref[...] += wv * (w0m[s] * g0 + w1m[s] * g1)
                return 0

            jax.lax.fori_loop(dmin, dmax + 2, candidate, 0)
            out_ref[0, rows, :] = jnp.clip(jnp.round(acc_ref[...]),
                                           0.0, 255.0)

    return kernel


def launch_v3(planes, planes_sh, y_wide, x_wide, sbase, tile_h, n_sub):
    b, hp, lp = planes.shape
    hop = y_wide.shape[1]
    n_cb = y_wide.shape[2] // TILE_W
    blk_h = tile_h * n_sub
    coord_spec = pl.BlockSpec((1, blk_h, TILE_W),
                              lambda b_, cb, r, sref: (b_, r, cb),
                              memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        return pl.BlockSpec(
            (1, hp, TILE_W),
            lambda b_, cb, r, sref, o=offset: (b_, 0, sref[b_, cb] + o),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, blk_h, TILE_W),
                            lambda b_, cb, r, sref: (b_, r, cb),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_cb, hop // blk_h),
        in_specs=[coord_spec, coord_spec,
                  *(stripe_spec(o) for o in range(N_STRIPES)),
                  *(stripe_spec(o) for o in range(N_STRIPES))],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((tile_h, TILE_W), jnp.float32)])
    return pl.pallas_call(
        make_kernel_v3(tile_h, 3, n_sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.float32),
    )(sbase, y_wide, x_wide, *([planes] * N_STRIPES),
      *([planes_sh] * N_STRIPES))


def launch(planes, y_wide, x_wide, sbase, tile_h, mode):
    b, hp, lp = planes.shape
    hop = y_wide.shape[1]
    n_cb = y_wide.shape[2] // TILE_W
    coord_spec = pl.BlockSpec((1, tile_h, TILE_W),
                              lambda b_, cb, r, sref: (b_, r, cb),
                              memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        return pl.BlockSpec(
            (1, hp, TILE_W),
            lambda b_, cb, r, sref, o=offset: (b_, 0, sref[b_, cb] + o),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, tile_h, TILE_W),
                            lambda b_, cb, r, sref: (b_, r, cb),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_cb, hop // tile_h),
        in_specs=[coord_spec, coord_spec,
                  *(stripe_spec(o) for o in range(N_STRIPES))],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((tile_h, TILE_W), jnp.float32),
                        pltpu.VMEM((tile_h, TILE_W), jnp.float32)])
    return pl.pallas_call(
        make_kernel(tile_h, 3, mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.float32),
    )(sbase, y_wide, x_wide, *([planes] * N_STRIPES))


def main():
    b, h, w, c = 4, 720, 1280, 3
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, c), dtype=np.uint8))
    path = synthetic.random_camera_path(jax.random.key(0), b,
                                        max_trans=0.15, max_angle=0.05)
    grids = jax.vmap(lambda p: grid_ops.affine_grid(
        synthetic.jitter_theta(p), h, w))(path)

    prep = jax.jit(functools.partial(warp_wide._wide_prep, max_dx_px=97,
                                     tile_h=32))
    planes, yw, xw, sbase, ok = prep(frames, grids)
    planes, yw, xw, sbase = map(jax.block_until_ready,
                                (planes, yw, xw, sbase))

    def fetch(x):
        return float(jnp.sum(x.reshape(-1)[::4097]))

    planes_sh = jnp.concatenate(
        [planes[:, :, 3:], planes[:, :, -3:]], axis=2)
    planes_sh = jax.block_until_ready(planes_sh)

    ref = None
    for mode in (sys.argv[1:] or ["full", "v2", "v3_s2", "v3_s4"]):
        if mode.startswith("v6"):
            n_sub = int(mode.split("_s")[1]) if "_s" in mode else 4
            blk = 32 * n_sub
            pad = (-yw.shape[1]) % blk
            ywp = jnp.pad(yw, ((0, 0), (0, pad), (0, 0)), mode="edge")
            xwp = jnp.pad(xw, ((0, 0), (0, pad), (0, 0)), mode="edge")
            ywp, xwp = map(jax.block_until_ready, (ywp, xwp))
            fn = jax.jit(functools.partial(launch_v6, tile_h=32,
                                           n_sub=n_sub))
            args = (planes, planes_sh, ywp, xwp, sbase)
        elif mode.startswith("v5"):
            th = int(mode.split("_t")[1].split("_")[0]) if "_t" in mode else 32
            pad = (-yw.shape[1]) % th
            ywp = jnp.pad(yw, ((0, 0), (0, pad), (0, 0)), mode="edge")
            xwp = jnp.pad(xw, ((0, 0), (0, pad), (0, 0)), mode="edge")
            ywp, xwp = map(jax.block_until_ready, (ywp, xwp))
            fn = jax.jit(functools.partial(launch_v5, tile_h=th, mode=mode))
            args = (planes, planes_sh, ywp, xwp, sbase)
        elif mode.startswith("v3"):
            n_sub = int(mode.split("_s")[1])
            blk = 32 * n_sub
            pad = (-yw.shape[1]) % blk
            ywp = jnp.pad(yw, ((0, 0), (0, pad), (0, 0)), mode="edge")
            xwp = jnp.pad(xw, ((0, 0), (0, pad), (0, 0)), mode="edge")
            ywp, xwp = map(jax.block_until_ready, (ywp, xwp))
            fn = jax.jit(functools.partial(launch_v3, tile_h=32,
                                           n_sub=n_sub))
            args = (planes, planes_sh, ywp, xwp, sbase)
        elif mode.startswith("v2"):
            th = int(mode.split("_t")[1]) if "_t" in mode else 32
            ns = 2 if "_s2" in mode else 3
            fn = jax.jit(functools.partial(launch_v2, tile_h=th, mode=mode,
                                           n_stripes=ns))
            args = (planes, planes_sh, yw, xw, sbase)
        else:
            fn = jax.jit(functools.partial(launch, tile_h=32, mode=mode))
            args = (planes, yw, xw, sbase)
        o = fn(*args)
        if mode == "full":
            ref = np.asarray(o)
        elif ref is not None and o.shape == ref.shape:
            print(f"  {mode} max|diff| vs full:",
                  np.abs(np.asarray(o) - ref).max(), flush=True)
        fetch(o)
        n = 100
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        fetch(outs[-1])
        dt = (time.perf_counter() - t0) / n
        print(f"{mode:14s}: {dt*1e6/b:8.1f} us/frame", flush=True)


if __name__ == "__main__":
    main()
