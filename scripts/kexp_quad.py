#!/usr/bin/env python
"""Quad-pack experiment: 2-row gathers for the wide-warp candidate loop.

The production kernel's dominant cost is the vertical candidate loop:
one PAIR-PACKED f32 gather per stripe per candidate row (both horizontal
taps of ONE source row ride one f32 lane — 24-bit mantissa holds two
exact 8-bit payloads, ops/warp_wide.py::_sub_accumulate).

An int32 lane holds FOUR exact bytes. Pack both horizontal taps of TWO
consecutive source rows per lane:

    Q[y, l] = v[y, l]<<24 | v[y, l+C]<<16 | v[y+1, l]<<8 | v[y+1, l+C]

and step the candidate loop by 2: one gather per stripe now serves two
candidate rows (unpack = 3 logical shifts + 3 ands + 4 converts, all
cheap VPU ops — scripts/kexp_quadprobe.py verified i32 gathers and the
unpack lower on Mosaic). If the loop is gather-latency-bound, this
halves its cost.

ADOPTED (round-3): measured 580 (unroll 2) vs 704 µs/frame for the f32
pair-pack at 720p b=8 (1080p: 1183 vs 1380); ops/warp_wide.py's packed
path is now this scheme, so this script's "quad vs production" parity
line compares the adopted kernel against itself and stays as the
measurement record.

Usage: python scripts/kexp_quad.py [--h 720] [--w 1280] [--batch 8]
"""
import argparse
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

from dvsg_tpu.ops import warp_wide                     # noqa: E402
from dvsg_tpu.train import synthetic                   # noqa: E402

TILE_W = warp_wide.TILE_W
N_STRIPES = warp_wide.N_STRIPES


def prep_quad_planes(frames_u8, tile_h):
    """Edge-pad like _prep_planes, then quad-pack into int32."""
    b, h, w, c = frames_u8.shape
    pad_h = tile_h
    wmult = TILE_W // np.gcd(TILE_W, c)
    pad_r = (-w) % wmult
    if pad_r < 1:
        pad_r += wmult
    planes = jnp.pad(frames_u8, ((0, 0), (pad_h, pad_h), (0, pad_r),
                                 (0, 0)), mode="edge")
    planes = warp_wide._pad_rows_to_multiple(planes, tile_h, 1)
    hp = planes.shape[1]
    planes = planes.reshape(b, hp, planes.shape[2] * c)
    pc = jnp.concatenate([planes[:, :, c:], planes[:, :, -c:]], axis=2)
    p1 = jnp.concatenate([planes[:, 1:, :], planes[:, -1:, :]], axis=1)
    p1c = jnp.concatenate([pc[:, 1:, :], pc[:, -1:, :]], axis=1)
    q = (jax.lax.shift_left(planes.astype(jnp.int32), 24)
         | jax.lax.shift_left(pc.astype(jnp.int32), 16)
         | jax.lax.shift_left(p1.astype(jnp.int32), 8)
         | p1c.astype(jnp.int32))
    return q, pad_h


def _sub_accumulate_quad(stripes, y, xpx, phase, lane_base, r0p, tile_h,
                         channels, unroll):
    """Candidate-PAIR accumulation: one i32 gather per stripe serves two
    source rows. Mirrors warp_wide._sub_accumulate otherwise."""
    y0 = jnp.floor(y)
    x0 = jnp.floor(xpx)
    fy = y - y0
    fx = xpx - x0
    y0i = y0.astype(jnp.int32)
    x0i = (channels * x0 + phase).astype(jnp.int32)

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
    loc0m = [jnp.where(reg0 == s, loc0, 0) for s in range(N_STRIPES)]
    w0m = [jnp.where(reg0 == s, w0, 0.0) for s in range(N_STRIPES)]
    w1m = [jnp.where(reg0 == s, w1, 0.0) for s in range(N_STRIPES)]

    def contribution(dp):
        # One candidate PAIR (source rows dp, dp+1): weights use the TRUE
        # row indices (zero when out of range); only the slice start is
        # clamped in-bounds.
        wv_a = (jnp.where(resid == dp, 1.0 - fy, 0.0)
                + jnp.where(resid + 1 == dp, fy, 0.0))
        wv_b = (jnp.where(resid == dp + 1, 1.0 - fy, 0.0)
                + jnp.where(resid + 1 == dp + 1, fy, 0.0))
        ds_ = jnp.minimum(dp, dmax + 1)
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

    # Pairs at dp = dmin, dmin+2, ... cover rows dmin .. dmax+1.
    n_cand = dmax + 2 - dmin
    n_pair = (n_cand + 1) // 2

    def macro(m, acc):
        d0 = dmin + m * (2 * unroll)
        cs = [contribution(d0 + 2 * off) for off in range(unroll)]
        while len(cs) > 1:
            cs = [cs[i] + cs[i + 1] if i + 1 < len(cs) else cs[i]
                  for i in range(0, len(cs), 2)]
        return acc + cs[0]

    zero = jnp.zeros((tile_h, TILE_W), jnp.float32)
    n_macro = (n_pair + unroll - 1) // unroll
    return jax.lax.fori_loop(0, n_macro, macro, zero)


def make_quad_kernel(tile_h, channels, pad_h, n_sub, unroll, h, w, gw,
                     scale):
    a_x = np.float32(scale)
    b_x = np.float32((1.0 - scale) * 0.5 * (w - 1))
    a_y = np.float32(scale)
    b_y = np.float32((1.0 - scale) * 0.5 * (h - 1))
    gx_scale = np.float32(gw / w)

    def kernel(sbase_ref, yoff_ref, xoff_ref, *refs):
        stripes = refs[:N_STRIPES]
        out_ref = refs[N_STRIPES]
        rt = pl.program_id(2)
        cb = pl.program_id(1)
        lane_f, phase, px_f = warp_wide._lane_geometry(cb, tile_h, channels)
        lane_base = sbase_ref[pl.program_id(0), cb, rt] * TILE_W

        gx = jnp.clip((px_f + 0.5) * gx_scale - 0.5, 0.0,
                      jnp.float32(gw - 1))
        c0f = jnp.floor(gx)
        fg = gx - c0f
        c0 = c0f.astype(jnp.int32)
        c1 = c0 + 1
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
            acc = _sub_accumulate_quad(stripes, y, xpx, phase, lane_base,
                                       r0 + pad_h, tile_h, channels, unroll)
            out_ref[0, rows, :] = warp_wide._quantize_u8(acc)

    return kernel


def launch_quad(planes_i32, yoffr, xoffr, sbase, h, w, wop, c, gw, scale,
                tile_h, n_sub, pad_h, unroll):
    b, hp, lp = planes_i32.shape
    hop = yoffr.shape[1]
    n_cb = (wop * c) // TILE_W
    blk = tile_h * n_sub
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
        make_quad_kernel(tile_h, c, pad_h, n_sub, unroll, h, w, gw, scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.uint8),
    )(sbase, yoffr, xoffr, *([planes_i32] * N_STRIPES))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--unrolls", type=int, nargs="*", default=[1, 2, 3])
    args = ap.parse_args()
    b, h, w, c = args.batch, args.h, args.w, 3
    gh, gw = 16, 16
    tile_h = warp_wide.TILE_H
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, c), dtype=np.uint8))
    path = synthetic.random_camera_path(jax.random.key(0), b,
                                        max_trans=0.15, max_angle=0.05)
    offsets = jax.vmap(lambda p: synthetic.theta_to_offsets(
        synthetic.jitter_theta(p), gh, gw))(path)

    n_sub = warp_wide.pick_n_sub(h, tile_h)
    blk = tile_h * n_sub
    wop = warp_wide._cdiv(w, TILE_W) * TILE_W

    def prep():
        q, pad_h = prep_quad_planes(frames, tile_h)
        yoffr, xoffr = warp_wide._offsets_rows(offsets, h, w, blk)
        sbase, ok = warp_wide._offsets_bounds(
            offsets, h, w, c, 1.0, blk, yoffr.shape[1], wop,
            q.shape[2] // TILE_W)
        return q, yoffr, xoffr, sbase

    ins = [jax.block_until_ready(x) for x in jax.jit(prep)()]
    print(f"backend={jax.default_backend()} n_sub={n_sub}", flush=True)

    # Correctness vs the production kernel.
    ref = jax.block_until_ready(
        warp_wide.warp_u8_offsets(frames, offsets, guarded=False))
    out = jax.jit(lambda *i: launch_quad(
        *i, h, w, wop, c, gw, 1.0, tile_h, n_sub, tile_h, 2))(*ins)
    out = np.asarray(out)[:, :h, :w * c].reshape(b, h, w, c)
    diff = np.abs(out.astype(np.int32) - np.asarray(ref, dtype=np.int32))
    print(f"quad vs production: max|diff|={diff.max()} "
          f"(frac>0: {(diff > 0).mean():.2e})", flush=True)

    def fetch(x):
        return float(jnp.sum(x.reshape(-1)[::4097].astype(jnp.float32)))

    for unroll in args.unrolls:
        fn = jax.jit(lambda *i, u=unroll: launch_quad(
            *i, h, w, wop, c, gw, 1.0, tile_h, n_sub, tile_h, u))
        o = fn(*ins)
        fetch(o)
        t0 = time.perf_counter()
        outs = [fn(*ins) for _ in range(args.iters)]
        fetch(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"quad unroll={unroll}: {dt*1e6/b:8.1f} us/frame", flush=True)


if __name__ == "__main__":
    main()
