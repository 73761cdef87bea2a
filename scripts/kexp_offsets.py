#!/usr/bin/env python
"""Offsets-native wide-warp kernel cost attribution on the real chip.

Round-3 companion to scripts/kexp_wide.py for the production kernel
(ops/warp_wide.py::warp_u8_offsets): times the full kernel and stripped
variants to attribute cost between DMA/pipeline overhead, in-kernel
coordinate synthesis, and the candidate gather loop, plus schedule
variants (grid order, tile height). Numbers feed ARCHITECTURE.md.

Usage: python scripts/kexp_offsets.py [--h 720] [--w 1280] [--batch 8]
       [variants: full unpacked dma_only coord_only no_coord one_candidate
                  rt_outer nofold selchain tent selchain_tent]
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


def make_kernel(tile_h, channels, pad_h, n_sub, unroll, h, w, gw, scale,
                mode, rt_outer=False):
    """Production offsets-kernel body with pieces removed/reordered."""
    a_x = np.float32(scale)
    b_x = np.float32((1.0 - scale) * 0.5 * (w - 1))
    a_y = np.float32(scale)
    b_y = np.float32((1.0 - scale) * 0.5 * (h - 1))
    gx_scale = np.float32(gw / w)
    packed = mode != "unpacked"

    def kernel(sbase_ref, yoff_ref, xoff_ref, *refs):
        stripes = refs[:N_STRIPES]
        out_ref = refs[N_STRIPES]
        rt = pl.program_id(1 if rt_outer else 2)
        cb = pl.program_id(2 if rt_outer else 1)
        if mode == "dma_only":
            out_ref[...] = jnp.zeros_like(out_ref)
            return
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
            r0 = (rt * n_sub + sub) * tile_h
            r_f = (jnp.float32(r0)
                   + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                              0).astype(jnp.float32))
            if mode == "no_coord":
                y = r_f + pad_h
                xpx = jnp.clip(x_id, 0.0, jnp.float32(w - 1))
            else:
                yo_rows = yoff_ref[0, rows, :]
                xo_rows = xoff_ref[0, rows, :]
                xoff = ((1.0 - fg) * jnp.take_along_axis(xo_rows, c0, axis=1)
                        + fg * jnp.take_along_axis(xo_rows, c1, axis=1))
                yoff = ((1.0 - fg) * jnp.take_along_axis(yo_rows, c0, axis=1)
                        + fg * jnp.take_along_axis(yo_rows, c1, axis=1))
                y = jnp.clip(a_y * r_f + b_y + yoff, 0.0,
                             jnp.float32(h - 1)) + pad_h
                xpx = jnp.clip(x_id + xoff, 0.0, jnp.float32(w - 1))
            if mode == "coord_only":
                out_ref[0, rows, :] = warp_wide._quantize_u8(y + xpx)
                continue
            if mode == "one_candidate":
                y = jnp.floor(y)      # single candidate row per lane
            acc = warp_wide._sub_accumulate(
                stripes, y, xpx, phase, lane_base, r0 + pad_h,
                tile_h, channels, unroll, packed=packed,
                adaptive_tail=(mode == "tail"),
                stripe_fold=(mode != "nofold"),
                fold_select=mode in ("selchain", "selchain_tent"),
                tent_wv=mode in ("tent", "selchain_tent"))
            out_ref[0, rows, :] = warp_wide._quantize_u8(acc)

    return kernel


def launch(planes, yoffr, xoffr, sbase, h, w, wop, c, gw, scale,
           tile_h, n_sub, pad_h, mode, rt_outer=False,
           unroll=warp_wide.UNROLL):
    b, hp, lp = planes.shape
    hop = yoffr.shape[1]
    n_cb = (wop * c) // TILE_W
    blk = tile_h * n_sub
    n_rt = hop // blk

    if rt_outer:
        grid = (b, n_rt, n_cb)
        def ids(b_, i, j):
            return b_, j, i      # (batch, cb, rt)
    else:
        grid = (b, n_cb, n_rt)
        def ids(b_, i, j):
            return b_, i, j

    def off_spec():
        return pl.BlockSpec(
            (1, blk, TILE_W),
            lambda b_, i, j, sref: (b_, ids(b_, i, j)[2], 0),
            memory_space=pltpu.VMEM)

    def stripe_spec(offset):
        return pl.BlockSpec(
            (1, hp, TILE_W),
            lambda b_, i, j, sref, o=offset: (
                b_, 0, sref[b_, ids(b_, i, j)[1], ids(b_, i, j)[2]] + o),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec(
        (1, blk, TILE_W),
        lambda b_, i, j, sref: (b_, ids(b_, i, j)[2], ids(b_, i, j)[1]),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[off_spec(), off_spec(),
                  *(stripe_spec(o) for o in range(N_STRIPES))],
        out_specs=out_spec)
    out = pl.pallas_call(
        make_kernel(tile_h, c, tile_h, n_sub, unroll, h, w, gw,
                    scale, mode, rt_outer),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.uint8),
    )(sbase, yoffr, xoffr, *([planes] * N_STRIPES))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tile-h", type=int, default=warp_wide.TILE_H)
    ap.add_argument("--unroll", type=int, default=0,
                    help="0 = auto (UNROLL_QUAD for packed modes, "
                         "UNROLL for unpacked)")
    ap.add_argument("--n-sub", type=int, default=0,
                    help="override pick_n_sub (0 = auto)")
    ap.add_argument("variants", nargs="*",
                    default=["full", "unpacked", "one_candidate",
                             "coord_only", "no_coord", "dma_only",
                             "rt_outer"])
    args = ap.parse_args()
    b, h, w, c = args.batch, args.h, args.w, 3
    gh, gw = 16, 16
    tile_h = args.tile_h
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, c), dtype=np.uint8))
    path = synthetic.random_camera_path(jax.random.key(0), b,
                                        max_trans=0.15, max_angle=0.05)
    offsets = jax.vmap(lambda p: synthetic.theta_to_offsets(
        synthetic.jitter_theta(p), gh, gw))(path)

    n_sub = args.n_sub or warp_wide.pick_n_sub(h, tile_h)
    blk = tile_h * n_sub
    wop = warp_wide._cdiv(w, TILE_W) * TILE_W

    def prep(packed):
        planes, pad_h, _ = warp_wide._prep_planes(frames, tile_h,
                                                  packed=packed)
        yoffr, xoffr = warp_wide._offsets_rows(offsets, h, w, blk)
        sbase, ok = warp_wide._offsets_bounds(
            offsets, h, w, c, 1.0, blk, yoffr.shape[1], wop,
            planes.shape[2] // TILE_W)
        return planes, yoffr, xoffr, sbase, ok, pad_h

    packed_in = jax.jit(lambda: prep(True)[:4])()
    unpacked_in = jax.jit(lambda: prep(False)[:4])()
    packed_in = [jax.block_until_ready(x) for x in packed_in]
    unpacked_in = [jax.block_until_ready(x) for x in unpacked_in]
    print(f"backend={jax.default_backend()} n_sub={n_sub} tile_h={tile_h} "
          f"unroll={args.unroll}", flush=True)

    def fetch(x):
        return float(jnp.sum(x.reshape(-1)[::4097].astype(jnp.float32)))

    for mode in args.variants:
        rt_outer = mode == "rt_outer"
        m = "full" if rt_outer else mode
        ins = unpacked_in if mode == "unpacked" else packed_in
        unroll = args.unroll or (warp_wide.UNROLL if m == "unpacked"
                                 else warp_wide.UNROLL_QUAD)
        fn = jax.jit(lambda p_, y_, x_, s_, m=m, ro=rt_outer, u=unroll:
                     launch(p_, y_, x_, s_, h, w, wop, c, gw, 1.0,
                            tile_h, n_sub, tile_h, m, ro, u))
        o = fn(*ins)
        fetch(o)
        t0 = time.perf_counter()
        outs = [fn(*ins) for _ in range(args.iters)]
        fetch(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{mode:14s}: {dt*1e6/b:8.1f} us/frame", flush=True)


if __name__ == "__main__":
    main()
