#!/usr/bin/env python
"""Wide-warp kernel cost attribution on the real chip.

Times the PRODUCTION kernel (ops/warp_wide.py) and stripped variants of
its body to attribute cost between DMA/pipeline overhead, per-tile index
math, and the candidate gather loop. This harness discovered the design
rules recorded in the warp_wide module docstring (register accumulation,
ILP macro-unroll, no predication); keep it runnable for future tuning.

Usage: python scripts/kexp_wide.py [--h 720] [--w 1280] [--batch 4]
       [variants: full dma_only no_gather one_candidate]
"""
import argparse
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

TILE_W = warp_wide.TILE_W
N_STRIPES = warp_wide.N_STRIPES


def make_stripped_kernel(tile_h, channels, pad_h, n_sub, unroll, mode):
    """Production kernel body with pieces removed for attribution."""

    def kernel(sbase_ref, y_ref, x_ref, *refs):
        stripes = refs[:N_STRIPES]
        out_ref = refs[N_STRIPES]
        rt = pl.program_id(2)
        cb = pl.program_id(1)
        if mode == "dma_only":
            out_ref[...] = jnp.zeros_like(out_ref)
            return
        lane_f = (jnp.float32(cb * TILE_W)
                  + jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W),
                                             1).astype(jnp.float32))
        phase = lane_f - channels * jnp.floor(lane_f * (1.0 / channels))
        lane_base = sbase_ref[pl.program_id(0), cb, rt] * TILE_W
        pl_idx = (((lane_f - phase) * (1.0 / channels))
                  - jnp.float32((cb // channels) * TILE_W)
                  ).astype(jnp.int32)

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
            dmax = (dmin - 1) if mode == "one_candidate" else jnp.max(resid)

            lx0 = x0i - lane_base
            lx1 = lx0 + channels
            reg0 = lx0 // TILE_W
            reg1 = lx1 // TILE_W
            loc0 = lx0 - reg0 * TILE_W
            loc1 = lx1 - reg1 * TILE_W
            loc0m = [jnp.where(reg0 == s, loc0, 0) for s in range(N_STRIPES)]
            loc1m = [jnp.where(reg1 == s, loc1, 0) for s in range(N_STRIPES)]
            w0m = [jnp.where(reg0 == s, 1.0 - fx, 0.0)
                   for s in range(N_STRIPES)]
            w1m = [jnp.where(reg1 == s, fx, 0.0) for s in range(N_STRIPES)]

            def contribution(d, dmax=dmax, loc0m=loc0m, loc1m=loc1m,
                             w0m=w0m, w1m=w1m, resid=resid, fy=fy, r0p=r0p):
                wv = (jnp.where(resid == d, 1.0 - fy, 0.0)
                      + jnp.where(resid + 1 == d, fy, 0.0))
                ds_ = jnp.minimum(d, dmax + 1)
                hv = None
                for s in range(N_STRIPES):
                    seg = stripes[s][0, pl.ds(r0p + ds_, tile_h), :]
                    if mode == "no_gather":
                        g0 = seg
                        g1 = seg
                    else:
                        g0 = jnp.take_along_axis(seg, loc0m[s], axis=1)
                        g1 = jnp.take_along_axis(seg, loc1m[s], axis=1)
                    t = w0m[s] * g0 + w1m[s] * g1
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
            out_ref[0, rows, :] = jnp.clip(jnp.round(acc), 0.0, 255.0
                                           ).astype(jnp.int32
                                                    ).astype(jnp.uint8)

    return kernel


def launch_stripped(planes, y_c, x_c, sbase, ho, wo, c, tile_h, n_sub,
                    mode):
    b, hp, lp = planes.shape
    hop = y_c.shape[1]
    n_cb = (wo * c) // TILE_W
    blk = tile_h * n_sub
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
    return pl.pallas_call(
        make_stripped_kernel(tile_h, c, tile_h, n_sub, warp_wide.UNROLL,
                             mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hop, n_cb * TILE_W), jnp.uint8),
    )(sbase, y_c, x_c, *([planes] * N_STRIPES))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("variants", nargs="*",
                    default=["full", "no_gather", "one_candidate",
                             "dma_only"])
    args = ap.parse_args()
    b, h, w, c = args.batch, args.h, args.w, 3
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, c), dtype=np.uint8))
    path = synthetic.random_camera_path(jax.random.key(0), b,
                                        max_trans=0.15, max_angle=0.05)
    grids = jax.vmap(lambda p: grid_ops.affine_grid(
        synthetic.jitter_theta(p), h, w))(path)
    n_sub = warp_wide.pick_n_sub(h)
    # packed=False: this harness's stripped kernel variants predate the
    # packed schemes and operate on plain f32 planes.
    prep = jax.jit(functools.partial(warp_wide._wide_prep, max_dx_px=0,
                                     tile_h=32, n_sub=n_sub, packed=False))
    planes, y_c, x_c, sbase, ok = map(jax.block_until_ready,
                                      prep(frames, grids))
    print(f"backend={jax.default_backend()} n_sub={n_sub} ok={ok}",
          flush=True)

    def fetch(x):
        return float(jnp.sum(x.reshape(-1)[::4097].astype(jnp.float32)))

    for mode in args.variants:
        if mode == "full":
            fn = jax.jit(lambda p_, y_, x_, s_: warp_wide._launch(
                p_, y_, x_, s_, h, w, c, 32, n_sub, False, packed=False))
        else:
            fn = jax.jit(functools.partial(
                launch_stripped, ho=h, wo=w, c=c, tile_h=32, n_sub=n_sub,
                mode=mode))
        o = fn(planes, y_c, x_c, sbase)
        fetch(o)
        t0 = time.perf_counter()
        outs = [fn(planes, y_c, x_c, sbase) for _ in range(args.iters)]
        fetch(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{mode:14s}: {dt*1e6/b:8.1f} us/frame", flush=True)


if __name__ == "__main__":
    main()
