#!/usr/bin/env python
"""Warp-kernel experiment harness (real TPU chip via axon).

Times the fused Pallas warp and its components separately so kernel work
can be attributed: prep (transpose/pad/coords), pallas_call, crop.

Usage: python scripts/kbench.py [--batch 4] [--h 720] [--w 1280] [variants]
Writes one line per measurement to stdout.
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32).reshape(-1)[::4097]))


def timeit(name, fn, *args, n_iters=10, chain=True):
    """Chained timing: output feeds next input (axon quirk: block_until_ready
    can return early; fetch a dependent value instead)."""
    out = fn(*args)
    fetch(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    a = args
    for _ in range(n_iters):
        out = fn(*a)
        if chain:
            first = out[0] if isinstance(out, tuple) else out
            if first.shape == args[0].shape and first.dtype == args[0].dtype:
                a = (first,) + args[1:]
    fetch(out if not isinstance(out, tuple) else out[0])
    dt = (time.perf_counter() - t0) / n_iters
    batch = args[0].shape[0]
    print(f"{name}: {dt*1e6/batch:.1f} us/frame ({dt*1e3:.2f} ms/call, "
          f"batch={batch})", flush=True)
    return dt


def realistic_grids(batch, h, w):
    from dvsg_tpu.ops import grid as grid_ops
    from dvsg_tpu.train import synthetic
    path = synthetic.random_camera_path(jax.random.key(0), batch,
                                        max_trans=0.15, max_angle=0.05)
    return jax.vmap(lambda p: grid_ops.affine_grid(
        synthetic.jitter_theta(p), h, w))(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("variants", nargs="*",
                    default=["current", "parts"])
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}", flush=True)
    b, h, w = args.batch, args.h, args.w
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((b, h, w, 3), np.float32))
    grids = realistic_grids(b, h, w)
    fetch(frames); fetch(grids)

    from dvsg_tpu.ops import warp_pallas as wp

    if "current" in args.variants:
        fn = jax.jit(functools.partial(wp.bilinear_warp_batch, max_dx_px=97))
        timeit("current full", fn, frames, grids, n_iters=args.iters)

    if "parts" in args.variants:
        # Prep-only: everything _run_warp does before pallas_call.
        @jax.jit
        def prep(frames, grids):
            planes = jnp.transpose(frames, (0, 3, 1, 2))
            pad_w, pad_h = 128, 32
            planes = jnp.pad(planes, ((0, 0), (0, 0), (pad_h, pad_h),
                                      (pad_w, pad_w)), mode="edge")
            planes = wp._pad_to_multiple(planes, 32, 2)
            planes = wp._pad_to_multiple(planes, 128, 3)
            x = (grids[..., 0] + 1.0) * 0.5 * (w - 1)
            y = (grids[..., 1] + 1.0) * 0.5 * (h - 1)
            x = jnp.clip(x, 0.0, w - 1) + pad_w
            y = jnp.clip(y, 0.0, h - 1) + pad_h
            y = wp._pad_to_multiple(wp._pad_to_multiple(y, 32, 1), 128, 2)
            x = wp._pad_to_multiple(wp._pad_to_multiple(x, 32, 1), 128, 2)
            n_cb = x.shape[2] // 128
            x_mean = x.reshape(b, x.shape[1], n_cb, 128).mean(axis=(1, 3))
            sbase = jnp.clip((x_mean // 128).astype(jnp.int32) - 1,
                             0, planes.shape[3] // 128 - 3)
            return planes, y, x, sbase

        timeit("prep only", prep, frames, grids, n_iters=args.iters,
               chain=False)

        # Transpose-only.
        tr = jax.jit(lambda f: jnp.transpose(f, (0, 3, 1, 2)))
        timeit("transpose only", tr, frames, n_iters=args.iters, chain=False)

    if "tile16" in args.variants:
        fn = jax.jit(functools.partial(wp.bilinear_warp_batch,
                                       max_dx_px=97, tile_h=16))
        timeit("tile_h=16", fn, frames, grids, n_iters=args.iters)
    if "tile64" in args.variants:
        fn = jax.jit(functools.partial(wp.bilinear_warp_batch,
                                       max_dx_px=97, tile_h=64))
        timeit("tile_h=64", fn, frames, grids, n_iters=args.iters)
    if "tile8" in args.variants:
        fn = jax.jit(functools.partial(wp.bilinear_warp_batch,
                                       max_dx_px=97, tile_h=8))
        timeit("tile_h=8", fn, frames, grids, n_iters=args.iters)


if __name__ == "__main__":
    main()
