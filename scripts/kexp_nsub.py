#!/usr/bin/env python
"""A/B-interleaved n_sub (row-block) sweep for the offsets warp kernel.

pick_n_sub historically chose from a fixed tuple (24, 12, 8, 4, 2, 1),
which pads the output rows to hop = ceil(h/blk)*blk and the kernel does
FULL candidate work on the padded rows before they are cropped: 6.7%
pure waste at 720p (hop 768 vs minimal 736), 6.7% at 1080p (1152 vs
1088), 6.7% at 480p (512 vs a possible exact 480). An exact-fit n_sub
(one row tile, minimal hop) should recover most of that.

Interleaves the candidate n_sub values in ONE process, several rounds,
reporting per-round and median numbers (the tunnel quirk note in
CLAUDE.md: never trust a single probe).

Usage: python scripts/kexp_nsub.py [--h 720 --w 1280] [--batch 8]
       [--n-subs 24,23] [--iters 30] [--rounds 4]
"""
import argparse
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvsg_tpu.ops import warp_wide                     # noqa: E402
from dvsg_tpu.train import synthetic                   # noqa: E402

TILE_W = warp_wide.TILE_W


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--tile-h", type=int, default=warp_wide.TILE_H)
    ap.add_argument("--n-subs", type=str, default="")
    args = ap.parse_args()
    b, h, w, c = args.batch, args.h, args.w, 3
    gh, gw = 16, 16
    tile_h = args.tile_h
    if args.n_subs:
        n_subs = [int(s) for s in args.n_subs.split(",")]
    else:
        legacy = warp_wide.pick_n_sub(h, tile_h)
        exact = -(-h // tile_h)
        n_subs = sorted({legacy, exact})

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, c), dtype=np.uint8))
    path = synthetic.random_camera_path(jax.random.key(0), b,
                                        max_trans=0.15, max_angle=0.05)
    offsets = jax.vmap(lambda p: synthetic.theta_to_offsets(
        synthetic.jitter_theta(p), gh, gw))(path)
    wop = warp_wide._cdiv(w, TILE_W) * TILE_W

    def build(n_sub):
        blk = tile_h * n_sub

        def prep():
            planes, pad_h, _ = warp_wide._prep_planes(frames, tile_h,
                                                      packed=True)
            yoffr, xoffr = warp_wide._offsets_rows(offsets, h, w, blk)
            sbase, ok = warp_wide._offsets_bounds(
                offsets, h, w, c, 1.0, blk, yoffr.shape[1], wop,
                planes.shape[2] // TILE_W)
            return planes, yoffr, xoffr, sbase

        ins = [jax.block_until_ready(x) for x in jax.jit(prep)()]
        hop = ins[1].shape[1]

        fn = jax.jit(lambda p_, y_, x_, s_: warp_wide._launch_offsets(
            p_, y_, x_, s_, h, w, wop, c, gw, 1.0, tile_h, n_sub,
            tile_h, False, True))
        t0 = time.perf_counter()
        out = fn(*ins)
        jax.block_until_ready(out)
        print(f"n_sub={n_sub}: hop={hop} n_rt={hop // blk} "
              f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)
        return fn, ins

    def fetch(x):
        return float(jnp.sum(x.reshape(-1)[::4097].astype(jnp.float32)))

    built = {n: build(n) for n in n_subs}
    # parity across n_sub values (same math, different blocking)
    outs = {n: np.asarray(jax.device_get(fn(*ins)))
            for n, (fn, ins) in built.items()}
    ref = outs[n_subs[0]]
    for n in n_subs[1:]:
        diff = np.abs(outs[n].astype(np.int32) - ref.astype(np.int32)).max()
        print(f"parity n_sub={n} vs {n_subs[0]}: max LSB diff {diff}",
              flush=True)

    times = {n: [] for n in n_subs}
    for r in range(args.rounds):
        for n in n_subs:
            fn, ins = built[n]
            fn(*ins)                     # warm the dispatch path
            t0 = time.perf_counter()
            res = [fn(*ins) for _ in range(args.iters)]
            fetch(res[-1])
            dt = (time.perf_counter() - t0) / args.iters / b * 1e6
            times[n].append(dt)
            print(f"round {r} n_sub={n:3d}: {dt:8.1f} us/frame", flush=True)
    print()
    for n in n_subs:
        med = statistics.median(times[n])
        print(f"n_sub={n:3d}: median {med:8.1f} us/frame  "
              f"(rounds: {', '.join(f'{t:.0f}' for t in times[n])})",
              flush=True)


if __name__ == "__main__":
    main()
