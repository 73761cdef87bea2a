#!/usr/bin/env python
"""Long-video 1080p soak on one chip (BASELINE.json config 5's
single-chip slice: 1080p long-video streaming, bounded HBM).

Device-resident chained soak: each chunk's stabilized output feeds the
next chunk's input and the halo carries across chunks exactly as in the
streaming driver, so hundreds of frames flow through the production
program with zero per-chunk host transfer. (A wall-clock streaming soak
is meaningless on this box — the axon tunnel's ~20-30 MB/s transport
swamps the 23 ms/chunk device program; see ARCHITECTURE.md "Known
environment quirks". bench_detail's host_io covers the host side.)

Checks: steady per-chunk device time (no drift), output stays u8 with
live content (not black/saturated — a NaN in the offsets would zero or
saturate the warp), and the program survives N chunks without HBM
growth (an OOM would abort the chain).

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
     python scripts/soak_stream_1080p.py [--frames 512]
"""
import argparse
import dataclasses
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax

from dvsg_tpu.config import StabilizeConfig, auto_chunk_frames
from dvsg_tpu.pipeline.stabilize import initial_halo, stabilize_chunk_impl
from dvsg_tpu.utils import checkpoint as ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--path-smooth", type=int, default=0,
                    help="soak the smoothed chunk program instead "
                         "(carried EMA state; prints its final bound)")
    ap.add_argument("--path-smooth-lag", type=int, default=0,
                    help="soak the fixed-lag program (needs "
                         "--path-smooth > 0): carried raw frames + "
                         "offset grids + measurement window")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    params, mcfg = ckpt.load_npz(
        os.path.join(root, "checkpoints", "flagship_fast.npz"))
    mcfg = dataclasses.replace(mcfg, dtype="bfloat16")
    h, w = args.height, args.width
    t = auto_chunk_frames(h, w)
    n_chunks = max(1, args.frames // t)
    cfg = StabilizeConfig(model=mcfg, chunk_frames=t, warp_impl="auto",
                          path_smooth=args.path_smooth,
                          path_smooth_lag=args.path_smooth_lag)
    print(f"backend={jax.default_backend()} {w}x{h} T={t} "
          f"chunks={n_chunks} ({n_chunks * t} frames) "
          f"path_smooth={args.path_smooth} lag={args.path_smooth_lag}",
          flush=True)

    from bench import _fetch, _shaky_frames  # repo root on sys.path
    import jax.numpy as jnp

    frames = jnp.asarray(_shaky_frames(t, h, w))
    halo = initial_halo(cfg, np.asarray(frames[0]))
    smoothing = args.path_smooth > 0
    lagging = args.path_smooth_lag > 0
    if lagging:
        from dvsg_tpu.pipeline.stabilize import (Stabilizer,
                                                 stabilize_chunk_lag_impl)
        lag_carry = Stabilizer(cfg, None)._init_lag_carry(
            np.asarray(frames[0]))
        step_l = jax.jit(functools.partial(stabilize_chunk_lag_impl,
                                           cfg, params))

        def step(f, carry):
            hl, lc = carry
            out, hl, cf, co, cd, cc, _ = step_l(f, hl, *lc)
            return out, (hl, (cf, co, cd, cc))
        carry0 = (halo, lag_carry)
        smoothing = False       # the lag mode has no EMA state to print
    elif smoothing:
        from dvsg_tpu.pipeline import pathsmooth
        from dvsg_tpu.pipeline.stabilize import stabilize_chunk_smooth_impl
        sstate = pathsmooth.initial_state()
        step_s = jax.jit(functools.partial(stabilize_chunk_smooth_impl,
                                           cfg, params))

        def step(f, hl_and_state):
            hl, st = hl_and_state
            out, hl, st, _ = step_s(f, hl, st)
            return out, (hl, st)
        carry0 = (halo, sstate)
    else:
        step_p = jax.jit(functools.partial(stabilize_chunk_impl, cfg,
                                           params))

        def step(f, hl):
            out, hl2, _ = step_p(f, hl)
            return out, hl2
        carry0 = halo

    out, hl = step(frames, carry0)       # warm/compile
    _fetch(out)
    t0 = time.perf_counter()
    _fetch(out)
    t_fetch = time.perf_counter() - t0   # one tunnel RTT (~56 ms here)

    def chain(out, hl):
        """One pass: n_chunks chained device steps, one closing fetch."""
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            out, hl = step(out, hl)
        _fetch(out)
        dt = time.perf_counter() - t0
        if t_fetch < 0.25 * dt:
            dt -= t_fetch
        return out, hl, dt

    out, hl, dt_a = chain(frames, carry0)
    out, hl, dt_b = chain(out, hl)       # second pass: drift check
    final = np.asarray(jax.device_get(out))
    if smoothing:
        st = np.asarray(jax.device_get(hl[1]))
        print(f"final EMA state D = {st} (|D| bounded, finite: "
              f"{bool(np.isfinite(st).all())})", flush=True)

    fps = (n_chunks * t) / dt_b
    drift = (dt_b / dt_a - 1) * 100
    print(f"device-chained: {fps:.1f} fps steady "
          f"({dt_b / n_chunks * 1e3:.1f} ms/chunk), "
          f"pass1->pass2 drift {drift:+.1f}% "
          f"({2 * n_chunks * t} frames total)", flush=True)
    lo, hi, mean = int(final.min()), int(final.max()), float(final.mean())
    print(f"final chunk u8 range [{lo}, {hi}], mean {mean:.1f}", flush=True)
    # Feedback warping drifts content toward the frame mean over many
    # passes; 'alive' means neither black nor saturated nor constant.
    ok = (final.dtype == np.uint8 and 0 <= lo < hi <= 255
          and 10.0 < mean < 245.0 and final.std() > 1.0
          and abs(drift) < 10.0)
    if smoothing:
        ok = ok and bool(np.isfinite(st).all()) and float(
            np.abs(st).max()) < 1.0
    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
