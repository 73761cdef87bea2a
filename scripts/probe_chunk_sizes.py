"""One-off on-chip probe: chunk-size sweep for the batched 8-clip 720p
program and the 480p / 4K single-clip sweeps.

Finds the fastest chunk_frames per config the same way the 720p (T=32)
and 1080p (T=16) picks were made; results feed bench.py's static picks.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/probe_chunk_sizes.py
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench import _fetch, _shaky_frames
from dvsg_tpu.config import StabilizeConfig
from dvsg_tpu.pipeline.stabilize import initial_halo, stabilize_chunk_impl


def _load_params():
    import dataclasses
    import os
    from dvsg_tpu.utils import checkpoint as _ckpt
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "checkpoints", "flagship_fast.npz")
    params, mcfg = _ckpt.load_npz(path)
    mcfg = dataclasses.replace(mcfg, dtype="bfloat16")
    return mcfg, params, "flagship_fast"


def bench_single(mcfg, params, h, w, t, n_iters):
    cfg = StabilizeConfig(model=mcfg, chunk_frames=t, warp_impl="auto")
    frames = jnp.asarray(_shaky_frames(t, h, w))
    halo = initial_halo(cfg, np.asarray(frames[0]))
    import functools
    step = jax.jit(functools.partial(stabilize_chunk_impl, cfg))
    out, hl = frames, halo
    for _ in range(3):
        out, hl = step(params, out, hl)[:2]
    _fetch(out)
    t0 = time.perf_counter()
    _fetch(out)
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out, hl = step(params, out, hl)[:2]
    _fetch(out)
    dt = time.perf_counter() - t0
    raw = (n_iters * t) / dt
    if t_fetch < 0.25 * dt:
        dt -= t_fetch
    return (n_iters * t) / dt, raw


def bench_batch(mcfg, params, h, w, n_clips, t, n_iters):
    cfg = StabilizeConfig(model=mcfg, chunk_frames=t, warp_impl="auto")
    frames = jnp.asarray(
        np.stack([_shaky_frames(t, h, w) for _ in range(n_clips)]))
    halos = jnp.stack([initial_halo(cfg, np.asarray(frames[i, 0]))
                       for i in range(n_clips)])
    step = jax.jit(lambda p, f, hl: jax.vmap(
        lambda ff, hh: stabilize_chunk_impl(cfg, p, ff, hh)[:2])(f, hl))
    out = frames
    for _ in range(3):
        out, halos = step(params, out, halos)
    _fetch(out)
    t0 = time.perf_counter()
    _fetch(out)
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out, halos = step(params, out, halos)
    _fetch(out)
    dt = time.perf_counter() - t0
    raw = (n_iters * n_clips * t) / dt
    if t_fetch < 0.25 * dt:
        dt -= t_fetch
    return (n_iters * n_clips * t) / dt, raw


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    mcfg, params, name = _load_params()
    print("model:", name, flush=True)

    for t, iters in [(4, 40), (8, 24), (16, 12)]:
        fps, raw = bench_batch(mcfg, params, 720, 1280, 8, t, iters)
        print(f"batch8 720p T={t}: {fps:.1f} fps agg (raw {raw:.1f})",
              flush=True)
    for t, iters in [(16, 60), (32, 40), (64, 24)]:
        fps, raw = bench_single(mcfg, params, 480, 854, t, iters)
        print(f"480p T={t}: {fps:.1f} fps (raw {raw:.1f})", flush=True)
    for t, iters in [(2, 60), (4, 40)]:
        fps, raw = bench_single(mcfg, params, 2160, 3840, t, iters)
        print(f"2160p T={t}: {fps:.1f} fps (raw {raw:.1f})", flush=True)


if __name__ == "__main__":
    main()
