#!/usr/bin/env python
"""Software-pipelined chunk probe: hide CNN+resize behind the warp kernel.

The production chunk program is sequential (resize -> predict -> warp;
stage attribution at 720p T=32: warp ~553 + CNN ~108 + resize ~45
us/frame, ARCHITECTURE.md "Chunk stage attribution"). But the GroupNorm
probe showed the full chunk absorbs encoder cost far below its standalone
price, so the scheduler CAN hide MXU work somewhere. This probe measures
a restructured step in which the warp of chunk N and the predict of chunk
N+1 are INDEPENDENT ops inside one program:

    step(frames_{N+1}, halo_N, pending_frames_N, pending_offsets_N)
        -> (out_N, halo_{N+1}, offsets_{N+1})

If the pipelined step is materially cheaper than the sequential chunk,
the streaming driver gets a prologue/epilogue restructure; if not, the
rejection gets recorded with numbers like the other avenues.

Usage: python scripts/kexp_pipeline.py [--iters 30] [--chunk 32]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--size", type=int, nargs=2, default=(720, 1280))
    args = ap.parse_args()

    import dataclasses
    import functools

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.ops import resize as resize_ops
    from dvsg_tpu.ops import warp as warp_ops
    from dvsg_tpu.pipeline.stabilize import (initial_halo,
                                             predict_chunk_offsets,
                                             stabilize_chunk_impl)
    from dvsg_tpu.train import synthetic
    from dvsg_tpu.utils import checkpoint as ckpt

    params, mcfg = ckpt.load_npz(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", "flagship_fast.npz"))
    mcfg = dataclasses.replace(mcfg, dtype="bfloat16")
    t, (h, w) = args.chunk, args.size
    cfg = StabilizeConfig(model=mcfg, chunk_frames=t, warp_impl="auto")
    print(f"backend={jax.default_backend()} chunk={t} res={h}x{w}",
          flush=True)

    frames_np = np.asarray(synthetic.synthetic_clip_u8(
        jax.random.key(42), t, h, w)[0])
    frames = jnp.asarray(frames_np)
    halo0 = initial_halo(cfg, frames_np[0])

    def fetch(x):
        return float(jnp.sum(x.astype(jnp.float32).reshape(-1)[::4097]))

    # --- sequential baseline: the production chunk program -------------
    step_seq = jax.jit(functools.partial(stabilize_chunk_impl, cfg))
    out, halo, offs = step_seq(params, frames, halo0)
    fetch(out)
    t0 = time.perf_counter()
    o, ha = frames, halo0
    for _ in range(args.iters):
        o, ha, _ = step_seq(params, o, ha)
    fetch(o)
    seq_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"sequential : {seq_ms:7.2f} ms/chunk "
          f"({seq_ms*1e3/t:6.1f} us/frame)", flush=True)

    # --- pipelined step: warp(N) independent of predict(N+1) -----------
    mh, mw = mcfg.model_size

    def pipelined_impl(params, frames_next_u8, halo, pend_frames_u8,
                       pend_offsets):
        out = warp_ops.warp_quantize_batch(
            pend_frames_u8, warp_impl=cfg.warp_impl,
            offsets=pend_offsets, border_crop=cfg.border_crop)
        small = resize_ops.downscale_norm(frames_next_u8, mh, mw)
        seq = jnp.concatenate([halo, small], axis=0)
        offsets = predict_chunk_offsets(cfg, params, seq, t)
        return out, seq[t:], offsets

    step_pipe = jax.jit(pipelined_impl)
    out_p, halo_p, offs_p = step_pipe(params, frames, halo0, frames, offs)
    fetch(out_p)
    t0 = time.perf_counter()
    o, ha, po, pf = frames, halo0, offs, frames
    for _ in range(args.iters):
        o2, ha, po = step_pipe(params, o, ha, pf, po)
        pf, o = o, o2
    fetch(o)
    pipe_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"pipelined  : {pipe_ms:7.2f} ms/chunk "
          f"({pipe_ms*1e3/t:6.1f} us/frame)  "
          f"delta {seq_ms-pipe_ms:+.2f} ms ({100*(seq_ms-pipe_ms)/seq_ms:+.1f}%)",
          flush=True)

    # --- warp-only floor (what full overlap would approach) ------------
    warp_only = jax.jit(lambda f, o: warp_ops.warp_quantize_batch(
        f, warp_impl=cfg.warp_impl, offsets=o,
        border_crop=cfg.border_crop))
    ow = warp_only(frames, offs)
    fetch(ow)
    t0 = time.perf_counter()
    o = frames
    for _ in range(args.iters):
        o = warp_only(o, offs)
    fetch(o)
    warp_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"warp-only  : {warp_ms:7.2f} ms/chunk "
          f"({warp_ms*1e3/t:6.1f} us/frame)", flush=True)


if __name__ == "__main__":
    main()
