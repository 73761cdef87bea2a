#!/usr/bin/env python
"""GroupNorm cost attribution in the encoder (VERDICT.md round-2 item 8).

Times ``encode_frames`` on the chip for the production config vs the
same weights with GroupNorm replaced by identity (monkeypatched — no
retraining; this measures COST only, quality adoption would require the
multi-seed gate after retraining). Also times the full chunk both ways
so the saving is expressed as a share of end-to-end time.

Usage: python scripts/kexp_groupnorm.py [--iters 30]
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
    args = ap.parse_args()

    import dataclasses
    import functools

    import flax.linen as nn

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.pipeline.stabilize import initial_halo, stabilize_chunk_impl
    from dvsg_tpu.train import synthetic
    from dvsg_tpu.utils import checkpoint as ckpt

    params, mcfg = ckpt.load_npz("checkpoints/flagship_fast.npz")
    mcfg = dataclasses.replace(mcfg, dtype="bfloat16")
    cfg = StabilizeConfig(model=mcfg, chunk_frames=16, warp_impl="auto")
    print(f"backend={jax.default_backend()} model_size={mcfg.model_size}",
          flush=True)

    t, h, w = 16, 720, 1280
    frames_np = np.asarray(synthetic.synthetic_clip_u8(
        jax.random.key(42), t, h, w)[0])
    frames = jnp.asarray(frames_np)
    seq = jnp.asarray(np.random.default_rng(0).random(
        (t + mcfg.window - 1, *mcfg.model_size, 3), np.float32) - 0.5)

    def fetch(x):
        return float(jnp.sum(x.astype(jnp.float32).reshape(-1)[::4097]))

    class IdentityNorm(nn.Module):
        """Drop-in for nn.GroupNorm: same param shapes, no reduction."""
        num_groups: int = 8
        dtype: object = None
        def __call__(self, x):  # noqa: D401
            # scale/bias params still exist in the checkpoint; apply them
            # elementwise so the program shape stays comparable.
            return x

    def bench(tag):
        enc = jax.jit(lambda p, s: motion_cnn.encode_frames(mcfg, p, s))
        o = enc(params, seq); fetch(o)
        t0 = time.perf_counter()
        o = seq
        outs = None
        for _ in range(args.iters):
            outs = enc(params, seq)
        fetch(outs)
        enc_ms = (time.perf_counter() - t0) / args.iters * 1e3

        step = jax.jit(functools.partial(stabilize_chunk_impl, cfg))
        halo = initial_halo(cfg, frames_np[0])
        out = frames
        out, halo, _ = step(params, out, halo); fetch(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, halo, _ = step(params, out, halo)
        fetch(out)
        chunk_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{tag:12s}: encode {enc_ms:7.2f} ms/chunk-seq, "
              f"full chunk {chunk_ms:7.2f} ms", flush=True)
        return enc_ms, chunk_ms

    base = bench("groupnorm")
    orig = nn.GroupNorm
    # Monkeypatch for the cost probe: ResBlock resolves nn.GroupNorm at
    # trace time, so patching the flax attribute is enough (the unused
    # gn scale/bias entries in the checkpoint are ignored by apply).
    nn.GroupNorm = IdentityNorm
    try:
        nonorm = bench("identity")
    finally:
        nn.GroupNorm = orig
    print(f"GN cost: encode {base[0]-nonorm[0]:.2f} ms/chunk, "
          f"chunk {base[1]-nonorm[1]:.2f} ms "
          f"({100*(base[1]-nonorm[1])/base[1]:.1f}% of chunk)", flush=True)


if __name__ == "__main__":
    main()
