#!/usr/bin/env python
"""Produce a side-by-side (shaky | stabilized) demo from the flagship model.

Writes a comparison video plus a PNG filmstrip of sampled frames with
per-frame PSNR-vs-ground-truth annotations — a quick visual sanity artifact.

  python scripts/make_demo.py --out-dir demo/ --frames 60 --size 480 640
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="checkpoints/flagship.npz")
    p.add_argument("--out-dir", default="demo")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import cv2
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.pipeline.stabilize import Stabilizer
    from dvsg_tpu.train import eval as eval_lib, synthetic
    from dvsg_tpu.utils import checkpoint as ckpt, video_io
    from dvsg_tpu.utils.metrics import psnr
    import jax.numpy as jnp

    h, w = args.size
    params, mcfg = ckpt.load_npz(args.checkpoint)
    stab = Stabilizer(StabilizeConfig(model=mcfg, chunk_frames=16,
                                      warp_impl="auto"), params)

    frames_u8, still_u8, path = synthetic.synthetic_clip_u8(
        jax.random.key(args.seed), args.frames, h, w)
    frames_np = np.asarray(frames_u8)
    out = stab.stabilize_clip(frames_np)
    targets = np.asarray(eval_lib.smoothed_targets(
        jnp.asarray(still_u8, jnp.float32) / 255.0, path,
        mcfg.window))
    t_u8 = np.clip(np.round(targets * 255), 0, 255).astype(np.uint8)

    os.makedirs(args.out_dir, exist_ok=True)
    side = np.concatenate([frames_np, out], axis=2)  # (T, H, 2W, 3)
    with video_io.VideoWriter(os.path.join(args.out_dir, "side_by_side.mp4"),
                              2 * w, h, fps=30) as wr:
        wr.write_batch(side)

    # Filmstrip PNG: 4 sampled frames, annotated.
    sl = (slice(h // 8, -h // 8), slice(w // 8, -w // 8))
    rows = []
    for t in np.linspace(args.frames // 4, args.frames - 1, 4, dtype=int):
        pi = psnr(frames_np[t][sl], t_u8[t][sl])
        po = psnr(out[t][sl], t_u8[t][sl])
        pair = np.concatenate([frames_np[t], out[t]], axis=1).copy()
        cv2.putText(pair, f"t={t}  in {pi:.1f} dB | stab {po:.1f} dB",
                    (10, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                    (255, 255, 0), 2)
        rows.append(pair)
    strip = np.concatenate(rows, axis=0)
    cv2.imwrite(os.path.join(args.out_dir, "filmstrip.png"),
                strip[..., ::-1])

    gains = [psnr(out[t][sl], t_u8[t][sl]) - psnr(frames_np[t][sl],
                                                  t_u8[t][sl])
             for t in range(mcfg.window, args.frames)]
    print(f"mean per-frame PSNR gain: {np.mean(gains):+.2f} dB "
          f"(min {np.min(gains):+.2f}, max {np.max(gains):+.2f})")
    print(f"wrote {args.out_dir}/side_by_side.mp4 and filmstrip.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
