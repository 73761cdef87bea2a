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
    p.add_argument("--sway", action="store_true",
                   help="ALSO produce a sway demo: a low-frequency "
                        "drift fixture stabilized plain vs "
                        "--path-smooth 32, three panels side by side "
                        "(sway_side_by_side.mp4 + tracked path RMS)")
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

    if args.sway:
        # Sway demo: slow sinusoidal drift + jitter — the plain model
        # removes the jitter but the sway passes through; path
        # smoothing removes both (pipeline/pathsmooth.py).
        from dvsg_tpu.utils import stab_metrics
        t_n = max(args.frames, 64)
        tt = np.arange(t_n)
        rng = np.random.default_rng(args.seed)
        path5 = np.zeros((t_n, 5), np.float32)
        path5[:, 0] = 0.05 * np.sin(2 * np.pi * tt / 40) \
            + rng.normal(0, 0.008, t_n)
        path5[:, 1] = 0.04 * np.sin(2 * np.pi * tt / 56 + 1.0) \
            + rng.normal(0, 0.008, t_n)
        path5[:, 2] = 0.04 * np.sin(2 * np.pi * tt / 48 + 0.5) \
            + rng.normal(0, 0.004, t_n)
        still = synthetic.random_still(jax.random.key(args.seed + 1),
                                       h, w)
        sway = np.asarray(jnp.clip(jnp.round(jax.vmap(
            lambda q: synthetic.jitter_frame(still, jnp.asarray(q)))(
            jnp.asarray(path5)) * 255), 0, 255).astype(jnp.uint8))
        plain = stab.stabilize_clip(sway)
        smooth = Stabilizer(stab.cfg.replace(path_smooth=32),
                            params).stabilize_clip(sway)

        def path_rms(x):
            # Drop untracked steps rather than zero-filling them — zero
            # reads as "no motion", the maximally optimistic value
            # (stab_metrics.camera_path docstring); report the count so
            # a heavily-untracked panel is visibly less trustworthy.
            cp = stab_metrics.camera_path(x)
            ok = ~np.isnan(cp[:, 0])
            pp = np.cumsum(cp[ok][:, :2], axis=0)
            rms = float(np.sqrt(((pp - pp.mean(0)) ** 2).mean()))
            return rms, int((~ok).sum())

        trio = np.concatenate([sway, plain, smooth], axis=2)
        with video_io.VideoWriter(
                os.path.join(args.out_dir, "sway_side_by_side.mp4"),
                3 * w, h, fps=30) as wr:
            wr.write_batch(trio)
        (r_in, f_in), (r_p, f_p), (r_s, f_s) = (
            path_rms(sway), path_rms(plain), path_rms(smooth))
        print(f"sway demo (input | plain | --path-smooth 32): tracked "
              f"path RMS {r_in:.2f} | {r_p:.2f} | {r_s:.2f} px "
              f"(untracked steps {f_in}/{f_p}/{f_s}) — "
              f"wrote {args.out_dir}/sway_side_by_side.mp4")
    return 0


if __name__ == "__main__":
    sys.exit(main())
