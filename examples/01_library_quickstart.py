#!/usr/bin/env python
"""Library quickstart: stabilize an in-memory clip with a pretrained
preset and measure the PSNR improvement against ground truth.

Mirrors what the reference's README-level usage would be (reference
mount empty — SURVEY.md §0): load weights, feed frames, get stabilized
frames. Runs anywhere; on CPU the warp uses the lax oracle path.

    python examples/01_library_quickstart.py [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu",
                    help="cpu (anywhere) or leave default on a TPU host")
    ap.add_argument("--frames", type=int, default=24)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.pipeline.stabilize import Stabilizer
    from dvsg_tpu.train.synthetic import synthetic_clip_u8
    from dvsg_tpu.utils.checkpoint import load_npz
    from dvsg_tpu.train.eval import evaluate_synthetic

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, mcfg = load_npz(os.path.join(root, "checkpoints",
                                         "flagship_fast.npz"))
    cfg = StabilizeConfig(model=mcfg, chunk_frames=8)

    # Stabilize any (T, H, W, 3) uint8 array:
    shaky, _, _ = synthetic_clip_u8(jax.random.key(0), args.frames,
                                    240, 320)
    stab = Stabilizer(cfg, params)
    stable = stab.stabilize_clip(np.asarray(shaky))
    print(f"stabilized {stable.shape[0]} frames "
          f"({stable.shape[2]}x{stable.shape[1]}, dtype {stable.dtype})")

    # Score it the way train/eval.py does: PSNR vs the smoothed-path
    # ground truth (the window-mean camera pose a stabilizer targets).
    metrics = evaluate_synthetic(stab, jax.random.key(1), args.frames,
                                 240, 320)
    print(f"PSNR vs smoothed-path target: "
          f"{metrics['psnr_identity']:.2f} dB shaky -> "
          f"{metrics['psnr_vs_target']:.2f} dB stabilized "
          f"(gain {metrics['psnr_gain_db']:+.2f} dB, "
          f"stability gain {metrics['stability_gain']:.2f})")


if __name__ == "__main__":
    main()
