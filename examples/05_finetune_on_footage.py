#!/usr/bin/env python
"""Fine-tune on your own footage, then evaluate on it.

The trainer's base imagery can come from your clips instead of
procedural noise (the synthetic jitter path and exact ground-truth
supervision are unchanged — see docs/API.md "Training"). This example
runs the whole loop end to end with a tiny model so it finishes on CPU:

  1. write a small "user clip" to disk,
  2. build an image bank from it (train/data.py) and train on that bank,
  3. evaluate on held-out frames of the same clip with
     evaluate_synthetic(still=...).

With a real clip, swap step 1 for your file and raise --steps:

    dvsg-train --checkpoint ckpt/ --steps 4000 --data myclip.mp4
    dvsg-eval  --checkpoint ckpt/ --stills myclip.mp4

    python examples/05_finetune_on_footage.py [--steps 120]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--steps", type=int, default=120)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from dvsg_tpu.config import ModelConfig, StabilizeConfig, TrainConfig
    from dvsg_tpu.pipeline.stabilize import Stabilizer
    from dvsg_tpu.train import loop
    from dvsg_tpu.train.data import build_image_bank
    from dvsg_tpu.train.eval import evaluate_synthetic
    from dvsg_tpu.train.synthetic import synthetic_clip_u8
    from dvsg_tpu.utils import video_io

    # 1. A stand-in for "your clip" (any video file or frame dir works).
    clip = os.path.join(tempfile.mkdtemp(), "mine.mp4")
    frames, _, _ = synthetic_clip_u8(jax.random.key(11), 16, 96, 128)
    with video_io.VideoWriter(clip, 128, 96) as w:
        w.write_batch(np.asarray(frames))

    # 2. Bank of random crops from the clip -> train on it.
    mcfg = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                       base_features=8, blocks_per_level=1,
                       max_offset=0.15)
    bank = build_image_bank(clip, mcfg.model_size, num_images=16)
    print(f"bank: {bank.shape[0]} crops from {os.path.basename(clip)}")
    tcfg = TrainConfig(model=mcfg, batch_size=4, steps=args.steps,
                       warmup_steps=10, learning_rate=1e-3,
                       checkpoint_every=0)
    state = loop.train(tcfg, log_every=max(args.steps // 4, 1), bank=bank)

    # 3. Evaluate on a held-out frame of the same footage.
    with video_io.VideoReader(clip) as r:
        held_out = [f for f in r][-1]
    import cv2
    still = cv2.resize(held_out, (64, 48),
                       interpolation=cv2.INTER_AREA).astype(np.float32) / 255
    stab = Stabilizer(StabilizeConfig(model=mcfg, chunk_frames=8,
                                      warp_impl="lax"), state.params)
    m = evaluate_synthetic(stab, jax.random.key(2), 10, 48, 64, still=still)
    print(f"on held-out footage: {m['psnr_identity']:.2f} dB shaky -> "
          f"{m['psnr_vs_target']:.2f} dB stabilized "
          f"(gain {m['psnr_gain_db']:+.2f} dB)")


if __name__ == "__main__":
    main()
