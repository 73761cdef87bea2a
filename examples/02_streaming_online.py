#!/usr/bin/env python
"""Streaming (live-source) stabilization with the frame-push API.

`OnlineStabilizer` is the surface for webcams / RTP feeds / any source
that produces one frame at a time: push frames in, collect stabilized
frames as each device chunk completes. `chunk_frames` trades latency
for throughput — 1 gives frame-level latency (~1.3 ms/frame on one v5e
chip at 720p), larger chunks amortize dispatch.

    python examples/02_streaming_online.py [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--chunk-frames", type=int, default=4)
    ap.add_argument("--path-smooth", type=int, default=0,
                    help="EMA horizon for live camera-path smoothing "
                         "(causal, so it is NATIVE to this surface; the "
                         "(x, y, rot, log-scale) state threads through "
                         "push/flush automatically)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.pipeline.online import OnlineStabilizer
    from dvsg_tpu.train.synthetic import synthetic_clip_u8
    from dvsg_tpu.utils.checkpoint import load_npz

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, mcfg = load_npz(os.path.join(root, "checkpoints",
                                         "flagship_fast.npz"))
    cfg = StabilizeConfig(model=mcfg, chunk_frames=args.chunk_frames,
                          path_smooth=args.path_smooth)

    # Stand-in for a live source: a synthetic shaky clip, frame by frame.
    shaky, _, _ = synthetic_clip_u8(jax.random.key(0), args.frames,
                                    240, 320)
    source = (np.asarray(f) for f in shaky)

    stab = OnlineStabilizer(cfg, params)
    n_out = 0
    for i, frame in enumerate(source):
        for out in stab.push(frame):          # 0 or chunk_frames frames
            n_out += 1
        print(f"pushed frame {i:2d} -> {n_out:2d} stabilized so far")
    for out in stab.flush():                  # drain the partial chunk
        n_out += 1
    print(f"done: {n_out}/{args.frames} stabilized frames "
          f"(shape {out.shape}, dtype {out.dtype})")


if __name__ == "__main__":
    main()
