#!/usr/bin/env python
"""Deployment export: serialize the stabilization program, then run it
from the artifact alone (no model code, no checkpoint on the serving
host).

Build host:   export the chunk program with weights baked in into a
              single .dvsgx file (optionally `--for-platform tpu` to
              cross-lower for a TPU fleet from a CPU box).
Serving host: `load_exported(path)` and call `.stabilize_clip` — the
              output is bit-identical to the live pipeline
              (tests/test_export.py pins this).

    python examples/06_export_deploy.py [--platform cpu]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--frames", type=int, default=12)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from dvsg_tpu import export as export_lib
    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.train.synthetic import synthetic_clip_u8
    from dvsg_tpu.utils.checkpoint import load_npz

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, mcfg = load_npz(os.path.join(root, "checkpoints",
                                         "flagship_fast.npz"))
    h, w = 240, 320
    cfg = StabilizeConfig(model=mcfg, chunk_frames=8,
                          warp_impl="lax" if args.platform == "cpu"
                          else "auto")

    # --- build host: one call, one file ---------------------------------
    path = os.path.join(tempfile.mkdtemp(), "flagship_fast_240p.dvsgx")
    exp = export_lib.export_chunk_program(cfg, params, h, w)
    export_lib.save_exported(exp, path, cfg)
    print(f"exported -> {path} ({os.path.getsize(path) / 1e6:.1f} MB, "
          f"platforms {list(exp.platforms)})")

    # --- serving host: artifact only ------------------------------------
    loaded = export_lib.load_exported(path)
    shaky, _, _ = synthetic_clip_u8(jax.random.key(0), args.frames, h, w)
    stable = loaded.stabilize_clips if loaded.batched else \
        loaded.stabilize_clip
    out = stable(np.asarray(shaky))
    print(f"stabilized {out.shape[0]} frames from the artifact "
          f"(T={loaded.chunk_frames}, {loaded.width}x{loaded.height})")


if __name__ == "__main__":
    main()
