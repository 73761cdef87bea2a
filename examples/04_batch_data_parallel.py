#!/usr/bin/env python
"""Multi-clip batch, sharded per-clip over every visible device.

The config-5 deployment shape (SURVEY.md §3.5): a batch of clips is
stabilized by ONE device program, vmapped over clips and sharded over
the mesh's "data" axis — zero steady-state collectives, linear scaling.
On a v5e-8 each chip takes its share of the clips; here we force an
8-device virtual CPU mesh so the same sharded program runs anywhere.

    python examples/04_batch_data_parallel.py
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.parallel import dp, mesh as mesh_lib
    from dvsg_tpu.train.synthetic import synthetic_clip_u8
    from dvsg_tpu.utils.checkpoint import load_npz

    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, mcfg = load_npz(os.path.join(root, "checkpoints",
                                         "flagship_fast.npz"))
    cfg = StabilizeConfig(model=mcfg, chunk_frames=4)

    # 8 clips -> 1 per device. Clips in one batch share a resolution;
    # mixed resolutions go in separate batches (see serve.py's splitter).
    clips = np.stack([
        np.asarray(synthetic_clip_u8(jax.random.key(i), 8, 120, 160)[0])
        for i in range(8)])

    stab = dp.ShardedClipStabilizer(cfg, params,
                                    mesh_lib.make_mesh())
    out = stab.stabilize_clips(clips)
    print(f"stabilized {out.shape[0]} clips x {out.shape[1]} frames "
          f"on {len(jax.devices())} devices: {out.shape}, {out.dtype}")


if __name__ == "__main__":
    main()
