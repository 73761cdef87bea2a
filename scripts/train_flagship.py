#!/usr/bin/env python
"""Train the flagship stabilization model on synthetic-jitter clips.

No pretrained reference weights exist on this machine (SURVEY.md §0), so
the in-repo pretrained checkpoint (checkpoints/flagship.npz) is produced by
this script. Runs on whatever backend is default (TPU under axon); uses the
DP mesh when more than one device is present.

  python scripts/train_flagship.py --steps 4000 --batch-size 32
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--learning-rate", type=float, default=3e-4)
    p.add_argument("--window", type=int, default=5)
    p.add_argument("--model-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--grid-size", type=int, nargs=2, default=(16, 16))
    p.add_argument("--blocks-per-level", type=int, default=2)
    p.add_argument("--base-features", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="checkpoints/flagship")
    p.add_argument("--npz", default="checkpoints/flagship.npz")
    p.add_argument("--eval-frames", type=int, default=48)
    p.add_argument("--eval-size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save-every", type=int, default=1000,
                   help="mid-run checkpoint interval in steps (0 = only "
                        "at the end). Through the axon tunnel a 256^2 "
                        "train-state save costs ~13 min of host transfer, "
                        "so long tunnel runs want this large.")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from dvsg_tpu.config import ModelConfig, StabilizeConfig, TrainConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.parallel import dp, mesh as mesh_lib
    from dvsg_tpu.pipeline.stabilize import Stabilizer
    from dvsg_tpu.train import loop
    from dvsg_tpu.train.eval import evaluate_synthetic
    from dvsg_tpu.utils import checkpoint as ckpt

    mcfg = ModelConfig(window=args.window,
                       model_size=tuple(args.model_size),
                       grid_size=tuple(args.grid_size),
                       blocks_per_level=args.blocks_per_level,
                       base_features=args.base_features)
    tcfg = TrainConfig(model=mcfg, steps=args.steps,
                       batch_size=args.batch_size,
                       learning_rate=args.learning_rate, seed=args.seed,
                       checkpoint_every=0)

    n_dev = len(jax.devices())
    print(f"backend={jax.default_backend()} devices={n_dev}")
    state = loop.init_state(tcfg, jax.random.key(args.seed))
    start_step = 0
    if args.resume and os.path.isdir(args.out):
        # Full-state restore: keeps Adam moments + schedule position
        # (falls back to params-only for legacy checkpoints).
        state = loop.load_train_state(tcfg, args.out)
        start_step = int(state.step)
        print(f"resumed at step {start_step}")

    rng = jax.random.key(tcfg.seed)
    t0 = time.perf_counter()
    if n_dev > 1 and tcfg.batch_size % n_dev == 0:
        mesh = mesh_lib.make_mesh()
        state = dp.replicate_state(state, mesh)
        step_fn, shard_keys = dp.make_dp_train_step(tcfg, mesh)
        stepper = lambda s, k: step_fn(s, shard_keys(k))
        print(f"DP over {n_dev} devices")
    else:
        stepper = lambda s, k: loop.train_step(s, k, tcfg)

    for step in range(start_step, tcfg.steps):
        state, aux = stepper(state, jax.random.fold_in(rng, step))
        if step % 100 == 0 or step == tcfg.steps - 1:
            aux = jax.device_get(aux)
            rate = (step - start_step + 1) / (time.perf_counter() - t0)
            print(f"step {step:5d} pixel={aux['pixel']:.5f} "
                  f"offset={aux['offset']:.6f} ({rate:.1f} steps/s)",
                  flush=True)
        if args.save_every and step and step % args.save_every == 0:
            host_state = jax.device_get(state)
            ckpt.save_checkpoint(args.out, host_state.params, mcfg,
                                 step=step)
            ckpt.save_train_state(args.out, host_state._asdict(), step=step)

    params = jax.device_get(state.params)
    ckpt.save_checkpoint(args.out, params, mcfg, step=tcfg.steps)
    os.makedirs(os.path.dirname(args.npz) or ".", exist_ok=True)
    ckpt.export_npz(args.npz, params, mcfg)
    print(f"saved {args.out} and {args.npz}")

    # Quality gate: synthetic-jitter eval (SURVEY.md §4).
    scfg = StabilizeConfig(model=mcfg, chunk_frames=16, warp_impl="auto")
    stab = Stabilizer(scfg, params)
    h, w = args.eval_size
    for i in range(2):
        m = evaluate_synthetic(stab, jax.random.key(1000 + i),
                               args.eval_frames, h, w)
        print(f"eval clip {i}: " + " ".join(f"{k}={v:.3f}"
                                            for k, v in m.items()),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
