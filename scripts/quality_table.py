#!/usr/bin/env python
"""No-ground-truth quality table: the literature trio on real-ish clips.

Runs the stability / cropping-ratio / distortion-value protocol
(utils/stab_metrics.py — LK feature tracking + robust similarity fits,
i.e. the measurement applies to REAL footage, not just synthetic PSNR)
over a fixed set of fixtures, with and without path smoothing, and
prints a markdown table. The committed numbers live in STATUS.md; the
regression gates live in tests/test_quality_table.py (margins below the
measured values, so quality regressions on real-ish footage fail CI —
VERDICT round-4 item 6).

Fixtures (all LK-trackable multi-octave texture, 64 frames, 256x320):
  sway      translation sway (period 40/56) + white jitter
  rot-sway  + rotation sway (period 48)
  zoom-sway + log-scale sway (period 48)
  handheld  full 5-param random handheld walk (trans+angle+perspective)

Run: python scripts/quality_table.py [--json out.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def make_fixture(name, t_n=64, h=256, w=320):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvsg_tpu.train import synthetic

    t = np.arange(t_n)
    rng = np.random.default_rng(3)
    still = synthetic.random_still(jax.random.key(11), h, w)
    if name == "handheld":
        path = synthetic.random_camera_path(jax.random.key(4), t_n,
                                            max_trans=0.05,
                                            max_angle=0.03,
                                            max_persp=0.01)
        frames = jax.vmap(lambda p: synthetic.jitter_frame(still, p))(path)
    elif name == "zoom-sway":
        path4 = np.zeros((t_n, 4), np.float32)
        path4[:, 0] = 0.03 * np.sin(2 * np.pi * t / 40) \
            + rng.normal(0, 0.008, t_n)
        path4[:, 1] = 0.03 * np.sin(2 * np.pi * t / 56 + 1.0) \
            + rng.normal(0, 0.008, t_n)
        path4[:, 3] = 0.04 * np.sin(2 * np.pi * t / 48 + 0.5) \
            + rng.normal(0, 0.004, t_n)
        from dvsg_tpu.ops import grid as grid_ops
        from dvsg_tpu.ops.warp_ref import bilinear_warp
        frames = jax.vmap(lambda p: bilinear_warp(
            still, grid_ops.homography_grid(
                synthetic.similarity_theta(p), h, w)))(jnp.asarray(path4))
    else:
        path5 = np.zeros((t_n, 5), np.float32)
        path5[:, 0] = 0.05 * np.sin(2 * np.pi * t / 40) \
            + rng.normal(0, 0.008, t_n)
        path5[:, 1] = 0.04 * np.sin(2 * np.pi * t / 56 + 1.0) \
            + rng.normal(0, 0.008, t_n)
        if name == "rot-sway":
            path5[:, 2] = 0.05 * np.sin(2 * np.pi * t / 48 + 0.5) \
                + rng.normal(0, 0.004, t_n)
        frames = jax.vmap(
            lambda p: synthetic.jitter_frame(still, jnp.asarray(p)))(
            jnp.asarray(path5))
    return np.asarray(jnp.clip(jnp.round(frames * 255), 0,
                               255).astype(jnp.uint8))


def measure(name, clip, params, mcfg, horizon):
    import numpy as np

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.pipeline.stabilize import Stabilizer
    from dvsg_tpu.utils import stab_metrics

    row = {"fixture": name}
    outs = {}
    for smooth in (0, horizon):
        cfg = StabilizeConfig(model=mcfg, chunk_frames=16,
                              warp_impl="lax", path_smooth=smooth)
        outs[smooth] = Stabilizer(cfg, params).stabilize_clip(clip)
    for tag, frames_out in (("plain", outs[0]), ("smooth", outs[horizon])):
        rep = stab_metrics.stability_report(clip, frames_out)
        row[f"stability_{tag}"] = round(rep["stability_out"], 4)
        row[f"crop_{tag}"] = round(rep["cropping_ratio"], 4)
        row[f"distortion_{tag}"] = round(rep["distortion_value"], 4)
        if tag == "plain":
            row["stability_in"] = round(rep["stability_in"], 4)
        cp = stab_metrics.camera_path(frames_out)
        cp = np.where(np.isnan(cp), 0.0, cp)
        p = np.cumsum(cp[:, :2], axis=0)
        row[f"t_rms_{tag}"] = round(float(np.sqrt(
            ((p - p.mean(0)) ** 2).mean())), 3)
    cp = stab_metrics.camera_path(clip)
    cp = np.where(np.isnan(cp), 0.0, cp)
    p = np.cumsum(cp[:, :2], axis=0)
    row["t_rms_in"] = round(float(np.sqrt(((p - p.mean(0)) ** 2).mean())), 3)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dvsg_tpu.utils import checkpoint as ckpt
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    params, mcfg = ckpt.load_npz(
        os.path.join(root, "checkpoints", "flagship_fast.npz"))

    rows = []
    for name in ("sway", "rot-sway", "zoom-sway", "handheld"):
        clip = make_fixture(name)
        row = measure(name, clip, params, mcfg, args.horizon)
        rows.append(row)
        print(f"{name}: {row}", flush=True)

    cols = ["fixture", "t_rms_in", "t_rms_plain", "t_rms_smooth",
            "stability_in", "stability_plain", "stability_smooth",
            "crop_plain", "crop_smooth", "distortion_plain",
            "distortion_smooth"]
    print("\n| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r.get(c, "")) for c in cols) + " |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
