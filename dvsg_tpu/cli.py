"""Command-line entry points, preserving the reference's public surface:
stabilize a video file or frame directory into stabilized output
(BASELINE.json north_star; SURVEY.md §1 L7 — reference mount empty,
citation unavailable).

  python -m dvsg_tpu.cli stabilize --input shaky.mp4 --output stable.mp4
  python -m dvsg_tpu.cli train --checkpoint ckpt/ --steps 1000
  python stabilize.py --input frames_dir/ --output out_dir/   (root wrapper)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


# ModelConfig-matching defaults, applied in _model_cfg; the parser uses
# None sentinels so _resolve_preset can tell "user asked for a custom
# architecture" (keep the untrained model) from "no model args at all"
# (default to the committed fast preset).
_MODEL_ARG_DEFAULTS = {"window": 5, "model_size": (256, 256),
                       "grid_size": (16, 16), "dtype": "float32"}


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--window", type=int, default=None,
                   help="temporal window length N (default 5)")
    p.add_argument("--model-size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="CNN input resolution (default 256 256)")
    p.add_argument("--grid-size", type=int, nargs=2, default=None,
                   metavar=("GH", "GW"),
                   help="coarse control grid (default 16 16)")
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default=None, help="CNN compute dtype (default float32)")


def _custom_arch(args) -> bool:
    # --dtype is a compute knob, not architecture: it never invalidates
    # preset weights (it is re-applied onto any loaded config instead).
    return any(getattr(args, k, None) is not None
               for k in _MODEL_ARG_DEFAULTS if k != "dtype")


def _apply_dtype(mcfg, args):
    """Fold an explicit --dtype onto a loaded checkpoint's config."""
    if getattr(args, "dtype", None) and args.dtype != mcfg.dtype:
        import dataclasses
        mcfg = dataclasses.replace(mcfg, dtype=args.dtype)
    return mcfg


def _model_cfg(args):
    from dvsg_tpu.config import ModelConfig
    d = {k: v if (v := getattr(args, k, None)) is not None else dflt
         for k, dflt in _MODEL_ARG_DEFAULTS.items()}
    return ModelConfig(window=d["window"],
                       model_size=tuple(d["model_size"]),
                       grid_size=tuple(d["grid_size"]),
                       dtype=d["dtype"])


def _load_any_checkpoint(path):
    """Load params+config from an orbax dir or a single-file .npz."""
    from dvsg_tpu.utils import checkpoint as ckpt
    if path.endswith(".npz"):
        params, mcfg = ckpt.load_npz(path)
        print(f"loaded npz checkpoint {path}")
    else:
        params, mcfg, step = ckpt.load_checkpoint(path)
        print(f"loaded checkpoint step {step} from {path}")
    return params, mcfg


_PRESETS = {"fast": "flagship_fast.npz", "quality": "flagship.npz"}


def _resolve_preset(args):
    """--preset fast|quality → the committed checkpoint, unless an
    explicit --checkpoint was given (which wins).

    With NO checkpoint, NO preset, and NO custom model-architecture
    flags, default to the committed fast preset when it exists: a bare
    ``stabilize --input x --output y`` should use the shipped trained
    model, not a random-init identity. Any explicit architecture flag
    keeps the untrained model (preset weights can't fit a custom arch).
    """
    if getattr(args, "checkpoint", None):
        return
    preset = getattr(args, "preset", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not preset:
        if _custom_arch(args):
            return
        path = os.path.join(root, "checkpoints", _PRESETS["fast"])
        if os.path.exists(path):
            print("no --checkpoint/--preset given; defaulting to the "
                  "committed 'fast' pretrained model", file=sys.stderr)
            args.checkpoint = path
        return
    path = os.path.join(root, "checkpoints", _PRESETS[preset])
    if not os.path.exists(path):
        print(f"ERROR: preset '{preset}' needs {path} (not found); "
              "pass --checkpoint instead", file=sys.stderr)
        raise SystemExit(2)
    args.checkpoint = path


def _auto_chunk(height: int, width: int, n_clips: int = 1) -> int:
    """Resolution-keyed chunk_frames pick (config.auto_chunk_frames) with
    the backend check and a one-line notice so runs are reproducible."""
    from dvsg_tpu.config import auto_chunk_frames
    from dvsg_tpu.ops.warp import _on_tpu
    on_tpu = _on_tpu()
    t = auto_chunk_frames(height, width, n_clips=n_clips, on_tpu=on_tpu)
    extra = f" x{n_clips} clips" if n_clips > 1 else ""
    print(f"--chunk-frames not given; auto-picked T={t} for "
          f"{width}x{height}{extra} ({'tpu' if on_tpu else 'cpu'} sweep)",
          file=sys.stderr)
    return t


def _parse_border_crop(val):
    """'auto' | float in [0, 0.5) | None (parse error, message printed).

    The range is enforced HERE so bad values fail before any
    checkpoint/reader/device work (the fail-fast pattern of
    _bad_strength); StabilizeConfig.__post_init__ re-validates."""
    s = str(val).strip().lower()
    if s == "auto":
        return "auto"
    try:
        f = float(s)
    except ValueError:
        f = -1.0
    if not 0.0 <= f < 0.5:
        print(f"ERROR: --border-crop must be a fraction in [0, 0.5) or "
              f"'auto', got {val!r}", file=sys.stderr)
        return None
    return f


def _run_autocrop_scan(cfg, params, input_paths, video_io):
    """Pass 1 of --border-crop auto: scan the input(s) with fresh
    readers, report, and return the picked crop fraction.

    The single shared report/warning site for BOTH CLIs: one clip scans
    through the scalar program (bit-identical to pass 2); several scan
    in lockstep through one vmapped program (mirroring how batched
    pass 2 drives them) and share the max."""
    from dvsg_tpu.pipeline.autocrop import (crop_for_max_offset,
                                            scan_readers_max_offset,
                                            smoothing_margin)
    t0 = time.perf_counter()
    readers = [video_io.VideoReader(p_) for p_ in input_paths]
    try:
        m = scan_readers_max_offset(cfg, params, readers)
    finally:
        for r in readers:
            r.close()
    # The smoothing stage adds up to this much beyond the predicted
    # offsets the scan measured (same margin pick_border_crop applies).
    m += smoothing_margin(cfg)
    crop, capped = crop_for_max_offset(m)
    extra = (f" (shared over {len(input_paths)} clips)"
             if len(input_paths) > 1 else "")
    print(f"auto border-crop{extra}: max |offset| {m:.4f} -> crop "
          f"{crop:.4f} ({round(crop * 64)}/64, scan "
          f"{time.perf_counter() - t0:.1f}s)", file=sys.stderr)
    if capped:
        print("WARNING: clip motion exceeds the largest valid crop "
              "(31/64); residual borders will be edge-clamped",
              file=sys.stderr)
    return crop


def _bad_strength(strength: float) -> bool:
    """One shared pre-flight --strength check (the range lives in
    StabilizeConfig.__post_init__; this just fails fast with a clean
    CLI message before any checkpoint/device work)."""
    if 0.0 <= strength <= 2.0:
        return False
    print("ERROR: --strength must be in [0, 2]", file=sys.stderr)
    return True


def _add_preset_arg(p):
    p.add_argument("--preset", choices=tuple(_PRESETS),
                   help="use a committed pretrained model: 'fast' "
                        "(128^2 encoder, highest throughput) or "
                        "'quality' (256^2 flagship, ~1 dB higher PSNR)")


def stabilize_main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="dvsg-stabilize",
        description="Stabilize a video file or frame directory (TPU-native "
                    "DVSG pipeline).")
    p.add_argument("--input", required=True,
                   help="input video file or frame directory")
    p.add_argument("--output", required=True,
                   help="output video file or frame directory")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (from dvsg-train); identity model "
                        "if omitted")
    _add_preset_arg(p)
    p.add_argument("--artifact", default=None, metavar="DVSGX",
                   help="run from a dvsg-export artifact instead of a "
                        "checkpoint (config/weights/chunk size are baked "
                        "in; input resolution must match the export)")
    p.add_argument("--chunk-frames", type=int, default=None,
                   help="frames per device step (default: measured-best "
                        "for the input resolution, see "
                        "config.auto_chunk_frames)")
    p.add_argument("--warp-impl", choices=("auto", "pallas", "lax"),
                   default=None, help="warp kernel (default: auto)")
    p.add_argument("--overlap", action="store_true",
                   help="overlap host decode/encode with device compute")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (cpu/tpu)")
    p.add_argument("--metrics-out", default=None,
                   help="append a JSONL metrics record here")
    p.add_argument("--border-crop", default="0",
                   help="crop fraction zoomed into the warp (hides "
                        "stabilized borders), or 'auto': a cheap predict-"
                        "only first pass over the input picks the minimal "
                        "crop that hides every border (two-pass, like "
                        "vidstab detect/transform)")
    p.add_argument("--strength", type=float, default=None,
                   help="stabilization strength: 1 = full correction "
                        "(default), 0 = passthrough, values between keep "
                        "some of the original camera motion")
    p.add_argument("--path-smooth", type=int, default=0, metavar="FRAMES",
                   help="cross-chunk camera-path smoothing horizon in "
                        "frames (0 = off): removes low-frequency "
                        "drift/sway the model's short window passes "
                        "through, via an EMA over the measured camera "
                        "path (pipeline/pathsmooth.py); try 32")
    p.add_argument("--path-smooth-max", type=float, default=0.05,
                   help="clamp on the extra smoothing correction per "
                        "frame, per component (x/y normalized units, "
                        "rotation radians; bounds the border revealed; "
                        "default 0.05)")
    p.add_argument("--path-smooth-no-rotation", action="store_true",
                   help="do not measure/smooth rotation sway (on by "
                        "default)")
    p.add_argument("--path-smooth-no-scale", action="store_true",
                   help="do not measure/smooth zoom/scale sway (on by "
                        "default; rides the same half-frame measurement "
                        "as rotation)")
    p.add_argument("--path-smooth-lag", type=int, default=0, metavar="D",
                   help="fixed-lag smoothing: delay output by D frames "
                        "and smooth the path with a ZERO-PHASE two-sided "
                        "filter over the D-frame lookahead instead of "
                        "the causal EMA — tracks the path tighter at the "
                        "same clamp (offline runs; not with --overlap); "
                        "try half of --path-smooth")
    p.add_argument("--path-smooth-conf", type=float, default=2.0,
                   help="confidence gate on the path measurement "
                        "(peak-to-second-peak ratio of the correlation "
                        "surface): deltas from pairs below it are "
                        "zeroed — scene cuts, flat stretches, and "
                        "occlusions then decay gracefully instead of "
                        "poisoning the smoother; 0 disables (default 2.0)")
    p.add_argument("--path-smooth-cut", type=float, default=1.5,
                   help="scene-cut gate (<= --path-smooth-conf): below "
                        "this ratio the smoothing filter RESETS — the "
                        "correction restarts at zero exactly where the "
                        "content discontinues; 0 disables (default 1.5)")
    p.add_argument("--resume-dir", default=None,
                   help="flush resume state here each chunk; restart "
                        "resumes at the last flushed chunk (frame-dir "
                        "outputs only)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the steady-state "
                        "loop into this dir and print an op summary")
    _add_model_args(p)
    args = p.parse_args(argv)
    border_crop = _parse_border_crop(args.border_crop)
    if border_crop is None:
        return 2
    if args.artifact and (args.checkpoint or args.preset):
        print("ERROR: --artifact already contains the weights; drop "
              "--checkpoint/--preset", file=sys.stderr)
        return 2
    if border_crop == "auto" and args.artifact:
        print("ERROR: --border-crop auto needs the two-pass pipeline; "
              "an --artifact bakes its crop at export time", file=sys.stderr)
        return 2
    if args.artifact and border_crop != 0.0:
        # A silently-dropped explicit crop would change the output
        # framing without notice.
        print("ERROR: the artifact's border-crop was baked at export "
              "time; re-export with dvsg-export --border-crop",
              file=sys.stderr)
        return 2
    if args.artifact:
        # Same rationale as --border-crop above: these are baked into the
        # exported program, so accepting-and-ignoring them would silently
        # change behavior vs what the user asked for.
        baked = [name for name, given in
                 (("--strength", args.strength is not None),
                  ("--chunk-frames", args.chunk_frames is not None),
                  ("--warp-impl", args.warp_impl is not None),
                  ("--path-smooth", args.path_smooth != 0)) if given]
        if baked:
            print(f"ERROR: {', '.join(baked)}: baked into the artifact at "
                  "export time; re-export with dvsg-export, or stabilize "
                  "from a checkpoint", file=sys.stderr)
            return 2
    strength = 1.0 if args.strength is None else args.strength
    warp_impl = args.warp_impl or "auto"
    if not args.artifact:
        _resolve_preset(args)
    if args.overlap and args.resume_dir:
        print("ERROR: --overlap has no resume support; drop --overlap for "
              "a resumable run (or --resume-dir for an overlapped one)",
              file=sys.stderr)
        return 2
    from dvsg_tpu.utils.video_io import is_container_path
    if args.resume_dir and is_container_path(args.output):
        # Opening cv2.VideoWriter on an existing container TRUNCATES it, so
        # a crashed resumable job would lose its partial output the moment
        # the re-run starts — and then fail the appendability check anyway.
        # Refuse before any writer is constructed.
        print("ERROR: --resume-dir needs a frame-directory --output "
              "(video containers cannot be appended to on resume)",
              file=sys.stderr)
        return 2

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.pipeline.stabilize import Stabilizer
    from dvsg_tpu.utils import profiling, video_io
    from dvsg_tpu.utils.metrics import StageTimer, write_metrics_jsonl

    reader = video_io.VideoReader(args.input)
    if args.artifact:
        from dvsg_tpu import export as export_lib
        loaded = export_lib.load_exported(args.artifact)
        if (reader.height, reader.width) != (loaded.height, loaded.width):
            print(f"ERROR: artifact was exported for "
                  f"{loaded.width}x{loaded.height}; input is "
                  f"{reader.width}x{reader.height} (re-export with "
                  "--size, or stabilize from a checkpoint)",
                  file=sys.stderr)
            reader.close()
            return 2
        cfg = loaded.cfg
        stab = loaded.engine()
        print(f"artifact {args.artifact}: T={cfg.chunk_frames}, "
              f"warp={cfg.warp_impl}, strength={cfg.strength}, "
              f"border_crop={cfg.border_crop}, "
              f"path_smooth={cfg.path_smooth} (baked at export)",
              file=sys.stderr)
    else:
        if args.checkpoint:
            params, mcfg = _load_any_checkpoint(args.checkpoint)
            mcfg = _apply_dtype(mcfg, args)
        else:
            mcfg = _model_cfg(args)
            params = motion_cnn.init_params(mcfg, jax.random.key(0))
            print("WARNING: no --checkpoint given; using an untrained "
                  "(identity) model", file=sys.stderr)

        if _bad_strength(strength):
            return 2
        if args.path_smooth < 0 or not 0 <= args.path_smooth_max <= 0.25:
            print("ERROR: --path-smooth must be >= 0 and "
                  "--path-smooth-max in [0, 0.25]", file=sys.stderr)
            return 2
        chunk = args.chunk_frames or _auto_chunk(reader.height,
                                                 reader.width)
        if border_crop == "auto":
            # Pass 1 shares chunking/strength with pass 2 so both passes
            # predict identical offsets (pipeline/autocrop.py); it also
            # carries path_smooth so the crop reserves the smoothing
            # clamp's margin.
            scan_cfg = StabilizeConfig(
                model=mcfg, chunk_frames=chunk, warp_impl=warp_impl,
                strength=strength, path_smooth=args.path_smooth,
                path_smooth_max=args.path_smooth_max,
                path_smooth_rotation=not args.path_smooth_no_rotation,
                path_smooth_scale=not args.path_smooth_no_scale,
                path_smooth_conf=args.path_smooth_conf,
                path_smooth_cut=args.path_smooth_cut,
                path_smooth_lag=args.path_smooth_lag)
            border_crop = _run_autocrop_scan(scan_cfg, params,
                                             [args.input], video_io)
        cfg = StabilizeConfig(
            model=mcfg, chunk_frames=chunk, warp_impl=warp_impl,
            border_crop=border_crop, strength=strength,
            path_smooth=args.path_smooth,
            path_smooth_max=args.path_smooth_max,
            path_smooth_rotation=not args.path_smooth_no_rotation,
            path_smooth_scale=not args.path_smooth_no_scale,
            path_smooth_conf=args.path_smooth_conf,
            path_smooth_cut=args.path_smooth_cut,
            path_smooth_lag=args.path_smooth_lag)
        stab = Stabilizer(cfg, params)
    writer = video_io.VideoWriter(args.output, reader.width, reader.height,
                                  reader.fps)
    timer = StageTimer()
    t0 = time.perf_counter()
    with profiling.trace(args.profile_dir):
        if args.overlap:
            from dvsg_tpu.pipeline.overlap import stabilize_stream_overlapped
            n = stabilize_stream_overlapped(stab, reader, writer,
                                            timer=timer)
        else:
            n = stab.stabilize_stream(reader, writer, timer=timer,
                                      resume_dir=args.resume_dir)
    wall = time.perf_counter() - t0
    if args.profile_dir:
        summary = profiling.summarize_trace(args.profile_dir)
        for name, rec in list(summary.items())[:8]:
            print(f"  [profile] {rec['mean_ms']:8.2f} ms x{rec['count']:3d} "
                  f"{name[:60]}")
    reader.close()
    writer.close()

    fps = n / wall if wall > 0 else 0.0
    print(f"stabilized {n} frames at {reader.width}x{reader.height} "
          f"in {wall:.2f}s ({fps:.1f} fps)")
    for name, s in timer.summary().items():
        print(f"  {name:8s} total {s['total_s']:7.2f}s  "
              f"mean {s['mean_ms']:7.2f}ms x{s['count']}")
    if stab.coverage_fallbacks:
        print(f"  NOTE: {stab.coverage_fallbacks}/{stab.chunks_seen} "
              "chunks exceeded the fused kernel's coverage band and ran "
              "through the exact (slower) fallback path — output is "
              "correct; this much warp per chunk is unusual for "
              "stabilization corrections")
    if args.metrics_out:
        write_metrics_jsonl(args.metrics_out, {
            "kind": "stabilize", "frames": n, "wall_s": wall, "fps": fps,
            "width": reader.width, "height": reader.height,
            "warp_impl": cfg.warp_impl, "stages": timer.summary(),
            "coverage_fallback_chunks": stab.coverage_fallbacks,
            "chunks": stab.chunks_seen,
        })
    return 0


def train_main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="dvsg-train",
        description="Self-supervised training on synthetic-jitter clips.")
    p.add_argument("--checkpoint", required=True, help="checkpoint out dir")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest step in --checkpoint")
    p.add_argument("--data", nargs="+", default=None, metavar="CLIP",
                   help="fine-tune on your own footage: video files or "
                        "frame dirs used as the base-image bank "
                        "(supervision stays the exact synthetic jitter)")
    p.add_argument("--data-images", type=int, default=256,
                   help="bank size when --data is given (random crops)")
    _add_model_args(p)
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dvsg_tpu.config import TrainConfig
    from dvsg_tpu.train import loop

    cfg = TrainConfig(model=_model_cfg(args), steps=args.steps,
                      batch_size=args.batch_size,
                      learning_rate=args.learning_rate, seed=args.seed)
    bank = None
    if args.data:
        from dvsg_tpu.train.data import build_image_bank_multi
        bank = build_image_bank_multi(args.data, cfg.model.model_size,
                                      num_images=args.data_images,
                                      seed=args.seed)
        print(f"image bank: {bank.shape[0]} crops from "
              f"{len(args.data)} clip(s)")
    state = None
    if args.resume:
        try:
            state = loop.load_train_state(cfg, args.checkpoint)
        except ValueError as e:
            print(f"ERROR: --resume: {e}", file=sys.stderr)
            return 2
        print(f"resuming from step {int(state.step)}")
    loop.train(cfg, checkpoint_dir=args.checkpoint, state=state, bank=bank)
    print(f"saved checkpoint to {args.checkpoint}")
    return 0


def stabilize_batch_main(argv=None) -> int:
    """Batched multi-clip stabilization (BASELINE.json configs 4-5):
    N clips in one device program per chunk, per-clip data parallel over
    the mesh when multiple devices are available."""
    p = argparse.ArgumentParser(
        prog="dvsg-stabilize-batch",
        description="Stabilize a batch of clips concurrently.")
    p.add_argument("--inputs", nargs="+", required=True)
    p.add_argument("--outputs", nargs="+", required=True)
    p.add_argument("--checkpoint", default=None)
    _add_preset_arg(p)
    p.add_argument("--chunk-frames", type=int, default=None,
                   help="per-clip frames per device step (default: "
                        "measured-best for the resolution and clip count)")
    p.add_argument("--warp-impl", choices=("auto", "pallas", "lax"),
                   default="auto")
    p.add_argument("--no-mesh", action="store_true",
                   help="disable data-parallel sharding even with >1 device")
    p.add_argument("--strength", type=float, default=1.0,
                   help="stabilization strength (1 full, 0 passthrough)")
    p.add_argument("--border-crop", default="0",
                   help="crop fraction, or 'auto': predict-only scan over "
                        "ALL clips picks one shared minimal crop (a single "
                        "value keeps the batch in one device program)")
    p.add_argument("--path-smooth", type=int, default=0, metavar="FRAMES",
                   help="cross-chunk camera-path smoothing horizon (see "
                        "dvsg-stabilize --path-smooth); per-clip EMA "
                        "states ride the batched program")
    p.add_argument("--path-smooth-max", type=float, default=0.05,
                   help="clamp on the extra smoothing correction "
                        "(normalized units)")
    p.add_argument("--platform", default=None)
    p.add_argument("--metrics-out", default=None)
    _add_model_args(p)
    args = p.parse_args(argv)
    _resolve_preset(args)
    border_crop = _parse_border_crop(args.border_crop)
    if border_crop is None:
        return 2
    if len(args.inputs) != len(args.outputs):
        print("ERROR: --inputs and --outputs must pair up", file=sys.stderr)
        return 2

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.parallel import mesh as mesh_lib
    from dvsg_tpu.pipeline.multiclip import stabilize_multi
    from dvsg_tpu.utils import video_io
    from dvsg_tpu.utils.metrics import StageTimer, write_metrics_jsonl

    if args.checkpoint:
        params, mcfg = _load_any_checkpoint(args.checkpoint)
        mcfg = _apply_dtype(mcfg, args)
    else:
        mcfg = _model_cfg(args)
        params = motion_cnn.init_params(mcfg, jax.random.key(0))
        print("WARNING: no --checkpoint given; using an untrained "
              "(identity) model", file=sys.stderr)

    if _bad_strength(args.strength):
        return 2
    if args.path_smooth < 0 or not 0 <= args.path_smooth_max <= 0.25:
        print("ERROR: --path-smooth must be >= 0 and "
              "--path-smooth-max in [0, 0.25]", file=sys.stderr)
        return 2
    n_dev = len(jax.devices())
    mesh = None
    if not args.no_mesh and n_dev > 1 and len(args.inputs) % n_dev == 0:
        mesh = mesh_lib.make_mesh()
        print(f"per-clip DP over {n_dev} devices")

    readers = [video_io.VideoReader(p_) for p_ in args.inputs]
    writers = []
    try:
        h, w = readers[0].shape
        for i, r in enumerate(readers):
            if r.shape != (h, w):
                # Fail BEFORE any writer is constructed: opening the
                # writers creates/truncates every output file, so a doomed
                # mixed-resolution batch would clobber pre-existing outputs
                # (stabilize_multi would reject the batch right after).
                print(f"ERROR: all clips must share one resolution for a "
                      f"batch: {args.inputs[i]} is {r.shape[1]}x"
                      f"{r.shape[0]}, {args.inputs[0]} is {w}x{h}; run "
                      "them as separate jobs (or via dvsg-serve, which "
                      "groups by resolution)", file=sys.stderr)
                return 2
        # The auto pick keys on clips-per-device: that is how many chunks
        # stack into one device program.
        clips_per_dev = len(args.inputs) // (n_dev if mesh is not None
                                             else 1)
        chunk = args.chunk_frames or _auto_chunk(h, w,
                                                 n_clips=clips_per_dev)
        if border_crop == "auto":
            scan_cfg = StabilizeConfig(model=mcfg, chunk_frames=chunk,
                                       warp_impl=args.warp_impl,
                                       strength=args.strength,
                                       path_smooth=args.path_smooth,
                                       path_smooth_max=args.path_smooth_max)
            border_crop = _run_autocrop_scan(scan_cfg, params, args.inputs,
                                             video_io)
        cfg = StabilizeConfig(model=mcfg, chunk_frames=chunk,
                              warp_impl=args.warp_impl,
                              border_crop=border_crop,
                              strength=args.strength,
                              path_smooth=args.path_smooth,
                              path_smooth_max=args.path_smooth_max)
        writers = [video_io.VideoWriter(p_, w, h, readers[i].fps)
                   for i, p_ in enumerate(args.outputs)]
        timer = StageTimer()
        t0 = time.perf_counter()
        result = stabilize_multi(cfg, params, readers, writers, mesh=mesh,
                                 timer=timer)
        wall = time.perf_counter() - t0
    finally:
        # Close even when stabilize_multi raises (device-step failure /
        # all clips failed): stabilize_multi has already joined its
        # encode workers, so closing here finalizes the partial output
        # containers — the written[] resume story depends on readable
        # partial outputs.
        for r in readers:
            r.close()
        for w_ in writers:
            w_.close()
    written = result.frames_written
    total = sum(written)
    fps = total / wall if wall else 0.0
    print(f"stabilized {len(written)} clips / {total} frames in "
          f"{wall:.2f}s ({fps:.1f} frames/s aggregate)")
    for i in result.failed_clips:
        print(f"FAILED clip {args.inputs[i]} after {written[i]} frames: "
              f"{result.errors[i]} — re-run it (frame-dir outputs resume "
              "at the written count)", file=sys.stderr)
    cov = result.coverage_fallback_chunks or []
    if any(cov):
        worst = sorted(range(len(cov)), key=lambda i: -cov[i])[:4]
        print("  NOTE: some chunks exceeded the fused kernel's coverage "
              "band and ran through the exact (slower) fallback path — "
              + ", ".join(f"clip {i}: {cov[i]}" for i in worst if cov[i]))
    if args.metrics_out:
        write_metrics_jsonl(args.metrics_out, {
            "kind": "stabilize_batch", "clips": len(written),
            "frames": total, "wall_s": wall, "fps": fps,
            "devices": n_dev, "mesh": mesh is not None,
            "failed_clips": result.failed_clips,
            "coverage_fallback_chunks": cov,
        })
    return 0 if result.ok else 3


def eval_main(argv=None) -> int:
    """Evaluate stabilization quality on synthetic-jitter ground truth
    (SURVEY.md §4: reference-free PSNR gate)."""
    p = argparse.ArgumentParser(
        prog="dvsg-eval",
        description="Evaluate a checkpoint on synthetic shaky clips.")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir; identity model if omitted")
    _add_preset_arg(p)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--size", type=int, nargs=2, default=(480, 640),
                   metavar=("H", "W"))
    p.add_argument("--clips", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk-frames", type=int, default=None,
                   help="frames per device step (default: measured-best "
                        "for --size)")
    p.add_argument("--warp-impl", choices=("auto", "pallas", "lax"),
                   default="auto")
    p.add_argument("--platform", default=None)
    p.add_argument("--metrics-out", default=None)
    p.add_argument("--track-metrics", action="store_true",
                   help="also report the feature-tracking stabilization "
                        "trio (stability score, cropping ratio, "
                        "distortion value) — no ground truth needed, "
                        "host-side cv2 work")
    p.add_argument("--path-smooth", type=int, default=0, metavar="FRAMES",
                   help="evaluate WITH cross-chunk camera-path smoothing "
                        "(see dvsg-stabilize --path-smooth); note "
                        "psnr_vs_target scores against the WINDOW-MEAN "
                        "target, which a smoothed output intentionally "
                        "deviates from — read the steadiness/tracking "
                        "metrics for this mode")
    p.add_argument("--path-smooth-lag", type=int, default=0, metavar="D",
                   help="evaluate the fixed-lag (zero-phase) smoothing "
                        "mode (see dvsg-stabilize --path-smooth-lag)")
    p.add_argument("--stills", default=None, metavar="CLIP",
                   help="evaluate on YOUR imagery: a video/frame dir whose "
                        "frames become the base images (resized to --size, "
                        "one per clip, cycled), jittered with the exact "
                        "synthetic ground truth instead of procedural "
                        "textures")
    _add_model_args(p)
    args = p.parse_args(argv)
    _resolve_preset(args)
    if args.path_smooth < 0:
        print("ERROR: --path-smooth must be >= 0", file=sys.stderr)
        return 2

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.pipeline.stabilize import Stabilizer
    from dvsg_tpu.train.eval import evaluate_synthetic
    from dvsg_tpu.utils.metrics import write_metrics_jsonl

    if args.checkpoint:
        params, mcfg = _load_any_checkpoint(args.checkpoint)
        mcfg = _apply_dtype(mcfg, args)
    else:
        mcfg = _model_cfg(args)
        params = motion_cnn.init_params(mcfg, jax.random.key(0))
        print("WARNING: evaluating an untrained (identity) model",
              file=sys.stderr)

    h, w = args.size
    chunk = args.chunk_frames or _auto_chunk(h, w)
    cfg = StabilizeConfig(model=mcfg, chunk_frames=chunk,
                          warp_impl=args.warp_impl,
                          path_smooth=args.path_smooth,
                          path_smooth_lag=args.path_smooth_lag)
    stab = Stabilizer(cfg, params)
    stills = None
    if args.stills:
        import cv2
        from dvsg_tpu.train.data import iter_sampled_frames
        # Streaming sampler: only the --clips sampled frames are decoded
        # (O(clips) memory, not O(clip) — long footage is the use case).
        try:
            stills = []
            for frame, cnt in iter_sampled_frames(args.stills, args.clips):
                still = cv2.resize(frame, (w, h),
                                   interpolation=cv2.INTER_AREA
                                   ).astype(np.float32) / 255.0
                stills.extend([still] * cnt)
        except ValueError:
            stills = []
        if not stills:
            print(f"ERROR: no frames in {args.stills}", file=sys.stderr)
            return 2
        while len(stills) < args.clips:  # overcounted container metadata
            stills.append(stills[-1])
    agg = {}
    for i in range(args.clips):
        m = evaluate_synthetic(stab, jax.random.key(args.seed + i),
                               args.frames, h, w,
                               track_metrics=args.track_metrics,
                               still=None if stills is None else stills[i])
        print(f"clip {i}: " + "  ".join(f"{k}={v:.3f}"
                                        for k, v in m.items()))
        for k, v in m.items():
            agg.setdefault(k, []).append(v)
    # nanmean: a clip whose feature tracking failed reports NaN for the
    # tracking trio — it must not poison the other clips' aggregate.
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slice
        mean = {k: float(np.nanmean(v)) for k, v in agg.items()}
    print("mean:   " + "  ".join(f"{k}={v:.3f}" for k, v in mean.items()))
    if args.metrics_out:
        # NaN -> null: keep the JSONL strictly parseable (json.dumps
        # would emit a bare `NaN` token that non-Python readers reject).
        write_metrics_jsonl(args.metrics_out, {
            "kind": "eval_synthetic",
            **{k: (None if np.isnan(v) else v) for k, v in mean.items()}})
    return 0


def export_main(argv=None) -> int:
    """AOT-export the stabilization device program (jax.export) into a
    self-contained .dvsgx artifact (weights baked in; no model code or
    checkpoint needed at serving time — see dvsg_tpu/export.py)."""
    p = argparse.ArgumentParser(
        prog="dvsg-export",
        description="Serialize the per-chunk stabilization program "
                    "(StableHLO, weights baked in) for deployment.")
    p.add_argument("--checkpoint", default=None)
    _add_preset_arg(p)
    p.add_argument("--output", required=True, help="artifact file (.dvsgx)")
    p.add_argument("--size", type=int, nargs=2, required=True,
                   metavar=("H", "W"),
                   help="frame resolution the program is compiled for")
    p.add_argument("--chunk-frames", type=int, default=None,
                   help="frames per device step (default: measured-best "
                        "for --size)")
    p.add_argument("--warp-impl", choices=("auto", "pallas", "lax"),
                   default="auto")
    p.add_argument("--for-platform", default=None, metavar="PLAT",
                   help="lower for this platform instead of the current "
                        "backend (e.g. 'tpu' to cross-export from a CPU "
                        "host)")
    p.add_argument("--platform", default=None,
                   help="force the local jax platform (cpu/tpu)")
    p.add_argument("--border-crop", type=float, default=0.0)
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--path-smooth", type=int, default=0, metavar="FRAMES",
                   help="bake cross-chunk camera-path smoothing into the "
                        "artifact (see dvsg-stabilize --path-smooth): the "
                        "(4,) EMA state becomes an extra state-in → "
                        "state-out slot of the exported signature")
    p.add_argument("--path-smooth-max", type=float, default=0.05,
                   help="clamp on the smoothing correction (baked)")
    _add_model_args(p)
    args = p.parse_args(argv)
    _resolve_preset(args)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dvsg_tpu import export as export_lib
    from dvsg_tpu.config import StabilizeConfig
    from dvsg_tpu.models import motion_cnn

    if args.checkpoint:
        params, mcfg = _load_any_checkpoint(args.checkpoint)
        mcfg = _apply_dtype(mcfg, args)
    else:
        mcfg = _model_cfg(args)
        params = motion_cnn.init_params(mcfg, jax.random.key(0))
        print("WARNING: no --checkpoint given; exporting an untrained "
              "(identity) model", file=sys.stderr)

    h, w = args.size
    chunk = args.chunk_frames or _auto_chunk(h, w)
    if args.path_smooth < 0 or not 0 <= args.path_smooth_max <= 0.25:
        print("ERROR: --path-smooth must be >= 0 and "
              "--path-smooth-max in [0, 0.25]", file=sys.stderr)
        return 2
    cfg = StabilizeConfig(model=mcfg, chunk_frames=chunk,
                          warp_impl=args.warp_impl,
                          border_crop=args.border_crop,
                          strength=args.strength,
                          path_smooth=args.path_smooth,
                          path_smooth_max=args.path_smooth_max)
    platforms = (args.for_platform,) if args.for_platform else None
    # Resolve warp_impl="auto" against the TARGET platform, not the
    # build host: --for-platform tpu from a CPU box must bake the Pallas
    # kernel (the header records the resolved impl).
    cfg = export_lib.resolve_cfg_platforms(cfg, platforms)
    exp = export_lib.export_chunk_program(cfg, params, h, w,
                                          platforms=platforms)
    export_lib.save_exported(exp, args.output, cfg,
                             extra={"checkpoint": args.checkpoint})
    import os as _os
    print(f"exported {w}x{h} T={chunk} program for "
          f"{list(exp.platforms)} -> {args.output} "
          f"({_os.path.getsize(args.output) / 1e6:.1f} MB)")
    return 0


def _friendly_errors(fn):
    """Turn expected user errors into one-line messages (no tracebacks)."""
    import functools

    @functools.wraps(fn)
    def wrapped(argv=None):
        try:
            return fn(argv)
        except FileNotFoundError as e:
            print(f"ERROR: not found: {e}", file=sys.stderr)
            return 2
        except (IOError, ValueError) as e:
            print(f"ERROR: {e}", file=sys.stderr)
            return 2
    return wrapped


stabilize_main = _friendly_errors(stabilize_main)
stabilize_batch_main = _friendly_errors(stabilize_batch_main)
eval_main = _friendly_errors(eval_main)
train_main = _friendly_errors(train_main)
export_main = _friendly_errors(export_main)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m dvsg_tpu.cli "
              "{stabilize|stabilize-batch|train|eval|export} [args]\n"
              "       see --help of each subcommand")
        return 0 if argv else 1
    cmd, rest = argv[0], argv[1:]
    if cmd == "stabilize":
        return stabilize_main(rest)
    if cmd == "stabilize-batch":
        return stabilize_batch_main(rest)
    if cmd == "train":
        return train_main(rest)
    if cmd == "eval":
        return eval_main(rest)
    if cmd == "export":
        return export_main(rest)
    print(f"unknown command {cmd!r}; expected "
          "stabilize|stabilize-batch|train|eval|export", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
