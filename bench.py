#!/usr/bin/env python
"""Headline benchmark: 720p stabilized frames/sec/chip (BASELINE.json).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` is measured against a reference-style CPU pipeline run in
this same process: a synchronous per-frame loop (decode-normalize-CNN-warp-
fetch each frame individually, f32, lax warp) — the architecture SURVEY.md
§3.1 attributes to the reference, since the reference mount is empty and
records no published numbers (BASELINE.json "published": {}). The target is
vs_baseline > 10.

Extra detail (per-stage timings, warp-kernel µs/frame) goes to stderr and
bench_detail.json; stdout carries the one JSON line.

Capture contract (round-3 postmortem — the driver recorded rc=124 with NO
number while the chip did 1570 fps, because the old wrapper buffered the
inner's output and its worst-case wall-clock exceeded the driver's budget):

  * The wrapper STREAMS the inner's headline line to its own stdout the
    moment the inner prints it — a later wedge, crash, or even a SIGKILL
    of the wrapper can no longer lose an already-measured headline.
  * TOTAL wrapper wall-clock (attempts + backend waits) is hard-bounded
    by DVSG_BENCH_BUDGET_S (default 600 s) — always finishes well inside
    any plausible driver budget.
  * If no attempt completes cleanly, the final stdout line is the best
    salvaged headline re-emitted with "partial": true.
  * A clean completed attempt whose final line matches what was already
    streamed prints nothing further: stdout then carries exactly one
    line. Consumers must parse the LAST JSON line of stdout.

Inner mode (DVSG_BENCH_INNER=1, e.g. the CPU smoke workflow in CLAUDE.md)
prints exactly one JSON line at the end; the early provisional print is
enabled only by the wrapper via DVSG_BENCH_PROVISIONAL=1.
"""

import json
import os
import sys
import time

import numpy as np


_T0 = time.monotonic()


def log(*a):
    print(f"[{time.monotonic() - _T0:6.1f}s]", *a, file=sys.stderr,
          flush=True)


def _try_metric(label, fn, default=None):
    """Run one non-headline measurement, degrading to ``default`` on error.

    The axon tunnel's remote-compile helper can drop a connection mid-run
    (JaxRuntimeError: "response body closed ..."); a detail metric must
    not take down an attempt whose headline is already measured — that
    exact failure cost round-3 a full bench attempt at the 1080p warp
    micro-bench after the 720p headline was in hand.
    """
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 — degrade, never die
        log(f"{label} FAILED ({type(e).__name__}: {e}); continuing "
            "without it")
        return default


def _fetch(x):
    """Force the device chain: pull a scalar that depends on the result.

    Stride on the native (uint8) dtype BEFORE upcasting: an eager
    astype(f32) of a large channel-last array materializes a full f32
    copy whose (8,128)-tiled layout pads the 3-wide channel axis to 128
    lanes — a ~42x HBM expansion that OOMs at 1080p T=16 (15.8 GiB).
    """
    import jax.numpy as jnp
    return float(jnp.sum(x.reshape(-1)[::4097].astype(jnp.float32)))


def _bench_chunked(cfg, params, frames_u8, n_iters=30, warm_reps=2,
                   detail=None, windows=2):
    """Steady-state device throughput: frames/sec over jitted chunks.

    Device-resident chained steps (each chunk's halo feeds the next), one
    final fetch — amortizes per-call dispatch latency, which dominates
    small loops when the chip sits behind the axon tunnel. Host I/O
    overlap is benchmarked separately by the streaming pipeline metrics.

    The closing fetch's tunnel round trip (~56 ms on this box) is part of
    the timed window; it is measured on an already-complete result and
    subtracted so the figure is device throughput, not transport latency.
    The correction is SANITY-CHECKED: if the measured RTT is more than
    25% of the window it is skipped (a fluctuation would dominate the
    headline) — size n_iters so the share stays small. When ``detail``
    (a dict) is given, the uncorrected figure and the correction's share
    of the window are recorded alongside.
    """
    import functools
    import jax
    import jax.numpy as jnp
    from dvsg_tpu.pipeline.stabilize import (initial_halo, put_frames,
                                             stabilize_chunk_impl)

    fetch = _fetch

    if cfg.path_smooth_lag > 0:
        # The fixed-lag program: thread its carries (D raw frames, D
        # offset grids, the measurement window) through a box; emitted
        # frames are D behind but shape-identical, so the chained loop
        # is unchanged.
        from dvsg_tpu.pipeline.stabilize import (Stabilizer,
                                                 stabilize_chunk_lag_impl)
        raw = jax.jit(functools.partial(stabilize_chunk_lag_impl, cfg))
        carry_box = [Stabilizer(cfg, None)._init_lag_carry(frames_u8[0])]

        def step(params, out, halo):
            o, h, cf, co, cd, cc, offs = raw(params, out, halo,
                                             *carry_box[0])
            carry_box[0] = (cf, co, cd, cc)
            return o, h, offs
    elif cfg.path_smooth > 0:
        # The smoothed program: thread the (4,) EMA state through a box
        # so the chained loop below stays 3-tuple shaped. (A round-4
        # review caught the first version of this metric passing a
        # smoothing cfg to the PLAIN impl — it timed the unsmoothed
        # program and reported noise as the smoothing cost.)
        from dvsg_tpu.pipeline import pathsmooth
        from dvsg_tpu.pipeline.stabilize import stabilize_chunk_smooth_impl
        raw = jax.jit(functools.partial(stabilize_chunk_smooth_impl, cfg))
        state_box = [pathsmooth.initial_state()]

        def step(params, out, halo):
            o, h, s, offs = raw(params, out, halo, state_box[0])
            state_box[0] = s
            return o, h, offs
    else:
        step = jax.jit(functools.partial(stabilize_chunk_impl, cfg))
    halo = initial_halo(cfg, frames_u8[0])
    # put_frames' wide (H, W*C) view: a direct device_put of a
    # tiny-last-dim uint8 array rides the ~2 MB/s transport path on this
    # tunnel (ARCHITECTURE quirks) — 88 MB of 720p fixture cost 100+ s
    # in one round-4 run.
    out = put_frames(frames_u8)
    # Compile, then warm the chain until steady state (first reps pay
    # host-buffer upload and runtime warmup; we bench device steady state,
    # host I/O overlap is reported by the streaming pipeline metrics).
    for _ in range(warm_reps):
        for _ in range(8):
            out, halo, _ = step(params, out, halo)
        fetch(out)

    t0 = time.perf_counter()
    fetch(out)
    t_fetch = time.perf_counter() - t0

    def window():
        nonlocal out, halo
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out, halo, _ = step(params, out, halo)
        fetch(out)              # force the full chain
        return time.perf_counter() - t0

    # Two timed windows (on TPU), keep the faster: the axon tunnel
    # occasionally wedges for seconds mid-window (ARCHITECTURE.md
    # "Known environment quirks"), which would silently tank a
    # single-window headline. Both windows are honest chained wall-clock
    # runs of the same steady-state program. CPU smoke runs pass
    # windows=1 (chunks are ~200x slower there).
    dt = min(window() for _ in range(max(1, windows)))
    frames = n_iters * frames_u8.shape[0]
    corr_share = t_fetch / dt
    if corr_share > 0.25:
        log(f"fetch RTT {t_fetch*1e3:.1f} ms is {corr_share*100:.0f}% of "
            "the window — correction skipped (unreliable)")
        fps = frames / dt
    else:
        fps = frames / (dt - t_fetch)
    if detail is not None:
        detail["fps_uncorrected"] = frames / dt
        detail["fetch_correction_pct"] = round(corr_share * 100.0, 2)
    return fps


def _bench_reference_style_cpu(mcfg, h, w, n_frames=8, n_windows=3):
    """The reference's architecture: per-frame synchronous loop on CPU,
    f32, framework warp, host round-trip every frame (SURVEY.md §3.1).

    Returns per-window frames/s over ``n_windows`` back-to-back windows
    of ``n_frames`` each; the caller takes the median. One long window
    measured 0.81 fps in one round-3 run and 0.43 in another (this
    1-core container's load varies), swinging the headline ratio ~3x —
    the median of short windows pins it (VERDICT round-3 weak #4)."""
    import jax
    import jax.numpy as jnp
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.ops import grid as grid_ops
    from dvsg_tpu.ops.warp_ref import bilinear_warp

    cpu = jax.devices("cpu")[0]
    mh, mw = mcfg.model_size

    with jax.default_device(cpu):
        params = motion_cnn.init_params(mcfg, jax.random.key(0))

        @jax.jit
        def one_frame(params, window_small, frame):
            off = motion_cnn.predict_offsets(mcfg, params, window_small[None])
            g = grid_ops.grid_from_offsets(off[0], h, w)
            return bilinear_warp(frame, g)

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (n_frames, h, w, 3), np.uint8)
        buf = []
        # warmup
        f32 = jnp.asarray(frames[0], jnp.float32) / 255.0
        small = jax.image.resize(f32, (mh, mw, 3), "bilinear") - 0.5
        win = jnp.concatenate([small] * mcfg.window, axis=-1)
        np.asarray(one_frame(params, win, f32))

        window_fps = []
        for _ in range(n_windows):
            buf.clear()
            t0 = time.perf_counter()
            for i in range(n_frames):
                f32 = jnp.asarray(frames[i], jnp.float32) / 255.0  # h2d
                small = jax.image.resize(f32, (mh, mw, 3), "bilinear") - 0.5
                buf.append(small)
                buf[:] = buf[-mcfg.window:]
                pad = [buf[0]] * (mcfg.window - len(buf))
                win = jnp.concatenate(pad + buf, axis=-1)
                out = one_frame(params, win, f32)
                np.asarray(out)                                 # d2h, sync
            window_fps.append(n_frames / (time.perf_counter() - t0))
    return window_fps


def _bench_warp_kernel(cfg, params, h, w, batch, n_iters=20, windows=2):
    """Warp-only µs/frame on the default backend: the PIPELINE's fused
    uint8 offsets→warp→quantize op, driven exactly as production drives
    it — coarse offsets in, coordinates synthesized in-kernel.

    The offsets come from ONE real pipeline chunk (the trained CNN on the
    shaky fixture), i.e. the window-relative CORRECTIONS the kernel sees
    in production — not the raw camera jitter. Raw jitter offsets reach
    ±92 px at 1080p, which exceeds the stripe-coverage band at the
    exact-fit row-block height (blk=544): the guard then (correctly)
    routes every call to the lax-gather oracle and this micro-bench
    reports the ORACLE's ~169 ms/frame instead of the kernel
    (BENCH r3 2026-08-20, reproduced twice). Production corrections are
    an order of magnitude smaller and stay covered — the 1080p chunked
    throughput above (same fixture through the full pipeline) is the
    proof."""
    import functools
    import jax
    import jax.numpy as jnp
    from dvsg_tpu.ops import warp as warp_ops
    from dvsg_tpu.pipeline.stabilize import (initial_halo,
                                             stabilize_chunk_impl)

    from dvsg_tpu.pipeline.stabilize import put_frames
    frames_np = _shaky_frames(batch, h, w)
    frames = put_frames(frames_np)
    cfg_b = cfg.replace(chunk_frames=batch)
    step = jax.jit(functools.partial(stabilize_chunk_impl, cfg_b))
    _, _, offsets = step(params, frames, initial_halo(cfg_b, frames_np[0]))
    offsets = jax.block_until_ready(offsets)

    fetch = _fetch

    fn = jax.jit(lambda f, o: warp_ops.warp_quantize_batch(
        f, warp_impl=cfg.warp_impl, offsets=o))
    out = fn(frames, offsets)
    fetch(out)
    t0 = time.perf_counter()
    fetch(out)
    t_fetch = time.perf_counter() - t0   # tunnel RTT, see _bench_chunked

    def window():
        t0 = time.perf_counter()
        out = frames
        for _ in range(n_iters):
            out = fn(out, offsets)   # chained: defeats async dispatch
        fetch(out)
        return time.perf_counter() - t0

    # Two timed windows, keep the faster: the axon tunnel can stall for
    # seconds mid-window, which would silently inflate a single-window
    # figure. The min of two honest chained windows is still a
    # wall-clock measurement; a stall hitting BOTH back-to-back windows
    # is rare enough to show up as an obvious outlier across runs.
    dt = min(window() for _ in range(max(1, windows)))
    if t_fetch < 0.25 * dt:
        dt -= t_fetch
    return dt / (n_iters * batch) * 1e6


def main():
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    from dvsg_tpu.config import ModelConfig, StabilizeConfig

    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    log(f"backend={backend} devices={jax.devices()}")

    h, w = 720, 1280
    # Production model = the committed fast flagship (128^2 single-block
    # encoder; quality within ~1 dB of the 256^2 flagship, see
    # tests/test_flagship_quality.py); random init if absent (arch cost
    # is weight-independent).
    import dataclasses
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.utils import checkpoint as _ckpt
    dt = "bfloat16" if on_tpu else "float32"
    # Resolve relative to this file, not the CWD — running bench.py from
    # elsewhere must not silently benchmark random-init weights.
    ckpt_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "checkpoints", "flagship_fast.npz")
    try:
        params, mcfg = _ckpt.load_npz(ckpt_path)
        mcfg = dataclasses.replace(mcfg, dtype=dt)
        model_name = "flagship_fast"
    except Exception as e:
        log(f"flagship_fast unavailable ({e}); random weights")
        mcfg = ModelConfig(dtype=dt)
        params = motion_cnn.init_params(mcfg, jax.random.key(0))
        model_name = "random-init-default"
    # T=32 measured fastest in the 720p chunk-size sweep (1383 vs 1340
    # fps at T=16, on-chip, 2026-08-18): longer chains amortize per-chunk
    # CNN/halo overhead; output is chunk-invariant (tests/test_pipeline).
    cfg = StabilizeConfig(model=mcfg, chunk_frames=32 if on_tpu else 16,
                          warp_impl="auto")

    rng = np.random.default_rng(0)
    frames = _shaky_frames(cfg.chunk_frames, h, w)

    detail = {"backend": backend, "model": model_name,
              "model_size": list(mcfg.model_size), "model_dtype": mcfg.dtype,
              "chunk_frames": cfg.chunk_frames}

    def flush_detail():
        # Incremental flush after EVERY metric: a killed attempt (tunnel
        # wedge past the wrapper's budget) still leaves fresh detail on
        # disk next to its salvaged headline (round-4 capture rework).
        with open("bench_detail.json", "w") as f:
            json.dump(detail, f, indent=2)

    # Soft inner budget (set by the wrapper to just under its attempt
    # timeout): expensive LATE metrics are skipped with a visible waiver
    # instead of the whole attempt being killed mid-metric — a complete
    # rc=0 run with a couple of detail rows marked skipped beats a
    # partial-marked salvage. Measured per-metric costs on this box
    # (round-4 timing runs; dominated by remote program LOADS, not
    # compute): train ~125 s, overlap ~60-90 s, 8-clip ~35 s.
    inner_budget = float(os.environ.get("DVSG_BENCH_INNER_BUDGET_S",
                                        "inf"))
    skipped = []
    detail["skipped_for_budget"] = skipped

    def budget_metric(label, est_s, fn, default=None):
        left = inner_budget - (time.monotonic() - _T0)
        if left < est_s:
            log(f"{label} SKIPPED for the inner budget "
                f"(~{est_s:.0f}s estimated, {left:.0f}s left)")
            skipped.append(label)
            return default
        return _try_metric(label, fn, default)

    # CPU runs (smoke only) are ~200x slower per chunk; keep them short.
    # On TPU, 100+ iters keep the fetch-RTT correction under ~3% of the
    # timed window (VERDICT.md round-2 weak #4).
    d720 = {}
    fps = _bench_chunked(cfg, params, frames,
                         n_iters=100 if on_tpu else 4,
                         warm_reps=2 if on_tpu else 0, detail=d720,
                         windows=2 if on_tpu else 1)
    log(f"720p chunked throughput: {fps:.2f} frames/s/chip "
        f"(uncorrected {d720.get('fps_uncorrected', fps):.2f}, "
        f"RTT correction {d720.get('fetch_correction_pct', 0):.1f}%)")
    detail.update(fps_720p_per_chip=fps,
                  fps_720p_uncorrected=d720.get("fps_uncorrected"),
                  fetch_correction_pct_720p=d720.get("fetch_correction_pct"),
                  warp_impl_resolved=warp_ops_name(cfg))
    flush_detail()

    # The headline is now in hand: measure its (host-CPU-only) baseline
    # and print a PROVISIONAL result line immediately, so a tunnel hang
    # or crash in any detail metric below cannot cost the attempt its
    # headline — the retry wrapper streams it to the driver-visible
    # stdout the moment it appears. Only the wrapper opts in
    # (DVSG_BENCH_PROVISIONAL=1): a directly-invoked inner run keeps the
    # documented exactly-one-JSON-line stdout contract.
    cpu_windows = _try_metric(
        "reference-style CPU baseline",
        lambda: _bench_reference_style_cpu(ModelConfig(dtype="float32"),
                                           h, w), None)
    # Median of 3 short windows: the 1-core container's load swings a
    # single window ~2x run-to-run, which swung the reported vs_baseline
    # 1079x..3645x across round-3 runs (VERDICT round-3 weak #4).
    cpu_fps = float(np.median(cpu_windows)) if cpu_windows else 0.0
    if cpu_windows:
        log(f"reference-style CPU per-frame loop: {cpu_fps:.2f} frames/s "
            f"(median of {['%.2f' % v for v in cpu_windows]}; "
            f"{os.cpu_count()} host cores; ratio is per-chip vs this host)")
    headline = json.dumps({
        "metric": "720p_stabilized_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        # null, not 0.0, when the CPU baseline is unavailable: a degraded
        # denominator must not read as a catastrophic regression to a
        # gate that only parses stdout (ADVICE round-3).
        "vs_baseline": round(fps / cpu_fps, 2) if cpu_fps > 0 else None,
    })
    if os.environ.get("DVSG_BENCH_PROVISIONAL") == "1":
        print(headline, flush=True)
    detail.update(reference_style_cpu_fps=cpu_fps,
                  reference_style_cpu_windows=cpu_windows)
    flush_detail()

    warp_us = budget_metric(
        "720p warp micro-bench", 40,
        lambda: _bench_warp_kernel(cfg, params, h, w, batch=8,
                                   n_iters=60 if on_tpu else 5,
                                   windows=2 if on_tpu else 1))
    if warp_us is not None:
        log(f"warp kernel: {warp_us:.1f} us/frame at 720p "
            f"({warp_ops_name(cfg)} impl)")
    detail["warp_us_per_frame_720p"] = warp_us
    flush_detail()

    # Resolution sweep (BASELINE.json config 5 is 1080p; 480p and 4K make
    # the STATUS numbers driver-reproducible), trained flagship weights,
    # device-resident. T picked so each chunk fits HBM with headroom.
    sweep = {}
    detail["resolution_sweep"] = sweep
    latency_ms = None
    if on_tpu:
        # iters sized so the one-RTT fetch correction stays a small share
        # of each timed window (2160p at T=2 swung ~30% run-to-run at 15
        # iters: ~0.27 s window vs ~56 ms RTT).
        # T per resolution = auto_chunk_frames' measured picks (re-swept
        # 2026-08-20 post exact-fit row blocking: 480p 64 -> 3050 fps vs
        # 2645 at 16; 1080p T=16 791 vs 768 at 8 / 777 at 32; 2160p T=4
        # 225 vs 209 at 2 / 212 at 8 — scripts/probe_chunk_sizes.py).
        for name, (sh, sw, t, iters) in {
                "480p": (480, 854, 64, 40),
                "1080p": (1080, 1920, 16, 60),
                "2160p": (2160, 3840, 4, 60)}.items():
            def _sweep_one(sh=sh, sw=sw, t=t, iters=iters):
                cfg_s = StabilizeConfig(model=mcfg, chunk_frames=t,
                                        warp_impl="auto")
                det = {}
                fps_s = _bench_chunked(cfg_s, params,
                                       _shaky_frames(t, sh, sw),
                                       n_iters=iters, warm_reps=2,
                                       detail=det)
                return {"fps_per_chip": fps_s, "chunk_frames": t, **det}
            entry = budget_metric(f"{name} sweep", 55, _sweep_one)
            if entry is not None:
                sweep[name] = entry
                log(f"{name} chunked throughput: "
                    f"{entry['fps_per_chip']:.2f} frames/s/chip (T={t})")
            flush_detail()
        warp_us_1080 = budget_metric(
            "1080p warp micro-bench", 40,
            lambda: _bench_warp_kernel(cfg, params, 1080, 1920, batch=8,
                                       n_iters=40))
        if warp_us_1080 is not None:
            log(f"warp kernel: {warp_us_1080:.1f} us/frame at 1080p")
            if "1080p" in sweep:
                sweep["1080p"]["warp_us_per_frame"] = warp_us_1080
        flush_detail()

        # Serving latency: one 720p frame per device step (chunk_frames=1).
        def _latency():
            cfg_lat = StabilizeConfig(model=mcfg, chunk_frames=1,
                                      warp_impl="auto")
            lat_fps = _bench_chunked(cfg_lat, params, frames[:1],
                                     n_iters=200, warm_reps=2)
            return 1000.0 / lat_fps if lat_fps else None
        latency_ms = budget_metric("720p T=1 latency", 20, _latency)
        if latency_ms is not None:
            log(f"720p single-frame latency: {latency_ms:.2f} ms (T=1)")
        detail["latency_ms_720p_T1"] = latency_ms
        flush_detail()

        # Path-smoothing cost (VERDICT round-3 item 2): the same 720p
        # chain with the cross-chunk smoothing stage on (round-4 measured
        # ~1.6-2.3%: the added work is the full-frame + 4 half-frame FFTs
        # per pair, the upsampled-DFT refinements, the peak-ratio
        # confidence gate, and a (4,)-state scan against a full CNN +
        # fused-warp chunk).
        def _smoothed():
            cfg_ps = cfg.replace(path_smooth=32)
            return _bench_chunked(cfg_ps, params, frames, n_iters=60,
                                  warm_reps=2)
        fps_smooth = budget_metric("720p path-smoothed", 35, _smoothed)
        if fps_smooth is not None:
            log(f"720p with path_smooth=32: {fps_smooth:.2f} frames/s/chip "
                f"({(1.0 - fps_smooth / fps) * 100.0:.1f}% cost)")
        detail["fps_720p_pathsmooth32"] = fps_smooth
        flush_detail()

        # Fixed-lag smoothing cost (round-5): the zero-phase lookahead
        # variant — extra work vs causal is the FIR contraction plus
        # warping carried-vs-current frame splits (all tiny next to the
        # CNN + warp).
        def _lag_smoothed():
            cfg_lg = cfg.replace(path_smooth=32, path_smooth_lag=16)
            return _bench_chunked(cfg_lg, params, frames, n_iters=60,
                                  warm_reps=2)
        fps_lag = budget_metric("720p lag-smoothed", 35, _lag_smoothed)
        if fps_lag is not None:
            log(f"720p with path_smooth=32 lag=16: {fps_lag:.2f} "
                f"frames/s/chip "
                f"({(1.0 - fps_lag / fps) * 100.0:.1f}% cost)")
        detail["fps_720p_pathsmooth32_lag16"] = fps_lag
        flush_detail()

        # Batch sweep (on-chip, 2026-08-18): per-clip T=16 1355 fps
        # aggregate vs 1267 at T=8, 1206 at T=4; T=24/32 OOM HBM.
        def _batched():
            cfg_mc = StabilizeConfig(model=mcfg, chunk_frames=16,
                                     warp_impl="auto")
            return _bench_batched_clips(cfg_mc, params, h, w)
        fps_8clip = budget_metric("8-clip batch", 40, _batched)
        if fps_8clip is not None:
            log(f"batched 8-clip 720p (config 4, device side): "
                f"{fps_8clip:.1f} frames/s aggregate")
        detail["fps_720p_8clip_batch"] = fps_8clip
        flush_detail()

        overlap = budget_metric("overlapped run", 95,
                                lambda: _bench_overlap(cfg, params, h, w),
                                {})
        if overlap:
            log(f"overlapped run: {overlap['overlapped_fps']:.1f} fps, "
                f"device idle {overlap.get('overlap_device_idle_pct')}% "
                "(gate < 20, includes tunnel dispatch latency)")
        detail["overlap"] = overlap
        flush_detail()

        train_bench = budget_metric("train step", 135,
                                    lambda: _bench_train_step(mcfg))
        if train_bench is not None:
            log(f"train step ({train_bench['batch_size']}-clip synthetic "
                f"batch): {train_bench['steps_per_sec']:.2f} steps/s, "
                f"{train_bench['windows_per_sec']:.0f} windows/s")
        detail["train"] = train_bench
        flush_detail()

        hbm = _try_metric("HBM stats", _hbm_stats)
        if hbm and "unavailable_reason" not in hbm:
            log(f"HBM after the sweep: peak {hbm.get('peak_gib')} GiB / "
                f"limit {hbm.get('limit_gib')} GiB")
        detail["hbm"] = hbm
        flush_detail()

    host_io = budget_metric("host mp4 I/O", 35,
                            lambda: _bench_host_io(h, w))
    if host_io is not None:
        log(f"host mp4 I/O: encode {host_io['encode_fps']:.1f} fps, "
            f"decode {host_io['decode_fps']:.1f} fps "
            f"({host_io['cores']} cores)")
    detail["host_io"] = host_io
    flush_detail()

    # The one final stdout line (identical to the provisional line the
    # wrapper may have already streamed; the wrapper dedupes).
    print(headline, flush=True)


def _shaky_frames(t, h, w):
    """Realistic bench input: a textured synthetic SHAKY clip, not pure
    noise. The CNN's offsets on noise are wild enough to violate the warp
    kernel's smoothness contract, tripping the (correct) oracle fallback —
    which benchmarks the guard, not the pipeline a user runs on real
    footage.

    Generated ON THE HOST CPU: the fixture program (procedural still +
    per-frame homography warp) would otherwise compile per resolution
    through the remote compile helper — measured ~40-50 s of each 60 s
    sweep entry in the round-4 timing run, most of the reason a full
    inner run outgrew the wrapper's attempt budget. Deterministic (seed
    42), so it is also CACHED on disk: generating the 720p T=32 fixture
    costs ~90 s on this 1-core host; every later run (including the
    driver's) loads it in milliseconds."""
    import jax
    from dvsg_tpu.train import synthetic

    cache_dir = os.path.expanduser("~/.dvsg_bench_fixtures")
    path = os.path.join(cache_dir, f"shaky42_{t}x{h}x{w}.npy")
    try:
        return np.load(path)
    except Exception:  # noqa: BLE001 — absent or corrupt: regenerate
        pass
    with jax.default_device(jax.devices("cpu")[0]):
        frames_u8, _, _ = synthetic.synthetic_clip_u8(jax.random.key(42),
                                                      t, h, w)
        frames = np.asarray(frames_u8)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # np.save appends .npy unless the name already ends with it.
        tmp = f"{path}.{os.getpid()}.tmp.npy"
        np.save(tmp, frames)
        os.replace(tmp, path)          # atomic vs concurrent benchers
    except OSError:
        pass
    return frames


def _bench_batched_clips(cfg, params, h, w, n_clips=8, t=None, n_iters=20):
    """BASELINE.json config 4 device side: an 8-clip 720p batch through
    the vmapped multi-clip chunk program (the same program
    `stabilize-batch`, `pipeline/multiclip.py`, and the serving batch
    engine dispatch). Reports aggregate frames/s; host-I/O overlap is
    measured separately (``overlap``/``host_io``)."""
    import functools
    import jax
    import jax.numpy as jnp
    from dvsg_tpu.pipeline.stabilize import (initial_halo,
                                             stabilize_chunk_impl)

    fetch = _fetch

    t = cfg.chunk_frames if t is None else t
    # ONE fixture replicated across slots: the vmapped program's timing
    # is content-independent, and generating 8 distinct clips cost ~60 s
    # of the round-4 timing run for no measurement value.
    from dvsg_tpu.pipeline.stabilize import put_frames
    one = _shaky_frames(t, h, w)
    frames = put_frames(np.broadcast_to(one, (n_clips,) + one.shape))
    halos = jnp.stack([initial_halo(cfg, one[0])] * n_clips)

    step = jax.jit(lambda p, f, hl: jax.vmap(
        lambda ff, hh: stabilize_chunk_impl(cfg, p, ff, hh)[:2])(f, hl))
    out = frames
    for _ in range(8):
        out, halos = step(params, out, halos)
    fetch(out)
    t0 = time.perf_counter()
    fetch(out)
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out, halos = step(params, out, halos)
    fetch(out)
    dt = time.perf_counter() - t0
    if t_fetch < 0.25 * dt:
        dt -= t_fetch
    return (n_iters * n_clips * t) / dt


def _hbm_stats():
    """Device-memory footprint, if the runtime exposes it ('fits HBM with
    headroom' claims get a measured number). Peak covers everything run
    so far in this process — i.e. the whole resolution sweep.

    The axon tunnel intermittently hides ``memory_stats()`` (round-3 runs
    got null with no explanation); the reason is now recorded in the
    returned dict instead of silently degrading (VERDICT round-3 weak
    #5) — bench_detail's ``hbm`` is either numbers or a visible waiver.
    """
    import jax
    s, why = None, None
    for dev_fn in (lambda: jax.devices()[0],
                   lambda: jax.local_devices()[0]):
        try:
            s = dev_fn().memory_stats()
        except Exception as e:  # noqa: BLE001 — record, try the next path
            why = f"{type(e).__name__}: {e}"
            continue
        if s:
            break
        why = "memory_stats() returned empty (transport hides allocator " \
              "stats; 'fits HBM' claims rest on not-OOMing on this box)"
    if not s:
        log(f"HBM stats unavailable: {why}")
        return {"unavailable_reason": why}
    gib = 1024.0 ** 3
    out = {}
    if "peak_bytes_in_use" in s:
        out["peak_gib"] = round(s["peak_bytes_in_use"] / gib, 2)
    if "bytes_limit" in s:
        out["limit_gib"] = round(s["bytes_limit"] / gib, 2)
    if "bytes_in_use" in s:
        out["in_use_gib"] = round(s["bytes_in_use"] / gib, 2)
    return out or {"unavailable_reason": "memory_stats() had none of the "
                   "expected keys"}


def _bench_train_step(mcfg, batch_size=8, n_iters=20):
    """Training-path throughput: jitted full train step (synthetic batch
    generated ON DEVICE inside the step, forward + backward + AdamW) at
    the benched model config. States chain output→input across
    iterations so the timed window is device-resident; the loss fetch at
    the end forces completion (one RTT, small share of the window)."""
    import jax
    import jax.numpy as jnp
    from dvsg_tpu.config import TrainConfig
    from dvsg_tpu.train import loop as train_loop

    tcfg = TrainConfig(model=mcfg, batch_size=batch_size)
    state = train_loop.init_state(tcfg, jax.random.key(0))
    step = jax.jit(lambda s, k: train_loop.train_step(s, k, tcfg))
    rng = jax.random.key(1)
    for i in range(3):
        state, aux = step(state, jax.random.fold_in(rng, i))
    float(jax.device_get(aux["total"]))
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, aux = step(state, jax.random.fold_in(rng, 100 + i))
    float(jax.device_get(aux["total"]))
    dt = time.perf_counter() - t0
    sps = n_iters / dt
    return {"batch_size": batch_size,
            "model_size": list(mcfg.model_size),
            "steps_per_sec": sps,
            "windows_per_sec": sps * batch_size}


def _bench_overlap(cfg, params, h, w, n_chunks=4):
    """SURVEY.md §7 stage-4 gate: device idle % during an OVERLAPPED run.

    Drives pipeline.overlap.stabilize_stream_overlapped with an in-memory
    source/sink (no codec cost — the gate measures the overlap machinery,
    not this container's 1-core decode) under a jax.profiler trace and
    reports the device busy/idle split from the device lanes. Gate:
    idle < 20%. Note the idle figure still includes this box's axon
    tunnel dispatch latency between chunks; on a directly-attached host
    it is an upper bound.
    """
    import shutil
    import tempfile

    import jax
    from dvsg_tpu.pipeline.overlap import stabilize_stream_overlapped
    from dvsg_tpu.pipeline.stabilize import Stabilizer
    from dvsg_tpu.utils import profiling

    t = cfg.chunk_frames
    frames = _shaky_frames(t, h, w)

    class MemWriter:
        def write_batch(self, out):
            pass

    # Source serves full chunks so every device step has the same shape.
    class ChunkReader:
        def __init__(self, n_chunks):
            self.n = n_chunks

        def read_batch(self, k):
            if self.n == 0:
                return frames[:0]
            self.n -= 1
            return frames

    stab = Stabilizer(cfg, params)
    stabilize_stream_overlapped(stab, ChunkReader(1), MemWriter())  # warm
    d = tempfile.mkdtemp(prefix="overlap_trace_")
    try:
        t0 = time.perf_counter()
        with profiling.trace(d):
            written = stabilize_stream_overlapped(stab, ChunkReader(n_chunks),
                                                  MemWriter())
        wall = time.perf_counter() - t0
        stats = profiling.device_busy_stats(d) or {}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return {"frames": written, "wall_s": wall,
            "overlapped_fps": written / wall if wall else 0.0,
            "device_busy_ms": stats.get("busy_ms"),
            "device_span_ms": stats.get("span_ms"),
            "overlap_device_idle_pct": stats.get("idle_pct")}


def _bench_host_io(h, w, n_frames=30):
    """Host container encode/decode throughput (the system-level bound on
    a small host; scales with cores + clip parallelism on real hosts).

    Alongside the mp4 codec path, the no-codec bounds are measured: raw
    .npy writeback (pure memcpy+filesystem — the ceiling any writeback
    can hit) and PNG frame-dir writeback (the compressed escape hatch
    when libavcodec is the bottleneck) — giving the "~2.2 GB/s host
    budget" deployment claim a measured shape on this container
    (VERDICT.md round-2 item 9).
    """
    import os
    import tempfile

    from dvsg_tpu.utils import video_io

    rng = np.random.default_rng(0)
    frames = (rng.random((n_frames, h, w, 3)) * 255).astype(np.uint8)
    frame_bytes = frames[0].nbytes
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "io.mp4")
        t0 = time.perf_counter()
        with video_io.VideoWriter(p, w, h, fps=30) as wtr:
            wtr.write_batch(frames)
        enc = n_frames / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        with video_io.VideoReader(p) as r:
            n = r.read_batch(n_frames).shape[0]
        dec = n / (time.perf_counter() - t0)

        t0 = time.perf_counter()
        np.save(os.path.join(d, "raw.npy"), frames)
        raw_fps = n_frames / (time.perf_counter() - t0)

        png_dir = os.path.join(d, "png")
        t0 = time.perf_counter()
        with video_io.VideoWriter(png_dir, w, h, fps=30) as fw:
            fw.write_batch(frames[:10])
        png_fps = 10 / (time.perf_counter() - t0)
    return {"encode_fps": enc, "decode_fps": dec,
            "raw_writeback_fps": raw_fps,
            "raw_writeback_gbps": raw_fps * frame_bytes / 1e9,
            "png_framedir_fps": png_fps,
            "cores": os.cpu_count() or 1}


def warp_ops_name(cfg):
    from dvsg_tpu.ops import warp as warp_ops
    return warp_ops.resolve_impl(cfg.warp_impl)


def _backend_probe(timeout_s=150):
    """Cheap liveness probe for the device backend, in a subprocess.

    The axon tunnel can go fully down for stretches (ARCHITECTURE.md
    "Known environment quirks"): ``jax.devices()`` then hangs forever in
    backend init — sometimes even at interpreter start (the sitecustomize
    registration call), which is why the probe is a subprocess with a
    hard timeout rather than an in-process import.
    """
    import subprocess
    try:
        res = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
        return res.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_backend(budget_s=2400, probe_timeout_s=150, sleep_s=120):
    """Wait out a tunnel outage, up to ``budget_s`` seconds.

    Returns True as soon as a probe succeeds; False when the budget is
    exhausted (the caller still attempts the measurement — the probe is
    advisory, not a gate)."""
    deadline = time.monotonic() + budget_s
    while True:
        if _backend_probe(probe_timeout_s):
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            log("backend probe still failing after the wait budget; "
                "attempting the measurement anyway")
            return False
        log(f"backend probe failed (tunnel down?); waiting "
            f"({remaining:.0f}s of patience left)")
        time.sleep(min(sleep_s, max(remaining, 1)))


def _mark_partial(headline_json):
    """Re-emit a salvaged headline with a visible ``"partial": true``
    marker (ADVICE round-3: a headline from an attempt that never
    completed must not be indistinguishable from a clean run's)."""
    try:
        d = json.loads(headline_json)
        d["partial"] = True
        return json.dumps(d)
    except (ValueError, TypeError):
        return headline_json


def _run_attempt(cmd, env, timeout_s, on_headline):
    """One inner attempt with STREAMED capture.

    stderr is forwarded line-by-line as it arrives (a killed attempt no
    longer loses its diagnostics — ADVICE round-3), and every stdout
    line that parses as a JSON object is handed to ``on_headline``
    IMMEDIATELY, so the caller can stream it to the driver-visible
    stdout before any wedge/kill (round-3 postmortem: the old
    capture_output pipe held the headline hostage).

    Returns (returncode|None on timeout, last_headline|None).
    """
    import subprocess
    import threading

    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, bufsize=1)
    last = [None]

    def pump_out():
        for line in proc.stdout:
            line = line.strip()
            if line.startswith("{"):
                last[0] = line
                on_headline(line)

    def pump_err():
        for line in proc.stderr:
            sys.stderr.write(line)
            sys.stderr.flush()

    threads = [threading.Thread(target=pump_out, daemon=True),
               threading.Thread(target=pump_err, daemon=True)]
    for t in threads:
        t.start()
    try:
        rc = proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        rc = None
    for t in threads:
        t.join(timeout=5)
    return rc, last[0]


def _run_with_retries():
    """Run the measurement in a subprocess with timeout + retry, under a
    HARD total wall-clock budget.

    The environment's remote compile helper intermittently wedges and
    the tunnel can go fully down for hours (ARCHITECTURE.md "Known
    environment quirks"); the remedy is kill-and-retry — the first
    attempt's compile usually lands in the persistent cache. Round 3
    proved the failure mode this wrapper exists for: the driver killed a
    silent wrapper at its own timeout (BENCH_r03.json rc=124, parsed
    null) while the chip measured 1570 fps. Hence the two invariants:

      * any headline the inner measures is ALREADY on this process's
        stdout (streamed the moment the inner printed it);
      * total wall-clock — attempts, waits, everything — never exceeds
        DVSG_BENCH_BUDGET_S (default 600 s), so this process always
        finishes before any plausible driver budget.

    ``DVSG_BENCH_CMD`` (tests only) replaces the inner command so a
    wedged inner can be faked without a chip.
    """
    budget_s = float(os.environ.get("DVSG_BENCH_BUDGET_S", "600"))
    attempt_cap_s = float(os.environ.get("DVSG_BENCH_ATTEMPT_TIMEOUT_S",
                                         "540"))
    deadline = time.monotonic() + budget_s
    start = time.time()

    fake_cmd = os.environ.get("DVSG_BENCH_CMD")
    cmd = (fake_cmd.split() if fake_cmd
           else [sys.executable, os.path.abspath(__file__)])
    env = dict(os.environ, DVSG_BENCH_INNER="1", DVSG_BENCH_PROVISIONAL="1")

    printed = [None]     # the headline already streamed to stdout

    def stream(line):
        if printed[0] is None:
            print(line, flush=True)
            printed[0] = line

    salvaged = None      # best headline from an incomplete attempt
    for attempt in range(3):
        remaining = deadline - time.monotonic()
        if remaining < 5:
            log("bench budget exhausted before another attempt")
            break
        if attempt > 0 and not fake_cmd:
            # Wait out a tunnel outage, but only within the budget.
            wait = max(0.0, min(remaining - 60, 2400))
            if wait > 0:
                _wait_for_backend(budget_s=wait,
                                  probe_timeout_s=min(150, wait))
            remaining = deadline - time.monotonic()
            if remaining < 5:
                break
        attempt_timeout = min(attempt_cap_s, remaining)
        # Soft inner budget just under the hard kill: the inner skips
        # late metrics (with a logged waiver + skipped_for_budget rows
        # in bench_detail) and COMPLETES rc=0 instead of dying
        # mid-metric with a partial-marked salvage.
        env["DVSG_BENCH_INNER_BUDGET_S"] = str(max(60.0,
                                                   attempt_timeout - 30.0))
        rc, headline = _run_attempt(cmd, env, timeout_s=attempt_timeout,
                                    on_headline=stream)
        if rc == 0 and headline is not None:
            if headline != printed[0]:
                # A retry measured a (different) complete headline; the
                # consumer takes the LAST stdout line.
                print(headline, flush=True)
            return 0
        if headline is not None:
            salvaged = headline
            log(f"bench attempt {attempt} "
                f"{'timed out' if rc is None else f'failed (rc={rc})'} "
                "after measuring the headline; keeping it")
        else:
            outcome = "timed out" if rc is None else f"failed (rc={rc})"
            log(f"bench attempt {attempt} {outcome} with no headline"
                + ("; retrying" if attempt < 2 else ""))
    if salvaged is not None:
        log("no complete attempt; reporting the salvaged headline as "
            "partial")
        # bench_detail.json is only written by a COMPLETED inner run; a
        # stale one from an earlier session must not read as this
        # (partial) run's detail (ADVICE round-3).
        try:
            if (os.path.exists("bench_detail.json")
                    and os.path.getmtime("bench_detail.json") < start):
                os.replace("bench_detail.json", "bench_detail.stale.json")
                log("bench_detail.json predates this run; moved to "
                    "bench_detail.stale.json")
        except OSError:
            pass
        print(_mark_partial(salvaged), flush=True)
        return 0
    if printed[0] is not None:
        return 0
    log("all bench attempts failed with no headline")
    return 1


if __name__ == "__main__":
    if os.environ.get("DVSG_BENCH_INNER") == "1":
        main()
    else:
        sys.exit(_run_with_retries())
