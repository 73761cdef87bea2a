"""Profiling helpers (SURVEY.md §5.1).

Wraps ``jax.profiler`` trace capture and extracts per-op device timings
(e.g. the fused warp kernel's µs/frame — the BASELINE.json metric) from the
dumped trace, so `dvsg-stabilize --profile-dir ...` and bench.py report
kernel numbers straight from the profile rather than wall-clock guesses.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler.trace when a dir is given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


def summarize_trace(trace_dir: str, min_us: float = 50.0) -> Dict[str, dict]:
    """Aggregate device-op durations from the newest trace in trace_dir.

    Returns {op_name: {"mean_ms", "total_ms", "count"}} sorted by total,
    Python-frame events filtered out.
    """
    files = sorted(glob.glob(os.path.join(trace_dir, "**",
                                          "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        return {}
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    buckets: Dict[str, list] = {}
    for ev in data.get("traceEvents", []):
        dur = ev.get("dur", 0)
        name = str(ev.get("name", ""))
        if dur * 1.0 < min_us or not name or name.startswith("$"):
            continue
        if ".py" in name or name.startswith(("profiler", "jit__psum")):
            continue
        buckets.setdefault(name, []).append(dur / 1e3)
    out = {}
    for name, ds in buckets.items():
        out[name] = {"mean_ms": sum(ds) / len(ds),
                     "total_ms": sum(ds), "count": len(ds)}
    return dict(sorted(out.items(), key=lambda kv: -kv[1]["total_ms"]))


def op_mean_ms(summary: Dict[str, dict], substring: str) -> Optional[float]:
    """Mean duration of the first op whose name contains substring."""
    for name, rec in summary.items():
        if substring in name:
            return rec["mean_ms"]
    return None


def device_busy_stats(trace_dir: str) -> Optional[Dict[str, float]]:
    """Device busy-vs-idle split from the newest trace in trace_dir.

    Sums "XLA Ops" lane durations on every /device:* process and compares
    against the span from first to last device event — the window in
    which the device could have been computing. Returns
    {busy_ms, span_ms, idle_pct} or None if no device lane was captured.
    Used for the SURVEY.md §7 stage-4 overlap gate (device idle < 20%).
    """
    files = sorted(glob.glob(os.path.join(trace_dir, "**",
                                          "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        return None
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    dev_pids = set()
    op_tids = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name" and "/device:" in str(
                ev.get("args", {}).get("name", "")):
            dev_pids.add(ev["pid"])
        if ev.get("name") == "thread_name" and \
                ev.get("args", {}).get("name") == "XLA Ops":
            op_tids.setdefault(ev["pid"], set()).add(ev["tid"])
    intervals = []
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        if ev.get("tid") not in op_tids.get(ev["pid"], ()):
            continue
        ts = ev.get("ts", 0)
        intervals.append((ts, ts + ev.get("dur", 0)))
    if not intervals:
        return None
    # Events nest (module > op), so busy time is the interval UNION.
    intervals.sort()
    busy = 0.0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    busy += cur_e - cur_s
    span = intervals[-1][1] - intervals[0][0]
    span = max(span, cur_e - intervals[0][0])
    if span <= 0:
        return None
    return {"busy_ms": busy / 1e3, "span_ms": span / 1e3,
            "idle_pct": max(0.0, 100.0 * (1.0 - busy / span))}
