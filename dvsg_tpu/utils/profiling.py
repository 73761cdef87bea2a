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
