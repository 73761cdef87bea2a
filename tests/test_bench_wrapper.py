"""bench.py retry-wrapper capture contract (VERDICT round-3 item 1).

Round 3's driver run recorded rc=124 with NO parsed number while the chip
measured 1570 fps: the old wrapper buffered the inner's stdout and its
worst-case wall-clock exceeded the driver's budget. These tests fake the
inner process (DVSG_BENCH_CMD) and pin the two invariants that make the
capture un-loseable:

  * a measured headline is streamed to the wrapper's stdout the moment
    the inner prints it — a wedge afterwards cannot lose it;
  * total wrapper wall-clock is hard-bounded by DVSG_BENCH_BUDGET_S.

No JAX, no chip: pure subprocess plumbing.
"""

import json
import os
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")

HEADLINE = {"metric": "720p_stabilized_frames_per_sec_per_chip",
            "value": 1234.5, "unit": "frames/s", "vs_baseline": 999.0}


def _fake_inner(tmp_path, body):
    p = tmp_path / "fake_inner.py"
    p.write_text("import json, os, sys, time\n"
                 f"HEADLINE = {HEADLINE!r}\n" + body)
    return str(p)


def _run(tmp_path, inner_body, budget_s=20, attempt_timeout_s=3,
         timeout=90):
    env = dict(os.environ,
               DVSG_BENCH_CMD=f"{sys.executable} "
                              f"{_fake_inner(tmp_path, inner_body)}",
               DVSG_BENCH_BUDGET_S=str(budget_s),
               DVSG_BENCH_ATTEMPT_TIMEOUT_S=str(attempt_timeout_s))
    env.pop("DVSG_BENCH_INNER", None)
    t0 = time.monotonic()
    res = subprocess.run([sys.executable, BENCH], env=env,
                         capture_output=True, text=True, timeout=timeout,
                         cwd=tmp_path)
    return res, time.monotonic() - t0


def _json_lines(stdout):
    return [json.loads(l) for l in stdout.strip().splitlines()
            if l.startswith("{")]


def test_healthy_inner_prints_exactly_one_line(tmp_path):
    # The fake also pins the wrapper→inner soft-budget contract: the
    # inner must see a positive DVSG_BENCH_INNER_BUDGET_S so it can skip
    # late metrics and complete clean instead of being killed mid-metric.
    res, _ = _run(tmp_path,
                  "assert float(os.environ['DVSG_BENCH_INNER_BUDGET_S'])"
                  " > 0\n"
                  "print(json.dumps(HEADLINE), flush=True)\n")
    assert res.returncode == 0
    lines = _json_lines(res.stdout)
    assert len(lines) == 1 and lines[0]["value"] == HEADLINE["value"]
    assert "partial" not in lines[0]


def test_wedged_inner_still_yields_headline_within_budget(tmp_path):
    # The round-3 failure mode: provisional printed, then the process
    # hangs forever (tunnel outage mid-run).
    res, dt = _run(tmp_path,
                   "print(json.dumps(HEADLINE), flush=True)\n"
                   "time.sleep(600)\n",
                   budget_s=20, attempt_timeout_s=3)
    assert res.returncode == 0
    assert dt < 30, f"wrapper took {dt:.0f}s against a 20s budget"
    lines = _json_lines(res.stdout)
    assert lines, f"no JSON on stdout: {res.stdout!r}"
    # First line was streamed the moment it appeared (pre-kill)...
    assert lines[0]["value"] == HEADLINE["value"]
    # ...and the final line carries the visible partial marker.
    assert lines[-1]["partial"] is True
    assert lines[-1]["value"] == HEADLINE["value"]


def test_crashing_inner_salvages_headline_as_partial(tmp_path):
    res, _ = _run(tmp_path,
                  "print(json.dumps(HEADLINE), flush=True)\n"
                  "sys.exit(3)\n")
    assert res.returncode == 0
    lines = _json_lines(res.stdout)
    assert lines[-1]["partial"] is True
    assert lines[-1]["value"] == HEADLINE["value"]


def test_silent_inner_fails_cleanly(tmp_path):
    res, dt = _run(tmp_path, "sys.exit(2)\n", budget_s=15)
    assert res.returncode == 1
    assert not _json_lines(res.stdout)
    assert dt < 25


def test_stale_bench_detail_is_quarantined_on_partial(tmp_path):
    stale = tmp_path / "bench_detail.json"
    stale.write_text("{\"from\": \"a prior run\"}")
    old = time.time() - 3600
    os.utime(stale, (old, old))
    res, _ = _run(tmp_path,
                  "print(json.dumps(HEADLINE), flush=True)\n"
                  "sys.exit(3)\n")
    assert res.returncode == 0
    assert not stale.exists()
    assert (tmp_path / "bench_detail.stale.json").exists()
