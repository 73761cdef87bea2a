"""Smoke tests keeping examples/ runnable (docs that execute).

Each example is run as a subprocess exactly the way the README tells a
user to run it; only cheap configurations are used. The serve example
is covered by tests/test_serve.py (same engine/server path) and skipped
here to keep suite time bounded.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _run(script, *args, timeout=600):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ROOT, "checkpoints",
                                    "flagship_fast.npz")),
    reason="no committed fast checkpoint")
class TestExamples:
    def test_library_quickstart(self):
        r = _run("01_library_quickstart.py", "--frames", "12")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "gain +" in r.stdout, r.stdout

    def test_streaming_online(self):
        r = _run("02_streaming_online.py", "--frames", "9",
                 "--chunk-frames", "4")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "done: 9/9 stabilized frames" in r.stdout, r.stdout

    def test_batch_data_parallel(self):
        r = _run("04_batch_data_parallel.py")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "stabilized 8 clips" in r.stdout, r.stdout

    def test_finetune_on_footage(self):
        r = _run("05_finetune_on_footage.py", "--steps", "4")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "on held-out footage:" in r.stdout, r.stdout

    def test_export_deploy(self):
        r = _run("06_export_deploy.py", "--frames", "8")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "stabilized 8 frames from the artifact" in r.stdout, r.stdout

    def test_path_smoothing(self):
        r = _run("07_path_smoothing.py", "--frames", "32",
                 "--horizon", "16")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "path_smooth=16" in r.stdout, r.stdout
