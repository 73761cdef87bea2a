#!/usr/bin/env python
"""HTTP serving round trip: start the server, POST a clip, save the
stabilized result.

The server (`python -m dvsg_tpu.serve`) is stdlib-only; concurrent
requests are accumulated for a few milliseconds and stabilized as ONE
batched device program (per resolution), so N clients don't pay N×
latency. This script spawns a server subprocess on a free port, writes
a synthetic shaky clip to mp4, POSTs it, and saves the response.

    python examples/03_serve_client.py [--platform cpu]
"""
import argparse
import os
import socket
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", default="/tmp/dvsg_example_stable.mp4")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    server = subprocess.Popen(
        [sys.executable, "-m", "dvsg_tpu.serve",
         "--checkpoint", os.path.join(root, "checkpoints",
                                      "flagship_fast.npz"),
         "--port", str(port), "--platform", args.platform],
        env=env, cwd=root)
    try:
        url = f"http://127.0.0.1:{port}"
        for _ in range(600):                      # wait for /healthz
            try:
                urllib.request.urlopen(f"{url}/healthz", timeout=1)
                break
            except Exception:
                time.sleep(0.5)

        # Make a small shaky clip to send.
        import cv2
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from dvsg_tpu.train.synthetic import synthetic_clip_u8
        shaky, _, _ = synthetic_clip_u8(jax.random.key(0), 16, 240, 320)
        clip = "/tmp/dvsg_example_shaky.mp4"
        vw = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"),
                             24, (320, 240))
        for f in np.asarray(shaky):
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()

        with open(clip, "rb") as f:
            req = urllib.request.Request(f"{url}/stabilize", data=f.read(),
                                         method="POST")
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=600) as resp:
            body = resp.read()
        with open(args.out, "wb") as f:
            f.write(body)
        print(f"stabilized {len(body)} bytes -> {args.out} "
              f"in {time.perf_counter() - t0:.1f}s")
    finally:
        server.terminate()
        server.wait(timeout=30)


if __name__ == "__main__":
    main()
