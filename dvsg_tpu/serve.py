"""Minimal production serving endpoint for stabilization jobs.

A threaded stdlib HTTP server (no extra dependencies) exposing:

  GET  /healthz            → {"status": "ok", "backend": ..., "model": ...}
  POST /stabilize          → body: a video container (e.g. mp4); response:
                             the stabilized container. Query params:
                             ?format=mp4 (default)

The device work reuses the streaming pipeline; requests are serialized
through a single device worker (one model instance per server), with
decode/encode on the request thread — the same ownership discipline as the
batch pipeline. Run:

  python -m dvsg_tpu.serve --checkpoint checkpoints/flagship.npz --port 8799
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


# Container formats VideoWriter can encode; anything else is rejected with
# a clear 400 (the raw query value otherwise leaks into temp filenames and
# the Content-Type header).
_ALLOWED_FORMATS = frozenset({"mp4", "m4v", "mov", "avi", "mkv", "webm"})


class _State:
    stabilizer = None
    lock = threading.Lock()     # device worker serialization
    model_desc = ""


def _build_handler(state: _State):

    class Handler(BaseHTTPRequestHandler):
        server_version = "dvsg-tpu"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                import jax
                self._json(200, {"status": "ok",
                                 "backend": jax.default_backend(),
                                 "model": state.model_desc})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/stabilize"):
                self._json(404, {"error": "unknown path"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "empty body"})
                return
            data = self.rfile.read(length)
            fmt = "mp4"
            if "format=" in self.path:
                fmt = self.path.split("format=")[1].split("&")[0]
            if fmt not in _ALLOWED_FORMATS:
                self._json(400, {
                    "error": f"unsupported format {fmt!r}; allowed: "
                             + ", ".join(sorted(_ALLOWED_FORMATS))})
                return
            try:
                out_bytes, n = _stabilize_bytes(state, data, fmt)
            except Exception as e:
                self._json(400, {"error": str(e)})
                return
            self.send_response(200)
            self.send_header("Content-Type", f"video/{fmt}")
            self.send_header("X-Frames", str(n))
            self.send_header("Content-Length", str(len(out_bytes)))
            self.end_headers()
            self.wfile.write(out_bytes)

    return Handler


def _stabilize_bytes(state: _State, data: bytes, fmt: str):
    from dvsg_tpu.utils import video_io

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, f"in.{fmt}")
        dst = os.path.join(d, f"out.{fmt}")
        with open(src, "wb") as f:
            f.write(data)
        reader = video_io.VideoReader(src)
        writer = video_io.VideoWriter(dst, reader.width, reader.height,
                                      reader.fps)
        with state.lock:            # one request on the device at a time
            n = state.stabilizer.stabilize_stream(reader, writer)
        reader.close()
        writer.close()
        with open(dst, "rb") as f:
            return f.read(), n


def make_server(host: str, port: int, stabilizer,
                model_desc: str = "") -> ThreadingHTTPServer:
    state = _State()
    state.stabilizer = stabilizer
    state.model_desc = model_desc
    return ThreadingHTTPServer((host, port), _build_handler(state))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="dvsg-serve")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--preset", choices=("fast", "quality"), default=None,
                   help="committed pretrained model (see dvsg-stabilize)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8799)
    p.add_argument("--chunk-frames", type=int, default=16)
    p.add_argument("--warp-impl", default="auto")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dvsg_tpu.cli import _resolve_preset
    _resolve_preset(args)

    from dvsg_tpu.config import ModelConfig, StabilizeConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.pipeline.stabilize import Stabilizer

    if args.checkpoint:
        from dvsg_tpu.cli import _load_any_checkpoint
        params, mcfg = _load_any_checkpoint(args.checkpoint)
        desc = f"checkpoint:{args.checkpoint}"
    else:
        mcfg = ModelConfig()
        params = motion_cnn.init_params(mcfg, jax.random.key(0))
        desc = "untrained-identity"
        print("WARNING: serving an untrained (identity) model",
              file=sys.stderr)

    cfg = StabilizeConfig(model=mcfg, chunk_frames=args.chunk_frames,
                          warp_impl=args.warp_impl)
    srv = make_server(args.host, args.port, Stabilizer(cfg, params), desc)
    print(f"serving on http://{args.host}:{args.port}  ({desc})")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
