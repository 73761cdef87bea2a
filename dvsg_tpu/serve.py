"""Minimal production serving endpoint for stabilization jobs.

A threaded stdlib HTTP server (no extra dependencies) exposing:

  GET  /healthz            → {"status": "ok", "backend": ..., "model": ...}
  POST /stabilize          → body: a video container (e.g. mp4); response:
                             the stabilized container. Query params:
                             ?format=mp4 (default)

Device work goes through ``pipeline.batching.BatchStabilizer``: one
device worker groups concurrent requests (a few-ms window) into a single
vmapped multi-clip chunk program and demuxes the outputs, so N
concurrent requests cost ~one batched pass instead of N serialized runs
(VERDICT.md round-2 item 7). Decode/encode stay on the request thread —
the same ownership discipline as the batch pipeline. Run:

  python -m dvsg_tpu.serve --checkpoint checkpoints/flagship.npz --port 8799
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


# Container formats VideoWriter can encode; anything else is rejected with
# a clear 400 (the raw query value otherwise leaks into temp filenames and
# the Content-Type header).
_ALLOWED_FORMATS = frozenset({"mp4", "m4v", "mov", "avi", "mkv", "webm"})


class _State:
    engine = None               # BatchStabilizer (owns the device worker)
    model_desc = ""
    max_upload = 1 << 30        # request-body cap in bytes (see do_POST)
    autocrop = False            # --border-crop auto: measure per request


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
                                 "model": state.model_desc,
                                 "autocrop": state.autocrop,
                                 "batching": dict(state.engine.stats)})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/stabilize"):
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                # Non-numeric header must answer 400 like every other
                # malformed input, not abort the connection.
                self._json(400, {"error": "bad Content-Length header"})
                return
            if length <= 0:
                self._json(400, {"error": "empty body"})
                return
            if length > state.max_upload:
                self._json(413, {
                    "error": f"body is {length} bytes; the server caps "
                             f"uploads at {state.max_upload} (each "
                             "request thread buffers its body in RAM)"})
                return
            data = self.rfile.read(length)
            # Real query parsing (exact param match + URL decoding): a
            # substring scan would match 'fileformat=' and never decode.
            from urllib.parse import parse_qs, urlsplit
            q = parse_qs(urlsplit(self.path).query)
            fmt = q.get("format", ["mp4"])[0]
            if fmt not in _ALLOWED_FORMATS:
                self._json(400, {
                    "error": f"unsupported format {fmt!r}; allowed: "
                             + ", ".join(sorted(_ALLOWED_FORMATS))})
                return
            try:
                out_bytes, n, crop = _stabilize_bytes(state, data, fmt)
            except ValueError as e:
                # Client-input problems are raised as ValueError with
                # pre-sanitized messages (no server paths).
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001
                # Everything else is a SERVER fault (device outage,
                # writer/codec failure): report 5xx so monitoring sees
                # it, and keep internals (temp paths, tracebacks) out of
                # the body.
                self._json(500, {"error": "internal stabilization "
                                          f"failure ({type(e).__name__})"})
                return
            self.send_response(200)
            self.send_header("Content-Type", f"video/{fmt}")
            self.send_header("X-Frames", str(n))
            if crop is not None:
                self.send_header("X-Border-Crop", f"{crop:.6f}")
            self.send_header("Content-Length", str(len(out_bytes)))
            self.end_headers()
            self.wfile.write(out_bytes)

    return Handler


def _read_sanitized(reader, n: int):
    """Decode errors mid-stream are the CLIENT's broken container; the
    raw cv2 exception can carry the server's temp path, so re-raise as a
    clean ValueError (→ 400)."""
    try:
        return reader.read_batch(n)
    except Exception:
        raise ValueError("request body stopped decoding mid-stream")


def _stabilize_bytes(state: _State, data: bytes, fmt: str,
                     segment_bytes: int = 256 * 1024 * 1024):
    """Decode → stabilize → encode with BOUNDED memory.

    Long uploads are processed in raw-frame segments of ~``segment_bytes``
    (a 10-minute 1080p upload decodes to ~80 GB of uint8 — it must never
    be materialized whole). Segments stay EXACT: each one is prefixed
    with the previous segment's last window-1 raw frames and those
    prefix outputs are dropped, so every kept frame's temporal window is
    its true history — bitwise identical to stabilizing the whole clip
    in one call (the carried halo is pure input history,
    pipeline/stabilize.py:initial_halo). Each segment still rides the
    shared batched device program with co-travelling requests.

    ``--border-crop auto`` (state.autocrop): the request's crop is
    measured by the predict-only scan (pipeline/autocrop.py, ~25% of a
    chunk's device cost, dispatched from this request thread) on the
    FIRST segment and reused for the rest — one framing per output
    video. The engine groups co-travelling requests by (resolution,
    crop), so distinct measured crops split programs but same-crop
    requests still batch. Returns (bytes, frames, crop|None).
    """
    import numpy as np

    from dvsg_tpu.utils import video_io

    window = state.engine.cfg.model.window
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, f"in.{fmt}")
        dst = os.path.join(d, f"out.{fmt}")
        with open(src, "wb") as f:
            f.write(data)
        try:
            reader_cm = video_io.VideoReader(src)
        except Exception:
            # Sanitize: the reader's error carries the server's temp
            # path; the client just needs to know the body didn't decode.
            raise ValueError("no decodable frames in request body")
        with reader_cm as reader:
            fps = reader.fps
            w, h = reader.width, reader.height
            frame_bytes = max(1, h * w * 3)
            seg = max(state.engine.cfg.chunk_frames,
                      int(segment_bytes // frame_bytes))
            # First decode BEFORE the writer exists: undecodable or
            # zero-dimension bodies must answer "no decodable frames",
            # not a writer error carrying the server's temp path.
            c = _read_sanitized(reader, seg)
            if c.shape[0] == 0:
                raise ValueError("no decodable frames in request body")
            req_crop = None
            if state.autocrop:
                from dvsg_tpu.pipeline.autocrop import pick_border_crop
                req_crop, _, _ = pick_border_crop(
                    state.engine.cfg, state.engine.params, c)
            n_out = 0
            if state.engine.cfg.path_smooth_lag > 0:
                # Lag mode serves WHOLE uploads (stored files, so the
                # D-frame lookahead is free) but caps them at one
                # segment: the lag carries include D raw frames, which
                # the segment-threading carry API does not ship.
                more = _read_sanitized(reader, 1)
                if more.shape[0]:
                    raise ValueError(
                        "upload too long for --path-smooth-lag serving "
                        f"(decodes past the ~{seg}-frame segment cap); "
                        "shorten the clip or use a causal --path-smooth "
                        "server for segmented streaming")
                out = state.engine.stabilize_clip(c, border_crop=req_crop)
                with video_io.VideoWriter(dst, w, h, fps) as writer:
                    writer.write_batch(out)
                n_out = out.shape[0]
                with open(dst, "rb") as f:
                    return f.read(), n_out, req_crop
            if state.engine.cfg.path_smooth > 0:
                # Path smoothing carries per-stream state (halo + EMA);
                # the stateless prefix-replay below would double-consume
                # the prefix frames' motion deltas. Instead the engine's
                # carry API threads the exact mid-stream state across
                # CHUNK-ALIGNED segments — bitwise-identical to a
                # one-call stabilization of the whole upload
                # (tests/test_serve.py pins it).
                chunk = state.engine.cfg.chunk_frames
                seg_al = max(chunk, seg // chunk * chunk)
                buf, eof = c, c.shape[0] < seg
                carry = None
                with video_io.VideoWriter(dst, w, h, fps) as writer:
                    while True:
                        if buf.shape[0] < seg_al and not eof:
                            # Top up only to one segment: reading a full
                            # seg_al here would peak at ~2x segment_bytes
                            # of buffered raw frames (round-4 advisor).
                            need = seg_al - buf.shape[0]
                            nxt = _read_sanitized(reader, need)
                            eof = nxt.shape[0] < need
                            if nxt.shape[0]:
                                buf = np.concatenate([buf, nxt], axis=0)
                            continue
                        if buf.shape[0] == 0:
                            break     # stream ended exactly on a boundary
                        final = eof and buf.shape[0] <= seg_al
                        piece = buf if final else buf[:seg_al]
                        buf = buf[:0] if final else buf[seg_al:].copy()
                        if final:
                            out = state.engine.stabilize_clip(
                                piece, border_crop=req_crop, carry=carry)
                        else:
                            out, carry = state.engine.stabilize_clip(
                                piece, border_crop=req_crop, carry=carry,
                                return_carry=True)
                        writer.write_batch(out)
                        n_out += out.shape[0]
                        del out, piece
                        if final:
                            break
                with open(dst, "rb") as f:
                    return f.read(), n_out, req_crop
            prefix = None            # last window-1 RAW frames
            with video_io.VideoWriter(dst, w, h, fps) as writer:
                while c.shape[0] > 0:
                    inp = c if prefix is None else np.concatenate(
                        [prefix, c], axis=0)
                    # Concurrent requests ride ONE batched device
                    # program; decode/encode stay on this thread.
                    out = state.engine.stabilize_clip(
                        inp, border_crop=req_crop)
                    drop = 0 if prefix is None else prefix.shape[0]
                    writer.write_batch(out[drop:])
                    n_out += out.shape[0] - drop
                    if c.shape[0] < seg:
                        break
                    # .copy(): a bare slice is a VIEW keeping the whole
                    # previous segment alive — 3x instead of 2x segment
                    # peak per request thread.
                    prefix = (inp[-(window - 1):].copy()
                              if window > 1 else None)
                    del inp, out
                    c = _read_sanitized(reader, seg)
        with open(dst, "rb") as f:
            return f.read(), n_out, req_crop


def make_server(host: str, port: int, engine,
                model_desc: str = "",
                max_upload_bytes: int = 1 << 30,
                autocrop: bool = False) -> ThreadingHTTPServer:
    """``engine``: a pipeline.batching.BatchStabilizer."""
    state = _State()
    state.engine = engine
    state.model_desc = model_desc
    state.max_upload = max_upload_bytes
    state.autocrop = autocrop
    srv = ThreadingHTTPServer((host, port), _build_handler(state))
    srv.engine = engine
    return srv


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
    p.add_argument("--max-batch", type=int, default=8,
                   help="max concurrent requests fused into one device "
                        "program")
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="how long the device worker waits for "
                        "co-travellers after a request arrives")
    p.add_argument("--strength", type=float, default=1.0,
                   help="stabilization strength (1 full, 0 passthrough)")
    p.add_argument("--path-smooth", type=int, default=0, metavar="FRAMES",
                   help="cross-chunk camera-path smoothing horizon (see "
                        "dvsg-stabilize --path-smooth); long uploads "
                        "thread the smoothing state across segments "
                        "exactly via the engine's carry API")
    p.add_argument("--path-smooth-max", type=float, default=0.05,
                   help="clamp on the extra smoothing correction "
                        "(normalized units)")
    p.add_argument("--path-smooth-lag", type=int, default=0, metavar="D",
                   help="fixed-lag smoothing lookahead (see "
                        "dvsg-stabilize --path-smooth-lag): uploads are "
                        "stored files, so the D-frame lookahead costs "
                        "nothing — but they must fit one raw-frame "
                        "segment (longer uploads answer 400; run a "
                        "causal server for segmented streaming)")
    p.add_argument("--border-crop", default="0",
                   help="crop fraction zoomed into the warp, or 'auto': "
                        "each request's crop is measured by a cheap "
                        "predict-only scan of its first segment; the "
                        "engine batches co-travelling requests by "
                        "(resolution, crop), so distinct crops split "
                        "programs while same-crop requests still share "
                        "one (measured crop is returned in the "
                        "X-Border-Crop response header)")
    p.add_argument("--max-upload-mb", type=int, default=1024,
                   help="reject request bodies above this size with 413 "
                        "(each request thread buffers its body in RAM)")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dvsg_tpu.cli import _resolve_preset
    _resolve_preset(args)

    from dvsg_tpu.config import ModelConfig, StabilizeConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.pipeline.batching import BatchStabilizer

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

    from dvsg_tpu.cli import _bad_strength, _parse_border_crop
    if _bad_strength(args.strength):
        return 2
    border_crop = _parse_border_crop(args.border_crop)
    if border_crop is None:
        return 2
    autocrop = border_crop == "auto"
    if args.path_smooth < 0 or not 0 <= args.path_smooth_max <= 0.25:
        print("ERROR: --path-smooth must be >= 0 and "
              "--path-smooth-max in [0, 0.25]", file=sys.stderr)
        return 2
    cfg = StabilizeConfig(model=mcfg, chunk_frames=args.chunk_frames,
                          warp_impl=args.warp_impl,
                          border_crop=0.0 if autocrop else border_crop,
                          strength=args.strength,
                          path_smooth=args.path_smooth,
                          path_smooth_max=args.path_smooth_max,
                          path_smooth_lag=args.path_smooth_lag)
    engine = BatchStabilizer(cfg, params, max_batch=args.max_batch,
                             window_s=args.batch_window_ms / 1e3)
    srv = make_server(args.host, args.port, engine, desc,
                      max_upload_bytes=args.max_upload_mb << 20,
                      autocrop=autocrop)
    print(f"serving on http://{args.host}:{args.port}  ({desc})")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
