"""Overlapped host↔device streaming driver (SURVEY.md §7 stage 3).

Replaces the reference's synchronous decode→infer→encode frame loop
(SURVEY.md §3.1) with a three-stage pipeline so decode(t+1), compute(t) and
encode(t-1) run concurrently:

  decode thread → bounded staging queue → device loop (async dispatch,
  fetch of the PREVIOUS chunk while the current one computes) → bounded
  output queue → encode thread

JAX dispatch is async by nature: ``stabilize_chunk`` returns device futures
immediately, and ``np.asarray`` on the previous chunk's output blocks only
until THAT chunk is done, while the next chunk's compute is already queued
on the device. Ownership discipline: each queue entry is owned by exactly
one stage at a time (SURVEY.md §5.2 race policy); a determinism test pins
bitwise-equal outputs across runs.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

from dvsg_tpu.pipeline.stabilize import (Stabilizer, fetch_frames,
                                         initial_halo, put_frames)
from dvsg_tpu.utils import video_io
from dvsg_tpu.utils.metrics import StageTimer

_SENTINEL = None


def _decode_worker(reader: video_io.VideoReader, chunk_frames: int,
                   out_q: "queue.Queue", err: list):
    try:
        while True:
            chunk = reader.read_batch(chunk_frames)
            if chunk.shape[0] == 0:
                break
            out_q.put(chunk)
            if chunk.shape[0] < chunk_frames:
                break
    except Exception as e:  # surface decode errors to the main thread
        err.append(e)
    finally:
        out_q.put(_SENTINEL)


def _encode_worker(writer: video_io.VideoWriter, in_q: "queue.Queue",
                   err: list):
    try:
        while True:
            item = in_q.get()
            if item is _SENTINEL:
                break
            writer.write_batch(item)
    except Exception as e:
        err.append(e)
        # Drain so the producer never blocks on a dead consumer.
        while in_q.get() is not _SENTINEL:
            pass


def stabilize_stream_overlapped(stab: Stabilizer,
                                reader: video_io.VideoReader,
                                writer: video_io.VideoWriter,
                                timer: Optional[StageTimer] = None) -> int:
    """Stream with decode/compute/encode overlap; returns frames written."""
    timer = timer or StageTimer()
    from dvsg_tpu.pipeline import pathsmooth
    pathsmooth.lag_reject(stab.cfg, "the overlapped stream driver "
                          "(use the sync driver for lag runs)")
    cfg = stab.cfg
    t_chunk = cfg.chunk_frames

    decode_q: "queue.Queue" = queue.Queue(maxsize=cfg.queue_depth)
    encode_q: "queue.Queue" = queue.Queue(maxsize=cfg.queue_depth)
    errors: list = []

    dec = threading.Thread(target=_decode_worker,
                           args=(reader, t_chunk, decode_q, errors),
                           daemon=True)
    enc = threading.Thread(target=_encode_worker,
                           args=(writer, encode_q, errors), daemon=True)
    dec.start()
    enc.start()

    stab.begin_stream()   # fresh per-stream state (path-smoothing EMA)
    halo = None
    written = 0
    hwc = None      # (H, W, C) of the stream, for the coverage note
    pending = None  # (device_output, offsets, n_valid) awaiting fetch

    def flush(p):
        nonlocal written
        out_dev, offs, n_valid = p
        with timer.stage("d2h"):
            host = fetch_frames(out_dev[:n_valid])
        encode_q.put(host)
        # Coverage observability (Stabilizer._note_coverage): done at
        # flush time, where we already block on this chunk's results —
        # noting at dispatch would serialize the overlap.
        stab._note_coverage(offs, *hwc)
        written += n_valid

    def _drain_decode():
        # Unblock the decode worker (it may be parked on a full queue)
        # and consume through to its sentinel; tolerate the sentinel
        # having been consumed already (normal-exit races).
        while dec.is_alive() or not decode_q.empty():
            try:
                if decode_q.get(timeout=0.1) is _SENTINEL:
                    break
            except queue.Empty:
                continue

    try:
        while True:
            with timer.stage("decode_wait"):
                chunk = decode_q.get()
            if chunk is _SENTINEL:
                break
            n_valid = chunk.shape[0]
            if halo is None:
                halo = initial_halo(cfg, chunk[0])
            if hwc is None:
                hwc = chunk.shape[1:]
            if n_valid < t_chunk:
                pad = np.repeat(chunk[-1:], t_chunk - n_valid, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            with timer.stage("dispatch"):
                out_dev, halo, offs = stab._chunk(put_frames(chunk), halo)
            # Fetch the PREVIOUS chunk only now — its compute overlapped
            # with this chunk's decode and dispatch.
            if pending is not None:
                flush(pending)
            pending = (out_dev, offs, n_valid)

        if pending is not None:
            flush(pending)
    except BaseException:
        # A device-step/fetch failure must still retire both workers:
        # a decode thread parked on queue.put would leak (holding the
        # reader), and the caller's finally-block writer.close() must
        # not race an in-flight write_batch (truncated container).
        # multiclip.py applies the same discipline to its workers.
        _drain_decode()
        encode_q.put(_SENTINEL)
        enc.join()
        dec.join()
        raise
    encode_q.put(_SENTINEL)
    enc.join()
    dec.join()
    if errors:
        raise errors[0]
    return written
