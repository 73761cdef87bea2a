"""Batched multi-clip streaming: N videos in → N stabilized videos out.

The BASELINE.json config-4/5 workload shape: a batch of clips processed as
one device program per chunk, sharded per-clip over the mesh's ``data``
axis when one is provided (zero steady-state collectives — clips are
independent). Host decode runs in a thread pool (one worker per clip,
bounded queues); encode likewise, so host I/O overlaps device compute the
same way the single-clip overlapped driver does.

Clips of different lengths are handled by replicate-padding finished clips
until the longest clip ends (their outputs are dropped). Clips must share
one resolution — ``stabilize_multi`` raises on a mixed-resolution batch
(VideoReader does not resize to a target resolution).
"""

from __future__ import annotations

import queue
import threading
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dvsg_tpu.config import StabilizeConfig
from dvsg_tpu.parallel import dp
from dvsg_tpu.pipeline.stabilize import (fetch_frames, initial_halo,
                                         put_frames)
from dvsg_tpu.utils import video_io
from dvsg_tpu.utils.metrics import StageTimer

_SENTINEL = None


def _decode_worker(reader, chunk, out_q, err):
    try:
        while True:
            batch = reader.read_batch(chunk)
            out_q.put(batch)
            if batch.shape[0] < chunk:
                break
    except Exception as e:
        err.append(e)
        out_q.put(np.zeros((0, reader.height, reader.width, 3), np.uint8))


def _encode_worker(writer, in_q, err):
    try:
        while True:
            item = in_q.get()
            if item is _SENTINEL:
                break
            writer.write_batch(item)
    except Exception as e:
        err.append(e)
        while in_q.get() is not _SENTINEL:
            pass


def stabilize_multi(cfg: StabilizeConfig, params,
                    readers: Sequence[video_io.VideoReader],
                    writers: Sequence[video_io.VideoWriter],
                    mesh=None,
                    timer: Optional[StageTimer] = None) -> List[int]:
    """Stabilize a batch of clips concurrently; returns frames per clip."""
    timer = timer or StageTimer()
    n = len(readers)
    assert n == len(writers)
    t_chunk = cfg.chunk_frames
    h, w = readers[0].shape
    for r in readers:
        if r.shape != (h, w):
            raise ValueError("all clips must share one resolution; "
                             f"got {r.shape} vs {(h, w)}")

    if mesh is not None:
        fn = dp.make_sharded_chunk_fn(cfg, mesh)
    else:
        from dvsg_tpu.pipeline.stabilize import stabilize_chunk_impl
        fn = jax.jit(lambda p, f, hl: jax.vmap(
            lambda ff, hh: stabilize_chunk_impl(cfg, p, ff, hh))(f, hl))

    errors: list = []
    dec_qs = [queue.Queue(maxsize=cfg.queue_depth) for _ in range(n)]
    enc_qs = [queue.Queue(maxsize=cfg.queue_depth) for _ in range(n)]
    threads = []
    for i in range(n):
        t = threading.Thread(target=_decode_worker,
                             args=(readers[i], t_chunk, dec_qs[i], errors),
                             daemon=True)
        t.start()
        threads.append(t)
        t = threading.Thread(target=_encode_worker,
                             args=(writers[i], enc_qs[i], errors),
                             daemon=True)
        t.start()
        threads.append(t)

    halos = None
    done = [False] * n
    written = [0] * n
    last = [None] * n           # last frame of each clip for padding
    pending = None              # (device out, valid list) to fetch later

    def flush(p):
        out_dev, valid = p
        with timer.stage("d2h"):
            host = fetch_frames(out_dev)
        for i in range(n):
            if valid[i] > 0:
                enc_qs[i].put(host[i, :valid[i]])
                written[i] += valid[i]

    while not all(done):
        chunks = []
        valid = []
        with timer.stage("decode_wait"):
            for i in range(n):
                if done[i]:
                    chunks.append(np.repeat(last[i][None], t_chunk, axis=0))
                    valid.append(0)
                    continue
                c = dec_qs[i].get()
                v = c.shape[0]
                if v == 0 and last[i] is None:
                    raise ValueError(f"clip {i} is empty")
                if v < t_chunk:
                    done[i] = True
                if v > 0:
                    last[i] = c[-1]
                    if v < t_chunk:
                        pad = np.repeat(c[-1:], t_chunk - v, axis=0)
                        c = np.concatenate([c, pad], axis=0)
                else:
                    c = np.repeat(last[i][None], t_chunk, axis=0)
                chunks.append(c)
                valid.append(v)
        if halos is None:
            halos = jnp.stack(
                [initial_halo(cfg, chunks[i][0]) for i in range(n)])
        batch = np.stack(chunks)
        with timer.stage("dispatch"):
            out_dev, halos, _ = fn(params, put_frames(batch), halos)
        if pending is not None:
            flush(pending)
        pending = (out_dev, list(valid))

    if pending is not None:
        flush(pending)
    for q in enc_qs:
        q.put(_SENTINEL)
    # Join without timeout: decode workers have terminated (their final
    # short batch was consumed above) and the sentinel guarantees encode
    # workers exit once their queues drain. A timed join here could return
    # while encoders still write, and the caller's writer.close() would
    # then race the in-flight writes and truncate outputs.
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return written
