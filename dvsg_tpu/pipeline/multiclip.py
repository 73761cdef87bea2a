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

import dataclasses
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


@dataclasses.dataclass
class MultiClipResult:
    """Per-clip outcome of a batch run (SURVEY.md §5.3 fault isolation).

    ``frames_written[i]`` counts frames flushed to writer i — for a
    failed clip this is the resume point (frame-dir outputs restart
    there; the single-clip streaming API's ``resume_dir`` mechanism
    applies). ``errors[i]`` is the exception that killed clip i's decode
    or encode, or None; a failed clip stops consuming device output but
    the REST of the batch runs to completion.

    ``coverage_fallback_chunks[i]`` counts clip i's chunks whose offsets
    exceeded the fused warp kernel's stripe-coverage band — those chunks
    rode the exact lax oracle via the device guard (correct output,
    ~40x slower; see Stabilizer._note_coverage for the single-clip
    analog). Zeros on the lax path, which has no coverage contract.
    """

    frames_written: List[int]
    errors: List[Optional[Exception]]
    coverage_fallback_chunks: Optional[List[int]] = None

    @property
    def failed_clips(self) -> List[int]:
        return [i for i, e in enumerate(self.errors) if e is not None]

    @property
    def ok(self) -> bool:
        return not self.failed_clips


def _decode_worker(reader, chunk, out_q, errs, idx, stop):
    # ``stop`` is this clip's abandon signal (its encoder failed, or the
    # device step died): it bounds how much a worker decodes after the
    # main loop stopped consuming, so an abandoned hour-long clip does
    # not burn a core decoding to EOF before the batch can return.
    try:
        while not stop.is_set():
            batch = reader.read_batch(chunk)
            out_q.put(batch)
            if batch.shape[0] < chunk:
                break
    except Exception as e:
        errs[idx] = e
        out_q.put(np.zeros((0, reader.height, reader.width, 3), np.uint8))


def _encode_worker(writer, in_q, errs, written, idx):
    # ``written[idx]`` counts frames ACTUALLY written, incremented only
    # after a batch lands — not at enqueue time. The main loop may be
    # several chunks ahead of the writer, so an enqueue-side count would
    # overstate the on-disk resume point when the encoder fails. A batch
    # that raises mid-write is not counted at all: undercounting makes a
    # resume re-write idempotent frames, overcounting would skip frames.
    try:
        while True:
            item = in_q.get()
            if item is _SENTINEL:
                break
            writer.write_batch(item)
            written[idx] += item.shape[0]
    except Exception as e:
        errs[idx] = e
        while in_q.get() is not _SENTINEL:
            pass


def stabilize_multi(cfg: StabilizeConfig, params,
                    readers: Sequence[video_io.VideoReader],
                    writers: Sequence[video_io.VideoWriter],
                    mesh=None,
                    timer: Optional[StageTimer] = None) -> MultiClipResult:
    """Stabilize a batch of clips concurrently.

    Fault isolation is PER CLIP: a clip whose reader or writer throws
    mid-stream is marked failed (its partial output and written-frame
    count are preserved as the resume point) and the remaining clips run
    to completion; the returned ``MultiClipResult`` says which clips
    need re-running. Only a failure of every clip raises.
    """
    timer = timer or StageTimer()
    n = len(readers)
    assert n == len(writers)
    from dvsg_tpu.pipeline import pathsmooth as _ps
    _ps.lag_reject(cfg, "the multi-clip batch driver")
    t_chunk = cfg.chunk_frames
    h, w = readers[0].shape
    for r in readers:
        if r.shape != (h, w):
            raise ValueError("all clips must share one resolution; "
                             f"got {r.shape} vs {(h, w)}")

    if mesh is not None:
        n_dev = mesh.devices.size
        if n % n_dev != 0:
            # Fail BEFORE any worker thread starts: the sharding error
            # XLA would raise at the first chunk is cryptic and would
            # leave decode/encode threads running (dp.py has the same
            # up-front check for its clip batches).
            raise ValueError(
                f"clip count {n} must be divisible by the mesh's "
                f"{n_dev} devices for per-clip data parallelism")
        fn = dp.make_sharded_chunk_fn(cfg, mesh)
        if cfg.path_smooth > 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from dvsg_tpu.parallel.mesh import DATA_AXIS
            from dvsg_tpu.pipeline import pathsmooth
            fn = pathsmooth.thread_batch_state(
                fn, n, sharding=NamedSharding(mesh, P(DATA_AXIS)))
    else:
        from dvsg_tpu.pipeline.stabilize import stabilize_chunk_impl
        if cfg.path_smooth > 0:
            from dvsg_tpu.pipeline import pathsmooth
            from dvsg_tpu.pipeline.stabilize import (
                stabilize_chunk_smooth_impl)
            fn = pathsmooth.thread_batch_state(
                jax.jit(lambda p, f, hl, st: jax.vmap(
                    lambda ff, hh, ss: stabilize_chunk_smooth_impl(
                        cfg, p, ff, hh, ss))(f, hl, st)), n)
        else:
            fn = jax.jit(lambda p, f, hl: jax.vmap(
                lambda ff, hh: stabilize_chunk_impl(cfg, p, ff, hh))(f, hl))

    # Decode and encode failures are tracked separately: a decode error
    # is acted on only when its (final) empty sentinel batch arrives, so
    # every successfully decoded frame ahead of it in the queue is still
    # stabilized and flushed — the written count IS the resume point. An
    # encode error stops the clip immediately (its output can no longer
    # be consumed).
    dec_errors: List[Optional[Exception]] = [None] * n
    enc_errors: List[Optional[Exception]] = [None] * n
    dec_qs = [queue.Queue(maxsize=cfg.queue_depth) for _ in range(n)]
    enc_qs = [queue.Queue(maxsize=cfg.queue_depth) for _ in range(n)]
    written = [0] * n           # frames on disk, owned by encode workers
    threads = []
    dec_threads = []
    dec_stops = [threading.Event() for _ in range(n)]
    for i in range(n):
        t = threading.Thread(target=_decode_worker,
                             args=(readers[i], t_chunk, dec_qs[i],
                                   dec_errors, i, dec_stops[i]),
                             daemon=True)
        t.start()
        threads.append(t)
        dec_threads.append(t)
        t = threading.Thread(target=_encode_worker,
                             args=(writers[i], enc_qs[i], enc_errors,
                                   written, i),
                             daemon=True)
        t.start()
        threads.append(t)

    def _drain_decode(i):
        # A failed clip's decode worker may still be producing into its
        # bounded queue; stop it, stop consuming it in the main loop,
        # and drain it here so the worker can't block forever on put()
        # (liveness). The stop event ends the worker at its next
        # read_batch boundary instead of letting it decode to EOF.
        dec_stops[i].set()

        def drain():
            while dec_threads[i].is_alive() or not dec_qs[i].empty():
                try:
                    dec_qs[i].get(timeout=0.1)
                except queue.Empty:
                    pass
        t = threading.Thread(target=drain, daemon=True)
        t.start()
        threads.append(t)

    done = [False] * n
    last = [None] * n           # last frame of each clip for padding

    cov = [0] * n               # per-clip coverage-fallback chunk counts
    try:
        _run_main_loop(cfg, n, t_chunk, h, w, fn, params, timer,
                       dec_qs, enc_qs, dec_errors, enc_errors,
                       done, last, _drain_decode, cov)
    except BaseException:
        # The device step (or a fetch) died mid-run: stop + drain the
        # decode workers and sentinel the encoders BEFORE the exception
        # escapes — otherwise the caller's writer.close() races the
        # in-flight write_batch calls (truncated containers, written[]
        # counts that don't match disk) and blocked decode workers leak.
        for i in range(n):
            if not done[i]:
                _drain_decode(i)
        raise
    finally:
        for q in enc_qs:
            q.put(_SENTINEL)
        # Join without timeout: decode workers have terminated (normal
        # path: their final short batch was consumed; error path: the
        # stop+drain above) and the sentinel guarantees encode workers
        # exit once their queues drain. A timed join could return while
        # encoders still write, and the caller's writer.close() would
        # then race the in-flight writes and truncate outputs.
        for t in threads:
            t.join()
    # All workers have joined: written[] is final.
    merged = [d if d is not None else e
              for d, e in zip(dec_errors, enc_errors)]
    result = MultiClipResult(written, merged, cov)
    if result.failed_clips and len(result.failed_clips) == n:
        raise merged[result.failed_clips[0]]
    return result


def _run_main_loop(cfg, n, t_chunk, h, w, fn, params, timer, dec_qs,
                   enc_qs, dec_errors, enc_errors, done, last,
                   _drain_decode, cov) -> None:
    from dvsg_tpu.ops.warp import resolve_impl
    check_cov = resolve_impl(cfg.warp_impl).startswith("pallas")
    halos = None
    pending = None      # (device out, offsets, valid list) to fetch later
    blank = np.zeros((t_chunk, h, w, 3), np.uint8)

    def flush(p):
        out_dev, offs_dev, valid = p
        with timer.stage("d2h"):
            host = fetch_frames(out_dev)
        if check_cov:
            # Host-side mirror of the device guard, per clip (the
            # vmapped guard_cond repairs only actual violators, so the
            # per-clip count is the honest unit; see MultiClipResult).
            from dvsg_tpu.ops import warp_wide
            offs = np.asarray(offs_dev)
            for i in range(n):
                if valid[i] > 0 and not warp_wide.offsets_coverage_ok(
                        offs[i], h, w, border_crop=cfg.border_crop):
                    cov[i] += 1
        for i in range(n):
            # A clip whose encoder already failed stops consuming output
            # (its queue is being drained); its encode worker owns
            # written[i], frozen at the last batch that actually landed
            # on disk — the resume point.
            if valid[i] > 0 and enc_errors[i] is None:
                enc_qs[i].put(host[i, :valid[i]])

    while not all(done):
        chunks = []
        valid = []
        with timer.stage("decode_wait"):
            for i in range(n):
                if not done[i] and enc_errors[i] is not None:
                    done[i] = True   # encoder died: stop feeding the clip
                    _drain_decode(i)
                if done[i]:
                    filler = blank if last[i] is None else np.repeat(
                        last[i][None], t_chunk, axis=0)
                    chunks.append(filler)
                    valid.append(0)
                    continue
                c = dec_qs[i].get()
                v = c.shape[0]
                if v == 0 and dec_errors[i] is not None:
                    # The decode worker's final (error) sentinel: every
                    # good batch before it has been processed; the worker
                    # has exited, so no drain is needed.
                    done[i] = True
                    chunks.append(blank if last[i] is None else np.repeat(
                        last[i][None], t_chunk, axis=0))
                    valid.append(0)
                    continue
                if v == 0 and last[i] is None:
                    dec_errors[i] = ValueError(f"clip {i} is empty")
                    done[i] = True
                    chunks.append(blank)
                    valid.append(0)
                    continue
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
        if all(done) and not any(valid):
            break
        if halos is None:
            halos = jnp.stack(
                [initial_halo(cfg, chunks[i][0]) for i in range(n)])
        batch = np.stack(chunks)
        with timer.stage("dispatch"):
            out_dev, halos, offs_dev = fn(params, put_frames(batch), halos)
        if pending is not None:
            flush(pending)
        pending = (out_dev, offs_dev, list(valid))

    if pending is not None:
        flush(pending)
