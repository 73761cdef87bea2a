"""Request batching for the serving surface (VERDICT.md round-2 item 7).

The HTTP endpoint used to serialize all device work through one lock, so
N concurrent requests saw N× latency while the batched multi-clip device
program sat unused. ``BatchStabilizer`` fixes that: request threads
submit in-memory clips and block; a single device worker groups whatever
arrived within a small window (plus everything already queued) into ONE
vmapped chunk program — the same per-clip batching the offline
multi-clip driver uses (pipeline/multiclip.py) — and demuxes the
outputs.

Batch shapes are padded to the next power of two (dummy replicated
clips) so the jit cache holds at most log2(max_batch) programs per
(T, H, W); mixed-resolution groups are split (one program per
resolution). Clips inside a group may have different lengths — shorter
ones are replicate-padded to the group's longest and trimmed on the way
out, exactly like the offline driver.

The reference has no serving stack at all (SURVEY.md §1: research
scripts only; reference mount empty — citation unavailable); this is
rebuild-only scope.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np

from dvsg_tpu.config import StabilizeConfig
from dvsg_tpu.pipeline.stabilize import (drive_chunked_batch,
                                         stabilize_chunk_impl)


@dataclass
class _Request:
    frames: np.ndarray                    # (T, H, W, C) uint8
    crop: Optional[float] = None          # per-request border_crop override
    halo_in: Optional[np.ndarray] = None  # mid-stream carry: input history
    smooth_state: Optional[np.ndarray] = None   # (4,) incoming EMA state
    return_state: bool = False
    done: threading.Event = field(default_factory=threading.Event)
    output: Optional[np.ndarray] = None
    out_carry: Optional[tuple] = None     # (halo, state) after last chunk
    error: Optional[Exception] = None


class BatchStabilizer:
    """Thread-safe clip stabilizer that batches concurrent callers onto
    one device program.

    ``stabilize_clip`` blocks the calling thread until its clip is done;
    concurrency comes from many threads calling it at once. ``window_s``
    is how long the device worker waits for co-travellers after the
    first request of a group arrives (a few ms: far below one chunk's
    device time, so the added latency is noise while the win under
    concurrency is ~Nx).
    """

    def __init__(self, cfg: StabilizeConfig, params,
                 max_batch: int = 8, window_s: float = 0.005):
        self.cfg = cfg
        self.params = params
        self.max_batch = max(1, max_batch)
        self.window_s = window_s
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._fns: Dict[tuple, object] = {}
        self.stats = {"requests": 0, "batches": 0, "max_group": 0,
                      # chunks (summed over real clips) that exceeded the
                      # fused kernel's coverage band and rode the exact
                      # lax-oracle fallback (correct, ~40x slower) —
                      # surfaces "why was this request slow" on /healthz.
                      "coverage_fallback_chunks": 0}
        self._closed = False
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- public API -----------------------------------------------------

    def stabilize_clip(self, frames_u8: np.ndarray,
                       border_crop: Optional[float] = None,
                       carry=None, return_carry: bool = False):
        """(T, H, W, C) uint8 → stabilized same shape; thread-safe.

        ``border_crop`` overrides the engine config's crop FOR THIS
        REQUEST (the serve --border-crop auto path, VERDICT round-3
        item 5): requests group by (resolution, crop), so co-travellers
        with the same crop still share one device program. Callers must
        pass values quantized to the autocrop grid (multiples of
        1/64, pipeline/autocrop.py) — the crop is a STATIC argument of
        the compiled program and unquantized values would grow the jit
        cache per distinct float.

        ``carry`` / ``return_carry`` (path smoothing only): a mid-stream
        carry ``(halo (window-1, mh, mw, C) f32, smooth_state (4,) f32)``
        for segment-threading callers (serve's bounded-memory long
        uploads). With ``return_carry=True`` the call returns
        ``(output, (halo, state))`` taken after this clip's LAST chunk.
        Carry requests additionally group by clip LENGTH so the
        pad-to-longest of mixed groups can never advance a carry past
        the true stream position; callers must keep every non-final
        segment a multiple of cfg.chunk_frames for the same reason.
        """
        frames_u8 = np.asarray(frames_u8)
        if frames_u8.ndim != 4 or frames_u8.shape[0] == 0:
            raise ValueError(f"need a (T, H, W, C) clip, "
                             f"got {frames_u8.shape}")
        if frames_u8.dtype != np.uint8:
            # Reject rather than cast: float frames in [0, 1] would
            # silently truncate to near-black garbage.
            raise TypeError(f"need uint8 frames in [0, 255], got "
                            f"{frames_u8.dtype}")
        if border_crop is not None:
            from dvsg_tpu.pipeline.autocrop import CROP_DENOM
            if not 0.0 <= border_crop < 0.5:
                raise ValueError(f"border_crop must be in [0, 0.5), "
                                 f"got {border_crop}")
            if border_crop == self.cfg.border_crop:
                # An override equal to the engine default names the
                # program the engine runs anyway — normalize it away
                # (BEFORE the grid check: an off-grid engine default is
                # legal, and echoing it back must stay legal too).
                border_crop = None
            else:
                steps = border_crop * CROP_DENOM
                if abs(steps - round(steps)) > 1e-9:
                    raise ValueError(
                        f"border_crop must be a multiple of "
                        f"1/{CROP_DENOM} (the compile-cache quantization "
                        f"grid), got {border_crop}")
        if (carry is not None or return_carry) and self.cfg.path_smooth <= 0:
            raise ValueError("carry/return_carry are the path-smoothing "
                             "segment-threading API; cfg.path_smooth is 0")
        if (carry is not None or return_carry) \
                and self.cfg.path_smooth_lag > 0:
            # The lag carries include D raw full-res frames; threading
            # them across segments is carry-API surgery nobody needs yet
            # (serve caps lag uploads at one segment instead).
            raise ValueError(
                "segment carries are not supported with path_smooth_lag; "
                "submit whole clips (or use the causal smoother for "
                "segmented streams)")
        if return_carry and frames_u8.shape[0] % self.cfg.chunk_frames:
            raise ValueError(
                "a segment that returns a carry (i.e. any NON-FINAL "
                "segment) must be a multiple of chunk_frames="
                f"{self.cfg.chunk_frames}: tail padding would advance "
                f"the carry past the true stream position; got "
                f"{frames_u8.shape[0]} frames")
        halo_in = smooth_state = None
        if carry is not None:
            from dvsg_tpu.pipeline import pathsmooth
            halo_in, smooth_state = carry
            halo_in = np.asarray(halo_in, np.float32)
            smooth_state = np.asarray(smooth_state, np.float32)
            want = pathsmooth.STATE_DIM
            if smooth_state.shape != (want,):
                raise ValueError(
                    f"carry smooth_state must be a ({want},) f32 vector "
                    f"(x, y, θ, log-s), got shape {smooth_state.shape}; "
                    "pass back exactly what return_carry returned")
        req = _Request(frames_u8, crop=border_crop, halo_in=halo_in,
                       smooth_state=smooth_state,
                       return_state=return_carry)
        # The lock orders submission against close(): without it a
        # request enqueued after the worker consumed the shutdown
        # sentinel would block on req.done forever.
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("BatchStabilizer is closed")
            self._q.put(req)
        req.done.wait()
        if req.error is not None:
            raise req.error
        if return_carry:
            return req.output, req.out_carry
        return req.output

    def close(self):
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._worker.join()
        # Fail anything the worker never picked up (enqueued before the
        # sentinel but left behind when the worker exited mid-group).
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item.error = RuntimeError("BatchStabilizer closed")
                item.done.set()

    # -- device worker --------------------------------------------------

    def _run(self):
        while True:
            first = self._q.get()
            if first is None:
                return
            group = [first]
            deadline = time.monotonic() + self.window_s
            while len(group) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    # Still sweep anything ALREADY queued (zero wait).
                    try:
                        item = self._q.get_nowait()
                    except queue.Empty:
                        break
                else:
                    try:
                        item = self._q.get(timeout=left)
                    except queue.Empty:
                        break
                if item is None:
                    self._q.put(None)     # re-arm shutdown, finish group
                    break
                group.append(item)
            self.stats["requests"] += len(group)
            self.stats["max_group"] = max(self.stats["max_group"],
                                          len(group))
            # Group by (resolution, crop): the crop is a static arg of
            # the compiled program, so requests with different measured
            # auto-crops ride different programs — but same-crop
            # co-travellers still batch (VERDICT round-3 item 5).
            # Carry requests (segment threading) additionally group by
            # clip LENGTH: pad-to-longest of a mixed group would advance
            # their carry past the true stream position.
            by_key: Dict[tuple, List[_Request]] = {}
            for r in group:
                carries = (r.return_state or r.halo_in is not None
                           or r.smooth_state is not None)
                by_key.setdefault(
                    (r.frames.shape[1:], r.crop,
                     r.frames.shape[0] if carries else None),
                    []).append(r)
            for (_, crop, _), items in by_key.items():
                try:
                    self._run_group(items, crop)
                except Exception as e:     # noqa: BLE001 — demux errors
                    for r in items:
                        r.error = e
                        r.done.set()

    def _group_cfg(self, crop: Optional[float]) -> StabilizeConfig:
        return (self.cfg if crop is None
                else self.cfg.replace(border_crop=crop))

    def _fn(self, batch: int, crop: Optional[float]):
        # Cache bounded: pow2 batches × crops quantized to 1/64
        # (validated at submit) → ≤ log2(max_batch) × 32 programs.
        key = (batch, crop)
        if key not in self._fns:
            cfg = self._group_cfg(crop)

            if cfg.path_smooth_lag > 0:
                from dvsg_tpu.parallel.dp import _stabilize_chunk_batch_lag

                def step(params, frames, halos, carries):
                    return _stabilize_chunk_batch_lag(cfg, params, frames,
                                                      halos, carries)
            elif cfg.path_smooth > 0:
                # Per-clip (B, 4) smoothing states ride the vmap; each
                # whole in-memory request is one stream, so the state is
                # threaded per _run_group call (thread_batch_state).
                from dvsg_tpu.pipeline.stabilize import (
                    stabilize_chunk_smooth_impl)

                def step(params, frames, halos, states):
                    return jax.vmap(
                        lambda f, h, s: stabilize_chunk_smooth_impl(
                            cfg, params, f, h, s)
                    )(frames, halos, states)
            else:
                def step(params, frames, halos):
                    return jax.vmap(
                        lambda f, h: stabilize_chunk_impl(cfg, params,
                                                          f, h)
                    )(frames, halos)

            self._fns[key] = jax.jit(step)
        return self._fns[key]

    def _run_group(self, items: List[_Request],
                   crop: Optional[float] = None):
        b = len(items)
        bp = 1
        while bp < b:
            bp *= 2
        lens = [r.frames.shape[0] for r in items]
        max_len = max(lens)
        clips = []
        for r in items:
            c = r.frames
            if c.shape[0] < max_len:
                c = np.concatenate(
                    [c, np.repeat(c[-1:], max_len - c.shape[0], axis=0)])
            clips.append(c)
        while len(clips) < bp:                 # pad to the pow2 program
            clips.append(clips[0])
        batch = np.stack(clips)                # (bp, max_len, H, W, C)

        # drive_chunked_batch pipelines D2H one chunk behind dispatch and
        # fetches only the b REAL clips — the pow2 padding clips must be
        # computed (one program per pow2 batch) but never transferred.
        cov: list = []
        cfg_group = self._group_cfg(crop)
        fn = self._fn(bp, crop)
        if self.cfg.path_smooth_lag > 0:
            # Whole-clip lag requests ride the lag drive (emission
            # shifted by D; per-clip replicate-pad tails make shorter
            # group members byte-identical to their single-clip runs).
            from dvsg_tpu.pipeline.stabilize import drive_chunked_batch_lag
            full = drive_chunked_batch_lag(fn, self.params, cfg_group,
                                           batch, fetch_clips=b,
                                           coverage_out=cov)
            self.stats["batches"] += 1
            self.stats["coverage_fallback_chunks"] += sum(cov)
            if crop is not None:
                seen = self.stats.get("crops_seen", [])
                if crop not in seen:
                    self.stats["crops_seen"] = sorted(seen + [crop])
            for i, r in enumerate(items):
                r.output = np.ascontiguousarray(full[i, :lens[i]])
                r.done.set()
            return
        smoothing = self.cfg.path_smooth > 0
        any_ret = any(r.return_state for r in items)
        init_halos = None
        if any(r.halo_in is not None for r in items):
            from dvsg_tpu.pipeline.stabilize import initial_halo
            hs = [r.halo_in if r.halo_in is not None
                  else np.asarray(initial_halo(cfg_group, r.frames[0]))
                  for r in items]
            hs += [hs[0]] * (bp - b)      # pad slots: any valid halo
            init_halos = np.stack(hs)
        wrapper = None
        if smoothing:
            from dvsg_tpu.pipeline import pathsmooth
            init_states = None
            if any(r.smooth_state is not None for r in items):
                fresh = np.asarray(pathsmooth.initial_state())
                ss = [r.smooth_state if r.smooth_state is not None
                      else fresh for r in items]
                ss += [ss[0]] * (bp - b)
                init_states = np.stack(ss)
            wrapper = pathsmooth.thread_batch_state(
                fn, bp, init_states=init_states)
            fn = wrapper
        res = drive_chunked_batch(fn, self.params, cfg_group, batch,
                                  fetch_clips=b, coverage_out=cov,
                                  initial_halos=init_halos,
                                  return_halos=any_ret)
        if any_ret:
            full, final_halos = res
            final_halos = np.asarray(final_halos)
            final_states = np.asarray(wrapper.states())
        else:
            full = res
        self.stats["batches"] += 1
        self.stats["coverage_fallback_chunks"] += sum(cov)
        if crop is not None:
            seen = self.stats.get("crops_seen", [])
            if crop not in seen:
                # Replace, never mutate: /healthz handler threads
                # serialize this list concurrently (dict(stats) is a
                # shallow copy), so an in-place append+sort could tear
                # their snapshot.
                self.stats["crops_seen"] = sorted(seen + [crop])
        for i, r in enumerate(items):
            # copy: a slice of `full` is a VIEW that would pin the whole
            # (b, max_len, H, W, C) batch for as long as any caller holds
            # its output (a 5-frame clip grouped with a long segment
            # would retain the segment's full buffer).
            r.output = np.ascontiguousarray(full[i, :lens[i]])
            if r.return_state:
                r.out_carry = (final_halos[i].copy(),
                               final_states[i].copy())
            r.done.set()
