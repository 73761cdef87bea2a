"""Online (push) stabilization API for live sources.

The reference's surface is batch scripts; for live/streaming use the same
chunked device core is wrapped in a push API: feed frames one at a time,
receive stabilized frames as each chunk fills. Latency = chunk_frames
frames (set chunk_frames=1 for frame-level latency — static shapes make
that just another compiled program).

Path smoothing (cfg.path_smooth > 0) is fully supported: the one-pole
EMA over the measured camera path is CAUSAL by construction, so live
streaming is its natural home — the carried (4,) state threads through
``push``/``flush`` exactly as ``Stabilizer._chunk`` threads it
(pipeline/stabilize.py), and the output is byte-identical to
``Stabilizer.stabilize_clip`` on the same frames.

End-of-stream contract: ``flush()`` pads its partial chunk by
replicating the last frame; those pad frames advance the carried halo
and smoothing state PAST the true stream position, so a flushed stream
is ENDED — further ``push`` calls raise until ``reset()``. (Silently
continuing used to treat the pad frames as real history — wrong for the
halo even without smoothing, and it would let pad-frame deltas decay a
continuing stream's EMA state.)
"""

from __future__ import annotations

from typing import List

import numpy as np

from dvsg_tpu.config import StabilizeConfig
from dvsg_tpu.pipeline.stabilize import (fetch_frames, initial_halo,
                                         put_frames, stabilize_chunk,
                                         stabilize_chunk_smooth)


class OnlineStabilizer:
    """Push frames in, get stabilized frames out, chunk by chunk.

    >>> s = OnlineStabilizer(cfg, params)
    >>> for frame in source:
    ...     for out in s.push(frame):
    ...         sink(out)
    >>> for out in s.flush():
    ...     sink(out)
    """

    def __init__(self, cfg: StabilizeConfig, params):
        from dvsg_tpu.pipeline import pathsmooth
        pathsmooth.lag_reject(
            cfg, "the online push surface (live consumers cannot pay "
                 "a D-frame output delay; the causal smoother IS "
                 "supported here)")
        self.cfg = cfg
        self.params = params
        self._buf: List[np.ndarray] = []
        self._halo = None
        self._smooth_state = None
        self._ended = False

    def _process(self, frames: np.ndarray, n_valid: int) -> np.ndarray:
        if self._halo is None:
            self._halo = initial_halo(self.cfg, frames[0])
            if self.cfg.path_smooth > 0:
                from dvsg_tpu.pipeline import pathsmooth
                self._smooth_state = pathsmooth.initial_state()
        if self.cfg.path_smooth > 0:
            out, self._halo, self._smooth_state, _ = stabilize_chunk_smooth(
                self.cfg, self.params, put_frames(frames), self._halo,
                self._smooth_state)
        else:
            out, self._halo, _ = stabilize_chunk(
                self.cfg, self.params, put_frames(frames), self._halo)
        return fetch_frames(out[:n_valid])

    def push(self, frame: np.ndarray) -> List[np.ndarray]:
        """Add one (H, W, 3) uint8 frame; returns 0 or chunk_frames
        stabilized frames."""
        if self._ended:
            raise RuntimeError(
                "this stream was ended by flush() (its replicate-padding "
                "advanced the carried state past the true stream "
                "position); call reset() to start a new stream")
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            # Reject rather than cast: a float frame in [0, 1] (common
            # for live capture pipelines) would silently survive an
            # astype as near-black garbage — the pipeline's contract is
            # 0..255 uint8.
            raise TypeError(
                f"push() needs uint8 frames in [0, 255], got "
                f"{frame.dtype}; scale and cast explicitly")
        if frame.ndim != 3:
            raise ValueError(f"push() needs one (H, W, C) frame, got "
                             f"shape {frame.shape}")
        self._buf.append(frame)
        if len(self._buf) < self.cfg.chunk_frames:
            return []
        chunk = np.stack(self._buf)
        self._buf.clear()
        return list(self._process(chunk, chunk.shape[0]))

    def flush(self) -> List[np.ndarray]:
        """Process any buffered partial chunk (replicate-padded) and END
        the stream (see module docstring); a no-op on an empty buffer
        leaves the stream open."""
        if not self._buf:
            return []
        n_valid = len(self._buf)
        chunk = np.stack(self._buf)
        self._buf.clear()
        pad = np.repeat(chunk[-1:], self.cfg.chunk_frames - n_valid, axis=0)
        chunk = np.concatenate([chunk, pad], axis=0)
        self._ended = True
        return list(self._process(chunk, n_valid))

    def reset(self):
        """Drop buffered frames and streaming state (new scene/source)."""
        self._buf.clear()
        self._halo = None
        self._smooth_state = None
        self._ended = False
