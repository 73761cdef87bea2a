"""Host frame staging: pinned NHWC buffers + native color conversion.

BASELINE.json north_star: "host-side frame decode into pinned NHWC
buffers". The hot per-byte host work (BGR→RGB swizzle, staging copies) runs
in the `_dvsg_native` C++ extension (dvsg_tpu/native/staging.cpp) with a
persistent thread pool; a numpy fallback keeps everything working where a
compiler is unavailable.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

_native = None
_native_tried = False


def native():
    """The `_dvsg_native` module, built on demand; None if unavailable."""
    global _native, _native_tried
    if not _native_tried:
        _native_tried = True
        try:
            from dvsg_tpu.native import build as native_build
            native_build.build()
            import importlib
            _native = importlib.import_module("dvsg_tpu.native._dvsg_native")
        except Exception:
            _native = None
    return _native


def bgr_to_rgb(src: np.ndarray, out: Optional[np.ndarray] = None
               ) -> np.ndarray:
    """(..., 3) uint8 BGR → RGB, fused single pass (native when possible)."""
    assert src.dtype == np.uint8 and src.shape[-1] == 3
    src = np.ascontiguousarray(src)
    if out is None:
        out = np.empty_like(src)
    elif not out.flags.c_contiguous:
        # reshape(-1) on a non-contiguous out would hand the native pass
        # a COPY: the conversion would land in the temporary and be
        # silently discarded.
        raise ValueError("out buffer must be C-contiguous")
    mod = native()
    if mod is not None:
        mod.bgr_to_rgb_batch(src.reshape(-1), out.reshape(-1))
    else:
        np.copyto(out, src[..., ::-1])
    return out


def stack_frames(frames: List[np.ndarray], out: Optional[np.ndarray] = None
                 ) -> np.ndarray:
    """Stack T (H, W, C) uint8 frames into a staging (T, H, W, C) buffer."""
    t = len(frames)
    h, w, c = frames[0].shape
    if out is None:
        out = alloc_staging((t, h, w, c))
    mod = native()
    for i, f in enumerate(frames):
        f = np.ascontiguousarray(f)
        if mod is not None:
            mod.copy_batch(f.reshape(-1), out[i].reshape(-1))
        else:
            np.copyto(out[i], f)
    return out[:t]


def alloc_staging(shape, dtype=np.uint8, alignment: int = 4096) -> np.ndarray:
    """Page-aligned staging buffer (DMA-friendly host→device transfers)."""
    size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    raw = np.empty(size + alignment, np.uint8)
    offset = (-raw.ctypes.data) % alignment
    return raw[offset:offset + size].view(dtype).reshape(shape)


class StagingRing:
    """Fixed pool of pinned NHWC staging buffers, reused round-robin.

    Each slot is owned by exactly one pipeline stage at a time (decode →
    h2d) — the bounded-queue ownership discipline of SURVEY.md §5.2. The
    ring removes per-chunk allocations from the steady-state loop.
    """

    def __init__(self, depth: int, shape, dtype=np.uint8):
        self._slots = [alloc_staging(shape, dtype) for _ in range(depth)]
        self._idx = 0

    def next_slot(self) -> np.ndarray:
        s = self._slots[self._idx]
        self._idx = (self._idx + 1) % len(self._slots)
        return s
