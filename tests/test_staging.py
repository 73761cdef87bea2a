"""Native host staging runtime tests (SURVEY.md §2.2 pinned-buffer row)."""

import numpy as np
import pytest

from dvsg_tpu.utils import staging


@pytest.fixture(scope="module")
def src(rng):
    return (rng.random((4, 64, 96, 3)) * 255).astype(np.uint8)


def test_native_module_builds():
    mod = staging.native()
    assert mod is not None, "C++ staging extension failed to build"
    assert mod.pool_size() >= 1


def test_bgr_to_rgb_matches_numpy(src):
    out = staging.bgr_to_rgb(src)
    np.testing.assert_array_equal(out, src[..., ::-1])


def test_bgr_to_rgb_into_preallocated(src):
    out = np.empty_like(src[0])
    ret = staging.bgr_to_rgb(src[0], out)
    assert ret is out
    np.testing.assert_array_equal(out, src[0][..., ::-1])


def test_stack_frames(src):
    frames = [src[i] for i in range(len(src))]
    out = staging.stack_frames(frames)
    np.testing.assert_array_equal(out, src)


def test_alloc_staging_alignment():
    buf = staging.alloc_staging((3, 5, 7, 3), alignment=4096)
    assert buf.ctypes.data % 4096 == 0
    assert buf.shape == (3, 5, 7, 3)
    buf[:] = 1  # writable


def test_staging_ring_round_robin():
    ring = staging.StagingRing(2, (2, 4, 4, 3))
    a, b, c = ring.next_slot(), ring.next_slot(), ring.next_slot()
    assert a is c and a is not b


def test_reader_uses_staging_buffer(tmp_path, rng):
    import cv2
    from dvsg_tpu.utils import video_io
    frames = (rng.random((5, 32, 48, 3)) * 255).astype(np.uint8)
    d = str(tmp_path / "f")
    with video_io.VideoWriter(d, 48, 32) as w:
        w.write_batch(frames)
    ring = staging.StagingRing(2, (3, 32, 48, 3))
    with video_io.VideoReader(d) as r:
        slot = ring.next_slot()
        got = r.read_batch(3, out=slot)
        assert got.base is slot.base or got.base is slot  # view into slot
        np.testing.assert_array_equal(got, frames[:3])


def test_concurrent_callers_thread_safe(rng):
    """The multi-clip pipeline calls the native pool from N decode threads
    concurrently; interleaved submissions must not deadlock or corrupt
    (regression: dangling task pointer crashed / hung stabilize-batch)."""
    import threading

    src = (rng.random((8, 64, 96, 3)) * 255).astype(np.uint8)
    errors = []

    def worker(i):
        try:
            for _ in range(50):
                out = staging.bgr_to_rgb(src[i % len(src)])
                assert out[0, 0, 0] == src[i % len(src)][0, 0, 2]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive(), "native pool deadlocked"
    assert not errors


def test_bgr_to_rgb_rejects_noncontiguous_out():
    """A non-contiguous out buffer would silently receive nothing (the
    native pass writes into reshape(-1)'s copy) — must raise instead."""
    src = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    backing = np.empty((2, 8, 3), np.uint8)
    out = backing[:, ::2, :]              # non-contiguous view
    with pytest.raises(ValueError, match="contiguous"):
        staging.bgr_to_rgb(src, out=out)
