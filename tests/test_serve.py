"""Serving endpoint tests (localhost, stdlib client)."""

import threading
import urllib.request

import numpy as np
import jax
import pytest

from dvsg_tpu import serve
from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.pipeline.stabilize import Stabilizer
from dvsg_tpu.utils import video_io

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)
CFG = StabilizeConfig(model=MCFG, chunk_frames=4, warp_impl="lax")


@pytest.fixture(scope="module")
def server():
    params = motion_cnn.init_params(MCFG, jax.random.key(0))
    srv = serve.make_server("127.0.0.1", 0, Stabilizer(CFG, params),
                            "test-model")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        assert r.status == 200
        body = r.read().decode()
    assert "ok" in body and "test-model" in body


def test_stabilize_roundtrip(server, tmp_path, rng):
    frames = (rng.random((9, 32, 48, 3)) * 255).astype(np.uint8)
    src = str(tmp_path / "in.mp4")
    with video_io.VideoWriter(src, 48, 32, fps=24.0) as w:
        w.write_batch(frames)
    with open(src, "rb") as f:
        payload = f.read()

    req = urllib.request.Request(server + "/stabilize", data=payload,
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["X-Frames"] == "9"
        out_bytes = r.read()

    out_path = str(tmp_path / "out.mp4")
    with open(out_path, "wb") as f:
        f.write(out_bytes)
    with video_io.VideoReader(out_path) as rd:
        out = rd.read_batch(32)
    assert out.shape == frames.shape


def test_bad_requests(server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/nope")
    assert e.value.code == 404
    req = urllib.request.Request(server + "/stabilize", data=b"",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    req = urllib.request.Request(server + "/stabilize", data=b"garbage",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    # Unknown format values are rejected with a clear 400 (ADVICE r1:
    # must not leak into temp filenames / the Content-Type header).
    req = urllib.request.Request(
        server + "/stabilize?format=../../evil", data=b"garbage",
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    assert "unsupported format" in e.value.read().decode()


def test_concurrent_requests(server, tmp_path, rng):
    """Two simultaneous stabilize requests: decode runs concurrently on
    request threads (native-pool thread safety), device work serialized."""
    import concurrent.futures

    payloads = []
    for i in range(2):
        frames = (rng.random((6, 32, 48, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f"cc{i}.mp4")
        with video_io.VideoWriter(p, 48, 32, fps=24.0) as w:
            w.write_batch(frames)
        with open(p, "rb") as f:
            payloads.append(f.read())

    def post(data):
        req = urllib.request.Request(server + "/stabilize", data=data,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.headers["X-Frames"]

    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        results = list(ex.map(post, payloads))
    assert results == [(200, "6"), (200, "6")]
