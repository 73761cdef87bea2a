"""Quality gate on the committed pretrained flagship checkpoint.

Guards against regressions in model/pipeline semantics that silently break
stabilization quality (the checkpoint is fixed, so any change in windowing,
grid math, warp, or normalization shows up here).
"""

import os

import numpy as np
import jax
import pytest

from dvsg_tpu.config import StabilizeConfig
from dvsg_tpu.pipeline.stabilize import Stabilizer
from dvsg_tpu.train import eval as eval_lib
from dvsg_tpu.utils import checkpoint as ckpt

_CKPT_DIR = os.path.join(os.path.dirname(__file__), "..", "checkpoints")


@pytest.mark.parametrize("name", ["flagship.npz", "flagship_fast.npz"])
@pytest.mark.parametrize("seed", [123, 7, 99])
def test_flagship_beats_identity_baseline(name, seed):
    """Measured (CPU, lax warp, 256x320, 16 frames; flagship and
    flagship_fast are both 40k-step late-round-3 retrains):
    flagship gains +21.6/+22.3/+19.3 dB at 52.3-52.6 dB vs target;
    flagship_fast (the 128^2 single-block throughput default)
    +21.2/+21.8/+18.7 dB at 51.8-52.2 dB. Gates sit ~3 dB under the
    worst measured value so a semantic regression cannot hide inside a
    loose margin (VERDICT.md round-1 item 8)."""
    path = os.path.join(_CKPT_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"no committed {name}")
    params, mcfg = ckpt.load_npz(path)
    stab = Stabilizer(StabilizeConfig(model=mcfg, chunk_frames=8,
                                      warp_impl="lax"), params)
    m = eval_lib.evaluate_synthetic(stab, jax.random.key(seed), 16, 256, 320)
    assert m["psnr_gain_db"] > 14.5, m
    assert m["psnr_vs_target"] > 47.5, m
    assert m["stability_gain"] < 0.95, m
