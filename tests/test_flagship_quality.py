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

_NPZ = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                    "flagship.npz")


@pytest.mark.skipif(not os.path.exists(_NPZ),
                    reason="no committed flagship checkpoint")
def test_flagship_beats_identity_baseline():
    params, mcfg = ckpt.load_npz(_NPZ)
    stab = Stabilizer(StabilizeConfig(model=mcfg, chunk_frames=8,
                                      warp_impl="lax"), params)
    m = eval_lib.evaluate_synthetic(stab, jax.random.key(123), 16, 256, 320)
    # Trained model: +13-14 dB at 480p; demand a robust margin here.
    assert m["psnr_gain_db"] > 5.0, m
    assert m["psnr_vs_target"] > 40.0, m
    assert m["stability_gain"] < 1.0, m
