"""Single-file .npz checkpoint export/import (portable pretrained format)."""

import numpy as np
import jax

from dvsg_tpu.config import ModelConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.utils import checkpoint as ckpt

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)


def test_npz_roundtrip(tmp_path):
    params = motion_cnn.init_params(MCFG, jax.random.key(5))
    path = str(tmp_path / "m.npz")
    ckpt.export_npz(path, jax.device_get(params), MCFG)
    restored, cfg2 = ckpt.load_npz(path)
    assert cfg2 == MCFG
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_npz_shape_mismatch_detected(tmp_path):
    params = motion_cnn.init_params(MCFG, jax.random.key(5))
    path = str(tmp_path / "m.npz")
    bad_cfg = ModelConfig(window=5, model_size=(32, 32), grid_size=(8, 8),
                          base_features=8, blocks_per_level=1)
    ckpt.export_npz(path, jax.device_get(params), bad_cfg)
    try:
        ckpt.load_npz(path)
        raised = False
    except (ValueError, KeyError):
        raised = True
    assert raised, "mismatched config must not load silently"
