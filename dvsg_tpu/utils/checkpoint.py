"""Checkpoint save/restore via orbax (SURVEY.md §5.4).

The reference restores framework-native pretrained weights (SURVEY.md §1
L1; reference mount empty — citation unavailable). Here: orbax for params,
a JSON sidecar for the model config so a checkpoint is self-describing, and
a small JSON resume record for streaming jobs (chunk index) so long-video
runs restart at the last flushed chunk (SURVEY.md §5.3).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from dvsg_tpu.config import ModelConfig, config_to_json, model_config_from_dict

_CONFIG_FILE = "model_config.json"
_PARAMS_DIR = "params"


def save_checkpoint(path: str, params, cfg: ModelConfig, step: int = 0):
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, _PARAMS_DIR, str(step)), params,
                   force=True)
    with open(os.path.join(path, _CONFIG_FILE), "w") as f:
        f.write(config_to_json(cfg))
        f.write("\n")


def latest_step(path: str) -> Optional[int]:
    pdir = os.path.join(os.path.abspath(path), _PARAMS_DIR)
    if not os.path.isdir(pdir):
        return None
    steps = [int(d) for d in os.listdir(pdir) if d.isdigit()]
    return max(steps) if steps else None


def load_checkpoint(path: str, step: Optional[int] = None
                    ) -> Tuple[dict, ModelConfig, int]:
    """Returns (params, model_config, step)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, _CONFIG_FILE)) as f:
        cfg = model_config_from_dict(json.load(f))
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no params checkpoints under {path}")
    # Restore with concrete target structure so dtypes/shapes are exact.
    from dvsg_tpu.models import motion_cnn
    target = jax.eval_shape(
        lambda: motion_cnn.init_params(cfg, jax.random.key(0)))
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(
            os.path.join(path, _PARAMS_DIR, str(step)), target)
    return params, cfg, step


def save_resume_state(path: str, record: dict):
    with open(os.path.join(os.path.abspath(path), "resume.json"), "w") as f:
        json.dump(record, f)


def load_resume_state(path: str) -> Optional[dict]:
    p = os.path.join(os.path.abspath(path), "resume.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
