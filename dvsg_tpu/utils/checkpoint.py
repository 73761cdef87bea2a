"""Checkpoint save/restore via orbax (SURVEY.md §5.4).

The reference restores framework-native pretrained weights (SURVEY.md §1
L1; reference mount empty — citation unavailable). Here: orbax for params
and a JSON sidecar for the model config so a checkpoint is self-describing.
(Streaming-job resume records live with the streaming loop itself —
pipeline/stabilize.py writes ONE atomic resume_state.npz per chunk.)
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
_STATE_DIR = "train_state"


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


def save_train_state(path: str, state_dict: dict, step: int):
    """Save the FULL training state (params + opt_state + step) so a
    resumed run keeps its optimizer moments and schedule position instead
    of re-warming the LR mid-run. ``state_dict`` is a plain pytree dict,
    e.g. ``state._asdict()`` of train.loop.TrainState (host arrays)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, _STATE_DIR, str(step)), state_dict,
                   force=True)


def latest_train_state_step(path: str) -> Optional[int]:
    sdir = os.path.join(os.path.abspath(path), _STATE_DIR)
    if not os.path.isdir(sdir):
        return None
    steps = [int(d) for d in os.listdir(sdir) if d.isdigit()]
    return max(steps) if steps else None


def load_train_state(path: str, target: dict,
                     step: Optional[int] = None) -> Tuple[dict, int]:
    """Restore a save_train_state dict; ``target`` is a matching abstract
    pytree (e.g. from jax.eval_shape over init_state). Returns
    (state_dict, step)."""
    path = os.path.abspath(path)
    if step is None:
        step = latest_train_state_step(path)
        if step is None:
            raise FileNotFoundError(f"no train_state checkpoints under {path}")
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(
            os.path.join(path, _STATE_DIR, str(step)), target)
    return state, step


def export_npz(path: str, params, cfg: ModelConfig):
    """Compact single-file checkpoint (flattened pytree in an .npz).

    Portable and git-committable — the in-repo pretrained weights live in
    this format (checkpoints/*.npz); orbax remains the training-time
    format.
    """
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        arrays[name] = np.asarray(leaf)
    arrays["__config__"] = np.frombuffer(
        config_to_json(cfg).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_npz(path: str):
    """Load an export_npz checkpoint → (params, ModelConfig)."""
    import numpy as np

    with np.load(path) as data:
        cfg = model_config_from_dict(
            json.loads(bytes(data["__config__"].tobytes()).decode()))
        flat = {k: data[k] for k in data.files if k != "__config__"}

    from dvsg_tpu.models import motion_cnn
    target = jax.eval_shape(
        lambda: motion_cnn.init_params(cfg, jax.random.key(0)))
    leaves_with_path = jax.tree_util.tree_flatten_with_path(target)[0]
    treedef = jax.tree_util.tree_structure(target)
    leaves = []
    for keypath, leaf in leaves_with_path:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if name not in flat:
            raise KeyError(f"checkpoint missing parameter {name}")
        arr = flat[name]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch for {name}: "
                             f"{arr.shape} vs {leaf.shape}")
        leaves.append(jax.numpy.asarray(arr, leaf.dtype))
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, cfg
