"""Device mesh construction and sharding helpers (SURVEY.md §2.3, §5.8).

The reference is single-process single-GPU; all scale-out here is new
capability, expressed the TPU-native way: a ``jax.sharding.Mesh`` plus
sharding annotations, with ALL collectives emitted by GSPMD/XLA over
ICI — never hand-written transport.

Axes:
  * ``data``  — per-clip / per-sample data parallelism (configs 4-5).
  * ``model`` — reserved tensor-parallel axis; the CNN is small enough
    that TP is off by default, but conv channels stay shardable so
    enabling it is a mesh-spec change, not a rewrite (SURVEY.md §2.3 TP).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` uses all devices on a single ``data`` axis. On a v5e-8
    slice this is the per-clip DP mesh of BASELINE.json config 5.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names[:len(shape)]))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading axis over ``data``, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_param_sharding(mesh: Mesh, params):
    """Tensor-parallel sharding spec for the CNN parameter pytree.

    Shards every conv kernel's OUTPUT-feature axis (the trailing dim of
    (kh, kw, cin, cout) leaves) over ``model`` when it divides the axis
    size; everything else (biases, norm scales) is replicated. This is the
    "TP is a mesh-spec change, not a rewrite" disposition of SURVEY.md
    §2.3: apply these shardings via jit in_shardings and GSPMD emits the
    activation collectives — no model-code change. The CNN is small enough
    that TP is off by default; tests/test_parallel.py demonstrates output
    equality with the unsharded model on a ("data", "model") mesh.
    """
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh has no {MODEL_AXIS!r} axis: "
                         f"{mesh.axis_names}")
    n_model = mesh.shape[MODEL_AXIS]

    def leaf_sharding(leaf):
        if leaf.ndim == 4 and leaf.shape[-1] % n_model == 0:
            return NamedSharding(
                mesh, P(None, None, None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf_sharding, params)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up: jax.distributed + GSPMD collectives over
    ICI within a slice and DCN across slices (SURVEY.md §5.8).

    Single-process runs (one host driving a v5e-8 slice) don't need this.
    """
    if coordinator is None:
        return  # single-process
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
