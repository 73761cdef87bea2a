"""dvsg_tpu — TPU-native deep video stabilization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
posgraph/coupe.DVSG: a motion-estimation CNN predicts per-frame warp grids
from a sliding window of frames; a fused Pallas gather-interpolate kernel
applies the spatial-transformer bilinear warp; a streaming pipeline overlaps
host video I/O with device compute and scales via per-clip data parallelism
over a ``jax.sharding.Mesh``.
"""

from dvsg_tpu.config import (  # noqa: F401
    ModelConfig,
    StabilizeConfig,
    TrainConfig,
)

__version__ = "0.1.0"
