"""Matrix-form separable bilinear resize — the MXU path for downscaling.

``jax.image.resize(..., method="bilinear")`` lowers to gather/convolution
fusions that cost ~1.6 ms per 16-frame 720p chunk on v5e. Bilinear resize
(including its antialiasing triangle kernel when minifying) is LINEAR and
separable, so it is exactly two matrix multiplies:

    out = R @ x @ C^T        R: (oh, h),  C: (ow, w)

and matmuls are where the TPU's FLOPs live. The matrices are extracted
from jax.image.resize ITSELF (resize of an identity basis, computed once
per shape pair at trace time under ``ensure_compile_time_eval``), so the
sampling convention cannot drift from the reference op — parity is exact
up to f32 accumulation order (pinned by tests/test_resize.py).

``downscale_norm`` additionally folds the pipeline's uint8 normalization
into the row matrix: (R/255) @ x @ C^T - 0.5 == resize(x/255) - 0.5
exactly, because normalize is linear and the operator rows sum to 1 —
one fewer full-size f32 materialization per chunk.

The reference resizes per frame on the host with cv2/framework ops
(SURVEY.md §1 L5; reference mount empty — citation unavailable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix M with M @ x == jax.image.resize(x) on axis 0."""
    with jax.ensure_compile_time_eval():
        eye = jnp.eye(n_in, dtype=jnp.float32)
        m = jax.image.resize(eye, (n_out, n_in), method="bilinear")
    return np.asarray(m)


def downscale_bilinear(frames: jax.Array, oh: int, ow: int,
                       precision=None) -> jax.Array:
    """(..., H, W, C) f32 → (..., oh, ow, C); exact jax.image.resize
    semantics (bilinear + antialias) as two MXU matmuls.

    ``precision``: matmul precision. Grid-coordinate callers pass
    "highest" so sampling coords are true f32 on TPU (the default bf16
    passes cost ~1e-2 px of coordinate error — visible as multi-LSB pixel
    diffs vs the in-kernel f32 coordinate synthesis); the CNN-input
    resize keeps the fast default.
    """
    *lead, h, w, c = frames.shape
    r = jnp.asarray(_resize_matrix(h, oh))
    cm = jnp.asarray(_resize_matrix(w, ow))
    y = jnp.einsum("ph,...hwc->...pwc", r, frames, precision=precision)
    return jnp.einsum("qw,...pwc->...pqc", cm, y, precision=precision)


def downscale_norm(frames_u8: jax.Array, oh: int, ow: int) -> jax.Array:
    """uint8 (..., H, W, C) → f32 (..., oh, ow, C) centered at 0: exactly
    jax.image.resize(frames/255) - 0.5, with the 1/255 folded into the
    row matrix so no full-resolution f32 frame is ever materialized."""
    *lead, h, w, c = frames_u8.shape
    r = jnp.asarray(_resize_matrix(h, oh) * (1.0 / 255.0))
    cm = jnp.asarray(_resize_matrix(w, ow))
    x = frames_u8.astype(jnp.float32)
    y = jnp.einsum("ph,...hwc->...pwc", r, x)
    return jnp.einsum("qw,...pwc->...pqc", cm, y) - 0.5
