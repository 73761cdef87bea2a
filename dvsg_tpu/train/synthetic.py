"""Synthetic shaky-clip generation: the reference-free ground-truth fixture.

Apply a known smooth camera jitter to a static image; the stabilizer should
invert it, so the still image itself is ground truth and PSNR is computable
without reference outputs (SURVEY.md §4 "key insight"). Also the training
data source: no pretrained reference weights exist on this machine, so the
model is self-trained on this distribution (SURVEY.md §7 stage 1).

Affine jitter is linear in position, and the model's coarse offset grid is
bilinearly upsampled — a linear field is exactly representable, so the
model can in principle drive pixel loss to zero.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from dvsg_tpu.ops import grid as grid_ops
from dvsg_tpu.ops.warp_ref import bilinear_warp


def random_still(key: jax.Array, height: int, width: int,
                 channels: int = 3) -> jax.Array:
    """Procedural textured still image in [0,1]: multi-octave smooth noise.

    Low-frequency octaves dominate so images have trackable large-scale
    structure (like real video), plus a fine octave for texture.
    """
    imgs = []
    for octave, (res, amp) in enumerate([(4, 0.5), (8, 0.25), (16, 0.15),
                                         (64, 0.10)]):
        k = jax.random.fold_in(key, octave)
        coarse = jax.random.uniform(k, (res, res, channels))
        imgs.append(amp * jax.image.resize(
            coarse, (height, width, channels), method="bicubic"))
    img = sum(imgs)
    img = img - img.min()
    return img / jnp.maximum(img.max(), 1e-6)


def random_camera_path(key: jax.Array, num_frames: int,
                       max_trans: float = 0.08,
                       max_angle: float = 0.05,
                       max_persp: float = 0.02) -> jax.Array:
    """Smooth random camera shake: per-frame (tx, ty, angle, px, py).

    tx/ty in normalized units (align_corners grid units), angle in radians,
    px/py mild projective terms (perspective wobble — rolling-shutter-like
    distortion handheld cameras exhibit). A random walk low-passed with a
    small moving-average window, scaled to the requested bounds — the
    low-frequency handheld-shake regime the stabilizer is meant to remove.
    """
    k1, k2 = jax.random.split(key)
    steps = jax.random.normal(k1, (num_frames + 8, 5))
    walk = jnp.cumsum(steps, axis=0)
    kernel = jnp.ones((9,)) / 9.0
    smooth = jnp.stack([
        jnp.convolve(walk[:, i], kernel, mode="valid") for i in range(5)
    ], axis=-1)[:num_frames]
    smooth = smooth - smooth.mean(axis=0, keepdims=True)
    denom = jnp.maximum(jnp.abs(smooth).max(axis=0, keepdims=True), 1e-6)
    scale = jnp.array([max_trans, max_trans, max_angle,
                       max_persp, max_persp])
    mag = jax.random.uniform(k2, (5,), minval=0.3, maxval=1.0)
    return smooth / denom * scale * mag


def jitter_theta(params: jax.Array) -> jax.Array:
    """(tx, ty, angle, px, py) → 3x3 homography in normalized coords."""
    tx, ty, ang, px, py = (params[0], params[1], params[2], params[3],
                           params[4])
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    one = jnp.ones_like(tx)
    return jnp.array([[ca, -sa, tx], [sa, ca, ty], [px, py, one]])


def similarity_theta(params: jax.Array) -> jax.Array:
    """(tx, ty, angle, log_scale) → 3x3 similarity in normalized coords.

    The zoom-sway fixture generator: log-scale composes additively like
    the other pose components, matching the path-smoothing state's
    (x, y, θ, log-s) parameterization (pipeline/pathsmooth.py)."""
    tx, ty, ang, logs = params[0], params[1], params[2], params[3]
    s = jnp.exp(logs)
    ca, sa = s * jnp.cos(ang), s * jnp.sin(ang)
    zero, one = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.array([[ca, -sa, tx], [sa, ca, ty], [zero, zero, one]])


def invert_theta(hmat: jax.Array) -> jax.Array:
    """Invert a 3x3 homography (normalized so H[2,2] == 1)."""
    inv = jnp.linalg.inv(hmat)
    return inv / inv[2, 2]


def compose_theta(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose 3x3 homographies: (a ∘ b)(p) = a(b(p))."""
    m = a @ b
    return m / m[2, 2]


def stabilizing_theta(path_window: jax.Array) -> jax.Array:
    """The warp that maps the window's LAST frame to the window-mean
    camera position: A_t⁻¹ ∘ Ā (normalized coords).

    Within a short window the still's absolute position is unobservable,
    so the learnable stabilization target is the local mean of the camera
    path — exactly what a stabilizer's path smoothing does.
    """
    mean_params = path_window.mean(axis=0)
    a_t_inv = invert_theta(jitter_theta(path_window[-1]))
    return compose_theta(a_t_inv, jitter_theta(mean_params))


def theta_to_offsets(hmat: jax.Array, gh: int, gw: int) -> jax.Array:
    """Coarse control-grid offsets sampling a homography at grid points.

    Affine parts are linear in position (bilinear upsampling reproduces
    them exactly); mild projective terms are approximated with O(cell²)
    error — far below the pixel-loss floor for handheld perspectives.
    """
    return (grid_ops.homography_grid(hmat, gh, gw)
            - grid_ops.identity_grid(gh, gw))


def jitter_frame(still: jax.Array, params: jax.Array) -> jax.Array:
    """Render one shaky frame: sample the still through the jitter warp."""
    h, w, _ = still.shape
    g = grid_ops.homography_grid(jitter_theta(params), h, w)
    return bilinear_warp(still, g)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def synthetic_clip(key: jax.Array, num_frames: int, height: int, width: int
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """A shaky clip with ground truth.

    Returns:
      frames: (T, H, W, 3) f32 in [0,1] — the unstable clip.
      still:  (H, W, 3) f32 — the stable ground-truth image.
      path:   (T, 5) per-frame jitter (tx, ty, angle, px, py).
    """
    k_img, k_path = jax.random.split(key)
    still = random_still(k_img, height, width)
    path = random_camera_path(k_path, num_frames)
    frames = jax.vmap(lambda p: jitter_frame(still, p))(path)
    return frames, still, path


def synthetic_clip_u8(key: jax.Array, num_frames: int, height: int,
                      width: int):
    """uint8 variant for pipeline/e2e tests; returns (frames_u8, still_u8)."""
    frames, still, path = synthetic_clip(key, num_frames, height, width)
    to8 = lambda x: jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)
    return to8(frames), to8(still), path
