"""Motion-estimation CNN: sliding frame window → coarse warp-offset grid.

TPU-first design notes (vs the reference's single-GPU CNN, SURVEY.md §1 L4;
reference mount empty — citation unavailable):

* The network always sees a fixed ``model_size`` resolution regardless of the
  video resolution, so there is exactly ONE compiled XLA program per config —
  no shape polymorphism, no recompiles across 480p/720p/1080p inputs.
* Channels-last NHWC, feature widths that are multiples of 8/128 after the
  first stage, and 3x3 convs → XLA tiles everything onto the MXU.
* GroupNorm (batch-independent) instead of BatchNorm: no cross-device stats,
  so data-parallel inference needs zero collectives (SURVEY.md §2.3 DP row).
* The head regresses a coarse ``grid_size`` control grid of normalized
  offsets, tanh-bounded by ``max_offset``; upsampling to dense resolution
  happens outside the network (ops/grid.py), keeping the CNN cost independent
  of output resolution.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvsg_tpu.config import ModelConfig
from dvsg_tpu.ops import grid as grid_ops


def _dtype(cfg: ModelConfig):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.dtype]


class ResBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn1")(h)
        h = nn.gelu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return nn.gelu(x + h)


def _stem_pyramid(cfg: ModelConfig, x: jax.Array) -> tuple[jax.Array, int]:
    """Stem conv + stride-2 ResBlock pyramid down to grid resolution.

    The ONE definition of the encoder trunk, shared by FrameEncoder (corr
    arch) and the legacy stacked arch so the two copies cannot diverge.
    Must be called from inside an ``nn.compact`` ``__call__``: the inline
    submodules bind to the CALLER's scope, so each arch's checkpoint
    layout ("stem"/"down{l}"/"res{l}_{b}" at that module's top level) is
    unchanged. Returns (features (B, gh, gw, F), final feature width)."""
    dt = _dtype(cfg)
    mh, mw = cfg.model_size
    gh, gw = cfg.grid_size
    x = x.astype(dt)
    feats = cfg.base_features
    x = nn.Conv(feats, (7, 7), padding="SAME", dtype=dt, name="stem")(x)
    x = nn.gelu(x)
    down = 1
    level = 0
    while (mh // down, mw // down) != (gh, gw) and level < cfg.levels * 2:
        feats = min(feats * 2, 256)
        x = nn.Conv(feats, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=dt, name=f"down{level}")(x)
        x = nn.gelu(x)
        for b in range(cfg.blocks_per_level):
            x = ResBlock(feats, dtype=dt, name=f"res{level}_{b}")(x)
        down *= 2
        level += 1
    if (mh // down, mw // down) != (gh, gw):
        raise ValueError(
            f"cannot reach grid_size {cfg.grid_size} from "
            f"model_size {cfg.model_size} by stride-2 stages")
    return x, feats


class FrameEncoder(nn.Module):
    """Siamese per-frame encoder: (B, Hm, Wm, C) → (B, gh, gw, F).

    Shared across all window frames so correlation volumes compare features
    in one embedding space (PWC-style cost-volume motion estimation)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, frame: jax.Array) -> jax.Array:
        return _stem_pyramid(self.cfg, frame)[0]


def _correlation_volume(ref: jax.Array, other: jax.Array,
                        radius: int) -> jax.Array:
    """Local cost volume: per-cell dot products over shifted alignments.

    ref/other: (B, gh, gw, F) features. Returns (B, gh, gw, (2r+1)^2)
    normalized correlations — motion becomes a first-class input feature
    instead of something convs must learn to compute implicitly. The shift
    loop is static and each term is an MXU-friendly contraction.
    """
    b, gh, gw, f = ref.shape
    scale = float(f) ** -0.5
    pad = jnp.pad(other, ((0, 0), (radius, radius), (radius, radius),
                          (0, 0)))
    vols = []
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            shifted = jax.lax.dynamic_slice(
                pad, (0, dy, dx, 0), (b, gh, gw, f))
            vols.append(jnp.sum(ref * shifted, axis=-1) * scale)
    return jnp.stack(vols, axis=-1)


def _corr_head_math(cfg: ModelConfig, feats: jax.Array, conv1, conv2,
                    conv_out) -> jax.Array:
    """Correlation volumes + regression head: feats (B, N, gh, gw, F) →
    offsets (B, gh, gw, 2). Shared by the fused forward and the
    feature-cached pipeline path."""
    n = cfg.window
    ref = feats[:, -1]                      # the frame being stabilized
    vols = [_correlation_volume(ref, feats[:, k], cfg.corr_radius)
            for k in range(n - 1)]
    x = jnp.concatenate(vols + [ref.astype(jnp.float32)], axis=-1)
    x = nn.gelu(conv1(x.astype(jnp.float32)))
    x = nn.gelu(conv2(x))
    off = conv_out(x)
    return jnp.tanh(off) * cfg.max_offset


class _CorrHeadModule(nn.Module):
    """Standalone head with the same top-scope param names as
    MotionEstimator's head — applied with the matching param subtree by
    offsets_from_feature_windows."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        conv1 = nn.Conv(128, (3, 3), padding="SAME", dtype=jnp.float32,
                        name="head_conv1")
        conv2 = nn.Conv(128, (3, 3), padding="SAME", dtype=jnp.float32,
                        name="head_conv2")
        conv_out = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros,
                           name="head_out")
        return _corr_head_math(self.cfg, feats, conv1, conv2, conv_out)


class MotionEstimator(nn.Module):
    """Window of stacked frames → coarse normalized warp offsets.

    Input:  (B, Hm, Wm, window * channels), values roughly in [-0.5, 0.5].
    Output: (B, gh, gw, 2) offsets in normalized grid units, |off| <= max_offset.

    Two architectures (cfg.arch):
      * "corr" (default): siamese per-frame encoder + PWC-style local
        correlation volumes of every window frame against the LAST frame
        (the one being stabilized), concatenated with the reference
        features into a small regression head. Motion is explicit in the
        input to the head, which is what makes the stabilizing offsets
        learnable in practice.
      * "stacked": legacy single conv stack over channel-stacked frames.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, window: jax.Array) -> jax.Array:
        cfg = self.cfg
        if cfg.arch == "corr":
            return self._corr_forward(window)
        return self._stacked_forward(window)

    def _corr_forward(self, window: jax.Array) -> jax.Array:
        cfg = self.cfg
        mh, mw = cfg.model_size
        n = cfg.window
        c = cfg.channels
        b = window.shape[0]
        if window.shape[-3:] != (mh, mw, n * c):
            raise ValueError(
                f"expected window (*, {mh}, {mw}, {n * c}), "
                f"got {window.shape}")

        frames = window.reshape(b, mh, mw, n, c)
        encoder = FrameEncoder(self.cfg, name="encoder")
        # One batched encoder pass over all window frames (shared weights).
        flat = jnp.transpose(frames, (0, 3, 1, 2, 4)).reshape(
            b * n, mh, mw, c)
        feats = encoder(flat)
        gh, gw = cfg.grid_size
        feats = feats.reshape(b, n, gh, gw, -1)
        # Head convs live at this module's top scope (checkpoint layout).
        conv1 = nn.Conv(128, (3, 3), padding="SAME", dtype=jnp.float32,
                        name="head_conv1")
        conv2 = nn.Conv(128, (3, 3), padding="SAME", dtype=jnp.float32,
                        name="head_conv2")
        conv_out = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros,
                           name="head_out")
        return _corr_head_math(cfg, feats, conv1, conv2, conv_out)

    def _stacked_forward(self, window: jax.Array) -> jax.Array:
        cfg = self.cfg
        if window.shape[-3:-1] != cfg.model_size:
            raise ValueError(
                f"expected spatial dims {cfg.model_size}, got {window.shape}")

        x, feats = _stem_pyramid(cfg, window)

        # Head: f32 for stable small-offset regression even under bf16 body.
        x = nn.Conv(feats, (3, 3), padding="SAME", dtype=jnp.float32,
                    name="head_conv")(x.astype(jnp.float32))
        x = nn.gelu(x)
        off = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.float32,
                      kernel_init=nn.initializers.zeros,
                      name="head_out")(x)
        return jnp.tanh(off) * cfg.max_offset


def init_params(cfg: ModelConfig, rng: jax.Array):
    model = MotionEstimator(cfg)
    mh, mw = cfg.model_size
    dummy = jnp.zeros((1, mh, mw, cfg.window * cfg.channels), jnp.float32)
    return model.init(rng, dummy)["params"]


def predict_offsets(cfg: ModelConfig, params, windows: jax.Array) -> jax.Array:
    """Apply the CNN: windows (B, Hm, Wm, N*C) → offsets (B, gh, gw, 2)."""
    return MotionEstimator(cfg).apply({"params": params}, windows)


def encode_frames(cfg: ModelConfig, params, frames: jax.Array) -> jax.Array:
    """Per-frame encoder pass: frames (B, Hm, Wm, C) → (B, gh, gw, F).

    Sliding windows share window-1 of their frames, so callers encode each
    unique frame ONCE and assemble feature windows — a window-length-fold
    saving over encoding stacked pixel windows (the chunked pipeline and
    the training loss both use this path). Requires cfg.arch == "corr".
    """
    if cfg.arch != "corr":
        raise ValueError("feature caching requires the corr architecture")
    return FrameEncoder(cfg).apply({"params": params["encoder"]}, frames)


def offsets_from_feature_windows(cfg: ModelConfig, params,
                                 feat_windows: jax.Array) -> jax.Array:
    """Head pass over cached features: (B, N, gh, gw, F) → (B, gh, gw, 2)."""
    head_params = {k: params[k] for k in ("head_conv1", "head_conv2",
                                          "head_out")}
    return _CorrHeadModule(cfg).apply({"params": head_params}, feat_windows)


def predict_grid(cfg: ModelConfig, params, windows: jax.Array,
                 out_height: int, out_width: int) -> jax.Array:
    """Windows → dense full-resolution sampling grids (B, H, W, 2)."""
    offsets = predict_offsets(cfg, params, windows)
    return jax.vmap(
        lambda o: grid_ops.grid_from_offsets(o, out_height, out_width)
    )(offsets)
