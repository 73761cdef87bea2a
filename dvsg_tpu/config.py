"""Configuration dataclasses for the dvsg_tpu framework.

The reference (posgraph/coupe.DVSG) uses argparse flags scattered through its
entry scripts (SURVEY.md §5.6; reference mount empty — citation unavailable).
Here all configuration is a frozen dataclass: hashable, so it can sit on the
``jax.jit`` static-argument boundary, and serializable to/from JSON for
reproducible runs.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Motion-estimation CNN hyperparameters.

    The CNN consumes a sliding temporal window of ``window`` frames, resized
    to ``model_size``, stacked on channels, and regresses a coarse
    ``grid_size`` control grid of normalized warp offsets which is bilinearly
    upsampled to the output resolution (SURVEY.md §3.3).
    """

    window: int = 5                       # temporal window length N
    model_size: Tuple[int, int] = (256, 256)   # (H, W) the CNN sees
    base_features: int = 32               # encoder width at full model res
    levels: int = 4                       # stride-2 encoder stages
    blocks_per_level: int = 2             # residual conv blocks per stage
    grid_size: Tuple[int, int] = (16, 16)  # coarse control grid (gh, gw)
    max_offset: float = 0.2               # max |offset| in normalized units
    channels: int = 3                     # input channels per frame
    dtype: str = "float32"                # compute dtype: float32 | bfloat16
    arch: str = "corr"                    # corr (cost-volume) | stacked
    corr_radius: int = 3                  # cost-volume displacement radius
                                          # (in coarse-grid cells)

    def __post_init__(self):
        gh, gw = self.grid_size
        mh, mw = self.model_size
        if mh % gh or mw % gw:
            raise ValueError(
                f"model_size {self.model_size} must be divisible by "
                f"grid_size {self.grid_size}"
            )


@dataclasses.dataclass(frozen=True)
class StabilizeConfig:
    """End-to-end stabilization pipeline configuration."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    chunk_frames: int = 16        # frames per device step (temporal chunk T)
    warp_impl: str = "auto"       # auto | pallas | lax
    mesh_shape: Tuple[int, ...] = (1,)   # data-parallel mesh ("data",)
    io_threads: int = 4           # host decode/encode thread pool size
    queue_depth: int = 3          # staging ring depth (decode↔compute↔encode)
    border_crop: float = 0.0      # optional stabilized-border crop fraction
    strength: float = 1.0         # scale on the predicted stabilization:
                                  # 0 = passthrough, 1 = full, (0,1) = partial
                                  # (keeps more of the original framing),
                                  # (1, 2] = overcorrection (exaggerates the
                                  # predicted camera-path smoothing).
                                  # Scales the CNN's window-relative
                                  # correction ONLY; the path_smooth sway
                                  # correction is always applied in full
                                  # (pathsmooth.apply_path_smoothing doc)
    path_smooth: int = 0          # cross-chunk camera-path smoothing horizon
                                  # in frames (EMA one-pole low-pass over the
                                  # MEASURED camera translation path); 0 = off.
                                  # The CNN corrects within its short window;
                                  # this removes the low-frequency drift/sway
                                  # that passes through it
                                  # (pipeline/pathsmooth.py).
    path_smooth_max: float = 0.05  # clamp on the extra path correction per
                                   # frame, per component (x/y in normalized
                                   # grid units, θ in radians) — bounds the
                                   # border revealed and keeps the fused
                                   # kernel's coverage band reachable
    path_smooth_rotation: bool = True  # also measure + smooth rotation sway
                                       # (half-frame differential phase
                                       # correlation); translation-only when
                                       # False
    path_smooth_scale: bool = True     # also measure + smooth zoom/scale
                                       # sway (the DIVERGENCE of the same
                                       # four half-frame shifts whose curl
                                       # gives rotation); log-scale units
    path_smooth_conf: float = 2.0      # confidence gate on the path
                                       # measurement: per-pair peak-to-
                                       # second-peak ratio of the phase-
                                       # correlation surface; deltas from
                                       # pairs below it are ZEROED (scene
                                       # change, flat/low-texture,
                                       # occlusion — the EMA then decays
                                       # gracefully instead of ingesting a
                                       # garbage delta). 0 disables.
                                       # Measured: healthy tracking >= 5.3
                                       # even under 3x-spec shake; cuts and
                                       # flat frames <= 1.35 — at BOTH 32²
                                       # and 128² (ratio is resolution-
                                       # independent, unlike the raw peak)
    path_smooth_lag: int = 0           # fixed-lag smoothing lookahead D in
                                       # frames (0 = causal EMA): output is
                                       # delayed D frames and the smoothed
                                       # path comes from a truncated
                                       # two-sided exponential FIR over the
                                       # measured deltas — zero phase lag,
                                       # so at equal clamp it tracks the
                                       # path tighter than the causal EMA
                                       # (measured: residual sway RMS
                                       # 0.0131 EMA → 0.0089 at D=16 →
                                       # 0.0054 at D=32 on the sway sim;
                                       # pipeline gates in tests). Offline
                                       # clip/stream surfaces only — live
                                       # surfaces stay causal
    path_smooth_cut: float = 1.5       # scene-cut gate (<= conf gate):
                                       # below this ratio the EMA state
                                       # RESETS (the correction restarts at
                                       # 0 — a jump that is invisible
                                       # exactly when the content
                                       # discontinues). 0 disables resets

    def __post_init__(self):
        if not 0.0 <= self.strength <= 2.0:
            raise ValueError(
                f"strength must be in [0, 2], got {self.strength}")
        if self.path_smooth < 0:
            raise ValueError(
                f"path_smooth must be >= 0, got {self.path_smooth}")
        if self.path_smooth > 0 and self.model.window < 2:
            # The smoother reads inter-frame deltas out of the carried
            # halo; window 1 carries no halo to read them from.
            raise ValueError("path_smooth requires model.window >= 2")
        if not 0.0 <= self.path_smooth_max <= 0.25:
            raise ValueError(f"path_smooth_max must be in [0, 0.25], got "
                             f"{self.path_smooth_max}")
        if self.path_smooth_lag < 0 or self.path_smooth_lag > 64:
            raise ValueError(
                f"path_smooth_lag must be in [0, 64], got "
                f"{self.path_smooth_lag}")
        if self.path_smooth_lag > 0:
            if self.path_smooth <= 0:
                raise ValueError(
                    "path_smooth_lag needs path_smooth > 0 (the lag is a "
                    "lookahead for the path smoother)")
            if self.path_smooth_lag > self.chunk_frames:
                # The lag program carries exactly D frames between chunks
                # and emits T per step; D > T would need multi-chunk
                # emission bookkeeping for no practical benefit (raise
                # chunk_frames instead).
                raise ValueError(
                    f"path_smooth_lag ({self.path_smooth_lag}) must be "
                    f"<= chunk_frames ({self.chunk_frames})")
        if self.path_smooth_conf < 0 or not (
                0.0 <= self.path_smooth_cut <= max(self.path_smooth_conf,
                                                   0.0)):
            # A cut must also be gated (its garbage delta zeroed), so the
            # cut threshold cannot exceed the gate threshold.
            raise ValueError(
                f"need 0 <= path_smooth_cut <= path_smooth_conf, got "
                f"cut={self.path_smooth_cut} conf={self.path_smooth_conf}")
        # border_crop >= 0.5 flips the sign of the identity-grid scale
        # (1 - 2*crop, ops/grid.py): x would DECREASE with pixel index,
        # which inverts the per-block bounds the Pallas coverage guard
        # derives from the corner control points — it could report ok
        # while the kernel samples outside its stripe window. Reject at
        # the config boundary (the kernel entry re-checks for direct
        # library callers).
        if not 0.0 <= self.border_crop < 0.5:
            raise ValueError(
                f"border_crop must be in [0, 0.5), got {self.border_crop}")

    def replace(self, **kw) -> "StabilizeConfig":
        return dataclasses.replace(self, **kw)


def auto_chunk_frames(height: int, width: int, n_clips: int = 1,
                      on_tpu: bool = True) -> int:
    """Measured-best temporal chunk size T for a given output resolution.

    Longer chunks amortize the per-chunk CNN forward and halo carry, until
    the chunk's HBM footprint and result-fetch size start to dominate. The
    bands below come from on-chip v5e sweeps (scripts/probe_chunk_sizes.py),
    re-swept 2026-08-20 after the exact-fit row-blocking kernel win
    shifted the balance toward longer chunks: 480p T=64 (3050 vs 2767 at
    T=32, 2645 at T=16; T=96+ fails to compile — the scalar-prefetch
    tables scale with T, same SMEM ceiling as 720p T=64) / 720p T=32
    (1566 vs 1525 at T=16, 1528 at T=48; T=64 OOMs SMEM) / 1080p T=16
    (791 vs 768 at T=8, 777 at T=32) / 2160p T=4 (225 vs 209 at T=2, 212
    at T=8). For batched multi-clip programs the per-clip chunk is scaled
    down so the combined frames-in-flight stay in the same band (8-clip
    720p measured fastest at T=16: 1487 vs 1375 at T=8, 1310 at T=4 fps
    aggregate, re-swept 2026-08-20; T=24+ OOMs HBM).

    On CPU (tests, smoke runs) large chunks only slow compilation down;
    the default T=16 is kept.
    """
    if not on_tpu:
        return 16
    px = height * width
    if px <= 600_000:          # <= ~480p
        t = 64
    elif px <= 1_300_000:      # ~720p
        t = 32
    elif px <= 2_700_000:      # ~1080p
        t = 16
    else:                      # 4K and beyond
        t = 4
    if n_clips > 1:
        t = max(2, t // max(1, n_clips // 4))
    return t


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Self-supervised training configuration (synthetic-jitter fixtures)."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    batch_size: int = 8
    learning_rate: float = 2e-4
    weight_decay: float = 1e-5
    steps: int = 1000
    warmup_steps: int = 100
    pixel_weight: float = 1.0
    offset_weight: float = 10.0   # direct regression to the known
                                  # window-relative stabilizing offsets
    smooth_weight: float = 0.1    # temporal smoothness between frame grids
    reg_weight: float = 0.001     # offset magnitude regularizer
    seed: int = 0
    checkpoint_every: int = 200


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, tuple):
        return list(obj)
    return obj


def config_to_json(cfg: Any) -> str:
    return json.dumps(_to_jsonable(cfg), indent=2, sort_keys=True)


def _tuplify(d: dict, keys=("model_size", "grid_size", "mesh_shape")) -> dict:
    out = dict(d)
    for k in keys:
        if k in out and isinstance(out[k], list):
            out[k] = tuple(out[k])
    return out


def model_config_from_dict(d: dict) -> ModelConfig:
    return ModelConfig(**_tuplify(d))


def stabilize_config_from_dict(d: dict) -> StabilizeConfig:
    d = _tuplify(d)
    if isinstance(d.get("model"), dict):
        d["model"] = model_config_from_dict(d["model"])
    return StabilizeConfig(**d)
