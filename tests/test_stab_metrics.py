"""Feature-tracking stabilization metrics (utils/stab_metrics.py).

The literature trio — stability score, cropping ratio, distortion
value — needs no ground truth, so it is validated here against clips
whose smoothness IS known by construction: a repeated still frame is a
perfectly stable video (score 1.0, identity in→out fit), and the
synthetic-jitter generator's shaky clip must score strictly below it.
"""

import numpy as np
import jax
import pytest

from dvsg_tpu.train import eval as eval_lib
from dvsg_tpu.train import synthetic
from dvsg_tpu.utils import stab_metrics

T, H, W = 48, 240, 320


@pytest.fixture(scope="module")
def clips():
    frames, still, _ = synthetic.synthetic_clip_u8(jax.random.key(3),
                                                   T, H, W)
    frames = np.asarray(frames)
    perfect = np.repeat(np.asarray(still)[None], T, axis=0)
    return frames, perfect


def test_perfect_clip_scores_one(clips):
    _, perfect = clips
    s = stab_metrics.stability_score(perfect)
    assert s["stability"] == pytest.approx(1.0)


def test_shaky_clip_scores_below_perfect(clips):
    frames, perfect = clips
    s_shaky = stab_metrics.stability_score(frames)["stability"]
    s_perf = stab_metrics.stability_score(perfect)["stability"]
    assert s_shaky < s_perf - 0.01


def test_camera_path_tracks_known_translation(clips):
    """A clip that is the still shifted by +3 px/frame must estimate
    ~(-3, 0) per-step motion (the fit maps frame t -> t+1 content)."""
    _, perfect = clips
    still = perfect[0]
    shifted = np.stack([np.roll(still, -3 * t, axis=1) for t in range(8)])
    path = stab_metrics.camera_path(shifted)
    # rolling content left 3 px/frame => tracked points move -3 in x
    assert np.abs(path[:, 0] - (-3.0)).max() < 0.5
    assert np.abs(path[:, 1]).max() < 0.5


def test_report_identity_output(clips):
    frames, perfect = clips
    rep = stab_metrics.stability_report(frames, perfect)
    assert rep["stability_out"] == pytest.approx(1.0)
    assert rep["stability_in"] < rep["stability_out"]
    # perfect output is the unwarped still: no zoom, no shear
    assert rep["cropping_ratio"] > 0.98
    assert rep["distortion_value"] > 0.97
    assert rep["tracked_frames"] >= T - 2


def test_featureless_clip_is_unmeasurable_not_perfect():
    """Tracking failure must read as NaN, not a perfect 1.0 — zeros in
    the path would score as 'no motion' (review finding)."""
    flat = np.full((T, 120, 160, 3), 128, np.uint8)
    s = stab_metrics.stability_score(flat)
    assert np.isnan(s["stability"])


def test_short_clip_is_unmeasurable():
    """Paths with <= k non-DC spectral bins score a trivial 1.0; the
    guard must return NaN below 12 steps (review finding)."""
    frames, _, _ = synthetic.synthetic_clip_u8(jax.random.key(4),
                                               10, 120, 160)
    s = stab_metrics.stability_score(np.asarray(frames))
    assert np.isnan(s["stability"])


def test_evaluate_synthetic_track_metrics_flag():
    from dvsg_tpu.config import ModelConfig, StabilizeConfig
    from dvsg_tpu.models import motion_cnn
    from dvsg_tpu.pipeline.stabilize import Stabilizer

    mcfg = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                       base_features=8, blocks_per_level=1)
    cfg = StabilizeConfig(model=mcfg, chunk_frames=8, warp_impl="lax")
    params = motion_cnn.init_params(mcfg, jax.random.key(0))
    stab = Stabilizer(cfg, params)
    m = eval_lib.evaluate_synthetic(stab, jax.random.key(1), 16, 64, 96,
                                    track_metrics=True)
    for k in ("stability_in", "stability_out", "cropping_ratio",
              "distortion_value"):
        assert k in m
