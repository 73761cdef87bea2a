"""Evaluation harness tests (SURVEY.md §4 integration config 2)."""

import numpy as np
import jax
import jax.numpy as jnp

from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.pipeline.stabilize import Stabilizer
from dvsg_tpu.train import eval as eval_lib
from dvsg_tpu.train import synthetic
from dvsg_tpu.utils.metrics import psnr

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)
CFG = StabilizeConfig(model=MCFG, chunk_frames=8, warp_impl="lax")


def test_smoothed_targets_match_direct():
    frames, still, path = synthetic.synthetic_clip(jax.random.key(0),
                                                   6, 32, 32)
    targets = eval_lib.smoothed_targets(still, path, window=3)
    assert targets.shape == (6, 32, 32, 3)
    # frame 0's window is replicate-padded -> mean pose == pose 0 ->
    # target 0 == the unstable frame 0 itself
    np.testing.assert_allclose(np.asarray(targets[0]),
                               np.asarray(frames[0]), atol=1e-5)


def test_identity_model_metrics_sane():
    params = motion_cnn.init_params(MCFG, jax.random.key(0))
    stab = Stabilizer(CFG, params)
    m = eval_lib.evaluate_synthetic(stab, jax.random.key(1), 12, 48, 64)
    # identity model: output == input, so both PSNRs match and the
    # stability gain is ~1
    assert abs(m["psnr_vs_target"] - m["psnr_identity"]) < 0.5
    assert 0.9 < m["stability_gain"] < 1.1
    assert m["steadiness_in"] > 0


def test_eval_on_user_still():
    """evaluate_synthetic(still=...) must jitter the GIVEN image: with an
    identity model, output == input, and the report is computed against
    the user still's smoothed-path targets."""
    import pytest
    params = motion_cnn.init_params(MCFG, jax.random.key(0))
    stab = Stabilizer(CFG, params)
    rng = np.random.default_rng(5)
    still = rng.random((48, 64, 3)).astype(np.float32)
    m = eval_lib.evaluate_synthetic(stab, jax.random.key(3), 10, 48, 64,
                                    still=still)
    assert abs(m["psnr_vs_target"] - m["psnr_identity"]) < 0.5
    assert m["steadiness_in"] > 0  # jitter actually moved the user image
    with pytest.raises(ValueError):
        eval_lib.evaluate_synthetic(stab, jax.random.key(3), 10, 48, 64,
                                    still=still[:20])


def test_eval_cli_with_stills(tmp_path):
    """dvsg-eval --stills: user imagery drives the synthetic-jitter eval."""
    import cv2
    from dvsg_tpu import cli
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(7)
    for i in range(2):
        cv2.imwrite(str(d / f"f{i}.png"),
                    rng.integers(0, 256, (40, 56, 3), np.uint8))
    out = tmp_path / "m.jsonl"
    rc = cli.eval_main([
        "--stills", str(d), "--clips", "2", "--frames", "6",
        "--size", "32", "32", "--warp-impl", "lax",
        "--window", "3", "--model-size", "32", "32", "--grid-size", "8",
        "8", "--platform", "cpu", "--metrics-out", str(out)])
    assert rc == 0 and out.exists()
    rc2 = cli.eval_main(["--stills", str(tmp_path / "nope"),
                         "--platform", "cpu"])
    assert rc2 == 2


def test_oracle_offsets_beat_identity():
    """Feeding the ground-truth stabilizing warp through the pipeline's
    warp path must beat the identity baseline by a wide margin — validates
    the metric direction before any model training."""
    frames, still, path = synthetic.synthetic_clip(jax.random.key(2),
                                                   10, 64, 64)
    from dvsg_tpu.ops import grid as grid_ops
    from dvsg_tpu.ops.warp_ref import bilinear_warp

    window = 3
    pad = jnp.tile(path[:1], (window - 1, 1))
    padded = jnp.concatenate([pad, path], axis=0)
    outs = []
    for t in range(10):
        win = padded[t:t + window]
        stab_theta = synthetic.stabilizing_theta(win)
        g = grid_ops.homography_grid(stab_theta, 64, 64)
        outs.append(bilinear_warp(frames[t], g))
    out = np.asarray(jnp.stack(outs))

    targets = np.asarray(eval_lib.smoothed_targets(still, path, window))
    inner = (slice(None), slice(8, -8), slice(8, -8))
    p_oracle = psnr(out[inner], targets[inner])
    p_identity = psnr(np.asarray(frames)[inner], targets[inner])
    # oracle ~40 dB (double-resampling bound), identity ~31.6 dB
    assert p_oracle > p_identity + 5, (p_oracle, p_identity)
    assert p_oracle > 37, p_oracle
