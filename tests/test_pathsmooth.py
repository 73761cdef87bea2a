"""Cross-chunk camera-path smoothing (pipeline/pathsmooth.py).

Covers: the phase-correlation shift estimator (sign + sub-pixel
accuracy), the EMA recursion against a plain-numpy reference, exact
cross-chunk state carry (chunk-size invariance), the end-to-end quality
gate on a sway-heavy fixture (low-frequency sway the 5-frame window
cannot see must shrink, and the output must track the constructed ideal
EMA trajectory), stream/resume/overlap integration, and the loud
rejection on surfaces that do not carry the state (VERDICT round-3
item 2).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.ops import resize as resize_ops
from dvsg_tpu.pipeline import pathsmooth
from dvsg_tpu.pipeline.stabilize import Stabilizer
from dvsg_tpu.train import synthetic

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1)
CFG = StabilizeConfig(model=MCFG, chunk_frames=4, warp_impl="lax",
                      path_smooth=8)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def params():
    return motion_cnn.init_params(MCFG, jax.random.key(0))


@pytest.fixture(scope="module")
def flagship():
    from dvsg_tpu.utils import checkpoint as ckpt
    path = os.path.join(_ROOT, "checkpoints", "flagship_fast.npz")
    return ckpt.load_npz(path)


def _translation_clip(key, t, h, w, max_trans=0.05):
    path = synthetic.random_camera_path(key, t, max_trans=max_trans,
                                        max_angle=0.0, max_persp=0.0)
    still = synthetic.random_still(jax.random.fold_in(key, 9), h, w)
    frames = jax.vmap(lambda p: synthetic.jitter_frame(still, p))(path)
    return frames, still, np.asarray(path)


class TestMeasureShifts:
    def test_integer_roll_is_exact(self):
        img = np.asarray(synthetic.random_still(jax.random.key(0), 64, 64))
        rolled = np.roll(np.roll(img, 3, axis=0), -2, axis=1)
        seq = jnp.stack([jnp.asarray(img), jnp.asarray(rolled)]) - 0.5
        d = np.asarray(pathsmooth.measure_shifts(seq)[0])[0]
        # roll(+3, axis=0): f_new(y) = f_old(y-3) → Δy_px = -3 (circular
        # shift, so phase correlation is exact up to the refinement grid).
        np.testing.assert_allclose(d[0], 2 * 2.0 / 63, atol=2e-3)   # x
        np.testing.assert_allclose(d[1], -3 * 2.0 / 63, atol=2e-3)  # y

    def test_synthetic_translation_accuracy_and_sign(self):
        t = 12
        frames, _, path = _translation_clip(jax.random.key(1), t, 160, 192)
        u8 = jnp.clip(jnp.round(frames * 255), 0, 255).astype(jnp.uint8)
        seq = resize_ops.downscale_norm(u8, 96, 96)
        d = np.asarray(pathsmooth.measure_shifts(seq)[0])
        true = np.diff(path[:, :2], axis=0)
        # Sub-pixel refinement keeps the estimator unbiased: sign must
        # match and error stays well under a model-res pixel.
        assert np.abs(d - true).max() < 0.004


def _ref_corrections(deltas, n, horizon, clamp, t, d0=None, cuts=None):
    """Plain-numpy reference of the documented recursion."""
    p = np.concatenate([np.zeros((1, 2)), np.cumsum(deltas, axis=0)])
    d = np.zeros(2) if d0 is None else np.array(d0, np.float64)
    alpha = 2.0 / (horizon + 1.0)
    es = []
    for i in range(t):
        g = i + n - 1
        rel = p[g] - p[g - n + 1:g + 1].mean(axis=0)
        d = (1 - alpha) * (d + (p[g] - p[g - 1]))
        if cuts is not None and cuts[i + n - 2]:
            d = rel.copy()                   # scene cut: filter restarts
        e = np.clip(rel - d, -clamp, clamp)
        d = rel - e
        es.append(e)
    return np.array(es), d


class TestRecursion:
    # The recursion is component-generic; the unit tests drive it with
    # 2-component deltas and an explicit (2,) zero state.

    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(0)
        t, n = 12, 5
        deltas = rng.normal(0, 0.01, (t + n - 2, 2)).astype(np.float32)
        cfg = StabilizeConfig(model=ModelConfig(window=n), path_smooth=32)
        e, d = pathsmooth.smoothed_corrections(
            cfg, jnp.asarray(deltas), t, jnp.zeros((2,)))
        e_ref, d_ref = _ref_corrections(deltas.astype(np.float64), n, 32,
                                        cfg.path_smooth_max, t)
        np.testing.assert_allclose(np.asarray(e), e_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-6)

    def test_clamp_and_antiwindup(self):
        # A large step saturates the clamp; anti-windup must absorb it so
        # the correction recovers instead of winding up.
        t, n = 6, 3
        deltas = np.zeros((t + n - 2, 2), np.float32)
        deltas[2] = (0.5, -0.5)
        cfg = StabilizeConfig(model=ModelConfig(window=n), path_smooth=16,
                              path_smooth_max=0.03)
        e, _ = pathsmooth.smoothed_corrections(
            cfg, jnp.asarray(deltas), t, jnp.zeros((2,)))
        e = np.asarray(e)
        assert np.abs(e).max() <= 0.03 + 1e-6
        e_ref, _ = _ref_corrections(deltas.astype(np.float64), n, 16,
                                    0.03, t)
        np.testing.assert_allclose(e, e_ref, atol=1e-6)

    def test_split_equals_whole(self):
        rng = np.random.default_rng(1)
        t, n = 12, 5
        deltas = rng.normal(0, 0.02, (t + n - 2, 2)).astype(np.float32)
        cfg = StabilizeConfig(model=ModelConfig(window=n), path_smooth=24)
        e_all, _ = pathsmooth.smoothed_corrections(
            cfg, jnp.asarray(deltas), t, jnp.zeros((2,)))
        e1, d1 = pathsmooth.smoothed_corrections(
            cfg, jnp.asarray(deltas[:6 + n - 2]), 6, jnp.zeros((2,)))
        e2, _ = pathsmooth.smoothed_corrections(
            cfg, jnp.asarray(deltas[6:]), 6, d1)
        np.testing.assert_allclose(np.concatenate([e1, e2]),
                                   np.asarray(e_all), atol=1e-7)


class TestPipelineIntegration:
    def test_chunk_size_invariant(self, params, rng):
        """The carried (2,) EMA state + halo-recomputed deltas make chunk
        boundaries exact: different chunk sizes, identical bytes."""
        frames_u8, _, _ = synthetic.synthetic_clip_u8(jax.random.key(3),
                                                      11, 40, 48)
        frames = np.asarray(frames_u8)
        out2 = Stabilizer(CFG.replace(chunk_frames=2),
                          params).stabilize_clip(frames)
        out8 = Stabilizer(CFG.replace(chunk_frames=8),
                          params).stabilize_clip(frames)
        np.testing.assert_array_equal(out2, out8)

    def test_smoothing_changes_output(self, params):
        frames_u8, _, _ = synthetic.synthetic_clip_u8(jax.random.key(4),
                                                      8, 40, 48)
        frames = np.asarray(frames_u8)
        out_off = Stabilizer(CFG.replace(path_smooth=0),
                             params).stabilize_clip(frames)
        out_on = Stabilizer(CFG, params).stabilize_clip(frames)
        assert not np.array_equal(out_off, out_on)

    def test_state_resets_between_clips(self, params):
        """Two identical clips through ONE Stabilizer must produce
        identical output (no state bleed across stabilize_clip calls)."""
        frames_u8, _, _ = synthetic.synthetic_clip_u8(jax.random.key(5),
                                                      8, 40, 48)
        frames = np.asarray(frames_u8)
        stab = Stabilizer(CFG, params)
        np.testing.assert_array_equal(stab.stabilize_clip(frames),
                                      stab.stabilize_clip(frames))


class TestQualityGate:
    """The reason the feature exists: low-frequency sway the CNN's short
    window passes through must shrink, while output tracks the
    constructed ideal EMA trajectory (VERDICT round-3 item 2 gates)."""

    T, H, W = 64, 256, 320
    HORIZON = 32

    def _sway_clip(self):
        t = np.arange(self.T)
        rng = np.random.default_rng(3)
        path5 = np.zeros((self.T, 5), np.float32)
        path5[:, 0] = 0.05 * np.sin(2 * np.pi * t / 40) \
            + rng.normal(0, 0.008, self.T)
        path5[:, 1] = 0.04 * np.sin(2 * np.pi * t / 56 + 1.0) \
            + rng.normal(0, 0.008, self.T)
        still = synthetic.random_still(jax.random.key(11), self.H, self.W)
        frames = jax.vmap(
            lambda p: synthetic.jitter_frame(still, jnp.asarray(p)))(
            jnp.asarray(path5))
        to8 = lambda x: np.asarray(
            jnp.clip(jnp.round(x * 255), 0, 255).astype(jnp.uint8))
        return to8(frames), still, path5, to8

    def _tracked_path_rms(self, frames):
        from dvsg_tpu.utils import stab_metrics
        cp = stab_metrics.camera_path(frames)
        cp = np.where(np.isnan(cp), 0.0, cp)
        p = np.cumsum(cp[:, :2], axis=0)
        return float(np.sqrt(((p - p.mean(0)) ** 2).mean()))

    def test_sway_shrinks_and_tracks_ideal(self, flagship):
        pytest.importorskip("cv2")
        from dvsg_tpu.utils.metrics import psnr
        params, mcfg = flagship
        frames, still, path5, to8 = self._sway_clip()
        outs = {}
        for horizon in (0, self.HORIZON):
            # Translation-only smoothing: the fixture and the ideal
            # target below are pure translation, so the translation
            # recursion is exact; rotation and scale have their own
            # gates (TestRotationSmoothing, TestScaleSmoothing).
            cfg = StabilizeConfig(model=mcfg, chunk_frames=16,
                                  warp_impl="lax", path_smooth=horizon,
                                  path_smooth_rotation=False,
                                  path_smooth_scale=False)
            outs[horizon] = Stabilizer(cfg, params).stabilize_clip(frames)

        rms_plain = self._tracked_path_rms(outs[0])
        rms_smooth = self._tracked_path_rms(outs[self.HORIZON])
        # EMA-32 on period-40/56 sway: |H| ≈ 0.4-0.5, so the tracked
        # sway RMS must drop well below the unsmoothed output's
        # (measured 4.7 → 2.4 px on the round-4 fixture).
        assert rms_smooth < 0.75 * rms_plain, (rms_smooth, rms_plain)

        # Fidelity to the intended trajectory: render the ideal target
        # from the TRUE path through the same discrete recursion.
        n = mcfg.window
        p = path5[:, :2].astype(np.float64)
        pad = np.concatenate([np.repeat(p[:1], n - 1, 0), p])
        abar = np.stack([pad[i:i + n].mean(0) for i in range(self.T)])
        # Ideal e from the TRUE deltas through the same recursion; the
        # replicate-padded halo contributes n-1 zero deltas, exactly as
        # the pipeline's initial halo does.
        deltas_padded = np.concatenate(
            [np.zeros((n - 1, 2)), np.diff(p, axis=0)])
        e_ref, _ = _ref_corrections(deltas_padded, n, self.HORIZON,
                                    0.05, self.T)
        target_xy = abar + e_ref
        th = np.zeros((self.T, 5), np.float32)
        th[:, :2] = target_xy
        tgt = to8(jax.vmap(
            lambda q: synthetic.jitter_frame(still, jnp.asarray(q)))(
            jnp.asarray(th)))
        bh, bw = int(self.H * 0.15), int(self.W * 0.15)
        inner = lambda a: a[:, bh:self.H - bh, bw:self.W - bw]
        p_db = psnr(inner(outs[self.HORIZON]), inner(tgt))
        assert p_db > 45.0, p_db


class TestRotationSmoothing:
    """Rotation sway (θ slower than the window) also passes through the
    CNN; the half-frame differential phase-correlation estimator plus
    the (−Y, X) linear correction field must remove most of it."""

    def test_measure_motion_accuracy(self):
        t = 16
        path = synthetic.random_camera_path(jax.random.key(5), t,
                                            max_trans=0.02,
                                            max_angle=0.05,
                                            max_persp=0.0)
        still = synthetic.random_still(jax.random.key(2), 192, 224)
        frames = jax.vmap(lambda p: synthetic.jitter_frame(still, p))(path)
        u8 = jnp.clip(jnp.round(frames * 255), 0, 255).astype(jnp.uint8)
        seq = resize_ops.downscale_norm(u8, 96, 96)
        m = np.asarray(pathsmooth.measure_motion(seq)[0])
        true = np.diff(np.asarray(path[:, :3]), axis=0)
        assert m.shape == (t - 1, 4)
        # Unbiased to ~a few percent, noise well under the true motion
        # (measured round-4: slope 1.02, rms err ~3e-4 rad at 128²).
        assert np.abs(m[:, 2] - true[:, 2]).max() < 2e-3

    def test_rotation_sway_shrinks(self, flagship):
        pytest.importorskip("cv2")
        from dvsg_tpu.utils import stab_metrics
        params, mcfg = flagship
        t_n, h, w = 64, 256, 320
        t = np.arange(t_n)
        rng = np.random.default_rng(3)
        path5 = np.zeros((t_n, 5), np.float32)
        path5[:, 0] = 0.04 * np.sin(2 * np.pi * t / 40) \
            + rng.normal(0, 0.008, t_n)
        path5[:, 1] = 0.03 * np.sin(2 * np.pi * t / 56 + 1.0) \
            + rng.normal(0, 0.008, t_n)
        path5[:, 2] = 0.05 * np.sin(2 * np.pi * t / 48 + 0.5) \
            + rng.normal(0, 0.004, t_n)
        still = synthetic.random_still(jax.random.key(11), h, w)
        frames = jax.vmap(
            lambda p: synthetic.jitter_frame(still, jnp.asarray(p)))(
            jnp.asarray(path5))
        clip = np.asarray(jnp.clip(jnp.round(frames * 255), 0,
                                   255).astype(jnp.uint8))

        def rot_rms(x):
            cp = stab_metrics.camera_path(x)
            cp = np.where(np.isnan(cp), 0.0, cp)
            p = np.cumsum(cp[:, 2], axis=0)
            return float(np.sqrt(((p - p.mean()) ** 2).mean()))

        outs = {}
        for smooth in (0, 32):
            cfg = StabilizeConfig(model=mcfg, chunk_frames=16,
                                  warp_impl="lax", path_smooth=smooth)
            outs[smooth] = Stabilizer(cfg, params).stabilize_clip(clip)
        r_plain, r_smooth = rot_rms(outs[0]), rot_rms(outs[32])
        # Measured round-4: 0.0357 → 0.0199 rad on this fixture.
        assert r_smooth < 0.75 * r_plain, (r_plain, r_smooth)


class TestConfidenceGating:
    """Scene cuts, flat stretches, and occlusions must not poison the
    EMA (VERDICT round-4 missing #3): the peak-to-second-peak ratio of
    the correlation surface gates the deltas (below path_smooth_conf →
    zeroed) and detects cuts (below path_smooth_cut → filter reset)."""

    def test_conf_discriminates(self):
        fr, still, _ = synthetic.synthetic_clip(jax.random.key(0), 4,
                                                160, 192)
        other = synthetic.random_still(jax.random.key(99), 160, 192)
        rng = np.random.default_rng(0)
        flat = jnp.asarray(np.clip(
            0.5 + rng.normal(0, 0.006, (2, 160, 192, 3)), 0, 1),
            jnp.float32)
        seq_f = jnp.concatenate([fr, other[None], flat], axis=0)
        u8 = jnp.clip(jnp.round(seq_f * 255), 0, 255).astype(jnp.uint8)
        seq = resize_ops.downscale_norm(u8, 96, 96)
        _, conf = pathsmooth.measure_shifts(seq)
        conf = np.asarray(conf)
        # pairs: 0-2 within-scene (healthy), 3 = scene cut, 4 = cut to
        # flat, 5 = flat pair — gates at the config defaults (2.0 / 1.5).
        assert conf[:3].min() > 2.0, conf
        assert conf[3] < 1.5, conf
        assert conf[4] < 1.5, conf
        assert conf[5] < 1.5, conf

    def test_cut_resets_recursion(self):
        t, n = 10, 3
        deltas = np.full((t + n - 2, 2), 0.01, np.float32)
        cuts = np.zeros((t + n - 2,), bool)
        cuts[5] = True
        deltas[5] = 0.0       # the gate zeroes the cut transition's delta
        cfg = StabilizeConfig(model=ModelConfig(window=n), path_smooth=16)
        e, d = pathsmooth.smoothed_corrections(
            cfg, jnp.asarray(deltas), t, jnp.zeros((2,)),
            cuts=jnp.asarray(cuts))
        e = np.asarray(e)
        # The cut is consumed at output frame i = 5 - (n - 2) = 4: the
        # correction must restart at exactly 0 there.
        np.testing.assert_allclose(e[4], 0.0, atol=1e-7)
        e_ref, d_ref = _ref_corrections(deltas.astype(np.float64), n, 16,
                                        cfg.path_smooth_max, t, cuts=cuts)
        np.testing.assert_allclose(e, e_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-6)

    def test_cut_clip_recovers_to_fresh_stream(self, params):
        """A hard cut mid-clip: with the default gates, output after the
        cut must converge to what a FRESH stream of the second scene
        produces; with gating disabled the garbage cut delta persists in
        the EMA and tracks worse."""
        from dvsg_tpu.utils.metrics import psnr
        a = np.asarray(synthetic.synthetic_clip_u8(jax.random.key(21),
                                                   8, 64, 80)[0])
        b = np.asarray(synthetic.synthetic_clip_u8(jax.random.key(22),
                                                   8, 64, 80)[0])
        both = np.concatenate([a, b], axis=0)
        fresh = Stabilizer(CFG, params).stabilize_clip(b)
        gated = Stabilizer(CFG, params).stabilize_clip(both)
        ungated = Stabilizer(
            CFG.replace(path_smooth_conf=0.0, path_smooth_cut=0.0),
            params).stabilize_clip(both)
        # Frames 12-15: CNN windows are pure second-scene content in both
        # runs, so any difference is the smoothing state's history.
        p_gated = psnr(gated[12:16], fresh[4:8])
        p_ungated = psnr(ungated[12:16], fresh[4:8])
        assert p_gated > 40.0, (p_gated, p_ungated)
        assert p_gated > p_ungated + 3.0, (p_gated, p_ungated)

    def test_flat_stretch_decays_instead_of_garbage(self, params):
        """Frames going flat mid-stream: gated deltas are zeroed, so the
        correction DECAYS (bounded by its pre-flat value) instead of
        chasing random correlation peaks."""
        a = np.asarray(synthetic.synthetic_clip_u8(jax.random.key(23),
                                                   8, 64, 80)[0])
        rng = np.random.default_rng(0)
        flat = np.clip(128 + rng.normal(0, 1.5, (8, 64, 80, 3)), 0,
                       255).astype(np.uint8)
        clip = np.concatenate([a, flat], axis=0)
        gated = Stabilizer(CFG, params).stabilize_clip(clip)
        ungated = Stabilizer(
            CFG.replace(path_smooth_conf=0.0, path_smooth_cut=0.0),
            params).stabilize_clip(clip)
        # The flat frames carry no structure for the ungated measurement:
        # its corrections are random-peak garbage and the two runs
        # diverge; the gated run must stay closer to the no-smoothing
        # output on the flat tail (its correction only decays from the
        # handover value).
        plain = Stabilizer(CFG.replace(path_smooth=0),
                           params).stabilize_clip(clip)
        d_gated = np.abs(gated[10:].astype(int) - plain[10:].astype(int))
        d_ungated = np.abs(ungated[10:].astype(int)
                           - plain[10:].astype(int))
        assert d_gated.mean() <= d_ungated.mean(), (
            d_gated.mean(), d_ungated.mean())

    def test_validation_rejects_cut_above_conf(self):
        with pytest.raises(ValueError, match="path_smooth_cut"):
            StabilizeConfig(path_smooth=8, path_smooth_conf=1.0,
                            path_smooth_cut=2.0)


LAG_CFG = CFG.replace(path_smooth_lag=4)        # chunk 4, horizon 8, D=4


class TestLagSmoothing:
    """Fixed-lag smoothing (VERDICT round-4 missing #5): output delayed
    by D frames, path smoothed by a zero-phase two-sided FIR over the
    lookahead — beats the causal EMA at equal clamp."""

    def _clip(self, n, key=3):
        return np.asarray(synthetic.synthetic_clip_u8(
            jax.random.key(key), n, 40, 48)[0])

    def test_chunk_size_invariant(self, params):
        frames = self._clip(11)
        out4 = Stabilizer(LAG_CFG, params).stabilize_clip(frames)
        out8 = Stabilizer(LAG_CFG.replace(chunk_frames=8),
                          params).stabilize_clip(frames)
        np.testing.assert_array_equal(out4, out8)

    def test_differs_from_causal(self, params):
        frames = self._clip(11)
        out_lag = Stabilizer(LAG_CFG, params).stabilize_clip(frames)
        out_causal = Stabilizer(CFG, params).stabilize_clip(frames)
        assert out_lag.shape == frames.shape
        assert not np.array_equal(out_lag, out_causal)

    def test_stream_equals_clip(self, params):
        frames = self._clip(14)
        want = Stabilizer(LAG_CFG, params).stabilize_clip(frames)
        w = _ListWriter()
        n = Stabilizer(LAG_CFG, params).stabilize_stream(
            _ArrayReader(frames, 4), w)
        assert n == frames.shape[0]
        np.testing.assert_array_equal(np.concatenate(w.chunks), want)

    def test_beats_causal_on_sway(self, flagship):
        """The reason the mode exists: zero phase lag tracks the path
        tighter at the same clamp (measured round-5: 2.15 px causal →
        1.72 px at D=16 on this fixture; 4.72 input)."""
        pytest.importorskip("cv2")
        from dvsg_tpu.utils import stab_metrics
        params, mcfg = flagship
        t_n, h, w = 64, 256, 320
        t = np.arange(t_n)
        rng = np.random.default_rng(3)
        path5 = np.zeros((t_n, 5), np.float32)
        path5[:, 0] = 0.05 * np.sin(2 * np.pi * t / 40) \
            + rng.normal(0, 0.008, t_n)
        path5[:, 1] = 0.04 * np.sin(2 * np.pi * t / 56 + 1.0) \
            + rng.normal(0, 0.008, t_n)
        still = synthetic.random_still(jax.random.key(11), h, w)
        frames = jax.vmap(
            lambda p: synthetic.jitter_frame(still, jnp.asarray(p)))(
            jnp.asarray(path5))
        clip = np.asarray(jnp.clip(jnp.round(frames * 255), 0,
                                   255).astype(jnp.uint8))

        def rms(x):
            cp = stab_metrics.camera_path(x)
            cp = np.where(np.isnan(cp), 0.0, cp)
            p = np.cumsum(cp[:, :2], axis=0)
            return float(np.sqrt(((p - p.mean(0)) ** 2).mean()))

        outs = {}
        for lag in (0, 16):
            cfg = StabilizeConfig(model=mcfg, chunk_frames=16,
                                  warp_impl="lax", path_smooth=32,
                                  path_smooth_lag=lag)
            outs[lag] = Stabilizer(cfg, params).stabilize_clip(clip)
        r_causal, r_lag = rms(outs[0]), rms(outs[16])
        assert r_lag < 0.92 * r_causal, (r_causal, r_lag)

    class _FailingWriter:          # standalone: _ListWriter is defined
        def __init__(self, fail_at):  # later in this module
            self.chunks = []
            self.fail_at = fail_at
            self.calls = 0

        def write_batch(self, x):
            if self.calls == self.fail_at:
                raise RuntimeError("injected encoder failure")
            self.calls += 1
            self.chunks.append(np.array(x))

        def seek(self, k):
            pass

    def _resume_run(self, params, frames, rdir, fail_at=None):
        w = (self._FailingWriter(fail_at) if fail_at is not None
             else _ListWriter())
        if fail_at is None:
            w.seek = lambda k: None
        r = _ArrayReader(frames, 4)
        r.skip = lambda k: (setattr(r, "i", k), k)[1]
        stab = Stabilizer(LAG_CFG, params)
        try:
            stab.stabilize_stream(r, w, resume_dir=rdir)
        except RuntimeError:
            pass
        return np.concatenate(w.chunks) if w.chunks else None

    def test_resume_midstream(self, params, tmp_path):
        """Interrupt mid-stream (carry frames all real): resume must be
        byte-identical to the uninterrupted run."""
        frames = self._clip(14, key=5)
        full = Stabilizer(LAG_CFG, params).stabilize_clip(frames)
        rdir = str(tmp_path / "r")
        self._resume_run(params, frames, rdir, fail_at=1)  # record: W=4
        got = self._resume_run(params, frames, rdir)
        np.testing.assert_array_equal(got, full[4:])

    def test_resume_in_drain_region(self, params, tmp_path):
        """Interrupt after EOF was discovered (record's carries are
        partly replicate-pad, lag_real < D): the drain must resume
        exactly."""
        frames = self._clip(14, key=6)
        full = Stabilizer(LAG_CFG, params).stabilize_clip(frames)
        rdir = str(tmp_path / "r")
        self._resume_run(params, frames, rdir, fail_at=3)  # record: W=12
        got = self._resume_run(params, frames, rdir)
        np.testing.assert_array_equal(got, full[12:])

    def test_resume_record_mode_mismatches_rejected(self, params,
                                                    tmp_path):
        frames = self._clip(8, key=7)
        rdir = str(tmp_path / "r")
        self._resume_run(params, frames, rdir, fail_at=1)   # lag record
        w = _ListWriter()
        w.seek = lambda k: None
        r = _ArrayReader(frames, 4)
        r.skip = lambda k: (setattr(r, "i", k), k)[1]
        with pytest.raises(ValueError, match="path-smooth-lag run"):
            Stabilizer(CFG, params).stabilize_stream(r, w,
                                                     resume_dir=rdir)

    def test_validation(self):
        with pytest.raises(ValueError, match="path_smooth_lag needs"):
            StabilizeConfig(path_smooth_lag=4)
        with pytest.raises(ValueError, match="chunk_frames"):
            StabilizeConfig(path_smooth=8, path_smooth_lag=32,
                            chunk_frames=16)

    def test_unsupported_surfaces_reject(self, params):
        from dvsg_tpu import export
        from dvsg_tpu.parallel import temporal
        from dvsg_tpu.parallel.mesh import make_mesh
        from dvsg_tpu.pipeline.online import OnlineStabilizer
        mesh = make_mesh((len(jax.devices()),))
        for ctor in (
                lambda: OnlineStabilizer(LAG_CFG, params),
                lambda: temporal.make_temporal_chunk_fn(LAG_CFG, mesh),
                lambda: export.export_chunk_program(LAG_CFG, params,
                                                    40, 48)):
            with pytest.raises(ValueError, match="path_smooth_lag"):
                ctor()

    def test_dp_sharded_lag_matches_single(self, params):
        """Lag on the clip-sharded DP surface (drive_chunked_batch_lag):
        per-clip carries ride the vmap + sharding; byte-identical to the
        single-clip lag pipeline."""
        from dvsg_tpu.parallel.dp import ShardedClipStabilizer
        from dvsg_tpu.parallel.mesh import make_mesh
        n = len(jax.devices())
        mesh = make_mesh((n,))
        clips = np.stack([
            np.asarray(synthetic.synthetic_clip_u8(
                jax.random.key(300 + i), 10, 40, 48)[0])
            for i in range(n)])
        outs = ShardedClipStabilizer(LAG_CFG, params,
                                     mesh).stabilize_clips(clips)
        for i in range(n):
            ref = Stabilizer(LAG_CFG, params).stabilize_clip(clips[i])
            np.testing.assert_array_equal(outs[i], ref)

    def test_batch_engine_lag_matches_single(self, params):
        """Whole-clip lag requests through the serving engine — incl. a
        mixed-length group — match the single-clip lag pipeline; segment
        carries with lag are rejected."""
        from dvsg_tpu.pipeline.batching import BatchStabilizer
        clips = [np.asarray(synthetic.synthetic_clip_u8(
            jax.random.key(310 + i), 10 - 3 * i, 40, 48)[0])
            for i in range(2)]                       # lengths 10 and 7
        engine = BatchStabilizer(LAG_CFG, params, max_batch=2,
                                 window_s=0.05)
        try:
            import threading
            outs = [None, None]

            def run(i):
                outs[i] = engine.stabilize_clip(clips[i])

            ts = [threading.Thread(target=run, args=(i,))
                  for i in range(2)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            for i in range(2):
                ref = Stabilizer(LAG_CFG, params).stabilize_clip(clips[i])
                np.testing.assert_array_equal(outs[i], ref)
            with pytest.raises(ValueError, match="segment carries"):
                engine.stabilize_clip(clips[0], return_carry=True)
        finally:
            engine.close()

    def test_overlap_driver_rejects(self, params):
        from dvsg_tpu.pipeline.overlap import stabilize_stream_overlapped
        frames = self._clip(8, key=8)
        with pytest.raises(ValueError, match="path_smooth_lag"):
            stabilize_stream_overlapped(Stabilizer(LAG_CFG, params),
                                        _ArrayReader(frames, 4),
                                        _ListWriter())


class TestScaleSmoothing:
    """Zoom/scale sway (VERDICT round-4 missing #4): the DIVERGENCE of
    the same four half-frame shifts whose curl gives rotation recovers
    Δlog-s for free; the correction field e_s·(X, Y) is linear, hence
    exact under the bilinear upsample."""

    @staticmethod
    def _render(path4, still):
        from dvsg_tpu.ops import grid as grid_ops
        from dvsg_tpu.ops.warp_ref import bilinear_warp
        h, w, _ = still.shape
        frames = jax.vmap(lambda p: bilinear_warp(
            still, grid_ops.homography_grid(
                synthetic.similarity_theta(p), h, w)))(jnp.asarray(path4))
        return np.asarray(jnp.clip(jnp.round(frames * 255), 0,
                                   255).astype(jnp.uint8))

    def test_measure_motion_scale_accuracy(self):
        t = 16
        rng = np.random.default_rng(0)

        def walk(scale):
            x = np.cumsum(rng.normal(0, 1, t + 8))
            x = np.convolve(x, np.ones(9) / 9, mode="valid")[:t]
            x -= x.mean()
            return (x / max(abs(x).max(), 1e-6) * scale).astype(np.float32)

        path4 = np.stack([walk(0.02), walk(0.02), walk(0.03),
                          walk(0.03)], axis=-1)
        still = synthetic.random_still(jax.random.key(2), 192, 224)
        u8 = self._render(path4, still)
        seq = resize_ops.downscale_norm(jnp.asarray(u8), 96, 96)
        m = np.asarray(pathsmooth.measure_motion(seq)[0])
        true = np.diff(path4.astype(np.float64), axis=0)
        assert m.shape == (t - 1, 4)
        # Measured round-5 at 96²: slope 0.99, rms err ~2e-4 log-units.
        assert np.abs(m[:, 3] - true[:, 3]).max() < 2e-3
        slope = np.polyfit(true[:, 3], m[:, 3], 1)[0]
        assert 0.9 < slope < 1.1, slope

    def test_zoom_sway_shrinks(self, flagship):
        pytest.importorskip("cv2")
        from dvsg_tpu.utils import stab_metrics
        params, mcfg = flagship
        t_n, h, w = 64, 256, 320
        t = np.arange(t_n)
        rng = np.random.default_rng(3)
        path4 = np.zeros((t_n, 4), np.float32)
        path4[:, 0] = 0.03 * np.sin(2 * np.pi * t / 40) \
            + rng.normal(0, 0.008, t_n)
        path4[:, 1] = 0.03 * np.sin(2 * np.pi * t / 56 + 1.0) \
            + rng.normal(0, 0.008, t_n)
        path4[:, 3] = 0.04 * np.sin(2 * np.pi * t / 48 + 0.5) \
            + rng.normal(0, 0.004, t_n)       # walking-bob zoom sway
        still = synthetic.random_still(jax.random.key(11), h, w)
        clip = self._render(path4, still)

        def scale_rms(x):
            cp = stab_metrics.camera_path(x)
            cp = np.where(np.isnan(cp), 0.0, cp)
            p = np.cumsum(cp[:, 3], axis=0)
            return float(np.sqrt(((p - p.mean()) ** 2).mean()))

        outs = {}
        for smooth in (0, 32):
            cfg = StabilizeConfig(model=mcfg, chunk_frames=16,
                                  warp_impl="lax", path_smooth=smooth)
            outs[smooth] = Stabilizer(cfg, params).stabilize_clip(clip)
        r_plain, r_smooth = scale_rms(outs[0]), scale_rms(outs[32])
        assert r_smooth < 0.75 * r_plain, (r_plain, r_smooth)

    def test_scale_off_flag(self, params):
        """path_smooth_scale=False must neither measure nor correct the
        scale component (output differs from scale-on on a zoom clip)."""
        path4 = np.zeros((8, 4), np.float32)
        path4[:, 3] = np.linspace(-0.03, 0.03, 8)
        still = synthetic.random_still(jax.random.key(1), 40, 48)
        clip = self._render(path4, still)
        out_on = Stabilizer(CFG, params).stabilize_clip(clip)
        out_off = Stabilizer(CFG.replace(path_smooth_scale=False),
                             params).stabilize_clip(clip)
        assert not np.array_equal(out_on, out_off)


class _ArrayReader:
    def __init__(self, frames, batch):
        self.frames, self.i, self.batch = frames, 0, batch

    def read_batch(self, k):
        c = self.frames[self.i:self.i + k]
        self.i += c.shape[0]
        return c


class _ListWriter:
    def __init__(self):
        self.chunks = []

    def write_batch(self, x):
        self.chunks.append(np.array(x))


class TestStreamSurfaces:
    def test_overlapped_equals_sync(self, params):
        from dvsg_tpu.pipeline.overlap import stabilize_stream_overlapped
        frames_u8, _, _ = synthetic.synthetic_clip_u8(jax.random.key(6),
                                                      10, 40, 48)
        frames = np.asarray(frames_u8)
        sync_out = Stabilizer(CFG, params).stabilize_clip(frames)
        w = _ListWriter()
        stab = Stabilizer(CFG, params)
        n = stabilize_stream_overlapped(stab, _ArrayReader(frames, 4), w)
        assert n == frames.shape[0]
        np.testing.assert_array_equal(np.concatenate(w.chunks), sync_out)

    def test_resume_matches_uninterrupted(self, params, tmp_path):
        from dvsg_tpu.utils import video_io
        frames_u8, _, _ = synthetic.synthetic_clip_u8(jax.random.key(7),
                                                      10, 40, 48)
        frames = np.asarray(frames_u8)

        def run(inp, resume=None):
            w = _ListWriter()
            w.seek = lambda k: None
            stab = Stabilizer(CFG, params)
            stab.stabilize_stream(_ArrayReader(inp, 4), w,
                                  resume_dir=resume)
            return np.concatenate(w.chunks) if w.chunks else None

        full = run(frames)
        rdir = str(tmp_path / "r")
        run(frames[:8], resume=rdir)          # "interrupted" after 2 chunks

        # Resume with the full input: must skip 8 and continue with the
        # carried halo AND smoothing state → identical to uninterrupted.
        w2 = _ListWriter()
        seeked = []
        w2.seek = lambda k: seeked.append(k)
        r2 = _ArrayReader(frames, 4)
        r2.skip = lambda k: (setattr(r2, "i", k), k)[1]
        Stabilizer(CFG, params).stabilize_stream(r2, w2, resume_dir=rdir)
        assert seeked == [8]
        np.testing.assert_array_equal(np.concatenate(w2.chunks), full[8:])

    def test_resume_record_without_state_is_rejected(self, params,
                                                     tmp_path):
        frames_u8, _, _ = synthetic.synthetic_clip_u8(jax.random.key(8),
                                                      8, 40, 48)
        frames = np.asarray(frames_u8)
        rdir = str(tmp_path / "r")

        def run(cfg, inp):
            w = _ListWriter()
            w.seek = lambda k: None
            r = _ArrayReader(inp, 4)
            r.skip = lambda k: (setattr(r, "i", k), k)[1]
            Stabilizer(cfg, params).stabilize_stream(r, w, resume_dir=rdir)

        run(CFG.replace(path_smooth=0), frames[:4])   # record w/o state
        with pytest.raises(ValueError, match="without path smoothing"):
            run(CFG, frames)

    def test_resume_record_with_state_rejected_when_off(self, params,
                                                        tmp_path):
        """Mirror of the check above (round-4 advisor): a record saved
        WITH smoothing must not silently resume into an unsmoothed run —
        the output would switch mid-stream."""
        frames_u8, _, _ = synthetic.synthetic_clip_u8(jax.random.key(9),
                                                      8, 40, 48)
        frames = np.asarray(frames_u8)
        rdir = str(tmp_path / "r")

        def run(cfg, inp):
            w = _ListWriter()
            w.seek = lambda k: None
            r = _ArrayReader(inp, 4)
            r.skip = lambda k: (setattr(r, "i", k), k)[1]
            Stabilizer(cfg, params).stabilize_stream(r, w, resume_dir=rdir)

        run(CFG, frames[:4])                          # record WITH state
        with pytest.raises(ValueError, match="carries a path-smoothing"):
            run(CFG.replace(path_smooth=0), frames)


class TestBatchSurfaces:
    """Per-clip (B, 2) EMA states ride the vmapped/sharded batch
    programs; every batched output must be byte-identical to the
    single-clip Stabilizer at the same config."""

    def _clips(self, n, t=10):
        return np.stack([
            np.asarray(synthetic.synthetic_clip_u8(
                jax.random.key(100 + i), t, 40, 48)[0])
            for i in range(n)])

    def test_batching_engine_matches_offline(self, params):
        from dvsg_tpu.pipeline.batching import BatchStabilizer
        clips = self._clips(2)
        engine = BatchStabilizer(CFG, params, max_batch=2, window_s=0.05)
        try:
            for i in range(2):
                out = engine.stabilize_clip(clips[i])
                ref = Stabilizer(CFG, params).stabilize_clip(clips[i])
                np.testing.assert_array_equal(out, ref)
        finally:
            engine.close()

    def test_dp_sharded_matches_single(self, params):
        from dvsg_tpu.parallel.dp import ShardedClipStabilizer
        from dvsg_tpu.parallel.mesh import make_mesh
        n = len(jax.devices())
        mesh = make_mesh((n,))
        clips = self._clips(n)
        outs = ShardedClipStabilizer(CFG, params,
                                     mesh).stabilize_clips(clips)
        for i in range(n):
            ref = Stabilizer(CFG, params).stabilize_clip(clips[i])
            np.testing.assert_array_equal(outs[i], ref)

    def test_multiclip_matches_offline(self, params, tmp_path):
        from dvsg_tpu.pipeline.multiclip import stabilize_multi
        from dvsg_tpu.utils import video_io
        clips = self._clips(2)
        readers, writers, outdirs = [], [], []
        for i in range(2):
            ind = str(tmp_path / f"in{i}")
            outd = str(tmp_path / f"out{i}")
            with video_io.VideoWriter(ind, 48, 40, 30) as w:
                w.write_batch(clips[i])
            readers.append(video_io.VideoReader(ind))
            writers.append(video_io.VideoWriter(outd, 48, 40, 30))
            outdirs.append(outd)
        res = stabilize_multi(CFG, params, readers, writers)
        for r in readers:
            r.close()
        for w in writers:
            w.close()
        assert res.frames_written == [10, 10]
        for i in range(2):
            with video_io.VideoReader(outdirs[i]) as rd:
                out = rd.read_batch(16)
            ref = Stabilizer(CFG, params).stabilize_clip(clips[i])
            np.testing.assert_array_equal(out, ref)


class TestUnsupportedSurfaces:
    # Since round 5 EVERY surface supports smoothing: online
    # (tests/test_online.py::TestSmoothedOnline), AOT export
    # (tests/test_export.py::TestSmoothedExport), temporal sharding
    # (tests/test_temporal.py::TestSmoothedTemporal) — each pinned
    # byte-identical to the single-device smoothed pipeline.

    def test_reject_helper_still_raises(self, params):
        """reject_unsupported stays for third-party drivers composing
        their own surface on the low-level chunk fns."""
        with pytest.raises(ValueError, match="path_smooth"):
            pathsmooth.reject_unsupported(CFG, "a custom driver")
        pathsmooth.reject_unsupported(CFG.replace(path_smooth=0),
                                      "a custom driver")   # no-op

    def test_autocrop_covers_smoothing_clamp(self, params):
        from dvsg_tpu.pipeline.autocrop import pick_border_crop
        frames = np.zeros((4, 40, 48, 3), np.uint8)
        crop_plain, _, _ = pick_border_crop(
            CFG.replace(path_smooth=0), params, frames)
        crop_smooth, _, _ = pick_border_crop(CFG, params, frames)
        # The smoothing correction is bounded by path_smooth_max per
        # component (x2 at the corners with rotation on); the picked
        # crop must reserve at least that margin on top.
        assert crop_smooth >= crop_plain + CFG.path_smooth_max - 1 / 64

    def test_cli_autocrop_scan_covers_smoothing_clamp(self, params,
                                                      tmp_path):
        """The CLI scan path (_run_autocrop_scan) must reserve the same
        margin as pick_border_crop — a round-4 review found it bypassed
        the margin entirely, under-cropping exactly the smoothed runs."""
        from dvsg_tpu import cli
        from dvsg_tpu.utils import video_io
        frames = np.full((4, 40, 48, 3), 128, np.uint8)
        p = str(tmp_path / "still")
        with video_io.VideoWriter(p, 48, 40, 30) as w:
            w.write_batch(frames)
        crop_plain = cli._run_autocrop_scan(
            CFG.replace(path_smooth=0), params, [p], video_io)
        crop_smooth = cli._run_autocrop_scan(CFG, params, [p], video_io)
        assert crop_smooth >= crop_plain + CFG.path_smooth_max - 1 / 64


class TestFuzzChunkInvariance:
    """Seeded fuzz over (mode, clip length, chunk-size pair): every
    smoothing mode must be chunk-size-invariant bit-for-bit — the
    property the whole carry design rests on."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_modes_invariant(self, params, seed):
        rng = np.random.default_rng(seed)
        t = int(rng.integers(9, 18))
        frames = np.asarray(synthetic.synthetic_clip_u8(
            jax.random.key(400 + seed), t, 40, 48)[0])
        mode = [
            {},                                            # causal
            {"path_smooth_rotation": False,
             "path_smooth_scale": False},                  # translation
            {"path_smooth_conf": 0.0, "path_smooth_cut": 0.0},  # ungated
            {"path_smooth_lag": 2},                        # fixed-lag
        ][seed % 4]
        cfg = CFG.replace(**mode)
        c_lo, c_hi = sorted(rng.choice([2, 4, 8], 2, replace=False))
        out_lo = Stabilizer(cfg.replace(chunk_frames=int(c_lo)),
                            params).stabilize_clip(frames)
        out_hi = Stabilizer(cfg.replace(chunk_frames=int(c_hi)),
                            params).stabilize_clip(frames)
        np.testing.assert_array_equal(out_lo, out_hi)


class TestConfigValidation:
    def test_rejects_negative(self):
        with pytest.raises(ValueError, match="path_smooth"):
            StabilizeConfig(path_smooth=-1)

    def test_rejects_window_one(self):
        with pytest.raises(ValueError, match="window >= 2"):
            StabilizeConfig(model=ModelConfig(window=1), path_smooth=8)

    def test_rejects_bad_clamp(self):
        with pytest.raises(ValueError, match="path_smooth_max"):
            StabilizeConfig(path_smooth=8, path_smooth_max=0.5)
