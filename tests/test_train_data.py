"""Real-footage fine-tuning bank (train/data.py) and its loop plumbing."""

import numpy as np
import cv2
import jax
import pytest

from dvsg_tpu.config import ModelConfig, TrainConfig
from dvsg_tpu.train import loop
from dvsg_tpu.train.data import build_image_bank, build_image_bank_multi

MCFG = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                   base_features=8, blocks_per_level=1, max_offset=0.15)
TCFG = TrainConfig(model=MCFG, batch_size=4, steps=10, warmup_steps=2,
                   learning_rate=1e-3, checkpoint_every=0)


@pytest.fixture
def frame_dir(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        img = rng.integers(0, 256, (48, 64, 3), np.uint8)
        cv2.imwrite(str(d / f"frame{i}.png"), img)
    return str(d)


class TestBank:
    def test_shape_dtype_range(self, frame_dir):
        bank = build_image_bank(frame_dir, (32, 32), num_images=7, seed=1)
        assert bank.shape == (7, 32, 32, 3)
        assert bank.dtype == np.float32
        assert bank.min() >= 0.0 and bank.max() <= 1.0

    def test_more_images_than_frames(self, frame_dir):
        bank = build_image_bank(frame_dir, (32, 32), num_images=12)
        assert bank.shape[0] == 12
        # Crops are independent even when frames repeat.
        assert not np.array_equal(bank[0], bank[-1])

    def test_source_smaller_than_model(self, tmp_path):
        d = tmp_path / "small"
        d.mkdir()
        cv2.imwrite(str(d / "f0.png"),
                    np.full((8, 10, 3), 128, np.uint8))
        bank = build_image_bank(str(d), (32, 32), num_images=2)
        assert bank.shape == (2, 32, 32, 3)

    def test_multi_split(self, frame_dir, tmp_path):
        d2 = tmp_path / "frames2"
        d2.mkdir()
        cv2.imwrite(str(d2 / "f0.png"), np.zeros((40, 40, 3), np.uint8))
        bank = build_image_bank_multi([frame_dir, str(d2)], (32, 32),
                                      num_images=5)
        assert bank.shape[0] == 5
        # Second clip's images are all-black; first clip's are noise.
        assert bank[-1].max() == 0.0 and bank[0].max() > 0.0

    def test_empty_inputs_raise(self, tmp_path):
        with pytest.raises(ValueError):
            build_image_bank_multi([], (32, 32))
        d = tmp_path / "empty"
        d.mkdir()
        (d / "x.png").write_bytes(b"")  # undecodable
        with pytest.raises((ValueError, RuntimeError, OSError)):
            build_image_bank(str(d), (32, 32), num_images=2)


class TestLoopWithBank:
    def test_stills_come_from_bank(self):
        """A constant-color bank must produce constant-color base images
        (modulo flips), proving the bank path is actually used."""
        bank = np.full((3, 32, 32, 3), 0.25, np.float32)
        keys = jax.random.split(jax.random.key(0), 4)
        stills = loop._draw_stills(keys, TCFG, bank)
        np.testing.assert_allclose(np.asarray(stills), 0.25, atol=1e-6)

    def test_train_step_with_bank(self):
        rng = np.random.default_rng(2)
        bank = rng.random((5, 32, 32, 3)).astype(np.float32)
        state = loop.init_state(TCFG, jax.random.key(0))
        for i in range(3):
            state, aux = loop.train_step(state, jax.random.key(i), TCFG,
                                         bank)
        assert np.isfinite(float(aux["total"]))
        assert int(state.step) == 3

    def test_train_entry_accepts_bank(self):
        rng = np.random.default_rng(3)
        bank = rng.random((4, 32, 32, 3)).astype(np.float32)
        cfg = TrainConfig(model=MCFG, batch_size=4, steps=2, warmup_steps=1,
                          learning_rate=1e-3, checkpoint_every=0)
        state = loop.train(cfg, log_every=0, bank=bank)
        assert int(state.step) == 2

    def test_dp_step_with_bank(self):
        from dvsg_tpu.parallel.dp import make_dp_train_step, replicate_state
        from dvsg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        if mesh.devices.size < 2:
            pytest.skip("needs a multi-device mesh")
        rng = np.random.default_rng(4)
        bank = rng.random((4, 32, 32, 3)).astype(np.float32)
        cfg = TrainConfig(model=MCFG, batch_size=8, steps=2, warmup_steps=1,
                          learning_rate=1e-3, checkpoint_every=0)
        step_fn, shard_keys = make_dp_train_step(cfg, mesh, bank=bank)
        state = replicate_state(loop.init_state(cfg, jax.random.key(0)),
                                mesh)
        state, aux = step_fn(state, shard_keys(jax.random.key(1)))
        assert np.isfinite(float(aux["total"]))


class TestCLI:
    def test_train_cli_with_data(self, frame_dir, tmp_path):
        from dvsg_tpu import cli
        out = str(tmp_path / "ckpt")
        rc = cli.train_main([
            "--checkpoint", out, "--steps", "2", "--batch-size", "2",
            "--data", frame_dir, "--data-images", "4",
            "--window", "3", "--model-size", "32", "32",
            "--grid-size", "8", "8", "--platform", "cpu"])
        assert rc == 0
        from dvsg_tpu.utils import checkpoint as ckpt
        assert ckpt.latest_step(out) == 2


class TestCropDiversity:
    def test_small_source_keeps_diversity_and_aspect(self):
        """A source below model res in ONE dimension must still yield
        diverse, aspect-true crops (review: the old full-frame branch
        squashed 426->256 and made every crop identical)."""
        from dvsg_tpu.train.data import _crop_resize
        rng = np.random.default_rng(0)
        frame = np.zeros((24, 64, 3), np.uint8)
        frame[:, ::2] = 255  # vertical stripes: squashing would alias
        crops = [_crop_resize(frame, (32, 32), rng) for _ in range(8)]
        assert all(c.shape == (32, 32, 3) for c in crops)
        # Position diversity along the wide axis.
        assert any(not np.array_equal(crops[0], c) for c in crops[1:])


class TestConfigValidation:
    def test_strength_validated_in_config(self):
        from dvsg_tpu.config import StabilizeConfig
        with pytest.raises(ValueError):
            StabilizeConfig(strength=-3.0)
        with pytest.raises(ValueError):
            StabilizeConfig(strength=2.5)
        assert StabilizeConfig(strength=1.5).strength == 1.5
