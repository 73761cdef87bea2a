"""Pin the warp oracle's semantics against torch.grid_sample and OpenCV.

SURVEY.md §4: the reference mount is empty, so fidelity is defined against
independent third-party oracles — torch (CPU) grid_sample with
align_corners=True / padding_mode='border', and cv2.warpAffine.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvsg_tpu.ops import grid as grid_ops
from dvsg_tpu.ops.warp_ref import bilinear_warp, bilinear_warp_batch


def _rand_frame(rng, h, w, c=3):
    return rng.random((h, w, c), dtype=np.float32)


def _rand_grid(rng, h, w, scale=0.2):
    base = np.asarray(grid_ops.identity_grid(h, w))
    off = (rng.random((h, w, 2), dtype=np.float32) - 0.5) * scale
    return base + off


class TestIdentity:
    def test_identity_grid_is_noop(self, rng):
        frame = _rand_frame(rng, 33, 47)
        g = grid_ops.identity_grid(33, 47)
        out = np.asarray(bilinear_warp(jnp.asarray(frame), g))
        np.testing.assert_allclose(out, frame, atol=1e-5)

    def test_identity_grid_range(self):
        g = np.asarray(grid_ops.identity_grid(8, 16))
        assert g[0, 0, 0] == -1.0 and g[0, -1, 0] == 1.0
        assert g[0, 0, 1] == -1.0 and g[-1, 0, 1] == 1.0


class TestTorchParity:
    @pytest.mark.parametrize("h,w", [(16, 16), (17, 31), (64, 48)])
    @pytest.mark.parametrize("scale", [0.1, 0.5, 3.0])  # 3.0 → out of range
    def test_matches_grid_sample(self, rng, h, w, scale):
        import torch
        import torch.nn.functional as F

        frame = _rand_frame(rng, h, w)
        grid = _rand_grid(rng, h, w, scale)

        ours = np.asarray(bilinear_warp(jnp.asarray(frame), jnp.asarray(grid)))

        t_in = torch.from_numpy(frame).permute(2, 0, 1)[None]      # (1,C,H,W)
        t_grid = torch.from_numpy(grid)[None]                      # (1,H,W,2)
        t_out = F.grid_sample(t_in, t_grid, mode="bilinear",
                              padding_mode="border", align_corners=True)
        theirs = t_out[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_grad_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F

        h, w = 12, 14
        frame = _rand_frame(rng, h, w, c=1)
        grid = _rand_grid(rng, h, w, 0.3)

        def loss_j(g):
            return jnp.sum(bilinear_warp(jnp.asarray(frame), g) ** 2)

        g_jax = np.asarray(jax.grad(loss_j)(jnp.asarray(grid)))

        t_in = torch.from_numpy(frame).permute(2, 0, 1)[None]
        t_grid = torch.from_numpy(grid)[None].requires_grad_(True)
        out = F.grid_sample(t_in, t_grid, mode="bilinear",
                            padding_mode="border", align_corners=True)
        (out ** 2).sum().backward()
        g_torch = t_grid.grad[0].numpy()
        # Gradients differ only at exact integer coords (measure-zero ties).
        np.testing.assert_allclose(g_jax, g_torch, atol=1e-4)


class TestAffineVsOpenCV:
    def test_matches_warpaffine(self, rng):
        import cv2

        h, w = 40, 56
        frame = _rand_frame(rng, h, w)
        # Small rotation + translation, in pixel coords.
        ang = np.deg2rad(3.0)
        tx_px, ty_px = 1.5, -2.25
        ca, sa = np.cos(ang), np.sin(ang)

        # cv2.warpAffine with WARP_INVERSE_MAP: dst(p) = src(M @ p).
        m_px = np.array([[ca, -sa, tx_px], [sa, ca, ty_px]], np.float32)
        ref = cv2.warpAffine(
            frame, m_px, (w, h),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_REPLICATE)

        # Same map converted to normalized align_corners=True units.
        sx, sy = 2.0 / (w - 1), 2.0 / (h - 1)
        theta = np.array([
            [ca, -sa * sx / sy, sx * (tx_px + (ca - 1) * (w - 1) / 2
                                      - sa * (h - 1) / 2) + 0.0],
            [sa * sy / sx, ca, sy * (ty_px + sa * (w - 1) / 2
                                     + (ca - 1) * (h - 1) / 2) + 0.0],
        ], np.float32)
        g = grid_ops.affine_grid(jnp.asarray(theta), h, w)
        ours = np.asarray(bilinear_warp(jnp.asarray(frame), g))

        # Interior only: cv2 replicates borders identically but rounds
        # coordinates differently at the very edge.
        np.testing.assert_allclose(ours[3:-3, 3:-3], ref[3:-3, 3:-3],
                                   atol=2e-4)


class TestBatchAndDtype:
    def test_batch_matches_single(self, rng):
        frames = np.stack([_rand_frame(rng, 20, 24) for _ in range(3)])
        grids = np.stack([_rand_grid(rng, 20, 24) for _ in range(3)])
        batch = np.asarray(
            bilinear_warp_batch(jnp.asarray(frames), jnp.asarray(grids)))
        for i in range(3):
            single = np.asarray(
                bilinear_warp(jnp.asarray(frames[i]), jnp.asarray(grids[i])))
            np.testing.assert_allclose(batch[i], single, atol=1e-6)

    def test_bf16_payload_f32_interp(self, rng):
        frame = _rand_frame(rng, 32, 32)
        grid = _rand_grid(rng, 32, 32)
        out_bf = bilinear_warp(jnp.asarray(frame, jnp.bfloat16),
                               jnp.asarray(grid))
        assert out_bf.dtype == jnp.bfloat16
        out_f32 = np.asarray(bilinear_warp(jnp.asarray(frame),
                                           jnp.asarray(grid)))
        np.testing.assert_allclose(np.asarray(out_bf, np.float32), out_f32,
                                   atol=1e-2)
