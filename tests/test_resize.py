"""Matrix-form resize (ops/resize.py) vs jax.image.resize — exact parity.

The matrices are extracted from jax.image.resize itself, so any mismatch
means the linear-operator assumption broke (it cannot: bilinear resize,
antialiased or not, is linear and separable)."""

import numpy as np
import jax
import jax.numpy as jnp

from dvsg_tpu.ops import resize as resize_ops


def _ref(x, oh, ow):
    *lead, h, w, c = x.shape
    return jax.image.resize(x, (*lead, oh, ow, c), method="bilinear")


class TestMatrixResize:
    def test_downscale_matches_image_resize(self, rng):
        x = jnp.asarray(rng.random((2, 96, 160, 3), dtype=np.float32))
        got = resize_ops.downscale_bilinear(x, 32, 48)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_ref(x, 32, 48)),
                                   atol=2e-5)

    def test_upscale_matches_image_resize(self, rng):
        x = jnp.asarray(rng.random((1, 6, 8, 2), dtype=np.float32))
        got = resize_ops.downscale_bilinear(x, 48, 64)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_ref(x, 48, 64)),
                                   atol=2e-5)

    def test_norm_fold_matches_composed(self, rng):
        x8 = jnp.asarray(rng.integers(0, 256, (2, 64, 96, 3),
                                      dtype=np.uint8))
        got = resize_ops.downscale_norm(x8, 24, 40)
        want = _ref(x8.astype(jnp.float32) / 255.0, 24, 40) - 0.5
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_identity_size_is_identity(self, rng):
        x = jnp.asarray(rng.random((1, 16, 128, 1), dtype=np.float32))
        got = resize_ops.downscale_bilinear(x, 16, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                                   atol=1e-6)
