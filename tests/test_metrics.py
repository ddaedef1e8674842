"""PSNR/SSIM metric properties and analytic cases (reference
util_path_restore.py:6-44 relies on skimage, absent here — the on-device
forms must stand on their own numbers)."""

import numpy as np
import jax.numpy as jnp

from reconfigisp_tpu.utils.metrics import psnr, ssim


class TestPsnr:
    def test_known_value(self):
        x = jnp.zeros((1, 8, 8, 3))
        y = jnp.full((1, 8, 8, 3), 0.1)
        # MSE = 0.01 -> PSNR = 10*log10(1/0.01) = 20 dB
        np.testing.assert_allclose(float(psnr(x, y)[0]), 20.0, atol=1e-4)

    def test_batch_shape(self):
        x = jnp.zeros((3, 8, 8, 3))
        assert psnr(x, x + 0.1).shape == (3,)


class TestSsim:
    def test_identity_is_one(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (2, 24, 24, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-5)

    def test_constant_images_analytic(self):
        """Zero-variance images reduce SSIM to the luminance term
        (2*mx*my + C1)/(mx^2 + my^2 + C1) (Wang et al. 2004 eq. 13)."""
        mx, my = 0.3, 0.7
        c1 = 0.01 ** 2
        expect = (2 * mx * my + c1) / (mx ** 2 + my ** 2 + c1)
        x = jnp.full((1, 16, 16, 1), mx)
        y = jnp.full((1, 16, 16, 1), my)
        # atol 1e-4: f32 cancellation in filt(x*x) - mu^2 at zero variance
        np.testing.assert_allclose(float(ssim(x, y)[0]), expect, atol=1e-4)

    def test_monotone_in_noise(self):
        rng = np.random.default_rng(1)
        x = np.clip(rng.uniform(0.2, 0.8, (1, 32, 32, 3)), 0, 1).astype(np.float32)
        vals = []
        for s in (0.01, 0.05, 0.2):
            y = np.clip(x + rng.normal(0, s, x.shape), 0, 1).astype(np.float32)
            vals.append(float(ssim(jnp.asarray(x), jnp.asarray(y))[0]))
        assert vals[0] > vals[1] > vals[2]
        assert all(-1.0 <= v <= 1.0 for v in vals)
