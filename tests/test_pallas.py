"""Tests for Pallas TPU kernels (interpreter mode on CPU) + latency calib."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconfigisp_tpu.ops import denoise
from reconfigisp_tpu.ops.pallas_kernels import bilateral_pallas


class TestBilateralPallas:
    def test_matches_jnp_reference(self, rng):
        x = jnp.asarray(rng.uniform(0.05, 0.95, (2, 32, 32, 3)).astype(np.float32))
        p = jnp.asarray([[0.3, 0.2, 0.5], [0.9, 0.5, 0.1]], jnp.float32)
        ref = denoise.bilateral(x, p)
        out = bilateral_pallas(x, p, strip=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_per_image_radius(self, rng):
        """Each batch element honours its own window size."""
        x = jnp.asarray(rng.uniform(0.3, 0.7, (2, 16, 16, 1)).astype(np.float32))
        p = jnp.asarray([[0.0, 0.9, 0.9], [1.0, 0.9, 0.9]], jnp.float32)
        out = np.asarray(bilateral_pallas(x, p, strip=8, interpret=True))
        # larger window smooths more
        assert out[1].std() < out[0].std()

    def test_single_channel_and_odd_strip_fallback(self, rng):
        x = jnp.asarray(rng.uniform(0.1, 0.9, (1, 24, 16, 1)).astype(np.float32))
        p = jnp.asarray([[0.5, 0.3, 0.3]], jnp.float32)
        ref = denoise.bilateral(x, p)
        out = bilateral_pallas(x, p, strip=16, interpret=True)  # 24 % 16 != 0
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestLatencyCalibration:
    def test_calibrate_and_install(self):
        from reconfigisp_tpu.utils import latency
        from reconfigisp_tpu import registry
        names = {"gamma", "skip", "wbmanual"}
        table = latency.calibrate(size=32, ops=names)
        assert set(table) == names
        assert all(v >= 0 for v in table.values())
        # snapshot EVERY op the install touches ('skip' exists in several
        # domains and shares one table entry)
        old = {}
        for domain in ("bayer", "demosaic", "srgb"):
            for spec in registry.pool(domain):
                if spec.name in names:
                    old[spec.name] = spec.latency
        try:
            latency.install(table)
            assert registry.get_op("srgb", "gamma").latency == pytest.approx(
                table["gamma"])
        finally:
            latency.install(old)
