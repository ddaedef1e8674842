"""Tests for Pallas TPU kernels (interpreter mode on CPU) + latency calib."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconfigisp_tpu.ops import denoise
from reconfigisp_tpu.ops.pallas_kernels import (
    bilateral_pallas, median_pallas, fastnlm_pallas)


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


class TestMedianPallas:
    def test_matches_jnp_reference(self, rng):
        """Bisection median vs exact sort median (precision 2^-14 of range)."""
        x = jnp.asarray(rng.uniform(0.05, 0.95, (2, 32, 32, 3)).astype(np.float32))
        p = jnp.asarray([[0.3], [0.3]], jnp.float32)
        ref = denoise._median_jnp(x, p)
        out = median_pallas(x, p, strip=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_impulse_removed(self, rng):
        x = np.full((1, 16, 16, 1), 0.5, np.float32)
        x[0, 8, 8, 0] = 1.0
        out = np.asarray(median_pallas(
            jnp.asarray(x), jnp.asarray([[0.0]], jnp.float32),
            strip=8, interpret=True))
        np.testing.assert_allclose(out, 0.5, atol=1e-4)


class TestFastnlmPallas:
    def test_matches_jnp_interior(self, rng):
        """Box-padding semantics differ at the frame border (kernel boxes
        reflected-image diffs, jnp boxes reflected diffs); interiors match."""
        x = jnp.asarray(rng.uniform(0.05, 0.95, (2, 32, 32, 3)).astype(np.float32))
        p = jnp.asarray([[0.15, 0.3, 0.3], [0.15, 0.6, 0.5]], jnp.float32)
        ref = denoise._fastnlm_jnp(x, p)
        out = fastnlm_pallas(x, p, strip=16, interpret=True)
        m = 10
        np.testing.assert_allclose(np.asarray(out)[:, m:-m, m:-m],
                                   np.asarray(ref)[:, m:-m, m:-m], atol=2e-5)

    def test_denoises(self, rng):
        clean = np.full((1, 16, 16, 1), 0.5, np.float32)
        noisy = np.clip(clean + rng.normal(0, 0.08, clean.shape)
                        .astype(np.float32), 0, 1)
        out = np.asarray(fastnlm_pallas(
            jnp.asarray(noisy), jnp.asarray([[0.1, 0.5, 0.3]], jnp.float32),
            strip=8, interpret=True))
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean() * 0.6


class TestHybridDispatch:
    def test_small_or_cpu_uses_jnp(self, rng):
        """On CPU the dispatcher must never pick the Pallas path."""
        x = jnp.asarray(rng.uniform(0.1, 0.9, (1, 1024, 1024, 3))
                        .astype(np.float32)[:, :16, :16])
        assert not denoise._use_pallas(x)

    def test_grads_flow_through_dispatcher(self, rng):
        x = jnp.asarray(rng.uniform(0.1, 0.9, (1, 16, 16, 3)).astype(np.float32))
        p = jnp.asarray([[0.3, 0.2, 0.5]], jnp.float32)
        g = jax.grad(lambda p_: jnp.sum(denoise.bilateral(x, p_)))(p)
        assert np.isfinite(np.asarray(g)).all()
        gx = jax.grad(lambda x_: jnp.sum(denoise.fastnlm(x_, p)))(x)
        assert np.isfinite(np.asarray(gx)).all()


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
