"""Golden tests for the differentiable color/tone op zoo.

Identity-parameter checks mirror the reference's manual __main__ numeric
checks (reference tools_origin.py:807-857) but are automated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconfigisp_tpu.ops import color, tone


def _p(n, vals):
    return jnp.broadcast_to(jnp.asarray(vals, jnp.float32)[None, :],
                            (n, len(vals)))


class TestGamma:
    def test_identity_at_half(self, bgr_batch):
        out = color.gamma(bgr_batch, _p(2, [0.5]))
        np.testing.assert_allclose(out, bgr_batch, atol=1e-5)

    def test_monotone_param(self, bgr_batch):
        bright = color.gamma(bgr_batch, _p(2, [0.0]))  # exponent 1/3 -> brighter
        dark = color.gamma(bgr_batch, _p(2, [1.0]))    # exponent 3 -> darker
        assert float(jnp.mean(dark)) < float(jnp.mean(bgr_batch))
        assert float(jnp.mean(bright)) > float(jnp.mean(bgr_batch))

    def test_grad_flows(self, bgr_batch):
        g = jax.grad(lambda p: jnp.sum(color.gamma(bgr_batch, p)))(_p(2, [0.3]))
        assert float(jnp.abs(g).sum()) > 0


class TestWhiteBalance:
    def test_wb_manual_identity(self, bgr_batch):
        # gain 1.0 at params 0.2 (sigmoid of the reference's -1.38 init)
        out = color.wb_manual(bgr_batch, _p(2, [0.2, 0.2, 0.2]))
        np.testing.assert_allclose(out, bgr_batch, atol=1e-6)

    def test_wb_manual_scales_channels(self, bgr_batch):
        out = color.wb_manual(bgr_batch, _p(2, [0.1, 0.2, 0.4]))
        np.testing.assert_allclose(out[..., 0], bgr_batch[..., 0] * 0.5, atol=1e-5)
        np.testing.assert_allclose(out[..., 2],
                                   np.clip(bgr_batch[..., 2] * 2.0, 0, 1), atol=1e-5)

    def test_grayworld_balances_means(self, rng):
        x = rng.uniform(0.1, 0.5, (1, 16, 16, 3)).astype(np.float32)
        x[..., 2] *= 1.8  # strong red cast
        out = np.asarray(color.grayworld(jnp.asarray(x)))
        means = out.mean(axis=(0, 1, 2))
        assert np.std(means) < 0.01

    def test_wb_quadratic_identity(self, bgr_batch):
        vals = [0.5] * 30
        vals[6] = vals[17] = vals[28] = 0.6  # linear diag -> coefficient 1.0
        out = color.wb_quadratic(bgr_batch, _p(2, vals))
        np.testing.assert_allclose(out, bgr_batch, atol=1e-5)

    def test_whiteworld_scales_to_white(self, rng):
        x = (rng.uniform(0.0, 0.5, (1, 16, 16, 3))).astype(np.float32)
        out = np.asarray(color.wb_whiteworld(jnp.asarray(x), _p(1, [0.0])))
        # with ratio 0 the max of each channel maps to ~1
        np.testing.assert_allclose(out.max(axis=(0, 1, 2)), 1.0, atol=1e-3)


class TestTone:
    def test_gtm_identity(self, bgr_batch):
        out = tone.gtm_manual(bgr_batch, _p(2, [0.25, 0.5, 0.75]))
        np.testing.assert_allclose(out, bgr_batch, atol=1e-5)

    def test_gtm_matches_reference_semantics(self):
        """Per-segment linear map with pinned endpoints
        (reference tools_origin.py:425-438)."""
        x = jnp.asarray([[0.1, 0.3, 0.6, 0.9]], jnp.float32)
        x = x.reshape(1, 1, 4, 1)
        knots = _p(1, [0.4, 0.5, 0.6])
        out = np.asarray(tone.gtm_manual(x, knots)).ravel()
        # segment 0: [0,0.25]->[0,0.4]; x=0.1 -> 0.16
        np.testing.assert_allclose(out[0], 0.16, atol=1e-5)
        # segment 1: [0.25,0.5]->[0.4,0.5]; x=0.3 -> 0.42
        np.testing.assert_allclose(out[1], 0.42, atol=1e-5)
        # segment 2: [0.5,0.75]->[0.5,0.6]; x=0.6 -> 0.54
        np.testing.assert_allclose(out[2], 0.54, atol=1e-5)
        # segment 3: [0.75,1]->[0.6,1]; x=0.9 -> 0.84
        np.testing.assert_allclose(out[3], 0.84, atol=1e-5)

    @pytest.mark.parametrize("fn,nparams", [
        (tone.tone_reinhard, 2), (tone.tone_crysis, 1), (tone.tone_filmic, 2)])
    def test_tone_ops_bounded_and_differentiable(self, bgr_batch, fn, nparams):
        p = _p(2, [0.5] * nparams)
        out = fn(bgr_batch, p)
        assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 1
        g = jax.grad(lambda q: jnp.sum(fn(bgr_batch, q)))(p)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_crysis_curve_value(self):
        x = jnp.full((1, 2, 2, 3), 0.5, jnp.float32)
        p = _p(1, [0.5])  # exposure = 0.1 + 9.9*0.5 = 5.05
        out = np.asarray(tone.tone_crysis(x, p))
        np.testing.assert_allclose(out, 1.0 - np.exp(-5.05 * 0.5), atol=1e-5)


class TestSkip:
    def test_identity(self, bgr_batch):
        np.testing.assert_array_equal(color.skip(bgr_batch), bgr_batch)
