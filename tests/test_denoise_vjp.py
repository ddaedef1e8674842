"""Strip-recomputed VJP for the windowed denoise ops (ops/denoise.py).

The Pallas-forward hybrids backprop through the jnp implementation; at the
frame sizes where the Pallas forward is chosen the direct jnp backward does
not fit in HBM, so large frames use an exact strip-by-strip VJP.  These
tests pin strip VJP == direct VJP to float tolerance, including the
reflect-edge folding, for all three ops and odd strip splits."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reconfigisp_tpu.ops import denoise


def _direct_vjp(fn, x, params, g):
    _, vjp = jax.vjp(fn, x, params)
    return vjp(g)


# (name, fn, halo, h, params) — h chosen so h > strip + 2*halo (the chunked
# path actually runs, not the small-frame direct fallback) and h is NOT a
# multiple of the strip (partial last chunk)
CASES = [
    ("bilateral", denoise._bilateral_jnp, denoise._MAX_R, 48,
     [0.4, 0.3, 0.5]),
    ("median", denoise._median_jnp, denoise._MAX_R, 48, [0.35]),
    ("fastnlm", denoise._fastnlm_jnp, 2 * denoise._MAX_R, 76,
     [0.2, 0.5, 0.4]),
]


@pytest.mark.parametrize("name,fn,halo,h,p", CASES,
                         ids=[c[0] for c in CASES])
def test_strip_vjp_matches_direct(name, fn, halo, h, p):
    rng = np.random.default_rng(0)
    w = 40
    assert h > 20 + 2 * halo  # chunked path engaged
    x = jnp.asarray(rng.uniform(0.1, 0.9, (1, h, w, 3)), jnp.float32)
    params = jnp.asarray([p], jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (1, h, w, 3)), jnp.float32)

    gx_d, gp_d = _direct_vjp(fn, x, params, g)
    gx_s, gp_s = denoise._strip_vjp(fn, halo, x, params, g, strip=20)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_d),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_d),
                               rtol=2e-4, atol=2e-5)


def test_strip_vjp_exact_strip_multiple():
    """h an exact multiple of strip (no zero-pad tail)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (2, 32, 24, 3)), jnp.float32)
    params = jnp.asarray(np.tile([0.6, 0.4, 0.3], (2, 1)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (2, 32, 24, 3)), jnp.float32)
    gx_d, gp_d = _direct_vjp(denoise._bilateral_jnp, x, params, g)
    gx_s, gp_s = denoise._strip_vjp(denoise._bilateral_jnp, denoise._MAX_R,
                                    x, params, g, strip=16)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_d),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_d),
                               rtol=2e-4, atol=2e-5)


def test_large_frame_grad_bounded_memory():
    """jax.grad of a 1024x1024 bilateral routes through the strip VJP and
    completes (the direct tap-scan backward at this size is the documented
    HBM trap).  Runs the strip path explicitly since the Pallas hybrid only
    engages on TPU."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0.2, 0.8, (1, 1024, 128, 1)), jnp.float32)
    params = jnp.asarray([[0.1, 0.5, 0.5]], jnp.float32)
    g = jnp.ones((1, 1024, 128, 1), jnp.float32)
    assert x.shape[1] > denoise._VJP_DIRECT_ROWS  # would take the strip path
    gx, gp = denoise._strip_vjp(denoise._bilateral_jnp, denoise._MAX_R,
                                x, params, g)
    assert bool(jnp.isfinite(gx).all()) and bool(jnp.isfinite(gp).all())
    assert float(jnp.abs(gx).sum()) > 0
