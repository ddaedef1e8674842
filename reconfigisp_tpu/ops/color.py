"""Color ops: gamma and the white-balance family.

All ops take NHWC BGR images in [0, 1] and per-image parameter vectors
`params` of shape (N, P) with every entry already squashed into [0, 1]
(the pipeline applies sigmoid to the stored logits before dispatch,
mirroring reference super_prune_fifteen_demos_four_bayer_two.py:206-210).

The reference wraps external, unshipped C kernels
(reference codes/models/modules/tools_origin.py:8-17); here every algorithm is
implemented natively in JAX and is differentiable in its parameters, which
removes the need for CNN proxies on these ops (proxies are still provided
for capability parity — see ops/proxy.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

GAMMA_MAX = 3.0  # params01=0.5 -> gamma 1.0 (identity); range [1/3, 3]


def gamma(x, params, weights=None):
    """Manual gamma curve (reference tools_origin.py:48-73).

    params (N, 1) in [0, 1]: mapped log-uniformly to an exponent in
    [1/GAMMA_MAX, GAMMA_MAX]; 0.5 is the identity.  y = x ** exponent.
    """
    exponent = GAMMA_MAX ** (2.0 * params[:, 0] - 1.0)  # (N,)
    xc = jnp.clip(x, 1e-8, 1.0)
    return xc ** exponent[:, None, None, None]


def grayworld(x, params=None, weights=None):
    """Gray-world white balance (reference tools_origin.py:22-45); no params.

    Scales each channel so its mean matches the global mean; gains are
    stop-gradiented statistics (the reference's kernel is param-free).
    Output clipped to [0, 1].
    """
    ch_mean = jnp.mean(x, axis=(1, 2), keepdims=True)  # (N,1,1,3)
    target = jnp.mean(ch_mean, axis=3, keepdims=True)
    gain = target / jnp.clip(ch_mean, 1e-6, None)
    gain = lax.stop_gradient(gain)
    return jnp.clip(x * gain, 0.0, 1.0)


def wb_manual(x, params, weights=None):
    """Per-channel gain white balance (reference tools_origin.py:200-225).

    params (N, 3) in [0, 1] -> gains in [0, 5] (0.2 is the identity; the
    reference's default logit -1.38 sigmoids to 0.2 — super_prune...py:131).
    """
    gain = params * 5.0  # (N, 3)
    return jnp.clip(x * gain[:, None, None, :], 0.0, 1.0)


def wb_whiteworld(x, params, weights=None):
    """White-world (white-patch) WB (reference tools_origin.py:634-669).

    params (N, 1): white-point ratio r in [0, 1].  Each channel's
    (1 - r/2)-quantile is taken as the channel's white point and scaled
    to 1.  The quantile itself is a non-differentiable order statistic and
    is stop-gradiented; the gradient path to r flows through the gain
    interpolation below, so the op is searchable without a proxy.
    """
    n, h, w, c = x.shape
    ratio = params[:, 0]  # (N,)
    flat = x.reshape(n, h * w, c)
    srt = jnp.sort(flat, axis=1)  # ascending
    # index of the white point: top `ratio/2` fraction treated as outliers
    q = 1.0 - 0.5 * ratio  # in [0.5, 1]
    pos = q * (h * w - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, h * w - 1)
    frac = pos - lo.astype(pos.dtype)
    v_lo = jnp.take_along_axis(srt, lo[:, None, None].repeat(c, 2), axis=1)[:, 0]
    v_hi = jnp.take_along_axis(srt, hi[:, None, None].repeat(c, 2), axis=1)[:, 0]
    white = lax.stop_gradient(v_lo) * (1 - frac[:, None]) + lax.stop_gradient(v_hi) * frac[:, None]
    gain = 1.0 / jnp.clip(white, 1e-3, None)  # (N, 3)
    return jnp.clip(x * gain[:, None, None, :], 0.0, 1.0)


def wb_quadratic(x, params, weights=None):
    """Quadratic color-basis transform (reference tools_origin.py:313-359).

    params (N, 30) in [0, 1] -> coefficients in [-5, 5].  The 10 channel
    basis is (B^2, G^2, R^2, BG, BR, GR, B, G, R, 1) and coefficients map it
    to 3 output channels; identity when the linear diagonal is 1
    (reference init logit 0.406 -> sigmoid 0.6 -> coeff 1.0).
    Implemented as a fused elementwise polynomial: a K=10 einsum materializes
    a (N,H,W,10) basis (~0.5 GB at 12 MP) through HBM and ran 10 ms/frame on
    v5e; the scalar-coefficient form fuses into one pass over x (<1 ms).
    """
    coef = params * 10.0 - 5.0  # (N, 30)
    coef = coef.reshape(-1, 3, 10)  # (N, 3, 10)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    outs = []
    for c in range(3):
        cc = [coef[:, c, k][:, None, None] for k in range(10)]
        yc = (cc[0] * b * b + cc[1] * g * g + cc[2] * r * r
              + cc[3] * b * g + cc[4] * b * r + cc[5] * g * r
              + cc[6] * b + cc[7] * g + cc[8] * r + cc[9])
        outs.append(yc)
    return jnp.clip(jnp.stack(outs, axis=-1), 0.0, 1.0)


def skip(x, params=None, weights=None):
    """Identity (reference tools_origin.py:256-262)."""
    return x
