"""Global tone-mapping ops.

The reference drives an external GlobalToneMapping kernel with options
{manual-piecewise, reinhard, crysisengine, filmic}
(reference codes/models/modules/tools_origin.py:409-631).  Here each operator
is the standard published curve, implemented natively and differentiable in
its parameters (the reference needed CNN proxies for all but the manual one).

BGR luminance weights follow ITU-R BT.601 (0.114, 0.587, 0.299).
"""

from __future__ import annotations

import jax.numpy as jnp

# numpy on purpose: a module-level jnp array initializes the device backend
# at import time (blocks on the tunnel retry loop when the TPU is down)
import numpy as _np  # noqa: E402

_LUM_BGR = _np.array([0.114, 0.587, 0.299], _np.float32)


def _luminance(x):
    return jnp.einsum("nhwc,c->nhw", x, _LUM_BGR)[..., None]  # (N,H,W,1)


def _scale_by_luminance(x, l_in, l_out):
    ratio = l_out / jnp.clip(l_in, 1e-6, None)
    return jnp.clip(x * ratio, 0.0, 1.0)


def gtm_manual(x, params, weights=None, n_seg: int = 4):
    """Piecewise-linear global tone map (reference tools_origin.py:409-440).

    params (N, n_seg-1): interior knot heights of a monotone-by-construction?
    (not enforced) piecewise-linear curve over [0, 1] with n_seg equal-width
    segments; boundary values are pinned to 0 and 1.  The reference uses one
    shared knot vector for the whole batch (params[0]); we honour per-image
    knots, which is a strict generalization (identical when rows are equal,
    as they are after the pipeline's repeat).
    """
    n = x.shape[0]
    zeros = jnp.zeros((n, 1), x.dtype)
    ones = jnp.ones((n, 1), x.dtype)
    ys = jnp.concatenate([zeros, params, ones], axis=1)  # (N, n_seg+1)
    seg = jnp.clip(jnp.floor(x * n_seg), 0, n_seg - 1).astype(jnp.int32)  # (N,H,W,C)
    y_lo = jnp.take_along_axis(ys[:, None, None, :], seg, axis=3)
    y_hi = jnp.take_along_axis(ys[:, None, None, :], seg + 1, axis=3)
    start_x = seg.astype(x.dtype) / n_seg
    out = y_lo + (x - start_x) * n_seg * (y_hi - y_lo)
    return jnp.clip(out, 0.0, 1.0)


def tone_reinhard(x, params, weights=None):
    """Extended Reinhard photographic operator (reference tools_origin.py:513-550).

    params (N, 2) in [0, 1]: [white_point, middle_grey].
      white_point  W  = 0.5 + 3.5 * p0   (curve saturates to 1 at L = W)
      middle_grey  a  = 0.05 + 0.85 * p1 (key value; log-average mapped to a)
    L' = a * L / exp(mean(log L)); Lo = L'(1 + L'/W^2) / (1 + L').
    """
    white = 0.5 + 3.5 * params[:, 0]
    key = 0.05 + 0.85 * params[:, 1]
    l_in = _luminance(x)
    log_avg = jnp.exp(jnp.mean(jnp.log(jnp.clip(l_in, 1e-6, None)),
                               axis=(1, 2, 3), keepdims=True))
    l_scaled = key[:, None, None, None] * l_in / log_avg
    w2 = (white ** 2)[:, None, None, None]
    l_out = l_scaled * (1.0 + l_scaled / w2) / (1.0 + l_scaled)
    return _scale_by_luminance(x, l_in, l_out)


def tone_crysis(x, params, weights=None):
    """CryEngine exponential operator (reference tools_origin.py:554-588).

    params (N, 1): adapted luminance p in [0, 1] mapped to exposure
    e = 0.1 + 9.9 * p;  y = 1 - exp(-e * x)  applied per channel.
    """
    expo = (0.1 + 9.9 * params[:, 0])[:, None, None, None]
    return jnp.clip(1.0 - jnp.exp(-expo * x), 0.0, 1.0)


def tone_filmic(x, params, weights=None):
    """Hable (Uncharted 2) filmic curve (reference tools_origin.py:592-630).

    params (N, 2) in [0, 1]: [white_point, exposure_bias].
      white_point  W = 0.5 + 10.5 * p0
      exposure     E = 1 + 9 * p1  (the reference maps p1 to [1, 10],
                                    tools_origin.py:613)
    hable(v) = ((v(Av+CB)+DE)/(v(Av+B)+DF)) - E/F with the published
    constants; y = hable(E * x) / hable(W).
    """
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30

    def hable(v):
        return ((v * (A * v + C * B) + D * E) / (v * (A * v + B) + D * F)) - E / F

    white = (0.5 + 10.5 * params[:, 0])[:, None, None, None]
    expo = (1.0 + 9.0 * params[:, 1])[:, None, None, None]
    y = hable(expo * x) / jnp.clip(hable(white), 1e-6, None)
    return jnp.clip(y, 0.0, 1.0)
