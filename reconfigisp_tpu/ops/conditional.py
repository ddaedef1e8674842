"""Histogram-conditioned ops: per-image parameters predicted by a tiny FC net.

Re-design of ConditionalModuleBGR + ConditionalGamma/WbManual/WbQuadratic
(reference codes/models/modules/tools_origin.py:77-163,167-197,229-253,363-406).
The FC net's weights themselves are the op's searchable parameter vector: a
single flat vector holding all layer weights/biases plus a global bias on the
predicted per-image parameters.  Unlike ordinary ops, conditional parameters
are used raw (no sigmoid squash, no batch repeat — reference
isp_universal.py:222-224); the sigmoid is applied to the FC output instead.

Histograms are computed with a one-hot matmul (MXU-friendly) and
stop-gradiented, mirroring the reference's detached torch.histc
(tools_origin.py:119-129).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from reconfigisp_tpu.ops import color


def conditional_n_params(in_channels: tuple, out_channel: int) -> int:
    """Total flat-parameter count (reference tools_origin.py:94-101)."""
    dims = list(in_channels) + [out_channel]
    total = 0
    for i in range(len(dims) - 1):
        total += dims[i] * dims[i + 1] + dims[i + 1]
    return total + out_channel


def _channel_histograms(x, bins: int):
    """(N,H,W,3) -> (N, 3*bins) stop-gradiented per-channel histograms."""
    edges_idx = jnp.clip(jnp.floor(x * bins), 0, bins - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(edges_idx, bins, dtype=x.dtype)  # (N,H,W,3,bins)
    hist = jnp.sum(onehot, axis=(1, 2))  # (N, 3, bins)
    hist = hist.reshape(x.shape[0], -1)  # (N, 3*bins)
    return lax.stop_gradient(hist)


def fc_forward(x, flat_params, in_channels: tuple, out_channel: int):
    """Predict per-image op parameters in [0, 1]
    (reference tools_origin.py:109-163)."""
    bins = in_channels[0] // 3
    feat = _channel_histograms(x, bins)
    dims = list(in_channels) + [out_channel]
    idx = 0
    for i in range(len(dims) - 1):
        cin, cout = dims[i], dims[i + 1]
        w = flat_params[idx:idx + cin * cout].reshape(cin, cout)
        idx += cin * cout
        b = flat_params[idx:idx + cout]
        idx += cout
        feat = feat @ w + b
        if i != len(dims) - 2:
            feat = jax.nn.relu(feat)
    glob = flat_params[idx:idx + out_channel]
    return jax.nn.sigmoid(glob[None, :] + feat)  # (N, out_channel)


def make_conditional(base_apply, out_channel: int, in_channels: tuple):
    """Wrap a base op so its per-image params come from the FC net."""

    def apply(x, params, weights=None):
        # params: (total_params,) raw flat vector (or (N, total) — row 0 used,
        # as the vector is shared across the batch).
        flat = params if params.ndim == 1 else params[0]
        per_image = fc_forward(x, flat, in_channels, out_channel)
        return base_apply(x, per_image, weights)

    return apply


# Default layer widths; callers may rebuild with custom in_channels via
# make_conditional (the reference passes them through YAML kwargs,
# isp_universal.py:54-58).
DEFAULT_IN_CHANNELS = (24, 16)

conditional_gamma = make_conditional(color.gamma, 1, DEFAULT_IN_CHANNELS)
conditional_wb_manual = make_conditional(color.wb_manual, 3, DEFAULT_IN_CHANNELS)
conditional_wb_quadratic = make_conditional(color.wb_quadratic, 30, DEFAULT_IN_CHANNELS)
