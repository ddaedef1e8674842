"""Demosaicing ops: nearest, bilinear, Malvar-He-Cutler (laplacian).

The reference calls an external Demosaic kernel with options
{nearestneighbor, bilinear, laplacian, demosaicnet}
(reference codes/models/modules/tools_origin.py:265-310, 445-509); bilinear and
laplacian were only searchable through CNN proxies.  Here all three classical
algorithms are implemented as one fused convolution with a 12-filter kernel
bank (3 output channels x 4 Bayer-phase types) followed by a phase-mask
select — a single MXU-friendly XLA op, exactly differentiable, no proxy
needed.  The learned `demosaicnet` option lives in ops/cnn.py.

Input: (N, H, W, 1) RGGB mosaic in [0, 1].  Output: (N, H, W, 3) BGR.
Phase types: 0 = R site (even row, even col), 1 = G1 (even, odd),
2 = G2 (odd, even), 3 = B (odd, odd).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _k(center_5x5_rows):
    a = np.zeros((5, 5), np.float32)
    a[:] = np.asarray(center_5x5_rows, np.float32)
    return a


def _delta(size=5):
    a = np.zeros((size, size), np.float32)
    a[size // 2, size // 2] = 1.0
    return a


def _offset(dy, dx, size=5):
    a = np.zeros((size, size), np.float32)
    a[size // 2 + dy, size // 2 + dx] = 1.0
    return a


# ---------------------------------------------------------------- kernel banks

def _bank_nearest():
    """Quad-aligned nearest neighbour: every 2x2 quad reuses its own R/G1/B."""
    K = {}
    K["r"] = [_delta(), _offset(0, -1), _offset(-1, 0), _offset(-1, -1)]
    K["g"] = [_offset(0, 1), _delta(), _offset(-1, 1), _offset(-1, 0)]
    K["b"] = [_offset(1, 1), _offset(1, 0), _offset(0, 1), _delta()]
    return K


def _bank_bilinear():
    h2 = _k([[0, 0, 0, 0, 0],
             [0, 0, 0, 0, 0],
             [0, .5, 0, .5, 0],
             [0, 0, 0, 0, 0],
             [0, 0, 0, 0, 0]])
    v2 = h2.T
    x4 = _k([[0, 0, 0, 0, 0],
             [0, .25, 0, .25, 0],
             [0, 0, 0, 0, 0],
             [0, .25, 0, .25, 0],
             [0, 0, 0, 0, 0]])
    cross4 = _k([[0, 0, 0, 0, 0],
                 [0, 0, .25, 0, 0],
                 [0, .25, 0, .25, 0],
                 [0, 0, .25, 0, 0],
                 [0, 0, 0, 0, 0]])
    K = {}
    K["r"] = [_delta(), h2, v2, x4]
    K["g"] = [cross4, _delta(), _delta(), cross4]
    K["b"] = [x4, v2, h2, _delta()]
    return K


def _bank_malvar():
    """Malvar-He-Cutler 2004 gradient-corrected linear kernels (the
    'laplacian' option of the reference's external kernel)."""
    g_at_rb = _k([[0, 0, -1, 0, 0],
                  [0, 0, 2, 0, 0],
                  [-1, 2, 4, 2, -1],
                  [0, 0, 2, 0, 0],
                  [0, 0, -1, 0, 0]]) / 8.0
    # chroma at green site, same-row chroma neighbours
    row_k = _k([[0, 0, .5, 0, 0],
                [0, -1, 0, -1, 0],
                [-1, 4, 5, 4, -1],
                [0, -1, 0, -1, 0],
                [0, 0, .5, 0, 0]]) / 8.0
    col_k = row_k.T
    diag_k = _k([[0, 0, -1.5, 0, 0],
                 [0, 2, 0, 2, 0],
                 [-1.5, 0, 6, 0, -1.5],
                 [0, 2, 0, 2, 0],
                 [0, 0, -1.5, 0, 0]]) / 8.0
    K = {}
    K["r"] = [_delta(), row_k, col_k, diag_k]
    K["g"] = [g_at_rb, _delta(), _delta(), g_at_rb]
    K["b"] = [diag_k, col_k, row_k, _delta()]
    return K


def _stack_bank(bank) -> np.ndarray:
    """-> (5, 5, 1, 12) filter: channel layout [b0..b3, g0..g3, r0..r3]
    so the select below directly emits BGR."""
    mats = bank["b"] + bank["g"] + bank["r"]
    return np.stack(mats, axis=-1)[:, :, None, :]


_BANKS = {
    "nearest": jnp.asarray(_stack_bank(_bank_nearest())),
    "bilinear": jnp.asarray(_stack_bank(_bank_bilinear())),
    "malvar": jnp.asarray(_stack_bank(_bank_malvar())),
}


def _phase_onehot(h: int, w: int) -> jnp.ndarray:
    """(H, W, 4) one-hot Bayer phase masks."""
    ys = jnp.arange(h) % 2
    xs = jnp.arange(w) % 2
    phase = ys[:, None] * 2 + xs[None, :]  # (H, W) in {0..3}
    return (phase[..., None] == jnp.arange(4)).astype(jnp.float32)


def _demosaic_conv(x: jnp.ndarray, bank: jnp.ndarray) -> jnp.ndarray:
    n, h, w, _ = x.shape
    # Reflect-pad by 2 (an even amount preserves Bayer phase parity) so border
    # pixels interpolate from mirrored neighbours instead of zeros.
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    # HIGHEST precision: the environment's default matmul precision is bf16
    # (TPU-style); interpolation kernels must be exact f32.
    y = lax.conv_general_dilated(
        xp, bank, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (N, H, W, 12)
    ph = _phase_onehot(h, w)  # (H, W, 4)
    y = y.reshape(n, h, w, 3, 4)
    out = jnp.einsum("nhwcp,hwp->nhwc", y, ph,
                     preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)
    return jnp.clip(out, 0.0, 1.0)


def demosaic_nearest(x, params=None, weights=None):
    """Reference tools_origin.py:265-286 ('nearestneighbor')."""
    return _demosaic_conv(x, _BANKS["nearest"])


def demosaic_bilinear(x, params=None, weights=None):
    """Reference tools_origin.py:445-475 ('bilinear', proxy-only there)."""
    return _demosaic_conv(x, _BANKS["bilinear"])


def demosaic_malvar(x, params=None, weights=None):
    """Reference tools_origin.py:479-509 ('laplacian', proxy-only there)."""
    return _demosaic_conv(x, _BANKS["malvar"])
