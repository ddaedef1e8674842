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


def _pack_bank(bank) -> np.ndarray:
    """Lower a full-resolution 5x5 kernel bank to packed-RGGB space.

    A 5x5 stencil evaluated at Bayer phase (ty, tx) only ever reads fixed
    phases at fixed half-resolution offsets, so the whole 12-kernel bank
    (3 colors x 4 phases) is EXACTLY a 3x3 convolution on the (H/2, W/2, 4)
    RGGB planes with 12 output channels, followed by a depth-to-space unpack.
    This keeps the TPU path on a 4->12-channel MXU conv instead of a
    1-channel full-res conv + a (N,H,W,3,4) phase-select einsum (which
    measured 163 ms at 12 MP vs ~2 ms for this form).

    Output channel order is c*4 + (ty*2+tx) so pixel_shuffle(., 2) yields
    (N, H, W, 3) BGR directly (torch PixelShuffle channel semantics).
    """
    packed = np.zeros((3, 3, 4, 12), np.float32)
    colors = ["b", "g", "r"]
    for ci, cname in enumerate(colors):
        for t, (ty, tx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            k = bank[cname][t]  # 5x5, centered
            for dy in range(-2, 3):
                for dx in range(-2, 3):
                    wgt = k[dy + 2, dx + 2]
                    if wgt == 0.0:
                        continue
                    fy, fx = ty + dy, tx + dx
                    oy, ox = fy // 2, fx // 2          # floor division
                    in_ch = (fy % 2) * 2 + (fx % 2)    # RGGB phase
                    packed[oy + 1, ox + 1, in_ch, ci * 4 + t] += wgt
    return packed


_BANKS = {
    "nearest": _bank_nearest(),
    "bilinear": _bank_bilinear(),
    "malvar": _bank_malvar(),
}


def _demosaic_conv(x: jnp.ndarray, bank) -> jnp.ndarray:
    """Demosaic via full-resolution masked stencil arithmetic.

    For each color, the four phase-specific 5x5 stencils are evaluated as
    shifted multiply-add chains over the reflect-padded mosaic (stride-1
    slices only) and blended with Bayer-parity masks.  No RGGB pack, no
    depth-to-space, no convolution: stride-2 re-interleaving is a cross-lane
    shuffle the TPU pays dearly for (a packed-conv formulation measured
    ~115 ms at 12 MP; this fully-fused VPU form is memory-bound at ~1 ms).
    Distinct stencils are shared across (color, phase) slots.
    """
    n, h, w, _ = x.shape
    xp = jnp.pad(x[..., 0], ((0, 0), (2, 2), (2, 2)), mode="reflect")
    yy = (jnp.arange(h) % 2)[:, None]
    xx = (jnp.arange(w) % 2)[None, :]
    masks = [((yy == ty) & (xx == tx)).astype(x.dtype)
             for ty, tx in ((0, 0), (0, 1), (1, 0), (1, 1))]

    cache = {}

    def stencil(k: np.ndarray):
        key = k.tobytes()
        if key in cache:
            return cache[key]
        acc = None
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                wgt = float(k[dy + 2, dx + 2])
                if wgt == 0.0:
                    continue
                piece = xp[:, 2 + dy:2 + dy + h, 2 + dx:2 + dx + w]
                term = piece if wgt == 1.0 else piece * wgt
                acc = term if acc is None else acc + term
        cache[key] = acc
        return acc

    chans = []
    for cname in ("b", "g", "r"):
        acc = None
        for t in range(4):
            term = masks[t] * stencil(bank[cname][t])
            acc = term if acc is None else acc + term
        chans.append(acc)
    return jnp.clip(jnp.stack(chans, axis=-1), 0.0, 1.0)


def demosaic_nearest(x, params=None, weights=None):
    """Reference tools_origin.py:265-286 ('nearestneighbor')."""
    return _demosaic_conv(x, _BANKS["nearest"])


def demosaic_bilinear(x, params=None, weights=None):
    """Reference tools_origin.py:445-475 ('bilinear', proxy-only there)."""
    return _demosaic_conv(x, _BANKS["bilinear"])


def demosaic_malvar(x, params=None, weights=None):
    """Reference tools_origin.py:479-509 ('laplacian', proxy-only there)."""
    return _demosaic_conv(x, _BANKS["malvar"])
