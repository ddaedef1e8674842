"""Learned CNN modules: SRCNN-Res proxies, SRCNN demosaic, Path-Restore-14L.

Functional re-designs of the reference's four conv architectures
(reference codes/models/modules/srcnn_res_arch.py, srcnn_demosaic_arch.py,
path_14l_bayer_arch.py, path_14l_bgr_arch.py).  Weights are plain pytrees;
`init_*` builds them, `apply_*` is pure and jittable.  All activations NHWC.

Parameter conditioning: per-image scalar params are broadcast to constant
feature planes and concatenated to the input (srcnn_res_arch.py:45-47).
To enable the supernet's fused proxy bank (see supernet.py), SRCNN-Res
weights are always allocated for MAX_PROXY_PARAMS conditioning channels;
unused channels are zero so narrower ops are bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reconfigisp_tpu.ops.nn import (
    conv2d, init_conv, pixel_shuffle, bayer_to_rggb, broadcast_params,
)
from reconfigisp_tpu.precision import cnn_storage_dtype


def _conv_s(x, w, b):
    """conv2d honoring the precision policy: bf16 storage halves the HBM
    traffic that dominates these stacks at 12 MP (precision.py)."""
    dt = cnn_storage_dtype()
    if dt == jnp.float32:
        return conv2d(x, w, b)
    return conv2d(x, w, b, compute_dtype=dt).astype(dt)

MAX_PROXY_PARAMS = 5  # widest proxy is bm3d with 5 params (super_prune...py:46)

# Performance note (v5e, measured): the 13x conv3x3/64ch stack runs at
# ~57 TFLOP/s in plain XLA with bf16 storage (precision.py) — ~4 ms/conv at
# 12 MP.  A fused Pallas version was built and benchmarked: rank-3
# dot_general does not lower onto the MXU (remote Mosaic compiler OOM-kill),
# and the compiling rank-2 variant needed a 100 MB VMEM override yet reached
# only ~12 TFLOP/s.  With conv FLOPs bounded by 64-channel MXU lane packing
# either way, the XLA path wins; the Pallas budget goes to the windowed
# denoise ops instead (ops/pallas_kernels.py), where XLA has no good form.


# ------------------------------------------------------------------ SRCNN-Res

def init_srcnn_res(key, n_params: int) -> dict:
    """3-conv residual SRCNN conditioned on image stats + params
    (reference srcnn_res_arch.py:13-24: conv9x9/64, conv5x5/32, conv5x5/3).

    Input channels: 3 (BGR) + 9 (per-channel min/mean/max) + MAX_PROXY_PARAMS.
    Weight columns for conditioning channels beyond `n_params` are zeroed so
    the padded layout is functionally identical to a (3+9+n_params)-channel net.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    cin = 3 + 9 + MAX_PROXY_PARAMS
    p = {
        "conv1": init_conv(k1, 9, 9, cin, 64),
        "conv2": init_conv(k2, 5, 5, 64, 32),
        "conv3": init_conv(k3, 5, 5, 32, 3),
    }
    used = 3 + 9 + n_params
    mask = jnp.arange(cin) < used
    p["conv1"]["w"] = p["conv1"]["w"] * mask[None, None, :, None]
    return p


def apply_srcnn_res(weights, x, params):
    """x (N,H,W,3) BGR; params (N,P) with P<=MAX_PROXY_PARAMS (zero-padded)."""
    n, h, w, _ = x.shape
    if params is None:
        params = jnp.zeros((n, 0), x.dtype)
    pad = MAX_PROXY_PARAMS - params.shape[1]
    if pad:
        params = jnp.concatenate(
            [params, jnp.zeros((n, pad), params.dtype)], axis=1)
    feat_min = jnp.min(x, axis=(1, 2))
    feat_mean = jnp.mean(x, axis=(1, 2))
    feat_max = jnp.max(x, axis=(1, 2))
    cond = jnp.concatenate([feat_min, feat_mean, feat_max, params], axis=1)
    feat = jnp.concatenate([x, broadcast_params(cond, h, w)], axis=-1)
    y = jax.nn.relu(_conv_s(feat, **weights["conv1"]))
    y = jax.nn.relu(_conv_s(y, **weights["conv2"]))
    y = _conv_s(y, **weights["conv3"])
    return x + y.astype(x.dtype)


# ------------------------------------------------------------- SRCNN demosaic

def init_srcnn_demosaic(key, n_params: int = 0) -> dict:
    """RGGB-packed demosaic net (reference srcnn_demosaic_arch.py:14-25:
    conv9x9/64, conv1x1/32, conv5x5/12, PixelShuffle x2)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_conv(k1, 9, 9, 4 + n_params, 64),
        "conv2": init_conv(k2, 1, 1, 64, 32),
        "conv3": init_conv(k3, 5, 5, 32, 12),
    }


def apply_srcnn_demosaic(weights, x, params=None):
    """x (N,H,W,1) Bayer RGGB -> (N,H,W,3) BGR."""
    packed = bayer_to_rggb(x)  # (N, H/2, W/2, 4)
    if params is not None and params.shape[1] > 0:
        packed = jnp.concatenate(
            [packed, broadcast_params(params, *packed.shape[1:3])], axis=-1)
    y = jax.nn.relu(_conv_s(packed, **weights["conv1"]))
    y = jax.nn.relu(_conv_s(y, **weights["conv2"]))
    y = _conv_s(y, **weights["conv3"])  # (N, H/2, W/2, 12)
    return pixel_shuffle(y, 2).astype(x.dtype)  # (N, H, W, 3)


# --------------------------------------------------------- Path-Restore 14L

def _init_resblock(key):
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv(k1, 3, 3, 64, 64),
            "conv2": init_conv(k2, 3, 3, 64, 64)}


def _apply_resblock(w, x):
    """pre-activation residual block (reference path_14l_bayer_arch.py:6-21)."""
    y = _conv_s(jax.nn.relu(x), **w["conv1"])
    y = _conv_s(jax.nn.relu(y), **w["conv2"])
    return x + y


def init_path14(key, in_ch: int, out_ch: int, n_params: int = 0) -> dict:
    keys = jax.random.split(key, 8)
    return {
        "conv_first": init_conv(keys[0], 3, 3, in_ch + n_params, 64),
        "blocks": [_init_resblock(keys[i + 1]) for i in range(6)],
        "conv_last": init_conv(keys[7], 3, 3, 64, out_ch),
    }


def _apply_path14(weights, feat):
    in_dtype = feat.dtype
    y = _conv_s(feat, **weights["conv_first"])
    for blk in weights["blocks"]:
        y = _apply_resblock(blk, y)
    return _conv_s(jax.nn.relu(y),
                   **weights["conv_last"]).astype(in_dtype)


def init_path14_bayer(key, n_params: int = 0) -> dict:
    """Bayer-domain denoiser: RGGB in, 4ch out + PixelShuffle -> Bayer
    (reference path_14l_bayer_arch.py:24-57)."""
    return init_path14(key, 4, 4, n_params)


def apply_path14_bayer(weights, x, params=None):
    """x (N,H,W,1) Bayer -> (N,H,W,1) Bayer."""
    packed = bayer_to_rggb(x)
    if params is not None and params.shape[1] > 0:
        packed = jnp.concatenate(
            [packed, broadcast_params(params, *packed.shape[1:3])], axis=-1)
    y = _apply_path14(weights, packed)  # (N, H/2, W/2, 4)
    return pixel_shuffle(y, 2)  # (N, H, W, 1)


def init_path14_bgr(key, n_params: int = 0) -> dict:
    """sRGB-domain denoiser (reference path_14l_bgr_arch.py:25-56)."""
    return init_path14(key, 3, 3, n_params)


def apply_path14_bgr(weights, x, params=None):
    """x (N,H,W,3) BGR -> BGR.  The net itself runs in RGB order
    (reference path_14l_bgr_arch.py:64-65,84)."""
    rgb = x[..., ::-1]
    if params is not None and params.shape[1] > 0:
        rgb = jnp.concatenate(
            [rgb, broadcast_params(params, *rgb.shape[1:3])], axis=-1)
    y = _apply_path14(weights, rgb)
    return y[..., ::-1]
