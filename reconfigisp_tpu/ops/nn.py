"""Minimal functional NN primitives (NHWC) used by the ISP CNN modules.

Weights are plain nested dicts of jnp arrays so they compose transparently
with jax.grad / optax / shardings.  Convolutions use lax.conv_general_dilated
with NHWC/HWIO layouts, which XLA maps directly onto the TPU MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int = 1,
           padding: str = "SAME", compute_dtype=None) -> jnp.ndarray:
    """2-D convolution, NHWC activations, HWIO weights, fp32 accumulation.

    compute_dtype=None keeps f32 operands with the platform default
    precision (bf16 single-pass on TPU), which is both the fast MXU path and
    autodiff-safe; an explicit bf16 cast breaks lax conv VJPs (cotangents
    stay f32) and measured no faster.  The fused Pallas stacks in
    pallas_kernels.py own their bf16 internals instead."""
    preferred = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        # keep output dtype == operand dtype so the conv transpose sees
        # matching cotangent/operand dtypes (f32-preferred with bf16 operands
        # makes jax.grad fail inside conv_general_dilated_transpose); the TPU
        # MXU still accumulates a single 3x3xC contraction in f32 internally.
        preferred = compute_dtype
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )
    return y + b


def init_conv(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> dict:
    """Kaiming-uniform conv + bias init (matches torch.nn.Conv2d defaults,
    so randomly-initialized proxies have the reference's activation scale)."""
    wkey, bkey = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = math.sqrt(1.0 / fan_in)
    # torch kaiming_uniform with a=sqrt(5) gives weight bound sqrt(6/((1+5)fan_in))
    wbound = math.sqrt(6.0 / (6.0 * fan_in))
    w = jax.random.uniform(wkey, (kh, kw, cin, cout), jnp.float32, -wbound, wbound)
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Depth-to-space with torch.nn.PixelShuffle channel semantics.

    Input (N, H, W, C*r*r) where the channel index decomposes as c*r*r + i*r + j;
    output (N, H*r, W*r, C).  Matching torch exactly matters for the RGGB
    pack/unpack round-trips in the Bayer-domain CNNs
    (reference codes/models/modules/path_14l_bayer_arch.py:48).
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (N, H, r_i, W, r_j, C)
    return x.reshape(n, h * r, w * r, c)


def bayer_to_rggb(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 1) Bayer RGGB mosaic -> (N, H/2, W/2, 4) planes [R, G1, G2, B].

    Channel order matches the reference's pack (path_14l_bayer_arch.py:71-75).
    Implemented as reshape+transpose: stride-2 slicing lowers to 4 gathers on
    TPU and cost 114 ms at 12 MP; this form is a single relayout (1.8 ms).
    """
    n, h2, w2, _ = x.shape
    t = x[..., 0].reshape(n, h2 // 2, 2, w2 // 2, 2)
    t = t.transpose(0, 1, 3, 2, 4)       # (N, H/2, W/2, 2, 2)
    return t.reshape(n, h2 // 2, w2 // 2, 4)


def rggb_to_bayer(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of bayer_to_rggb: (N, h, w, 4) -> (N, 2h, 2w, 1).

    reshape+transpose instead of 4 scatter-sets (65 ms -> 0.1 ms at 12 MP)."""
    n, h, w, _ = x.shape
    t = x.reshape(n, h, w, 2, 2).transpose(0, 1, 3, 2, 4)
    return t.reshape(n, 2 * h, 2 * w, 1)


def broadcast_params(params: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(N, P) parameter vectors -> (N, H, W, P) constant feature planes.

    The parameter-conditioning mechanism of the proxy CNNs
    (reference codes/models/modules/srcnn_res_arch.py:45-47).
    """
    return jnp.broadcast_to(params[:, None, None, :], (params.shape[0], h, w, params.shape[1]))
