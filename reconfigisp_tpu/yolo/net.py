"""Functional Darknet/YOLOv3 graph: init, forward, darknet weight loader.

Re-design of reference codes/models/modules/yolo_v3_net.py:239-359 (Darknet
module walking cfg blocks, binary weight parser at :271-322).  The graph is
static data (cfg.py blocks), the forward is a pure function over a weights
pytree — jittable end-to-end, NHWC, BN applied in eval mode (the evaluator is
frozen: reference darts_yolo_model.py:37-40 never updates YOLO weights).

Raw head outputs are decoded in loss.py; `apply_yolo` returns the list of
(N, A, G, G, 5+C) per-scale prediction maps plus each scale's anchors.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _conv_init(key, kh, kw, cin, cout):
    bound = math.sqrt(1.0 / (kh * kw * cin))
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def init_yolo(key: jax.Array, blocks: List[dict], in_channels: int = 3):
    """Weights pytree: list aligned with blocks (None for weightless)."""
    weights = []
    channels = [in_channels]
    for i, blk in enumerate(blocks):
        t = blk["type"]
        if t == "convolutional":
            key, k = jax.random.split(key)
            cin = channels[-1]
            cout = blk["filters"]
            w = _conv_init(k, blk["size"], blk["size"], cin, cout)
            if blk.get("batch_normalize"):
                w["bn"] = {
                    "gamma": jnp.ones((cout,)),
                    "beta": jnp.zeros((cout,)),
                    "mean": jnp.zeros((cout,)),
                    "var": jnp.ones((cout,)),
                }
                del w["b"]
            weights.append(w)
            channels.append(cout)
        elif t == "shortcut":
            weights.append(None)
            channels.append(channels[-1])
        elif t == "route":
            idxs = [l if l >= 0 else i + l for l in blk["layers"]]
            channels.append(sum(channels[j + 1] for j in idxs))
            weights.append(None)
        elif t == "upsample":
            weights.append(None)
            channels.append(channels[-1])
        elif t == "yolo":
            weights.append(None)
            channels.append(channels[-1])
        else:
            raise ValueError(f"unknown block type {t}")
    return weights


def _upsample2(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def apply_yolo(weights, blocks: List[dict], x: jnp.ndarray,
               dtype=jnp.float32):
    """x: (N, H, W, 3) RGB in [0,1] -> list of (head_map, anchors, classes).

    head_map: (N, A, G_h, G_w, 5+C) raw (pre-sigmoid) predictions."""
    outputs = []
    heads = []
    for i, blk in enumerate(blocks):
        t = blk["type"]
        if t == "convolutional":
            w = weights[i]
            stride = blk["stride"]
            pad = (blk["size"] // 2, blk["size"] // 2)
            y = lax.conv_general_dilated(
                x, w["w"], (stride, stride), [pad, pad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            if "bn" in w:
                bn = w["bn"]
                inv = lax.rsqrt(bn["var"] + 1e-5)
                y = (y - bn["mean"]) * (bn["gamma"] * inv) + bn["beta"]
            else:
                y = y + w["b"]
            if blk.get("activation") == "leaky":
                y = jnp.where(y > 0, y, 0.1 * y)
            x = y
        elif t == "shortcut":
            x = x + outputs[i + blk["from"]]
        elif t == "route":
            idxs = [l if l >= 0 else i + l for l in blk["layers"]]
            parts = [outputs[j] for j in idxs]
            x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
        elif t == "upsample":
            x = _upsample2(x)
        elif t == "yolo":
            n, gh, gw, f = x.shape
            n_anchors = len(blk["mask"])
            c = blk["classes"]
            head = x.reshape(n, gh, gw, n_anchors, 5 + c)
            head = head.transpose(0, 3, 1, 2, 4)  # (N, A, Gh, Gw, 5+C)
            anchors = [blk["anchors"][m] for m in blk["mask"]]
            heads.append((head, anchors, c))
        outputs.append(x)
    return heads


def load_darknet_weights(blocks: List[dict], path: str,
                         in_channels: int = 3):
    """Parse the binary darknet weight format into the weights pytree
    (reference yolo_v3_net.py:271-322): 3x int32 header + seen counter
    (int64 when major*10+minor >= 2), then per conv layer
    [bn_beta, bn_gamma, bn_mean, bn_var | bias] + conv weights (OIHW)."""
    with open(path, "rb") as f:
        major, minor, revision = np.fromfile(f, np.int32, 3)
        if major * 10 + minor >= 2:
            np.fromfile(f, np.int64, 1)
        else:
            np.fromfile(f, np.int32, 1)
        data = np.fromfile(f, np.float32)

    weights = init_yolo(jax.random.PRNGKey(0), blocks, in_channels)
    ptr = 0
    channels = [in_channels]
    for i, blk in enumerate(blocks):
        t = blk["type"]
        if t == "route":
            idxs = [l if l >= 0 else i + l for l in blk["layers"]]
            channels.append(sum(channels[j + 1] for j in idxs))
            continue
        if t != "convolutional":
            channels.append(channels[-1])
            continue
        cin = channels[-1]
        cout = blk["filters"]
        k = blk["size"]
        w = weights[i]
        if blk.get("batch_normalize"):
            for name in ("beta", "gamma", "mean", "var"):
                w["bn"][name] = jnp.asarray(data[ptr:ptr + cout])
                ptr += cout
        else:
            w["b"] = jnp.asarray(data[ptr:ptr + cout])
            ptr += cout
        n = cout * cin * k * k
        conv = data[ptr:ptr + n].reshape(cout, cin, k, k)  # OIHW
        ptr += n
        w["w"] = jnp.asarray(conv.transpose(2, 3, 1, 0))   # -> HWIO
        channels.append(cout)
    if ptr != len(data):
        raise ValueError(
            f"weight file mismatch: consumed {ptr} of {len(data)} floats")
    return weights


def save_darknet_weights(blocks: List[dict], weights, path: str):
    """Inverse of load_darknet_weights (round-trip tests / export)."""
    chunks = [np.asarray([0, 2, 0], np.int32).tobytes(),
              np.asarray([0], np.int64).tobytes()]
    for i, blk in enumerate(blocks):
        if blk["type"] != "convolutional":
            continue
        w = weights[i]
        if "bn" in w:
            for name in ("beta", "gamma", "mean", "var"):
                chunks.append(np.asarray(w["bn"][name], np.float32).tobytes())
        else:
            chunks.append(np.asarray(w["b"], np.float32).tobytes())
        conv = np.asarray(w["w"], np.float32).transpose(3, 2, 0, 1)  # OIHW
        chunks.append(conv.tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
