"""Minimal torch-semantics optimizers over pytrees.

The reference uses torch.optim.SGD(momentum) for module params and
torch.optim.Adam for alphas / fixed-pipeline params
(reference codes/models/darts_model.py:86-92, isp_model.py:86-90).  Exact
semantic parity matters for matching search trajectories:
  SGD:  buf = mu*buf + g;  p -= lr*buf
  Adam: m,v EMA; p -= lr * (m/bc1) / (sqrt(v/bc2) + eps)   (eps outside sqrt)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sgd_init(params):
    return {"momentum": jax.tree.map(jnp.zeros_like, params)}


def sgd_update(params, grads, state, *, lr, momentum):
    buf = jax.tree.map(lambda b, g: momentum * b + g,
                       state["momentum"], grads)
    new_params = jax.tree.map(lambda p, b: p - lr * b, params, buf)
    return new_params, {"momentum": buf}


def adam_init(params):
    return {"m": jax.tree.map(jnp.zeros_like, params),
            "v": jax.tree.map(jnp.zeros_like, params),
            "t": jnp.zeros((), jnp.int32)}


def adam_update(params, grads, state, *, lr, beta1=0.9, beta2=0.99,
                eps=1e-8):
    t = state["t"] + 1
    m = jax.tree.map(lambda m_, g: beta1 * m_ + (1 - beta1) * g,
                     state["m"], grads)
    v = jax.tree.map(lambda v_, g: beta2 * v_ + (1 - beta2) * g * g,
                     state["v"], grads)
    bc1 = 1 - beta1 ** t.astype(jnp.float32)
    bc2 = 1 - beta2 ** t.astype(jnp.float32)
    new_params = jax.tree.map(
        lambda p, m_, v_: p - lr * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps),
        params, m, v)
    return new_params, {"m": m, "v": v, "t": t}
