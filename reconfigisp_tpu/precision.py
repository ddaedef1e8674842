"""Precision policy for the learned CNN stacks.

TPU MXU multiplies are bf16 single-pass with f32 accumulation either way;
what this policy controls is the *storage* dtype of inter-layer activations.
At 12 MP the Path-Restore stack moves ~0.8 GB of activations per layer in
f32 — bf16 storage halves that HBM traffic and measured ~1.2x end-to-end on
v5e (see bench.py).  Training keeps f32 storage by default: second-order
DARTS runs five forward/backward passes whose finite-difference Hessian
probes are sensitive to rounding (search/darts.py), and lax conv VJPs keep
f32 cotangents regardless.

Usage:
    with precision.cnn_storage("bf16"):
        y = pipe(state, x)          # traced with bf16 inter-layer storage
or set RECONFIGISP_CNN_STORAGE=bf16 to flip the process-wide default.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

_DTYPES = {"f32": jnp.float32, "float32": jnp.float32,
           "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}

_default = os.environ.get("RECONFIGISP_CNN_STORAGE", "f32")
_current = [_DTYPES.get(_default, jnp.float32)]


def cnn_storage_dtype():
    """Storage dtype for CNN inter-layer activations (jnp dtype)."""
    return _current[-1]


def policy_jit(fn, **jit_kw):
    """jax.jit whose compilation cache is additionally keyed on the active
    CNN storage policy.

    The policy is a process global read at *trace* time, so a plain jax.jit
    traced under one policy silently reuses the stale compiled program when
    the policy later changes (the 'silent f32 trace' failure mode bench.py
    once hit).  This wrapper keeps one jitted instance per policy and
    dispatches on the policy active at call time, so entering cnn_storage()
    always reaches a program traced under that policy.
    """
    cache: dict = {}

    def call(*args, **kw):
        name = jnp.dtype(cnn_storage_dtype()).name
        jitted = cache.get(name)
        if jitted is None:
            # jax.jit keys its global trace cache on the wrapped function's
            # identity — a fresh closure per policy forces a fresh trace
            def per_policy(*a, _fn=fn, **k):
                return _fn(*a, **k)

            jitted = jax.jit(per_policy, **jit_kw)
            cache[name] = jitted
        return jitted(*args, **kw)

    return call


@contextlib.contextmanager
def cnn_storage(name_or_dtype):
    """Scoped storage-dtype override ('f32' | 'bf16' | a jnp dtype).
    Applies at trace time — wrap the jit'd call, not the jit definition."""
    dt = _DTYPES.get(name_or_dtype, name_or_dtype) if isinstance(
        name_or_dtype, str) else name_or_dtype
    _current.append(dt)
    try:
        yield
    finally:
        _current.pop()
