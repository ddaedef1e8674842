"""Per-op latency calibration on the current device.

The reference designed a latency-aware search loss but never shipped a
latency source (reference codes/utils/util_loss.py:8-23, SURVEY §5 'dormant').
Here the supernet's expected latency is a differentiable function of the
alphas and a per-op latency table; this module measures that table on real
hardware and installs it into the registry.

Measurement protocol: median of synced runs on distinct inputs (the device
tunnel memoizes identical dispatches and reports readiness optimistically,
so each run uses a fresh input and syncs via a scalar fetch), with the
measured empty-dispatch round-trip subtracted.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp

from reconfigisp_tpu import registry as reg


def _timed(fn, make_input, iters: int = 3) -> float:
    xs = [make_input(i) for i in range(iters + 2)]
    float(jnp.sum(fn(xs[0])))  # compile
    float(jnp.sum(fn(xs[1])))  # drain
    ts = []
    for i in range(2, iters + 2):
        t0 = time.perf_counter()
        float(jnp.sum(fn(xs[i])))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def measure_rtt() -> float:
    """Per-dispatch round-trip overhead (seconds)."""
    f = jax.jit(lambda x: x + 1.0)
    return _timed(f, lambda i: jnp.full((8,), float(i)))


def calibrate(size: int = 1024, batch: int = 1, use_proxies: bool = False,
              domains=("bayer", "demosaic", "srgb"),
              ops: Optional[set] = None,
              key: Optional[jax.Array] = None) -> dict:
    """Measure ms-per-megapixel for every registered op (or the `ops`
    subset); returns {op_name: ms_per_mp}.  Call install() with the result
    BEFORE constructing pipelines/supernets — they capture OpSpecs at build
    time."""
    key = key if key is not None else jax.random.PRNGKey(0)
    rtt = measure_rtt()
    mp = size * size * batch / 1e6
    table = {}
    for domain in domains:
        for spec in reg.pool(domain):
            if ops is not None and spec.name not in ops:
                continue
            apply_fn = spec.get_apply(use_proxies)
            if apply_fn is None:
                continue
            key, k1, k2 = jax.random.split(key, 3)
            weights = None
            winit = (spec.proxy_init if (use_proxies or spec.proxy_only)
                     and spec.proxy_init else spec.init_weights)
            if winit is not None:
                weights = winit(k1)
            if spec.conditional:
                params = spec.init_params(k2)
            elif spec.n_params:
                params = jnp.full((batch, spec.n_params), 0.5, jnp.float32)
            else:
                params = None
            c = 1 if domain == "bayer" or domain == "demosaic" else 3
            f = jax.jit(lambda x, a=apply_fn, p=params, w=weights: a(x, p, w))
            mk = lambda i: jax.random.uniform(
                jax.random.PRNGKey(100 + i), (batch, size, size, c),
                jnp.float32, 0.05, 0.95)
            t = max(_timed(f, mk) - rtt, 1e-6)
            table[spec.name] = t * 1e3 / mp
    return table


def install(table: dict) -> None:
    """Replace latency fields in the registry (OpSpecs are frozen; rebuilt
    via dataclasses.replace in place)."""
    for domain in ("bayer", "demosaic", "srgb"):
        dom = reg.registry[domain]
        for name, (idx, spec) in list(dom.items()):
            if name in table:
                dom[name] = (idx, dataclasses.replace(
                    spec, latency=float(table[name])))
