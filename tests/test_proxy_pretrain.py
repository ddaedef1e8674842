"""Offline proxy pretraining reduces imitation error."""

import numpy as np
import jax
import jax.numpy as jnp

from reconfigisp_tpu.search.proxy_pretrain import pretrain_proxies
from reconfigisp_tpu.registry import get_op


def test_pretrain_improves_proxy(rng):
    spec = get_op("srgb", "gamma")  # cheap native target? gamma has no proxy
    spec = get_op("srgb", "crysisengine")
    key = jax.random.PRNGKey(3)
    w0 = spec.proxy_init(key)
    probe = jnp.asarray(rng.uniform(0.1, 0.9, (2, 32, 32, 3)).astype(np.float32))
    p = jnp.full((2, 1), 0.5, jnp.float32)

    def err(w):
        return float(jnp.mean((spec.proxy_apply(probe, p, w) -
                               spec.apply(probe, p, None)) ** 2))

    trained = pretrain_proxies(steps=120, batch=4, size=32, lr=3e-3,
                               seed=3, ops={"crysisengine"}, verbose=False)
    assert err(trained["crysisengine"]) < err(w0) * 0.7
