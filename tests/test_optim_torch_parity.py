"""Numerical parity of utils/optim with torch.optim.

The reference drives the search with torch.optim.SGD(momentum) on module
params and torch.optim.Adam on alphas (darts_model.py:86-92); matching
search trajectories requires matching update rules exactly, so compare
against the real torch implementations step by step on the same
param/grad streams (torch CPU is available in this environment).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from reconfigisp_tpu.utils import optim

torch = pytest.importorskip("torch")


def _stream(seed, shape=(7, 3), steps=6):
    rng = np.random.default_rng(seed)
    p0 = rng.normal(size=shape).astype(np.float32)
    grads = [rng.normal(size=shape).astype(np.float32) for _ in range(steps)]
    return p0, grads


class TestSgdParity:
    def test_matches_torch_sgd_momentum(self):
        p0, grads = _stream(0)
        lr, mu = 3e-2, 0.9

        tp = torch.nn.Parameter(torch.tensor(p0))
        topt = torch.optim.SGD([tp], lr=lr, momentum=mu)
        jp = jnp.asarray(p0)
        jstate = optim.sgd_init(jp)
        for g in grads:
            topt.zero_grad()
            tp.grad = torch.tensor(g)
            topt.step()
            jp, jstate = optim.sgd_update(jp, jnp.asarray(g), jstate,
                                          lr=lr, momentum=mu)
            np.testing.assert_allclose(np.asarray(jp),
                                       tp.detach().numpy(), atol=1e-6)


class TestAdamParity:
    @pytest.mark.parametrize("betas", [(0.9, 0.99), (0.5, 0.999)])
    def test_matches_torch_adam(self, betas):
        p0, grads = _stream(1)
        lr, eps = 1e-2, 1e-8

        tp = torch.nn.Parameter(torch.tensor(p0))
        topt = torch.optim.Adam([tp], lr=lr, betas=betas, eps=eps)
        jp = jnp.asarray(p0)
        jstate = optim.adam_init(jp)
        for g in grads:
            topt.zero_grad()
            tp.grad = torch.tensor(g)
            topt.step()
            jp, jstate = optim.adam_update(jp, jnp.asarray(g), jstate,
                                           lr=lr, beta1=betas[0],
                                           beta2=betas[1], eps=eps)
            np.testing.assert_allclose(np.asarray(jp),
                                       tp.detach().numpy(), atol=2e-6)
