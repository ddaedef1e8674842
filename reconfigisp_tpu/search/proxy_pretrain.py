"""Offline proxy pretraining: teach each proxy CNN to imitate its algorithm.

The reference ships a zoo of pretrained proxy checkpoints
(reference super_prune...py:34-47 loads 12 .pth files trained in external
'proxy_nets' experiments that are not part of the repo).  This module is that
missing pretraining stage: for every proxy-capable op, train the SRCNN
imitator against our *native* implementation on procedural images with
params ~ U[0,1] — the same protocol the online fine-tuner uses
(darts_ft_model.py:221-240), run to convergence offline.

CLI: python -m reconfigisp_tpu.search.proxy_pretrain --steps 2000 \
        --out proxies.ckpt [--ops reinhard,median] [--platform cpu]
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from reconfigisp_tpu.registry import pool
from reconfigisp_tpu.utils import losses, optim, checkpoint
from reconfigisp_tpu.data.datasets import SyntheticRawDataset


def pretrain_proxies(steps: int = 1000, *, batch: int = 8, size: int = 48,
                     lr: float = 1e-3, seed: int = 0,
                     ops: Optional[set] = None,
                     log_every: int = 100, verbose: bool = True) -> dict:
    """-> {op_name: weights pytree} for every sRGB op with both a proxy and
    a native implementation (BM3D has no native target, as in the
    reference — origin_universal.py:11-13)."""
    key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)
    scene = SyntheticRawDataset(n=1, size=size, noise_std=0.02, seed=seed)

    def sample_batch(i):
        imgs = [scene._scene(np.random.default_rng(seed * 7 + i * 131 + k),
                             size) for k in range(batch)]
        return jnp.asarray(np.stack(imgs))

    trained = {}
    for spec in pool("srgb"):
        if spec.proxy_apply is None or spec.apply is None:
            continue
        if ops is not None and spec.name not in ops:
            continue
        key, k = jax.random.split(key)
        weights = spec.proxy_init(k)
        opt_state = optim.adam_init(weights)

        @jax.jit
        def step_fn(w, o, data, params, _spec=spec):
            target = jax.lax.stop_gradient(_spec.apply(data, params, None))

            def loss_fn(w_):
                return losses.l2(_spec.proxy_apply(data, params, w_), target)

            loss, grads = jax.value_and_grad(loss_fn)(w)
            w2, o2 = optim.adam_update(w, grads, o, lr=lr)
            return w2, o2, loss

        loss = None
        for i in range(steps):
            data = sample_batch(i)
            p = rng.random((1, spec.n_params)).astype(np.float32)
            params = jnp.asarray(np.repeat(p, batch, axis=0))
            weights, opt_state, loss = step_fn(weights, opt_state, data,
                                               params)
            if verbose and (i + 1) % log_every == 0:
                print(f"[{spec.name}] step {i + 1}/{steps} "
                      f"l2 {float(loss):.3e}", flush=True)
        trained[spec.name] = weights
        if verbose:
            print(f"[{spec.name}] done, final l2 {float(loss):.3e}",
                  flush=True)
    return trained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="proxies.ckpt")
    ap.add_argument("--ops", default=None,
                    help="comma-separated subset of op names")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    ops = set(args.ops.split(",")) if args.ops else None
    trained = pretrain_proxies(steps=args.steps, batch=args.batch,
                               size=args.size, lr=args.lr, ops=ops)
    import os
    d, f = os.path.split(args.out)
    checkpoint.save_network(d or ".", "proxies",
                            f.replace(".ckpt", ""), trained)
    print(f"saved {len(trained)} proxies to {args.out}")


if __name__ == "__main__":
    main()
