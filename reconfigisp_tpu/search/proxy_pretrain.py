"""Offline pretraining for every learned module in the search space.

The reference ships a zoo of pretrained checkpoints loaded at supernet
construction (reference super_prune...py:34-47: 12 proxy .pth files trained
in external 'proxy_nets' experiments that are not part of the repo) and
per-step weights for fixed pipelines (isp_universal.py:169-176).  This module
is that missing pretraining stage, covering:

  * sRGB proxies  — SRCNN-Res imitators trained against our native
    implementation of their algorithm on params ~ U[0,1] (the protocol the
    online fine-tuner uses, darts_ft_model.py:221-240).  Includes BM3D, whose
    target is the native transform-domain denoiser (ops/denoise.dct_denoise).
  * demosaic proxies — SRCNN-demosaic imitators of bilinear / Malvar.
  * native CNN ops — trained on their actual tasks so they enter the search
    as competent candidates rather than random nets:
      demosaicnet  : clean mosaic -> clean BGR
      path_bayer   : noisy mosaic -> clean mosaic
      path_bgr     : noisy BGR    -> clean BGR

CLI: python -m reconfigisp_tpu.search.proxy_pretrain --steps 2000 \
        --out proxies.ckpt [--ops reinhard,median] [--platform cpu]
The checkpoint is consumed by run_training via `path.pretrain_proxies`.
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


def _make_scene_sampler(batch: int, size: int, seed: int):
    scene = SyntheticRawDataset(n=1, size=size, noise_std=0.02, seed=seed)

    def sample(i: int) -> np.ndarray:
        imgs = [scene._scene(np.random.default_rng(seed * 7 + i * 131 + k),
                             size) for k in range(batch)]
        return np.stack(imgs)

    return sample


def _mosaic_batch(bgr: np.ndarray) -> np.ndarray:
    return np.stack([SyntheticRawDataset.mosaic_rggb(im) for im in bgr])


# Transient backend failures a long TPU pretraining run should survive
# (remote-compile flakes, device OOM/comm errors).  Programming errors
# (shape bugs, bad plan wiring — TypeError/ValueError/etc.) propagate.
def _transient_errors() -> tuple:
    errs: tuple = (OSError,)
    try:
        from jax.errors import JaxRuntimeError
        errs = (JaxRuntimeError,) + errs
    except ImportError:  # pragma: no cover - old jax
        errs = (RuntimeError,) + errs
    return errs


def pretrain_modules(steps: int = 1000, *, batch: int = 8, size: int = 48,
                     lr: float = 1e-3, seed: int = 0,
                     ops: Optional[set] = None, noise_std: float = 0.06,
                     log_every: int = 100, verbose: bool = True,
                     strict: bool = False) -> dict:
    """-> {op_name: weights pytree} for every learned module (see module
    docstring for the task each one trains on)."""
    key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)
    sample_scene = _make_scene_sampler(batch, size, seed)

    # plans: (name, init_fn, apply_fn, target_fn, sample_fn)
    #   sample_fn(i) -> (x, params, target_or_None)  [host-side numpy only]
    #   target_fn(x, params) -> target, evaluated INSIDE the jitted step —
    #   eager target evaluation dispatched hundreds of primitive ops per
    #   iteration through the device tunnel and leaked its memoization
    #   cache to an OOM kill on long runs.
    plans = []

    # ---- sRGB proxies: imitate the native algorithm on random params ----
    for spec in pool("srgb"):
        if spec.proxy_apply is None or spec.ft_target_fn() is None:
            continue

        def sample(i, _spec=spec):
            x = sample_scene(i)
            p = rng.random((1, _spec.n_params)).astype(np.float32)
            return x, np.repeat(p, batch, axis=0), None

        plans.append((spec.name, spec.proxy_init, spec.proxy_apply,
                      lambda x, p, _tf=spec.ft_target_fn(): _tf(x, p, None),
                      sample))

    # ---- demosaic proxies: imitate the native demosaic on mosaics ----
    for spec in pool("demosaic"):
        if spec.proxy_apply is None or spec.apply is None:
            continue

        def sample(i):
            return _mosaic_batch(sample_scene(i)), None, None

        plans.append((spec.name, spec.proxy_init, spec.proxy_apply,
                      lambda x, p, _s=spec: _s.apply(x, None, None), sample))

    # ---- native CNN ops: train on their real task ----
    by_name = {s.name: s for dom in ("bayer", "demosaic", "srgb")
               for s in pool(dom)}

    def add_native(name, sample_fn):
        spec = by_name[name]
        plans.append((name, spec.init_weights,
                      lambda x, p, w, _s=spec: _s.apply(x, p, w),
                      None, sample_fn))

    def dem_sample(i):
        bgr = sample_scene(i)
        return _mosaic_batch(bgr), None, bgr

    def bayer_sample(i):
        bgr = sample_scene(i)
        clean = _mosaic_batch(bgr)
        noisy = np.clip(clean + rng.normal(0, noise_std, clean.shape),
                        0, 1).astype(np.float32)
        return noisy, None, clean

    def bgr_sample(i):
        bgr = sample_scene(i)
        noisy = np.clip(bgr + rng.normal(0, noise_std, bgr.shape),
                        0, 1).astype(np.float32)
        return noisy, None, bgr

    add_native("demosaicnet", dem_sample)
    add_native("path_bayer", bayer_sample)
    add_native("path_bgr", bgr_sample)

    trained = {}
    for name, init_fn, apply_fn, target_fn, sample_fn in plans:
        if ops is not None and name not in ops:
            continue
        key, k = jax.random.split(key)
        weights = init_fn(k)
        opt_state = optim.adam_init(weights)

        @jax.jit
        def step_fn(w, o, x, params, target,
                    _apply=apply_fn, _tf=target_fn):
            if _tf is not None:
                target = jax.lax.stop_gradient(_tf(x, params))

            def loss_fn(w_):
                return losses.l2(_apply(x, params, w_), target)

            loss, grads = jax.value_and_grad(loss_fn)(w)
            w2, o2 = optim.adam_update(w, grads, o, lr=lr)
            return w2, o2, loss

        loss = None
        i = 0
        try:
            for i in range(steps):
                x, params, target = sample_fn(i)
                weights, opt_state, loss = step_fn(
                    weights, opt_state, jnp.asarray(x),
                    None if params is None else jnp.asarray(params),
                    None if target is None else jnp.asarray(target))
                if verbose and (i + 1) % log_every == 0:
                    print(f"[{name}] step {i + 1}/{steps} "
                          f"l2 {float(loss):.3e}", flush=True)
        except _transient_errors() as e:  # pragma: no cover - backend flake
            # one op failing on a transient backend error must not lose the
            # rest of a long pretraining run; strict=True re-raises instead
            if strict:
                raise
            print(f"[{name}] FAILED after {i} steps: {e}", flush=True)
            continue
        trained[name] = weights
        if verbose:
            print(f"[{name}] done, final l2 {float(loss):.3e}", flush=True)
    return trained


def pretrain_proxies(steps: int = 1000, *, ops: Optional[set] = None,
                     **kw) -> dict:
    """Back-compat alias restricted to the sRGB proxy set when ops is None."""
    if ops is None:
        ops = {s.name for s in pool("srgb")
               if s.proxy_apply is not None and s.ft_target_fn() is not None}
    return pretrain_modules(steps, ops=ops, **kw)


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
    trained = pretrain_modules(steps=args.steps, batch=args.batch,
                               size=args.size, lr=args.lr, ops=ops)
    import os
    d, f = os.path.split(args.out)
    checkpoint.save_network(d or ".", "proxies",
                            f.replace(".ckpt", ""), trained)
    print(f"saved {len(trained)} module weight sets to {args.out}")


if __name__ == "__main__":
    main()
