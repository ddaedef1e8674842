"""Search/training objectives.

Re-design of the reference's loss kit: l1/l2 (darts_model.py:60-65),
local_global (codes/utils/util_loss.py:26-64) and the latency-aware loss
(util_loss.py:8-23).  In the reference the latency loss is dormant (no network
returns a latency); here every pipeline/supernet reports an expected latency,
making it live.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2(pred, target):
    return jnp.mean((pred - target) ** 2)


def latency_loss(pred, target, latency, target_latency, w, fidelity_loss=l2):
    """fidelity * (latency / target)^w (reference util_loss.py:8-23).

    Returns (loss, latency_term)."""
    fid = fidelity_loss(pred, target)
    term = (latency / target_latency) ** w
    return fid * term, term


def local_global_loss(pred, target, glb_flag, loss_func=l2):
    """Mixed local/global objective (reference util_loss.py:26-64).

    Local samples (glb_flag < 1) are gain-matched per image/channel before the
    loss (gain = clamped mean ratio, stop-gradiented); global samples compare
    1/4-scale bilinear downsamples.  Implemented with masks instead of boolean
    indexing so it stays jittable under fixed shapes.
    """
    n = pred.shape[0]
    loc_mask = (glb_flag < 1).astype(pred.dtype).reshape(n, 1, 1, 1)
    glb_mask = 1.0 - loc_mask

    # ---- local: gain-matched full-res comparison
    in_mean = jnp.clip(jnp.mean(pred, axis=(1, 2), keepdims=True), 0, None) + 1e-6
    gt_mean = jnp.mean(target, axis=(1, 2), keepdims=True)
    gain = jnp.clip(gt_mean / in_mean, 0.5, 2.0)
    gain = jax.lax.stop_gradient(gain)
    per_px_loc = (pred * gain - target) ** 2
    n_loc = jnp.sum(loc_mask)
    loss_loc = jnp.sum(per_px_loc * loc_mask) / jnp.clip(
        n_loc * per_px_loc[0].size, 1.0, None)

    # ---- global: 1/4-scale bilinear comparison
    h, w = pred.shape[1], pred.shape[2]
    small = (max(h // 4, 1), max(w // 4, 1))
    pred_s = jax.image.resize(pred, (n, *small, pred.shape[3]), "bilinear")
    targ_s = jax.image.resize(target, (n, *small, target.shape[3]), "bilinear")
    per_px_glb = (pred_s - targ_s) ** 2
    n_glb = jnp.sum(glb_mask)
    loss_glb = jnp.sum(per_px_glb * glb_mask.reshape(n, 1, 1, 1)) / jnp.clip(
        n_glb * per_px_glb[0].size, 1.0, None)

    return loss_loc + loss_glb


def make_criterion(loss_type: str, train_opt: dict | None = None):
    """String -> loss fn, mirroring the reference's dispatch
    (darts_model.py:56-77).  Returned fn signature:
    f(pred, target, *, latency=None, glb_flag=None) -> scalar."""
    train_opt = train_opt or {}

    if loss_type == "l1":
        return lambda pred, target, **kw: l1(pred, target)
    if loss_type == "l2":
        return lambda pred, target, **kw: l2(pred, target)
    if loss_type == "local_global_l2":
        return lambda pred, target, glb_flag=None, **kw: local_global_loss(
            pred, target, glb_flag)
    if loss_type == "l2_latency":
        w = train_opt.get("w", 1.0)
        tl = train_opt.get("target_latency", 1.0)
        return lambda pred, target, latency=None, **kw: latency_loss(
            pred, target, latency, tl, w)[0]
    raise ValueError(f"unknown pixel_criterion {loss_type!r}")
