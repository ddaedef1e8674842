"""YOLOv3 detection loss: decode + scatter-based target building.

Re-design of reference codes/models/modules/yolo_v3_net.py:107-205 (YOLOLayer)
and util_yolo.py:286-340 (build_targets).  The torch reference builds targets
with boolean-mask indexing over a variable box count; here labels are a fixed
(N, B, 6) tensor [valid, cls, cx, cy, w, h] (normalized) and assignments are
scatters with out-of-bounds drop semantics for invalid rows — static shapes,
fully jittable, so the detection loss can sit inside the fused DARTS step
(reference darts_yolo_model.py:139-213 runs it eagerly per pass).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def decode_head(head: jnp.ndarray, anchors: Sequence[Tuple[float, float]],
                img_size: int):
    """Raw head (N,A,Gh,Gw,5+C) -> boxes in image pixels + scores.

    Standard YOLOv3 decode (reference yolo_v3_net.py:150-195):
    xy = sigmoid(txy) + grid, wh = anchor * exp(twh), conf/cls = sigmoid."""
    n, a, gh, gw, f = head.shape
    stride = img_size / gh
    gy = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    anchors_arr = jnp.asarray(anchors, jnp.float32) / stride  # grid units
    x = (jax.nn.sigmoid(head[..., 0]) + gx) * stride
    y = (jax.nn.sigmoid(head[..., 1]) + gy) * stride
    w = anchors_arr[:, 0][None, :, None, None] * jnp.exp(head[..., 2]) * stride
    h = anchors_arr[:, 1][None, :, None, None] * jnp.exp(head[..., 3]) * stride
    conf = jax.nn.sigmoid(head[..., 4])
    cls = jax.nn.sigmoid(head[..., 5:])
    return jnp.stack([x, y, w, h], -1), conf, cls


def _wh_iou(wh1, wh2):
    """IoU of width/height pairs (anchor matching, reference util_yolo.py:212)."""
    inter = jnp.minimum(wh1[..., 0], wh2[..., 0]) * \
        jnp.minimum(wh1[..., 1], wh2[..., 1])
    union = wh1[..., 0] * wh1[..., 1] + wh2[..., 0] * wh2[..., 1] - inter
    return inter / jnp.clip(union, 1e-9, None)


def build_targets(labels: jnp.ndarray, anchors_grid: jnp.ndarray,
                  gh: int, gw: int, n_cls: int, ignore_thres: float = 0.5):
    """labels (N,B,6) [valid, cls, cx, cy, w, h] normalized ->
    target tensors on the (N,A,Gh,Gw) grid (reference util_yolo.py:286-340).

    Invalid rows scatter to out-of-range batch indices and are dropped."""
    n, b, _ = labels.shape
    a = anchors_grid.shape[0]
    valid = labels[..., 0] > 0.5                      # (N,B)
    cls_idx = labels[..., 1].astype(jnp.int32)
    gx = labels[..., 2] * gw
    gy = labels[..., 3] * gh
    tw_boxes = labels[..., 4] * gw
    th_boxes = labels[..., 5] * gh
    gi = jnp.clip(gx.astype(jnp.int32), 0, gw - 1)
    gj = jnp.clip(gy.astype(jnp.int32), 0, gh - 1)

    ious = _wh_iou(jnp.stack([tw_boxes, th_boxes], -1)[:, :, None, :],
                   anchors_grid[None, None, :, :])    # (N,B,A)
    best_a = jnp.argmax(ious, axis=-1)                # (N,B)

    batch_idx = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
    # drop invalid rows by pushing their batch index out of range
    sb = jnp.where(valid, batch_idx, n)

    def scat(base, value):
        return base.at[sb, best_a, gj, gi].set(value, mode="drop")

    obj = scat(jnp.zeros((n, a, gh, gw), jnp.float32), 1.0)
    tx = scat(jnp.zeros((n, a, gh, gw), jnp.float32), gx - gx.astype(jnp.int32))
    ty = scat(jnp.zeros((n, a, gh, gw), jnp.float32), gy - gy.astype(jnp.int32))
    tw = scat(jnp.zeros((n, a, gh, gw), jnp.float32),
              jnp.log(jnp.clip(tw_boxes / anchors_grid[best_a, 0], 1e-9, None)))
    th = scat(jnp.zeros((n, a, gh, gw), jnp.float32),
              jnp.log(jnp.clip(th_boxes / anchors_grid[best_a, 1], 1e-9, None)))
    tcls = jnp.zeros((n, a, gh, gw, n_cls), jnp.float32).at[
        sb, best_a, gj, gi, jnp.where(valid, cls_idx, 0)].set(1.0, mode="drop")

    # noobj mask: off at object cells and wherever any target's anchor IoU
    # exceeds ignore_thres (reference util_yolo.py:322-327)
    noobj = 1.0 - obj
    ignore = (ious > ignore_thres)                    # (N,B,A)
    sb_a = jnp.broadcast_to(sb[:, :, None], (n, b, a))
    aa = jax.lax.broadcasted_iota(jnp.int32, (n, b, a), 2)
    gj_a = jnp.broadcast_to(gj[:, :, None], (n, b, a))
    gi_a = jnp.broadcast_to(gi[:, :, None], (n, b, a))
    sb_ig = jnp.where(ignore, sb_a, n)
    noobj = noobj.at[sb_ig, aa, gj_a, gi_a].set(0.0, mode="drop")
    noobj = noobj * (1.0 - obj)

    return {"obj": obj, "noobj": noobj, "tx": tx, "ty": ty, "tw": tw,
            "th": th, "tcls": tcls}


def _bce(logits, target):
    return jnp.maximum(logits, 0) - logits * target + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def yolo_head_loss(head: jnp.ndarray, anchors, labels: jnp.ndarray,
                   img_size: int, *, obj_scale: float = 1.0,
                   noobj_scale: float = 100.0,
                   ignore_thres: float = 0.5) -> jnp.ndarray:
    """Multi-part loss of one scale (reference yolo_v3_net.py:196-205):
    MSE on x/y/w/h at object cells, BCE on objectness (obj + scaled noobj),
    BCE on class probabilities."""
    n, a, gh, gw, f = head.shape
    n_cls = f - 5
    stride = img_size / gh
    anchors_grid = jnp.asarray(anchors, jnp.float32) / stride
    t = build_targets(labels, anchors_grid, gh, gw, n_cls, ignore_thres)

    px = jax.nn.sigmoid(head[..., 0])
    py = jax.nn.sigmoid(head[..., 1])
    pw, ph = head[..., 2], head[..., 3]
    obj, noobj = t["obj"], t["noobj"]
    n_obj = jnp.clip(jnp.sum(obj), 1.0, None)

    loss_x = jnp.sum(obj * (px - t["tx"]) ** 2) / n_obj
    loss_y = jnp.sum(obj * (py - t["ty"]) ** 2) / n_obj
    loss_w = jnp.sum(obj * (pw - t["tw"]) ** 2) / n_obj
    loss_h = jnp.sum(obj * (ph - t["th"]) ** 2) / n_obj
    conf_bce = _bce(head[..., 4], obj)
    loss_conf = (obj_scale * jnp.sum(obj * conf_bce) +
                 noobj_scale * jnp.sum(noobj * conf_bce)) / n_obj
    cls_bce = _bce(head[..., 5:], t["tcls"])
    loss_cls = jnp.sum(obj[..., None] * cls_bce) / n_obj

    # zero-loss guard when a batch carries no boxes
    # (reference darts_yolo_model.py:147-152)
    has_obj = jnp.sum(t["obj"]) > 0
    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls
    safe = loss_conf  # objectness-only loss still defined with no targets
    return jnp.where(has_obj, total, safe)


def yolo_loss(heads: List[tuple], labels: jnp.ndarray,
              img_size: int, **kw) -> jnp.ndarray:
    """Sum of per-scale losses over the apply_yolo outputs."""
    total = 0.0
    for head, anchors, _ in heads:
        total = total + yolo_head_loss(head, anchors, labels, img_size, **kw)
    return total
