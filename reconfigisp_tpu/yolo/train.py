"""Detector training + mAP evaluation helpers.

The reference uses YOLOv3 strictly as a frozen pretrained evaluator
(reference codes/models/darts_yolo_model.py:37-40, weights from darknet
binaries).  There is no public pretrained checkpoint for this repo's
hermetic synthetic-box workload, so this module supplies the missing stage:
train a (tiny) YOLO on rendered images until it actually detects, producing
the frozen evaluator that makes detection-driven search meaningful — and an
mAP evaluation wrapper shared by tests and the test.py CLI flow.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from reconfigisp_tpu.yolo.net import init_yolo, apply_yolo
from reconfigisp_tpu.yolo.loss import yolo_loss, decode_head
from reconfigisp_tpu.yolo import metrics as ymetrics
from reconfigisp_tpu.utils import optim


def pretrain_yolo(blocks: List[dict], images_bgr, labels, img_size: int, *,
                  steps: int = 600, lr: float = 3e-3, batch: int = 4,
                  seed: int = 0, weights=None, log_every: int = 0,
                  obj_scale: float = 5.0, noobj_scale: float = 2.0):
    """Adam-train a YOLO graph on (images, labels) until it detects.

    images_bgr (N, S, S, 3) in [0,1]; labels (N, max_boxes, 6)
    [valid, cls, cx, cy, w, h].  Returns trained weights.

    Default loss balance differs from the inference-parity default in
    yolo_head_loss (reference noobj_scale=100): a 100:1 negative:positive
    ratio needs tens of thousands of iterations to lift objectness; 5:2
    reaches mAP 0.5+ on the synthetic-box workload in ~600 steps."""
    images_bgr = jnp.asarray(images_bgr)
    labels = jnp.asarray(labels)
    n = images_bgr.shape[0]
    if weights is None:
        weights = init_yolo(jax.random.PRNGKey(seed), blocks)
    opt_state = optim.adam_init(weights)

    @jax.jit
    def step(w, o, img, lab):
        def loss_fn(w_):
            heads = apply_yolo(w_, blocks, img[..., ::-1])
            return yolo_loss(heads, lab, img_size,
                             obj_scale=obj_scale, noobj_scale=noobj_scale)

        loss, grads = jax.value_and_grad(loss_fn)(w)
        w2, o2 = optim.adam_update(w, grads, o, lr=lr)
        return w2, o2, loss

    rng = np.random.default_rng(seed)
    loss = None
    for i in range(steps):
        idx = jnp.asarray(rng.integers(0, n, size=min(batch, n)))
        weights, opt_state, loss = step(weights, opt_state,
                                        images_bgr[idx], labels[idx])
        if log_every and (i + 1) % log_every == 0:
            print(f"[yolo] step {i + 1}/{steps} loss {float(loss):.3f}",
                  flush=True)
    return weights


def evaluate_map(weights, blocks, images_bgr, labels, img_size: int, *,
                 conf_thres: float = 0.5,
                 forward=None) -> dict:
    """mAP of the detector over (images, labels); same decode/NMS/AP path
    as the test.py CLI (reference util_yolo.py:81-200 machinery).

    `forward`: optional jitted (weights, images)->heads override."""
    images_bgr = jnp.asarray(images_bgr)
    if forward is None:
        forward = jax.jit(lambda w, im: apply_yolo(w, blocks, im[..., ::-1]))
    heads = forward(weights, images_bgr)
    all_dets, all_gts, all_tcls = [], [], []
    n = images_bgr.shape[0]
    decoded = []
    for head, anchors, _ in heads:
        b, cf, cl = decode_head(head, anchors, img_size)
        decoded.append((np.asarray(b), np.asarray(cf), np.asarray(cl)))
    labels = np.asarray(labels)
    for i in range(n):
        boxes = np.concatenate(
            [d[0][i].reshape(-1, 4) for d in decoded])
        confs = np.concatenate([d[1][i].reshape(-1) for d in decoded])
        clss = np.concatenate(
            [d[2][i].reshape(-1, d[2].shape[-1]) for d in decoded])
        dets = ymetrics.non_max_suppression(boxes, confs, clss,
                                            conf_thres=conf_thres)
        lab = labels[i]
        valid = lab[lab[:, 0] > 0.5]
        gtb = np.zeros((len(valid), 5), np.float32)
        gtb[:, 0] = valid[:, 1]
        gtb[:, 1] = (valid[:, 2] - valid[:, 4] / 2) * img_size
        gtb[:, 2] = (valid[:, 3] - valid[:, 5] / 2) * img_size
        gtb[:, 3] = (valid[:, 2] + valid[:, 4] / 2) * img_size
        gtb[:, 4] = (valid[:, 3] + valid[:, 5] / 2) * img_size
        all_dets.append(dets)
        all_gts.append(gtb)
        all_tcls.extend(valid[:, 1].tolist())
    stats = ymetrics.get_batch_statistics(all_dets, all_gts)
    if not stats:
        return {"mAP": 0.0, "n_det": 0}
    out = ymetrics.ap_per_class(
        np.concatenate([s[0] for s in stats]),
        np.concatenate([s[1] for s in stats]),
        np.concatenate([s[2] for s in stats]), all_tcls)
    out["n_det"] = int(sum(len(d) for d in all_dets))
    return out
