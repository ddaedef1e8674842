"""Tests for the YOLOv3 evaluator: graph, weights, loss, NMS/mAP."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconfigisp_tpu.yolo import cfg as ycfg
from reconfigisp_tpu.yolo.net import (
    init_yolo, apply_yolo, load_darknet_weights, save_darknet_weights)
from reconfigisp_tpu.yolo.loss import (
    decode_head, build_targets, yolo_loss, yolo_head_loss)
from reconfigisp_tpu.yolo import metrics as ymetrics


class TestGraph:
    def test_full_yolov3_structure(self):
        blocks = ycfg.yolov3_blocks(80)
        convs = [b for b in blocks if b["type"] == "convolutional"]
        shorts = [b for b in blocks if b["type"] == "shortcut"]
        routes = [b for b in blocks if b["type"] == "route"]
        ups = [b for b in blocks if b["type"] == "upsample"]
        yolos = [b for b in blocks if b["type"] == "yolo"]
        # the standard cfg: 75 conv, 23 shortcut, 4 route, 2 upsample, 3 yolo
        # (reference yolo_v3.cfg per SURVEY §2.19)
        assert (len(convs), len(shorts), len(routes), len(ups),
                len(yolos)) == (75, 23, 4, 2, 3)
        # route anchor points at layers 61 and 36 (standard YOLOv3)
        concat_routes = [b for b in routes if len(b["layers"]) == 2]
        assert sorted(b["layers"][1] for b in concat_routes) == [36, 61]

    def test_tiny_graph_forward_shapes(self, key):
        blocks = ycfg.yolov3_tiny_test_blocks(num_classes=1)
        w = init_yolo(key, blocks)
        x = jnp.zeros((2, 32, 32, 3))
        heads = apply_yolo(w, blocks, x)
        assert len(heads) == 2
        h0, anchors0, c0 = heads[0]
        assert h0.shape == (2, 3, 8, 8, 6)  # 32/4, 3 anchors, 5+1
        h1, _, _ = heads[1]
        assert h1.shape == (2, 3, 16, 16, 6)

    def test_full_yolov3_forward(self, key):
        blocks = ycfg.yolov3_blocks(80)
        w = init_yolo(key, blocks)
        x = jnp.zeros((1, 64, 64, 3))
        heads = apply_yolo(w, blocks, x)
        assert [h[0].shape for h in heads] == [
            (1, 3, 2, 2, 85), (1, 3, 4, 4, 85), (1, 3, 8, 8, 85)]

    def test_darknet_weight_roundtrip(self, key, tmp_path):
        """Binary format parity (reference yolo_v3_net.py:271-322)."""
        blocks = ycfg.yolov3_tiny_test_blocks(num_classes=2)
        w = init_yolo(key, blocks)
        path = str(tmp_path / "w.weights")
        save_darknet_weights(blocks, w, path)
        w2 = load_darknet_weights(blocks, path)
        for a, b in zip(jax.tree.leaves(w), jax.tree.leaves(w2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_cfg_parser(self, tmp_path):
        cfg_text = """
[net]
width=416

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=0
filters=18
size=1
stride=1
pad=1
activation=linear

[yolo]
mask = 0,1,2
anchors = 10,13, 16,30, 33,23
classes=1
num=3
"""
        p = tmp_path / "t.cfg"
        p.write_text(cfg_text)
        blocks = ycfg.parse_cfg(str(p))
        assert [b["type"] for b in blocks] == [
            "convolutional", "convolutional", "yolo"]
        assert blocks[0]["filters"] == 16
        assert blocks[2]["anchors"][:2] == [(10, 13), (16, 30)]
        assert blocks[2]["mask"] == [0, 1, 2]


class TestLoss:
    def _labels(self):
        lab = np.zeros((2, 4, 6), np.float32)
        lab[0, 0] = [1, 0, 0.5, 0.5, 0.25, 0.25]
        lab[1, 0] = [1, 0, 0.25, 0.75, 0.5, 0.3]
        return jnp.asarray(lab)

    def test_build_targets_placement(self):
        anchors = jnp.asarray([[1.0, 1.0], [2.0, 2.0], [4.0, 4.0]])
        t = build_targets(self._labels(), anchors, 8, 8, 1)
        # box 0 of image 0: center (0.5,0.5)*8 = (4,4); wh 2x2 grid -> anchor 1
        assert float(t["obj"][0, 1, 4, 4]) == 1.0
        assert float(jnp.sum(t["obj"][0])) == 1.0
        # invalid rows contribute nothing
        assert float(jnp.sum(t["obj"])) == 2.0
        # noobj off at object cells
        assert float(t["noobj"][0, 1, 4, 4]) == 0.0
        # tw = log(wh / anchor) = log(2/2) = 0
        assert float(t["tx"][0, 1, 4, 4]) == pytest.approx(0.0)
        assert float(t["tw"][0, 1, 4, 4]) == pytest.approx(0.0, abs=1e-6)

    def test_loss_finite_and_differentiable(self, key):
        blocks = ycfg.yolov3_tiny_test_blocks(num_classes=1)
        w = init_yolo(key, blocks)
        labels = self._labels()

        def loss_fn(img):
            heads = apply_yolo(w, blocks, img)
            return yolo_loss(heads, labels, img_size=32)

        img = jnp.full((2, 32, 32, 3), 0.5)
        loss, g = jax.value_and_grad(loss_fn)(img)
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0  # gradient reaches the image (ISP)

    def test_empty_labels_zero_guard(self, key):
        """No boxes -> objectness-only loss, finite
        (reference darts_yolo_model.py:147-152)."""
        blocks = ycfg.yolov3_tiny_test_blocks(num_classes=1)
        w = init_yolo(key, blocks)
        labels = jnp.zeros((2, 4, 6))
        heads = apply_yolo(w, blocks, jnp.full((2, 32, 32, 3), 0.5))
        loss = yolo_loss(heads, labels, img_size=32)
        assert np.isfinite(float(loss))

    def test_decode_head_geometry(self):
        head = jnp.zeros((1, 2, 4, 4, 6))
        anchors = [(8, 8), (16, 16)]
        boxes, conf, cls = decode_head(head, anchors, img_size=32)
        # zero logits: xy = (grid + 0.5) * stride, wh = anchors
        assert float(boxes[0, 0, 0, 0, 0]) == pytest.approx(4.0)  # (0+.5)*8
        assert float(boxes[0, 0, 1, 2, 1]) == pytest.approx(12.0)
        assert float(boxes[0, 1, 0, 0, 2]) == pytest.approx(16.0)
        assert float(conf[0, 0, 0, 0]) == pytest.approx(0.5)


class TestMetrics:
    def test_nms_merges_overlaps(self):
        boxes = np.asarray([[10, 10, 4, 4], [10.5, 10, 4, 4], [30, 30, 4, 4]],
                           np.float32)
        conf = np.asarray([0.9, 0.8, 0.7], np.float32)
        cls = np.ones((3, 1), np.float32)
        dets = ymetrics.non_max_suppression(boxes, conf, cls,
                                            conf_thres=0.5, nms_thres=0.4)
        assert len(dets) == 2

    def test_map_perfect_detection(self):
        gt = [np.asarray([[0, 8, 8, 12, 12]], np.float32)]
        dets = [np.asarray([[8, 8, 12, 12, 0.9, 0.9, 0]], np.float32)]
        stats = ymetrics.get_batch_statistics(dets, gt)
        tp = np.concatenate([s[0] for s in stats])
        conf = np.concatenate([s[1] for s in stats])
        pred_cls = np.concatenate([s[2] for s in stats])
        out = ymetrics.ap_per_class(tp, conf, pred_cls, [0])
        assert out["mAP"] == pytest.approx(1.0)

    def test_map_false_positive(self):
        gt = [np.asarray([[0, 8, 8, 12, 12]], np.float32)]
        dets = [np.asarray([[8, 8, 12, 12, 0.9, 0.9, 0],
                            [30, 30, 34, 34, 0.95, 0.9, 0]], np.float32)]
        stats = ymetrics.get_batch_statistics(dets, gt)
        out = ymetrics.ap_per_class(
            np.concatenate([s[0] for s in stats]),
            np.concatenate([s[1] for s in stats]),
            np.concatenate([s[2] for s in stats]), [0])
        assert 0 < out["mAP"] < 1.0


class TestYoloTraining:
    def test_darts_yolo_end_to_end(self, tmp_path):
        from reconfigisp_tpu import config
        from reconfigisp_tpu.search.trainer import run_training
        opt = config.parse_dict({
            "name": "t_yolo", "model": "darts_yolo",
            "datasets": {"train": {"mode": "synthetic_yolo", "n": 16,
                                   "data_size": 32, "batch_size": 2}},
            "yolo": {"cfg": "tiny_test", "classes": 1},
            "network_G": {"n_step": 1, "prune_threshold": 0.2,
                          "srgb_count": 4},
            "train": {"lr_G": 1e-3, "momentum_G": 0.9, "lr_meta": 1e-3,
                      "beta1": 0.9, "beta2": 0.99, "pixel_criterion": "l2",
                      "niter": 3, "lr_scheme": "MultiStepLR",
                      "lr_steps": [], "manual_seed": 1},
            "logger": {"print_freq": 1},
        }, root=str(tmp_path))
        summary = run_training(opt)
        assert summary["steps"] == 3
        assert np.isfinite(summary["loss"])

    def test_isp_yolo_end_to_end(self, tmp_path):
        from reconfigisp_tpu import config
        from reconfigisp_tpu.search.trainer import run_training
        opt = config.parse_dict({
            "name": "t_isp_yolo", "model": "isp_yolo",
            "datasets": {"train": {"mode": "synthetic_yolo", "n": 16,
                                   "data_size": 32, "batch_size": 2}},
            "yolo": {"cfg": "tiny_test", "classes": 1},
            "network_G": {"architecture": "Bayer_02_Demosaic_02_sRGB_01"},
            "train": {"lr_G": 1e-3, "pixel_criterion": "l2", "niter": 3,
                      "lr_scheme": "MultiStepLR", "lr_steps": [],
                      "manual_seed": 1},
            "logger": {"print_freq": 1},
        }, root=str(tmp_path))
        summary = run_training(opt)
        assert summary["steps"] == 3
        assert np.isfinite(summary["loss"])
