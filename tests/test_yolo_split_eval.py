"""YOLO evaluation through test.py when the evaluated frame is larger than
the configured data_size (split / full-frame mode).

Pins the round-3 fix: decode strides and GT box scaling must come from the
ACTUAL merged frame, not ds_opt['data_size'] (the reference's yolo split test
only renders, test_yolo_split.py:125 — here mAP is wired end to end)."""

import importlib.util
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import yaml

from reconfigisp_tpu.data.datasets import SyntheticDetectionDataset
from reconfigisp_tpu.yolo.cfg import yolov3_tiny_test_blocks
from reconfigisp_tpu.yolo.net import save_darknet_weights
from reconfigisp_tpu.yolo.train import pretrain_yolo, evaluate_map

FRAME = 96      # actual frame size the detector sees
DATA_SIZE = 48  # configured data_size (the stale grid source pre-fix)


def _run_test_py(opt_path):
    """Execute the repo-root test.py main() in-process."""
    spec = importlib.util.spec_from_file_location(
        "reconfigisp_test_cli",
        os.path.join(os.path.dirname(__file__), "..", "test.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = ["test.py", "--opt", opt_path]
    try:
        return mod.main()
    finally:
        sys.argv = argv


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    """Detector + trained pipeline + config for 128px frames with
    data_size configured to 64."""
    root = tmp_path_factory.mktemp("yolo_split")
    ds = SyntheticDetectionDataset(n=16, size=FRAME, seed=5)
    gts = np.stack([ds[i]["gt"] for i in range(16)])
    labs = np.stack([ds[i]["label"] for i in range(16)])

    blocks = yolov3_tiny_test_blocks(num_classes=1)
    # staged training with best-stage selection: the tiny detector at 96px
    # trains noisily (plateaus ~0.3-0.4 mAP); the periodic Adam restarts of
    # the staging measurably stabilize it.  The grid-consistency assertions
    # below are all RELATIVE to the reached mAP.
    yweights, best_w, direct_map = None, None, -1.0
    for _ in range(5):
        yweights = pretrain_yolo(blocks, gts, labs, FRAME, steps=600,
                                 seed=0, weights=yweights)
        m = evaluate_map(yweights, blocks, gts, labs, FRAME,
                         conf_thres=0.3)["mAP"]
        if m > direct_map:
            best_w, direct_map = yweights, m
        if direct_map > 0.3:
            break
    yweights = best_w
    assert direct_map > 0.2, f"detector failed to train: mAP {direct_map}"
    wpath = str(root / "tiny.weights")
    save_darknet_weights(blocks, yweights, wpath)

    # train the fixed pipeline so rendered frames resemble the GT scenes
    from reconfigisp_tpu.pipeline import Pipeline
    from reconfigisp_tpu.search.trainer import IspTrainer
    from reconfigisp_tpu.utils import checkpoint

    # wbmanual (pure per-channel gains) rather than a statistics op like
    # whiteworld: per-tile statistics would change the render inside split
    # mode and confound the grid assertion
    arch = "Bayer_02_Demosaic_03_sRGB_11"
    pipe = Pipeline(arch)
    tr = IspTrainer(pipe, {"pixel_criterion": "l2", "lr_G": 5e-2})
    rng = np.random.default_rng(0)
    for _ in range(120):
        idx = rng.integers(0, 16, 2)
        tr.train_step({"noisy": np.stack([ds[int(i)]["noisy"] for i in idx]),
                       "gt": np.stack([ds[int(i)]["gt"] for i in idx])})
    mpath = checkpoint.save_network(str(root), "G", "final", tr.state)
    return root, blocks, yweights, arch, wpath, mpath, labs, direct_map


def _write_cfg(root, arch, wpath, mpath, *, split: bool) -> str:
    ds_opt = {"mode": "synthetic_yolo", "n": 8,  # eval on first 8
              "frame_size": FRAME, "data_size": DATA_SIZE,
              "conf_thres": 0.3, "save_strips": False}
    if split:
        ds_opt.update({"patch_size": 48, "patch_stride": 32})
    opt = {"name": f"yolo_split_{split}", "model": "isp_yolo",
           "datasets": {"test": ds_opt},
           "yolo": {"cfg": "tiny_test", "classes": 1, "weights": wpath},
           "network_G": {"which_model_G": "Pipeline", "architecture": arch},
           "path": {"pretrain_model_G": mpath,
                    "results_root": None, "log": None}}
    p = str(root / f"cfg_split_{split}.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(opt, f)
    return p


class TestYoloFrameGrid:
    def test_split_mode_map_survives(self, workload, capsys):
        root, _, _, arch, wpath, mpath, _, direct = workload
        cfg = _write_cfg(root, arch, wpath, mpath, split=True)
        _run_test_py(cfg)
        out = capsys.readouterr().out
        line = [l for l in out.splitlines() if l.startswith("map=")][-1]
        m = float(line.split("=")[1])
        assert m > 0.3 * direct, \
            f"mAP collapsed on split frames != data_size: {m} vs {direct}"

    def test_whole_mode_map_survives(self, workload, capsys):
        root, _, _, arch, wpath, mpath, _, direct = workload
        cfg = _write_cfg(root, arch, wpath, mpath, split=False)
        _run_test_py(cfg)
        out = capsys.readouterr().out
        line = [l for l in out.splitlines() if l.startswith("map=")][-1]
        m = float(line.split("=")[1])
        assert m > 0.3 * direct, \
            f"mAP collapsed on whole frames != data_size: {m} vs {direct}"

    def test_stale_grid_would_fail(self, workload):
        """Sanity anchor: decoding the 128px frames with the configured
        64px grid (the pre-fix behavior) destroys mAP — proving the
        assertions above actually discriminate."""
        root, blocks, yweights, _, _, _, labs, _ = workload
        ds = SyntheticDetectionDataset(n=8, size=FRAME, seed=5)
        gts = np.stack([ds[i]["gt"] for i in range(8)])
        labs = labs[:8]
        good = evaluate_map(yweights, blocks, gts, labs, FRAME,
                            conf_thres=0.3)["mAP"]
        # labels scaled as if the frame were DATA_SIZE: the grid mismatch
        stale = evaluate_map(yweights, blocks, gts,
                             labs, DATA_SIZE, conf_thres=0.3)["mAP"]
        assert good > 0.2
        assert stale < good * 0.5
