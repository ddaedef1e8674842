"""Integration test of the real-scale rehearsal fixture path (SID leg):
fabricated 1424x2128 14-bit DNGs -> data/dng.py decode -> preprocessing
(black-level subtract + exposure-ratio scale) -> folder/packed datasets at
the reference's true frame geometry (generate_rggb2bgr_imgs_SID_Sony.py:50).

Keeps tools/rehearse_real_scale.py's data plumbing covered by CI without
running any search (the TPU rehearsal exercises that part).
"""

import importlib.util
import os

import numpy as np
import pytest


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "rehearse_real_scale_under_test",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "rehearse_real_scale.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sid_fixture_roots(tmp_path_factory):
    tool = _load_tool()
    root = str(tmp_path_factory.mktemp("rehearsal"))
    train_root, test_root = tool.build_sid_fixtures(
        root, n_train=1, n_test=1)
    return train_root, test_root


class TestSidFixtures:
    def test_train_folder_pairs_at_reference_scale(self, sid_fixture_roots):
        from reconfigisp_tpu.data.datasets import RawPairFolderDataset
        train_root, _ = sid_fixture_roots
        ds = RawPairFolderDataset(train_root, data_size=48, is_train=True)
        s = ds[0]
        assert s["noisy"].shape == (48, 48, 1)
        assert s["gt"].shape == (48, 48, 3)
        # exposure-ratio x100 scaling of a ~[0,1]/100 short exposure keeps
        # the raw in [0,1] and non-degenerate
        full = np.load(os.path.join(
            train_root, "noisy", sorted(os.listdir(
                os.path.join(train_root, "noisy")))[0]))
        assert full.shape == (1424, 2128) or full.shape == (1424, 2128, 1)
        assert 0.0 <= float(full.min()) and float(full.max()) <= 1.0
        assert float(full.max()) > 0.25  # ratio applied, not raw short frame

    def test_packed_test_set_with_exposure_keys(self, sid_fixture_roots):
        from reconfigisp_tpu.data.datasets import PairRecordDataset
        _, test_root = sid_fixture_roots
        ds = PairRecordDataset(test_root, is_train=False)
        assert len(ds) >= 1
        s = ds[0]
        h, w = s["noisy"].shape[:2]
        assert (h, w) == (1424, 2128)
        assert s["gt"].shape[:2] == (1424, 2128)
        assert float(s["noisy"].max()) <= 1.0


class TestLetterboxGeometry:
    def test_letterbox_matches_the_oneplus_loader_transform(self, tmp_path):
        """The criterion-pretrain views must sit at the loader's geometry:
        round-5 run 2 pretrained on square-squashed frames + native tiles
        (geometries the eval never produces) and the memorizing 2-scene
        criterion scored objectness 0.000 on the actual letterboxed eval
        view (mAP 0).  Pin _letterbox == OnePlusDetectionDataset's resize/
        pad/label transform."""
        import cv2
        import json
        from reconfigisp_tpu.data.datasets import OnePlusDetectionDataset
        tool = _load_tool()
        rng = np.random.default_rng(5)
        h, w, d = 600, 800, 256
        scene = rng.uniform(0.1, 0.4, (h, w, 3)).astype(np.float32)
        x0, y0, x1, y1 = 200, 150, 500, 390
        scene[y0:y1, x0:x1] = rng.uniform(0.7, 1.0, 3)
        cv2.imwrite(str(tmp_path / "000.png"),
                    (np.clip(tool._mosaic(scene), 0, 1) * 1023
                     ).astype(np.uint16))
        with open(tmp_path / "000.json", "w") as f:
            json.dump({"shapes": [{"label": "car",
                                   "points": [[x0, y0], [x1, y1]]}]}, f)
        ds = OnePlusDetectionDataset(str(tmp_path), data_size=d,
                                     desired=d, is_train=False)
        sample = ds[0]
        lab = sample["label"][0]
        assert lab[0] == 1.0 and lab[1] == 2.0

        canvas, (rh, rw, top) = tool._letterbox(scene, d)
        assert canvas.shape == (d, d, 3)
        # content band sits exactly where the loader puts the mosaic band
        assert float(np.abs(canvas[:top]).max()) == 0.0
        band_rows = int(round(h * (d / max(h, w)) / 2)) * 2
        assert float(np.abs(canvas[top + band_rows:]).max()) == 0.0
        # the box's letterbox-coordinate center == the loader's label center
        cx = ((x0 + x1) / 2 * rw) / d
        cy = ((y0 + y1) / 2 * rh + top) / d
        assert abs(cx - float(lab[2])) < 2.0 / d
        assert abs(cy - float(lab[3])) < 2.0 / d
        assert abs((x1 - x0) * rw / d - float(lab[4])) < 2.0 / d
        assert abs((y1 - y0) * rh / d - float(lab[5])) < 2.0 / d


class TestS7GrbgFabrication:
    def test_grbg_phase_shift_keeps_content_aligned(self):
        """The S7 fixtures fabricate GRBG by shifting the CFA PHASE only;
        an np.roll of the RGGB mosaic once shifted the scene a column and
        misregistered every raw/GT pair (GT is scene[:, 1:-1] after the
        GRBG->RGGB column crop)."""
        from reconfigisp_tpu.data import preprocessing
        tool = _load_tool()
        rng = np.random.default_rng(0)
        scene = rng.uniform(0.1, 0.9, (8, 10, 3)).astype(np.float32)
        grbg = tool._mosaic(
            np.concatenate([scene[:, :1], scene], axis=1))[:, 1:]
        # GRBG: row0 = G R G R..., row1 = B G B G..., content at pixel (y,x)
        assert grbg[0, 0] == scene[0, 0, 1]   # G
        assert grbg[0, 1] == scene[0, 1, 2]   # R
        assert grbg[1, 0] == scene[1, 0, 0]   # B
        assert grbg[1, 1] == scene[1, 1, 1]   # G
        rggb = preprocessing.grbg_to_rggb(grbg)
        gt = scene[:, 1:-1]
        # after the column crop the mosaic is RGGB and every sample matches
        # the SAME pixel of the cropped GT
        assert rggb[0, 0] == gt[0, 0, 2]      # R
        assert rggb[0, 1] == gt[0, 1, 1]      # G
        assert rggb[1, 0] == gt[1, 0, 1]      # G
        assert rggb[1, 1] == gt[1, 1, 0]      # B
