"""Real-dataset ingestion: packed backend, meta-indexed pairs, OnePlus
labelme-JSON detection dataset (reference workloads, SURVEY §2 rows 24-27)."""

import json
import os
import pickle

import numpy as np
import pytest

from reconfigisp_tpu.data.backends import (
    PackedPairWriter, PackedReader, open_backend)
from reconfigisp_tpu.data.datasets import (
    PairRecordDataset, OnePlusDetectionDataset, create_dataset)
from reconfigisp_tpu.data import preprocessing


def _write_packed(root, n=4, size=16, expos=None):
    rng = np.random.default_rng(0)
    with PackedPairWriter(root, resolution=size) as w:
        for i in range(n):
            tag = expos[i] if expos else ""
            noisy = (rng.uniform(0, 1, (size, size)) * 16383).astype(np.uint16)
            gt = (rng.uniform(0, 1, (size, size, 3)) * 255).astype(np.uint8)
            w.add_pair(f"noisy/{i:03d}{tag}", noisy, f"gt/{i:03d}_10s", gt)
    return root


class TestPackedBackend:
    def test_roundtrip(self, tmp_path):
        root = _write_packed(str(tmp_path))
        r = PackedReader(root)
        a = r.read("noisy/000")
        assert a.shape == (16, 16) and a.dtype == np.uint16
        b = r.read("gt/000_10s")
        assert b.shape == (16, 16, 3) and b.dtype == np.uint8

    def test_auto_backend_detection(self, tmp_path):
        root = _write_packed(str(tmp_path))
        reader, meta = open_backend(root)
        assert isinstance(reader, PackedReader)
        assert meta["keys_ratio"] == meta["keys_noisy"]


class TestPairRecordDataset:
    def test_crops_and_normalization(self, tmp_path):
        root = _write_packed(str(tmp_path))
        ds = PairRecordDataset(root, data_size=8, white_level=16383.0)
        s = ds[0]
        assert s["noisy"].shape == (8, 8, 1)
        assert s["gt"].shape == (8, 8, 3)
        assert 0.0 <= s["noisy"].min() and s["noisy"].max() <= 1.0

    def test_exposure_selection(self, tmp_path):
        """Only pairs whose keys contain the expo substrings survive
        (reference sid...py:50-58)."""
        expos = ["_0.1s", "_0.1s", "_0.04s", "_0.04s"]
        root = _write_packed(str(tmp_path), expos=expos)
        ds = PairRecordDataset(root, expo_in="_0.1s", expo_gt="10s")
        assert len(ds) == 2
        with pytest.raises(ValueError):
            PairRecordDataset(root, expo_in="_30s")

    def test_create_dataset_routes_to_records(self, tmp_path):
        root = _write_packed(str(tmp_path))
        ds = create_dataset({"mode": "SID", "dataroot": root,
                             "data_size": 8})
        assert isinstance(ds, PairRecordDataset)


class TestProcessRawPairsPacked:
    def test_per_pair_ratio_to_packed(self, tmp_path):
        raws, gts, ratios = [], [], []
        for i, ratio in enumerate([2.0, 4.0]):
            raw = np.full((8, 8), 512 + 100, np.uint16)  # black=512
            gt = np.full((8, 8, 3), 128, np.uint8)
            rp = str(tmp_path / f"r{i}.npy")
            gp = str(tmp_path / f"g{i}.npy")
            np.save(rp, raw)
            np.save(gp, gt.astype(np.float32) / 255.0)
            raws.append(rp)
            gts.append(gp)
            ratios.append(ratio)
        out = str(tmp_path / "packed")
        n = preprocessing.process_raw_pairs(
            raws, gts, out, black=512, white=1023, ratio=ratios,
            patch=None, packed=True)
        assert n == 2
        r = PackedReader(out)
        v0 = r.read("noisy/r0")[0, 0]
        v1 = r.read("noisy/r1")[0, 0]
        # (100 / (1023-512)) * ratio, per pair
        np.testing.assert_allclose(v0, 100 / 511 * 2.0, rtol=1e-5)
        np.testing.assert_allclose(v1, 100 / 511 * 4.0, rtol=1e-5)


def _labelme(path, shapes):
    with open(path, "w") as f:
        json.dump({"shapes": [
            {"label": lab, "points": [[x0, y0], [x1, y1]]}
            for lab, x0, y0, x1, y1 in shapes]}, f)


def _write_oneplus(root, n=2, h=128, w=256):
    """uint16 mosaic pngs (wider than tall, like the reference DNGs) +
    labelme jsons; a big bright box in the middle is 'car'."""
    import cv2
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        img = (rng.uniform(0.05, 0.2, (h, w)) * 1023).astype(np.uint16)
        img[h // 4:3 * h // 4, w // 4:3 * w // 4] = 900
        cv2.imwrite(os.path.join(root, f"{i:03d}.png"), img)
        _labelme(os.path.join(root, f"{i:03d}.json"), [
            ("car", w // 4, h // 4, 3 * w // 4, 3 * h // 4),
            ("bicycle", 0, 0, 10, 10),          # class not in dict
            ("person", -50, -50, 2, 2),         # mostly outside, IoU < 0.5
        ])
    return root


class TestOnePlusDataset:
    def test_labels_and_filters(self, tmp_path):
        root = _write_oneplus(str(tmp_path / "op"))
        ds = OnePlusDetectionDataset(root, data_size=64, desired=128,
                                     max_crop=8, seed=1)
        s = ds[0]
        assert s["noisy"].shape == (64, 64, 1)
        assert s["label"].shape == (16, 6)
        valid = s["label"][s["label"][:, 0] > 0]
        # retries until the car box is visible; never the filtered classes
        assert len(valid) >= 1
        assert set(valid[:, 1].tolist()) <= {2.0}
        # normalized coords in range
        assert ((valid[:, 2:] >= 0) & (valid[:, 2:] <= 1)).all()

    def test_bayer_structure_preserved(self, tmp_path):
        """Distinct per-phase values must survive resize + crop alignment."""
        import cv2
        root = str(tmp_path / "cfa")
        os.makedirs(root)
        img = np.zeros((64, 128), np.uint16)
        img[0::2, 0::2] = 1000   # R
        img[0::2, 1::2] = 600    # G1
        img[1::2, 0::2] = 400    # G2
        img[1::2, 1::2] = 200    # B
        cv2.imwrite(os.path.join(root, "a.png"), img)
        _labelme(os.path.join(root, "a.json"),
                 [("car", 10, 10, 120, 60)])
        ds = OnePlusDetectionDataset(root, data_size=32, desired=64,
                                     max_crop=2, seed=0)
        m = ds[0]["noisy"][..., 0]
        content = m[np.abs(m) > 1e-6]
        phases = m[0::2, 0::2], m[0::2, 1::2], m[1::2, 0::2], m[1::2, 1::2]
        # wherever there is content, each phase holds one constant value
        vals = []
        for ph in phases:
            pv = ph[ph > 1e-6]
            if pv.size:
                assert pv.std() < 1e-4
                vals.append(round(float(pv.mean()) * 1023))
        assert set(vals) <= {1000, 600, 400, 200}
        assert len(set(vals)) >= 3

    def test_create_dataset_routing(self, tmp_path):
        root = _write_oneplus(str(tmp_path / "op2"))
        ds = create_dataset({"mode": "OnePlus_Rggb2Obj", "dataroot": root,
                             "data_size": 64, "desired_size": 128})
        assert isinstance(ds, OnePlusDetectionDataset)
