"""Datasets: raw Bayer (noisy) -> {sRGB ground truth | detection labels}.

Re-design of the reference's six dataset classes
(reference codes/data/sid_sony_ratio_rggb2bgr_dataset.py:20-139,
s7isp_rggb2bgr_dataset.py:20-129, oneplus_rggb2obj_dataset.py:23-265).
Backends: .npy / .png pair folders (the reference's lmdb/memcached backends
have no hermetic analog here; the folder layout is produced by
data/preprocessing.py), plus fully synthetic datasets so every pipeline is
testable without external data.

Conventions (match the reference):
  * noisy input: single-channel RGGB mosaic, normalized to [0, 1] by the
    sensor white level (16383 for 14-bit SID — sid...dataset.py:133; 1023 for
    10-bit S7/OnePlus — s7isp...py:123);
  * GT: BGR in [0, 1];
  * random crops are RGGB-aligned: offsets snapped to even indices
    (sid...dataset.py:119-126).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class SyntheticRawDataset:
    """Procedural raw->sRGB pairs: piecewise-smooth BGR scenes are mosaicked
    (RGGB), gained down and noised to form the raw input; the clean scene is
    the ground truth.  Deterministic per (seed, index)."""

    def __init__(self, n: int = 64, size: int = 64, noise_std: float = 0.03,
                 gain: float = 0.5, seed: int = 0, data_size: Optional[int] = None):
        self.n = n
        self.size = size if data_size is None else data_size
        self.noise_std = noise_std
        self.gain = gain
        self.seed = seed

    def __len__(self):
        return self.n

    def _scene(self, rng, s):
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        base = np.stack([
            0.2 + 0.6 * (a * yy + b * xx) % 1.0
            for a, b in rng.uniform(0.3, 1.7, (3, 2))], axis=-1)
        for _ in range(4):  # random soft boxes
            y0, x0 = rng.integers(0, s // 2, 2)
            h, w = rng.integers(s // 8, s // 2, 2)
            color = rng.uniform(0.1, 0.9, 3)
            base[y0:y0 + h, x0:x0 + w] = 0.5 * base[y0:y0 + h, x0:x0 + w] + 0.5 * color
        return np.clip(base, 0.0, 1.0).astype(np.float32)

    @staticmethod
    def mosaic_rggb(bgr: np.ndarray) -> np.ndarray:
        """BGR (H,W,3) -> RGGB mosaic (H,W,1)."""
        h, w, _ = bgr.shape
        m = np.zeros((h, w), np.float32)
        m[0::2, 0::2] = bgr[0::2, 0::2, 2]  # R
        m[0::2, 1::2] = bgr[0::2, 1::2, 1]  # G
        m[1::2, 0::2] = bgr[1::2, 0::2, 1]  # G
        m[1::2, 1::2] = bgr[1::2, 1::2, 0]  # B
        return m[..., None]

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        gt = self._scene(rng, self.size)
        mosaic = self.mosaic_rggb(gt)
        noisy = mosaic * self.gain + rng.normal(
            0, self.noise_std, mosaic.shape).astype(np.float32)
        return {"noisy": np.clip(noisy, 0.0, 1.0).astype(np.float32),
                "gt": gt}


class RawPairFolderDataset:
    """Paired folder backend: <root>/noisy/<name>.npy and <root>/gt/<name>.npy
    (or .png via cv2).  npy raws may be uint16 (divided by `white_level`) or
    float32 in [0,1]; pngs are divided by 255.

    data_size crops RGGB-aligned random patches at train time
    (reference sid...dataset.py:119-126); None returns full frames.
    """

    def __init__(self, root: str, data_size: Optional[int] = None,
                 white_level: float = 1023.0, seed: int = 0,
                 is_train: bool = True):
        self.root = root
        self.data_size = data_size
        self.white_level = white_level
        self.is_train = is_train
        self.seed = seed
        noisy_dir = os.path.join(root, "noisy")
        self.names = sorted(
            os.path.splitext(f)[0] for f in os.listdir(noisy_dir))
        if not self.names:
            raise ValueError(f"no files under {noisy_dir}")

    def __len__(self):
        return len(self.names)

    def _load(self, sub: str, name: str) -> np.ndarray:
        for ext in (".npy", ".png"):
            p = os.path.join(self.root, sub, name + ext)
            if os.path.exists(p):
                if ext == ".npy":
                    arr = np.load(p)
                    if arr.dtype == np.uint16:
                        arr = arr.astype(np.float32) / self.white_level
                    return arr.astype(np.float32)
                import cv2
                img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
                return img.astype(np.float32) / 255.0
        raise FileNotFoundError(f"{name} under {self.root}/{sub}")

    def __getitem__(self, idx: int) -> dict:
        name = self.names[idx]
        noisy = self._load("noisy", name)
        gt = self._load("gt", name)
        if noisy.ndim == 2:
            noisy = noisy[..., None]
        if self.data_size:
            s = self.data_size
            rng = np.random.default_rng(self.seed * 7919 + idx)
            h, w = noisy.shape[:2]
            y0 = int(rng.integers(0, max(h - s, 1) // 2 + 1)) * 2
            x0 = int(rng.integers(0, max(w - s, 1) // 2 + 1)) * 2
            noisy = noisy[y0:y0 + s, x0:x0 + s]
            gt = gt[y0:y0 + s, x0:x0 + s]
        return {"noisy": noisy, "gt": gt}


class SyntheticDetectionDataset(SyntheticRawDataset):
    """Raw Bayer -> detection targets: scenes contain bright rectangles whose
    boxes are the labels (the hermetic analog of the OnePlus labelme-JSON
    dataset, reference oneplus_rggb2obj_dataset.py:160-194).

    Labels: (max_boxes, 6) rows [valid, cls, cx, cy, w, h] normalized, the
    YOLO target layout (fixed max_boxes replaces the reference's
    variable-length collate, oneplus...py:207-229 — static shapes for jit)."""

    def __init__(self, n: int = 64, size: int = 64, max_boxes: int = 8,
                 **kw):
        super().__init__(n=n, size=size, **kw)
        self.max_boxes = max_boxes

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        s = self.size
        gt = self._scene(rng, s) * 0.4
        labels = np.zeros((self.max_boxes, 6), np.float32)
        n_obj = int(rng.integers(1, min(self.max_boxes, 4) + 1))
        for k in range(n_obj):
            h, w = rng.integers(s // 8, s // 3, 2)
            y0 = int(rng.integers(0, s - h))
            x0 = int(rng.integers(0, s - w))
            gt[y0:y0 + h, x0:x0 + w] = rng.uniform(0.7, 1.0, 3)
            labels[k] = [1.0, 0.0, (x0 + w / 2) / s, (y0 + h / 2) / s,
                         w / s, h / s]
        gt = np.clip(gt, 0, 1).astype(np.float32)
        mosaic = self.mosaic_rggb(gt)
        noisy = mosaic * self.gain + rng.normal(
            0, self.noise_std, mosaic.shape).astype(np.float32)
        return {"noisy": np.clip(noisy, 0, 1).astype(np.float32),
                "gt": gt, "label": labels}


def create_dataset(dataset_opt: dict):
    """Factory keyed on `mode` (reference codes/data/__init__.py:33-53)."""
    mode = dataset_opt.get("mode", "synthetic")
    if mode in ("synthetic", "Synthetic"):
        return SyntheticRawDataset(
            n=dataset_opt.get("n", 64) or 64,
            size=dataset_opt.get("data_size", 64) or 64,
            noise_std=dataset_opt.get("noise_std", 0.03) or 0.03,
            seed=dataset_opt.get("seed", 0) or 0)
    if mode in ("synthetic_yolo", "SyntheticYolo"):
        return SyntheticDetectionDataset(
            n=dataset_opt.get("n", 64) or 64,
            size=dataset_opt.get("data_size", 64) or 64,
            seed=dataset_opt.get("seed", 0) or 0)
    if mode.startswith("SID"):
        return RawPairFolderDataset(
            dataset_opt["dataroot"], dataset_opt.get("data_size"),
            white_level=16383.0,
            is_train=dataset_opt.get("is_train", True))
    if mode.startswith(("S7ISP", "OnePlus", "Folder")):
        return RawPairFolderDataset(
            dataset_opt["dataroot"], dataset_opt.get("data_size"),
            white_level=1023.0,
            is_train=dataset_opt.get("is_train", True))
    raise ValueError(f"unknown dataset mode {mode!r}")
