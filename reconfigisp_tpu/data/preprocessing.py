"""Offline preprocessing: raw sensor dumps -> training pair folders.

Re-design of reference codes/data/preprocessing/
generate_rggb2bgr_imgs_SID_Sony.py:32-110 and
generate_rggb2bgr_imgs_S7ISP_percentage.py:37-106.  The reference decodes
ARW/DNG with rawpy (not available here); this module ingests uint16 .npy
mosaics (or any array loadable by numpy), applies black-level subtraction and
exposure-ratio scaling through the native rawproc library, slices aligned
patches, and writes the noisy/gt pair-folder layout that
RawPairFolderDataset consumes.  `synthesize_pair_folder` generates the same
layout from procedural scenes for hermetic end-to-end runs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from reconfigisp_tpu.native import rawproc


def grbg_to_rggb(mosaic: np.ndarray) -> np.ndarray:
    """Crop one column so a GRBG mosaic becomes RGGB
    (reference generate...S7ISP_percentage.py:52-62)."""
    return mosaic[:, 1:-1]


def process_raw_pairs(raw_paths, gt_paths, out_root: str, *,
                      black: float, white: float, ratio: float = 1.0,
                      patch: Optional[int] = 256,
                      stride: Optional[int] = None) -> int:
    """Normalize raws, cut aligned patches, write pair folders.

    raw .npy: (H, W) uint16 mosaic; gt .npy/.png: (H, W, 3) image.
    Returns the number of patches written (reference SID script writes
    256px patch dumps + an index, generate...SID_Sony.py:101-109)."""
    os.makedirs(os.path.join(out_root, "noisy"), exist_ok=True)
    os.makedirs(os.path.join(out_root, "gt"), exist_ok=True)
    stride = stride or patch
    count = 0
    for raw_p, gt_p in zip(raw_paths, gt_paths):
        raw = np.load(raw_p)
        mosaic = rawproc.normalize_u16(raw, black, white, ratio)
        gt = np.load(gt_p) if gt_p.endswith(".npy") else _imread(gt_p)
        if gt.dtype == np.uint8:
            gt = gt.astype(np.float32) / 255.0
        name = os.path.splitext(os.path.basename(raw_p))[0]
        if patch is None:
            _dump(out_root, name, mosaic, gt)
            count += 1
            continue
        h, w = mosaic.shape[:2]
        for y0 in range(0, h - patch + 1, stride):
            for x0 in range(0, w - patch + 1, stride):
                y0a, x0a = y0 & ~1, x0 & ~1
                _dump(out_root, f"{name}_{y0a}_{x0a}",
                      mosaic[y0a:y0a + patch, x0a:x0a + patch],
                      gt[y0a:y0a + patch, x0a:x0a + patch])
                count += 1
    return count


def _imread(path):
    import cv2
    return cv2.imread(path, cv2.IMREAD_UNCHANGED)


def _dump(root, name, mosaic, gt):
    np.save(os.path.join(root, "noisy", name + ".npy"),
            mosaic.astype(np.float32))
    np.save(os.path.join(root, "gt", name + ".npy"), gt.astype(np.float32))


def synthesize_pair_folder(out_root: str, n: int = 16, size: int = 64,
                           seed: int = 0) -> int:
    """Write a synthetic pair folder (hermetic stand-in for SID/S7 dumps)."""
    from reconfigisp_tpu.data.datasets import SyntheticRawDataset
    ds = SyntheticRawDataset(n=n, size=size, seed=seed)
    os.makedirs(os.path.join(out_root, "noisy"), exist_ok=True)
    os.makedirs(os.path.join(out_root, "gt"), exist_ok=True)
    for i in range(n):
        s = ds[i]
        np.save(os.path.join(out_root, "noisy", f"{i:05d}.npy"),
                s["noisy"][..., 0])
        np.save(os.path.join(out_root, "gt", f"{i:05d}.npy"), s["gt"])
    return n
