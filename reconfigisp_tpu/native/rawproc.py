"""ctypes bindings for the native rawproc library, with numpy fallbacks.

Build with `make -C reconfigisp_tpu/native` (auto-attempted on first import).
Every entry point has a pure-numpy fallback so the framework works unbuilt;
`HAVE_NATIVE` reports which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "librawproc.so")


def _load():
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rawproc_normalize_u16.argtypes = [
        u16p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, f32p]
    lib.rawproc_crop_norm_batch.argtypes = [
        u16p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, f32p, ctypes.c_int]
    lib.rawproc_pack_rggb.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p]
    lib.rawproc_feather_accumulate.argtypes = [
        f32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.rawproc_version.restype = ctypes.c_int
    return lib


_LIB = _load()
HAVE_NATIVE = _LIB is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def normalize_u16(raw: np.ndarray, black: float, white: float,
                  ratio: float = 1.0) -> np.ndarray:
    """(x - black) * ratio / (white - black), clipped to [0, 1]
    (the reference's black-level + exposure-ratio scaling,
    generate_rggb2bgr_imgs_SID_Sony.py:50-56)."""
    raw = np.ascontiguousarray(raw, np.uint16)
    out = np.empty(raw.shape, np.float32)
    if _LIB is not None:
        _LIB.rawproc_normalize_u16(
            _ptr(raw, ctypes.c_uint16), raw.size, black, white, ratio,
            _ptr(out, ctypes.c_float))
        return out
    return np.clip((raw.astype(np.float32) - black) * ratio / (white - black),
                   0.0, 1.0)


def crop_norm_batch(raws: np.ndarray, offsets: np.ndarray, size: int,
                    black: float, white: float, ratio: float = 1.0,
                    n_threads: int = 4) -> np.ndarray:
    """(N,H,W) uint16 + (N,2) offsets -> (N,size,size) float32, crops snapped
    to even offsets (RGGB phase)."""
    raws = np.ascontiguousarray(raws, np.uint16)
    offsets = np.ascontiguousarray(offsets, np.int32)
    n, h, w = raws.shape
    out = np.empty((n, size, size), np.float32)
    if _LIB is not None:
        _LIB.rawproc_crop_norm_batch(
            _ptr(raws, ctypes.c_uint16), n, h, w,
            _ptr(offsets, ctypes.c_int32), size, black, white, ratio,
            _ptr(out, ctypes.c_float), n_threads)
        return out
    for i in range(n):
        y0 = min(max(int(offsets[i, 0]) & ~1, 0), h - size)
        x0 = min(max(int(offsets[i, 1]) & ~1, 0), w - size)
        out[i] = np.clip(
            (raws[i, y0:y0 + size, x0:x0 + size].astype(np.float32) - black)
            * ratio / (white - black), 0.0, 1.0)
    return out


def pack_rggb(mosaic: np.ndarray) -> np.ndarray:
    """(H,W) float32 -> (4, H/2, W/2) RGGB planes."""
    mosaic = np.ascontiguousarray(mosaic, np.float32)
    h, w = mosaic.shape
    out = np.empty((4, h // 2, w // 2), np.float32)
    if _LIB is not None:
        _LIB.rawproc_pack_rggb(_ptr(mosaic, ctypes.c_float), h, w,
                               _ptr(out, ctypes.c_float))
        return out
    out[0] = mosaic[0::2, 0::2]
    out[1] = mosaic[0::2, 1::2]
    out[2] = mosaic[1::2, 0::2]
    out[3] = mosaic[1::2, 1::2]
    return out


def feather_accumulate(patches: np.ndarray, positions: np.ndarray,
                       mask: np.ndarray, H: int, W: int,
                       n_threads: int = 4):
    """Accumulate (P,h,w,C) patches at (P,2) positions with a feather mask ->
    (out (H,W,C), count (H,W)) — host-side patch2whole for frames too large
    to blend on-device (reference util_path_restore.py:108-134)."""
    patches = np.ascontiguousarray(patches, np.float32)
    positions = np.ascontiguousarray(positions, np.int32)
    mask = np.ascontiguousarray(mask, np.float32)
    p, ph, pw, c = patches.shape
    out = np.zeros((H, W, c), np.float32)
    count = np.zeros((H, W), np.float32)
    if _LIB is not None:
        _LIB.rawproc_feather_accumulate(
            _ptr(patches, ctypes.c_float), _ptr(positions, ctypes.c_int32),
            p, ph, pw, c, _ptr(mask, ctypes.c_float),
            _ptr(out, ctypes.c_float), _ptr(count, ctypes.c_float),
            H, W, n_threads)
        return out, count
    for k in range(p):
        y0, x0 = positions[k]
        out[y0:y0 + ph, x0:x0 + pw] += patches[k] * mask[:, :, None]
        count[y0:y0 + ph, x0:x0 + pw] += mask
    return out, count
