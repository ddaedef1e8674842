"""Tests for the native rawproc library (and its numpy fallbacks)."""

import numpy as np
import pytest

from reconfigisp_tpu.native import rawproc
from reconfigisp_tpu.data import preprocessing


@pytest.fixture
def force_fallback(monkeypatch):
    """Run the same API without the native lib."""
    monkeypatch.setattr(rawproc, "_LIB", None)


class TestRawproc:
    def test_native_built(self):
        assert rawproc.HAVE_NATIVE, "librawproc.so should build in-tree"

    def test_normalize_semantics(self):
        raw = np.asarray([[512, 16383, 0]], np.uint16)
        out = rawproc.normalize_u16(raw, black=512, white=16383, ratio=1.0)
        np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-6)

    def test_normalize_ratio_clip(self):
        raw = np.asarray([[8448]], np.uint16)  # (8448-512)/15871 = 0.5
        out = rawproc.normalize_u16(raw, 512, 16383, ratio=3.0)
        np.testing.assert_allclose(out, [[1.0]], atol=1e-6)  # clipped

    def test_crop_matches_fallback(self, force_fallback):
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 16384, (3, 32, 32)).astype(np.uint16)
        offs = rng.integers(0, 16, (3, 2)).astype(np.int32)
        ref = rawproc.crop_norm_batch(raw, offs, 8, 512, 16383)
        assert ref.shape == (3, 8, 8)
        # offsets snapped even
        offs_odd = offs | 1
        snapped = rawproc.crop_norm_batch(raw, offs_odd, 8, 512, 16383)
        even = rawproc.crop_norm_batch(raw, offs_odd & ~1, 8, 512, 16383)
        np.testing.assert_array_equal(snapped, even)

    def test_pack_rggb(self):
        m = np.arange(16, dtype=np.float32).reshape(4, 4)
        out = rawproc.pack_rggb(m)
        np.testing.assert_array_equal(out[0], [[0, 2], [8, 10]])   # R
        np.testing.assert_array_equal(out[3], [[5, 7], [13, 15]])  # B

    def test_feather_accumulate_counts(self):
        patches = np.ones((2, 4, 4, 3), np.float32)
        pos = np.asarray([[0, 0], [2, 2]], np.int32)
        mask = np.ones((4, 4), np.float32)
        out, count = rawproc.feather_accumulate(patches, pos, mask, 8, 8)
        assert count[3, 3] == 2.0 and count[0, 0] == 1.0 and count[7, 7] == 0.0
        np.testing.assert_allclose(out[3, 3], [2, 2, 2])


class TestPreprocessing:
    def test_synthesize_and_load_roundtrip(self, tmp_path):
        from reconfigisp_tpu.data import RawPairFolderDataset
        n = preprocessing.synthesize_pair_folder(str(tmp_path), n=4, size=32)
        assert n == 4
        ds = RawPairFolderDataset(str(tmp_path))
        s = ds[0]
        assert s["noisy"].shape == (32, 32, 1)
        assert s["gt"].shape == (32, 32, 3)

    def test_process_raw_pairs_patches(self, tmp_path):
        rng = np.random.default_rng(0)
        raw_p = tmp_path / "r.npy"
        gt_p = tmp_path / "g.npy"
        np.save(raw_p, rng.integers(0, 1024, (32, 32)).astype(np.uint16))
        np.save(gt_p, rng.random((32, 32, 3)).astype(np.float32))
        out = tmp_path / "out"
        count = preprocessing.process_raw_pairs(
            [str(raw_p)], [str(gt_p)], str(out),
            black=64, white=1023, patch=16)
        assert count == 4
        from reconfigisp_tpu.data import RawPairFolderDataset
        ds = RawPairFolderDataset(str(out))
        assert len(ds) == 4

    def test_grbg_to_rggb(self):
        m = np.arange(16, dtype=np.float32).reshape(4, 4)
        out = preprocessing.grbg_to_rggb(m)
        assert out.shape == (4, 2)
        np.testing.assert_array_equal(out[0], [1, 2])
