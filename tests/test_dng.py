"""Pure-python DNG/TIFF-EP ingress (data/dng.py) — the rawpy replacement
for the reference's offline decode stage
(reference generate_rggb2bgr_imgs_SID_Sony.py:32-66)."""

import os

import numpy as np
import pytest

from reconfigisp_tpu.data import dng


def _mosaic(h=16, w=24, seed=0, bits=14):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << bits, (h, w)).astype(np.uint16)


class TestRoundTrip:
    @pytest.mark.parametrize("bits", [8, 10, 12, 14, 16])
    def test_bit_depths(self, tmp_path, bits):
        m = _mosaic(bits=min(bits, 14) if bits != 8 else 8)
        if bits == 8:
            m = (m % 256).astype(np.uint16)
        p = str(tmp_path / f"a{bits}.dng")
        dng.write_dng(p, m, black=64, white=(1 << bits) - 1, bits=bits)
        got, meta = dng.read_dng(p)
        np.testing.assert_array_equal(got, m)
        assert meta["black_level"] == 64.0
        assert meta["white_level"] == float((1 << bits) - 1)
        assert meta["cfa"] == "RGGB"
        assert meta["bits"] == bits

    def test_sid_scale_frame(self, tmp_path):
        """A full SID-format frame: 1424x2128 14-bit RGGB."""
        m = _mosaic(h=1424, w=2128, bits=14)
        p = str(tmp_path / "sid.dng")
        dng.write_dng(p, m, black=512, white=16383, bits=14)
        got, meta = dng.read_dng(p)
        np.testing.assert_array_equal(got, m)
        assert meta["black_level"] == 512.0

    def test_as_shot_neutral(self, tmp_path):
        m = _mosaic()
        p = str(tmp_path / "n.dng")
        dng.write_dng(p, m, as_shot_neutral=[0.5, 1.0, 0.7])
        _, meta = dng.read_dng(p)
        np.testing.assert_allclose(meta["as_shot_neutral"],
                                   [0.5, 1.0, 0.7], atol=1e-4)

    @pytest.mark.parametrize("bits", [10, 14])
    def test_unaligned_row_width(self, tmp_path, bits):
        """TIFF 6.0 pads every bit-packed ROW to a byte boundary; a width
        where w*bits % 8 != 0 (even w with w % 4 == 2 at 10/14 bits) must
        still round-trip without a progressive per-row bit shift."""
        w = 6
        assert (w * bits) % 8 != 0
        m = _mosaic(h=8, w=w, bits=bits)
        p = str(tmp_path / f"u{bits}.dng")
        dng.write_dng(p, m, bits=bits)
        got, _ = dng.read_dng(p)
        np.testing.assert_array_equal(got, m)

    def test_missing_byte_counts_multi_strip(self, tmp_path):
        """StripByteCounts is defaultable; with several strips the default
        must be per-strip (one whole-frame count once truncated the read
        to the first strip)."""
        import struct
        h, w = 8, 6
        m = _mosaic(h=h, w=w, bits=14)
        strip_bytes = 4 * w * 2  # RowsPerStrip=4, 16-bit samples
        ifd_off, n = 8, 4
        overflow_off = ifd_off + 2 + n * 12 + 4
        data_off = overflow_off + 8
        entries = b""
        for tag, typ, cnt, val4 in (
                (256, 4, 1, struct.pack("<I", w)),    # ImageWidth
                (257, 4, 1, struct.pack("<I", h)),    # ImageLength
                (273, 4, 2, struct.pack("<I", overflow_off)),  # StripOffsets
                (278, 4, 1, struct.pack("<I", 4))):   # RowsPerStrip
            entries += struct.pack("<HHI", tag, typ, cnt) + val4
        blob = (b"II*\0" + struct.pack("<I", ifd_off)
                + struct.pack("<H", n) + entries + struct.pack("<I", 0)
                + struct.pack("<II", data_off, data_off + strip_bytes)
                + m.astype("<u2").tobytes())
        p = str(tmp_path / "ms.dng")
        with open(p, "wb") as f:
            f.write(blob)
        got, _ = dng.read_dng(p)
        np.testing.assert_array_equal(got, m)

    def test_rejects_non_tiff(self, tmp_path):
        p = str(tmp_path / "x.dng")
        with open(p, "wb") as f:
            f.write(b"nonsense")
        with pytest.raises(dng.DngError):
            dng.read_dng(p)


class TestPostprocess:
    def test_flat_gray_scene(self, tmp_path):
        """A neutral flat scene must postprocess to flat gray sRGB."""
        m = np.full((32, 32), 512 + 4000, np.uint16)
        meta = {"black_level": 512.0, "white_level": 16383.0, "cfa": "RGGB",
                "as_shot_neutral": [1.0, 1.0, 1.0]}
        bgr = dng.postprocess(m, meta)
        assert bgr.dtype == np.uint8 and bgr.shape == (32, 32, 3)
        assert bgr.std() < 1.0  # flat
        # linear 4000/15871 -> sRGB encode
        lin = 4000 / 15871
        expect = (1.055 * lin ** (1 / 2.4) - 0.055) * 255
        assert abs(float(bgr.mean()) - expect) < 3.0

    def test_white_balance_from_neutral(self):
        """AsShotNeutral gains neutralize a color cast."""
        m = np.zeros((32, 32), np.uint16)
        m[0::2, 0::2] = 2000   # R weak
        m[0::2, 1::2] = 4000   # G
        m[1::2, 0::2] = 4000   # G
        m[1::2, 1::2] = 3000   # B weak-ish
        meta = {"black_level": 0.0, "white_level": 16383.0, "cfa": "RGGB",
                "as_shot_neutral": [0.5, 1.0, 0.75]}
        bgr = dng.postprocess(m, meta).astype(np.float32)
        inner = bgr[8:-8, 8:-8]
        ch_means = inner.reshape(-1, 3).mean(axis=0)
        assert ch_means.std() / ch_means.mean() < 0.02  # neutralized


class TestPreprocessingIngress:
    def test_dng_raw_and_dng_gt(self, tmp_path):
        """process_raw_pairs consumes DNG raws + DNG-postprocessed GT with
        levels taken from metadata (the reference's rawpy flow)."""
        from reconfigisp_tpu.data import preprocessing
        from reconfigisp_tpu.data.datasets import RawPairFolderDataset

        short = np.full((16, 16), 512 + 100, np.uint16)
        long_ = np.full((16, 16), 512 + 8000, np.uint16)
        sp = str(tmp_path / "short.dng")
        lp = str(tmp_path / "long.dng")
        dng.write_dng(sp, short, black=512, white=16383, bits=14)
        dng.write_dng(lp, long_, black=512, white=16383, bits=14)
        out = str(tmp_path / "pairs")
        n = preprocessing.process_raw_pairs(
            [sp], [lp], out, ratio=[80.0], patch=None)
        assert n == 1
        ds = RawPairFolderDataset(out, data_size=None)
        s = ds[0]
        np.testing.assert_allclose(
            s["noisy"][..., 0], 100 / 15871 * 80.0, rtol=1e-4)
        assert s["gt"].shape == (16, 16, 3)
        assert s["gt"].std() < 0.01  # flat neutral GT

    def test_npy_requires_levels(self, tmp_path):
        from reconfigisp_tpu.data import preprocessing
        rp = str(tmp_path / "r.npy")
        gp = str(tmp_path / "g.npy")
        np.save(rp, np.zeros((8, 8), np.uint16))
        np.save(gp, np.zeros((8, 8, 3), np.float32))
        with pytest.raises(ValueError):
            preprocessing.process_raw_pairs([rp], [gp],
                                            str(tmp_path / "o"), patch=None)
