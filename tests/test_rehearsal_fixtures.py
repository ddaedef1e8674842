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
