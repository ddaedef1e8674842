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
