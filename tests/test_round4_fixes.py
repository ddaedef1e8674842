"""Round-4 fixes (VERDICT r3): fixed-pipeline resume, loader stream skip,
timing/learning summaries, OnePlus eval coverage.
"""

import glob
import os

import numpy as np
import pytest

from reconfigisp_tpu import config
from reconfigisp_tpu.search.trainer import run_training
from reconfigisp_tpu.utils import checkpoint


def _isp_opt(root, niter, name="t_isp_resume"):
    return config.parse_dict({
        "name": name, "model": "isp",
        "datasets": {"train": {"mode": "synthetic", "n": 16,
                               "data_size": 16, "batch_size": 2}},
        "network_G": {"architecture": "Bayer_02_Demosaic_02_sRGB_01"},
        "train": {"lr_G": 1e-2, "pixel_criterion": "l2", "niter": niter,
                  "lr_scheme": "MultiStepLR", "lr_steps": [4],
                  "lr_gamma": 0.5, "manual_seed": 3},
        "logger": {"print_freq": 100},
    }, root=root)


def _load_g(root, step):
    paths = glob.glob(os.path.join(root, "**", f"{step}_G.ckpt"),
                      recursive=True)
    assert paths, f"no {step}_G.ckpt under {root}"
    return checkpoint.load_network(paths[0])


class TestIspResume:
    """VERDICT r3 #7: the isp branch of run_training had no resume path
    (reference base_model.py:99-119 saves the plumbing but train.py:81-82
    never passes resume_state; the 80k-iter SID_isp.yml budget therefore
    ran unresumable there too)."""

    def test_killed_run_resumes_to_the_uninterrupted_result(self, tmp_path):
        # straight 6-iter run
        sa = run_training(_isp_opt(str(tmp_path / "a"), 6))
        assert sa["steps"] == 6
        # killed at 3, resumed to 6 — crosses the lr_steps=[4] boundary
        run_training(_isp_opt(str(tmp_path / "b"), 3))
        sb = run_training(_isp_opt(str(tmp_path / "b"), 6))
        assert sb["steps"] == 6
        ga = _load_g(str(tmp_path / "a"), 6)
        gb = _load_g(str(tmp_path / "b"), 6)
        import jax
        for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-6, atol=1e-7)
        assert np.isclose(sa["loss"], sb["loss"], rtol=1e-5)

    def test_resume_restores_step_and_opt_state(self, tmp_path):
        run_training(_isp_opt(str(tmp_path), 3))
        state_dir = glob.glob(os.path.join(str(tmp_path), "**",
                                           "training_state"),
                              recursive=True)[0]
        latest = checkpoint.latest_state(state_dir)
        st = checkpoint.load_training_state(latest)
        assert st["step"] == 3
        assert "opt_state" in st and st["opt_state"] is not None

    def test_summary_carries_timing_and_first_loss(self, tmp_path):
        s = run_training(_isp_opt(str(tmp_path), 6))
        assert s["compile_s"] > 0
        assert s["steady_s_per_iter"] > 0
        # compile dominates the first loop body
        assert s["compile_s"] >= s["steady_s_per_iter"]
        assert np.isfinite(s["loss_first"])


class TestLoaderSkip:
    """create_loader(skip=k) drops exactly k samples from the front of the
    per-rank stream, across epoch boundaries."""

    def test_skip_continues_the_stream(self):
        from reconfigisp_tpu.data.sampler import create_loader

        class _Idx:
            def __len__(self):
                return 6

            def __getitem__(self, i):
                return {"i": np.asarray([i])}

        def take(loader, n):
            out = []
            it = iter(loader)
            for _ in range(n):
                out.extend(next(it)["i"][:, 0].tolist())
            return out

        base = take(create_loader(_Idx(), 2, shuffle_seed=5), 8)
        skipped = take(create_loader(_Idx(), 2, shuffle_seed=5, skip=6), 5)
        assert skipped == base[3 * 2:]  # 6 samples = 3 batches skipped

    def test_skip_across_epochs(self):
        from reconfigisp_tpu.data.sampler import create_loader

        class _Idx:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return {"i": np.asarray([i])}

        it0 = iter(create_loader(_Idx(), 2, shuffle_seed=1))
        flat = []
        for _ in range(6):
            flat.extend(next(it0)["i"][:, 0].tolist())
        it9 = iter(create_loader(_Idx(), 2, shuffle_seed=1, skip=10))
        nxt = next(it9)["i"][:, 0].tolist()
        assert nxt == flat[10:12]


def _write_oneplus_frame(root, w, h, box, name="000"):
    """uint16 mosaic PNG + labelme JSON with one 'car' box (frame coords)."""
    import cv2
    img = np.full((h, w), 200, np.uint16)
    x0, y0, x1, y1 = box
    img[y0:y1, x0:x1] = 900
    cv2.imwrite(os.path.join(root, f"{name}.png"), img)
    import json
    with open(os.path.join(root, f"{name}.json"), "w") as f:
        json.dump({"shapes": [{"label": "car",
                               "points": [[x0, y0], [x1, y1]]}]}, f)


class TestOnePlusEvalCoverage:
    """VERDICT r3 weak #6: eval pinned r0=top, c0=0 — any data_size <
    desired run scored one fixed corner (and data_size == desired silently
    truncated the crop to d-top rows).  Eval now tiles deterministically."""

    def test_eval_tiles_score_a_far_corner_box(self, tmp_path):
        from reconfigisp_tpu.data.datasets import OnePlusDetectionDataset
        # 128x128 frame, box in the BOTTOM-RIGHT quadrant; desired=64 ->
        # resized coords 48..62, outside the old fixed 32x32 corner crop
        _write_oneplus_frame(str(tmp_path), 128, 128, (96, 96, 124, 124))
        ds = OnePlusDetectionDataset(str(tmp_path), data_size=32,
                                     desired=64, is_train=False)
        assert len(ds) > 1  # image x tile enumeration
        hits = []
        for i in range(len(ds)):
            s = ds[i]
            assert s["noisy"].shape == (32, 32, 1)
            if (s["label"][:, 0] > 0.5).any():
                hits.append(i)
        assert hits, "no eval tile scored the bottom-right box"
        # and the old behavior's tile (top-left) does NOT see it
        assert 0 not in hits

    def test_eval_full_frame_is_not_truncated(self, tmp_path):
        from reconfigisp_tpu.data.datasets import OnePlusDetectionDataset
        # non-square source -> top padding; s == desired must return the
        # full padded square, not a (d - top)-row slice
        _write_oneplus_frame(str(tmp_path), 128, 64, (100, 20, 120, 40))
        ds = OnePlusDetectionDataset(str(tmp_path), data_size=64,
                                     desired=64, is_train=False)
        assert len(ds) == 1
        s = ds[0]
        assert s["noisy"].shape == (64, 64, 1)
        lab = s["label"]
        valid = lab[lab[:, 0] > 0.5]
        assert len(valid) == 1
        # box center in crop coords includes the top pad: source y-center
        # 30 * rh(0.5) + top(16) = 31 -> normalized ~31/64
        assert abs(valid[0, 3] - 31 / 64) < 0.05
        assert abs(valid[0, 2] - 55 / 64) < 0.05  # x-center 110*0.5/64

    def test_train_len_and_crops_unchanged(self, tmp_path):
        from reconfigisp_tpu.data.datasets import OnePlusDetectionDataset
        _write_oneplus_frame(str(tmp_path), 128, 128, (96, 96, 124, 124))
        ds = OnePlusDetectionDataset(str(tmp_path), data_size=32,
                                     desired=64, is_train=True)
        assert len(ds) == 1
        assert ds[0]["noisy"].shape == (32, 32, 1)


class TestSearchTimingSummary:
    def test_search_summary_has_compile_and_steady(self, tmp_path):
        opt = config.parse_dict({
            "name": "t_timing", "model": "darts",
            "datasets": {"train": {"mode": "synthetic", "n": 16,
                                   "data_size": 16, "batch_size": 2}},
            "network_G": {"n_step": 1, "prune_threshold": 0.2,
                          "srgb_count": 4},
            "train": {"lr_G": 1e-2, "momentum_G": 0.9, "lr_meta": 1e-2,
                      "pixel_criterion": "l2", "niter": 4,
                      "lr_scheme": "MultiStepLR", "lr_steps": [],
                      "manual_seed": 1},
            "logger": {"print_freq": 100},
        }, root=str(tmp_path))
        s = run_training(opt)
        assert s["compile_s"] >= s["steady_s_per_iter"] > 0
        assert np.isfinite(s["loss_first"])
