"""Tests for config, schedules, checkpointing, data layer, tiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconfigisp_tpu import config
from reconfigisp_tpu.utils import schedule, checkpoint
from reconfigisp_tpu.data import (
    SyntheticRawDataset, SyntheticDetectionDataset, RawPairFolderDataset,
    HalfSplitSampler, Loader, create_search_loaders)
from reconfigisp_tpu.parallel.tiling import (
    feather_mask, tile_positions, tiled_apply)


class TestConfig:
    def test_nonedict_missing_returns_none(self):
        opt = config.parse_dict({"name": "x", "train": {"lr_G": 1e-3}})
        assert opt["nonexistent"] is None
        assert opt["train"]["nonexistent"] is None

    def test_path_derivation(self, tmp_path):
        opt = config.parse_dict({"name": "exp1"}, is_train=True,
                                root=str(tmp_path))
        assert opt["path"]["experiments_root"].endswith("experiments/exp1")
        assert opt["path"]["models"].endswith("exp1/models")
        opt_t = config.parse_dict({"name": "exp1"}, is_train=False,
                                  root=str(tmp_path))
        assert opt_t["path"]["results_root"].endswith("results/exp1")

    def test_debug_overrides(self):
        """'debug' in the name shortens frequencies (reference options.py:53-56)."""
        opt = config.parse_dict({"name": "debug_run", "train": {}})
        assert opt["logger"]["print_freq"] == 2
        assert opt["train"]["niter"] == 8


class TestSchedule:
    def test_multistep(self):
        f = lambda s: schedule.multistep_restart(s, [10, 20], 0.5)
        assert f(5) == 1.0 and f(10) == 0.5 and f(25) == 0.25

    def test_multistep_restart_weights(self):
        f = lambda s: schedule.multistep_restart(
            s, [30], 0.5, restarts=[20], restart_weights=[0.7])
        assert f(19) == 1.0
        assert f(20) == 0.7          # restart resets decay with weight
        assert f(30) == 0.35         # decay applies after restart

    def test_cosine(self):
        f = lambda s: schedule.cosine_restart(s, [100])
        assert f(0) == pytest.approx(1.0)
        assert f(50) == pytest.approx(0.5)
        assert f(100) == pytest.approx(0.0, abs=1e-9)

    def test_warmup(self):
        assert schedule.with_warmup(1.0, 5, 10) == 0.5
        assert schedule.with_warmup(1.0, 20, 10) == 1.0
        assert schedule.with_warmup(1.0, 5, -1) == 1.0

    def test_make_schedule_dispatch(self):
        f = schedule.make_schedule(
            {"lr_scheme": "MultiStepLR", "lr_steps": [10], "lr_gamma": 0.1,
             "warmup_iter": -1})
        assert f(5) == 1.0 and f(15) == pytest.approx(0.1)


class TestCheckpoint:
    def test_roundtrip_and_resume(self, tmp_path):
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        opt = {"m": jnp.zeros(3)}
        p = checkpoint.save_training_state(
            str(tmp_path), 42, epoch=3, step=42, variables=tree, opt_state=opt)
        st = checkpoint.load_training_state(p)
        assert st["epoch"] == 3 and st["step"] == 42
        np.testing.assert_array_equal(st["variables"]["a"], np.arange(4.0))
        assert checkpoint.latest_state(str(tmp_path)) == p

    def test_network_save_naming(self, tmp_path):
        p = checkpoint.save_network(str(tmp_path), "G", 100, {"w": jnp.ones(2)})
        assert p.endswith("100_G.ckpt")
        assert "w" in checkpoint.load_network(p)


class TestData:
    def test_synthetic_deterministic(self):
        ds = SyntheticRawDataset(n=4, size=32, seed=1)
        a, b = ds[0], ds[0]
        np.testing.assert_array_equal(a["noisy"], b["noisy"])
        assert a["noisy"].shape == (32, 32, 1)
        assert a["gt"].shape == (32, 32, 3)
        assert 0 <= a["noisy"].min() and a["noisy"].max() <= 1

    def test_mosaic_consistency(self):
        """The mosaic must sample GT's BGR channels at RGGB sites."""
        ds = SyntheticRawDataset(n=1, size=16, noise_std=0.0, gain=1.0)
        s = ds[0]
        gt, m = s["gt"], s["noisy"][..., 0]
        np.testing.assert_allclose(m[0::2, 0::2], gt[0::2, 0::2, 2], atol=1e-6)
        np.testing.assert_allclose(m[1::2, 1::2], gt[1::2, 1::2, 0], atol=1e-6)

    def test_detection_dataset_labels(self):
        ds = SyntheticDetectionDataset(n=4, size=32, seed=0)
        s = ds[0]
        assert s["label"].shape == (8, 6)
        valid = s["label"][s["label"][:, 0] > 0]
        assert len(valid) >= 1
        assert ((valid[:, 2:] >= 0) & (valid[:, 2:] <= 1)).all()

    def test_folder_dataset_roundtrip(self, tmp_path):
        os.makedirs(tmp_path / "noisy")
        os.makedirs(tmp_path / "gt")
        raw = (np.random.default_rng(0).uniform(0, 1023, (16, 16))
               ).astype(np.uint16)
        np.save(tmp_path / "noisy" / "a.npy", raw)
        np.save(tmp_path / "gt" / "a.npy",
                np.random.default_rng(1).random((16, 16, 3)).astype(np.float32))
        ds = RawPairFolderDataset(str(tmp_path), white_level=1023.0)
        s = ds[0]
        assert s["noisy"].shape == (16, 16, 1)
        np.testing.assert_allclose(s["noisy"][..., 0],
                                   raw.astype(np.float32) / 1023.0)

    def test_half_split_sampler_disjoint(self):
        tr = HalfSplitSampler(20, "train")
        va = HalfSplitSampler(20, "val")
        assert set(tr.indices) == set(range(10))
        assert set(va.indices) == set(range(10, 20))

    def test_sampler_rank_striding(self):
        """Ranks see disjoint strided subsequences (reference
        data_sampler.py:98-102)."""
        e0 = HalfSplitSampler(16, "train", rank=0, world=2,
                              enlarge=1).epoch_indices(0)
        e1 = HalfSplitSampler(16, "train", rank=1, world=2,
                              enlarge=1).epoch_indices(0)
        full = HalfSplitSampler(16, "train", enlarge=1).epoch_indices(0)
        np.testing.assert_array_equal(np.sort(np.concatenate([e0, e1])),
                                      np.sort(full))

    def test_loader_batches(self):
        ds = SyntheticRawDataset(n=8, size=16)
        tr, va = create_search_loaders(ds, batch_size=2)
        b = next(iter(tr))
        assert b["noisy"].shape == (2, 16, 16, 1)
        assert b["gt"].shape == (2, 16, 16, 3)


class TestTiling:
    def test_feather_mask_matches_reference_shape(self):
        m = feather_mask((8, 8), (2, 2))
        assert m[0, 4] == pytest.approx(1 / 3)
        assert m[1, 4] == pytest.approx(2 / 3)
        assert m[4, 4] == 1.0
        assert m[0, 0] == pytest.approx(1 / 3)  # min of row/col ramps

    def test_tile_positions_cover(self):
        pos = tile_positions(100, 32, 24)
        assert pos[0] == 0 and pos[-1] == 68
        assert all(p + 32 <= 100 for p in pos)

    def test_tiled_identity_blend_is_exact(self):
        """Feather-blending an identity map must reconstruct the image."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        y = tiled_apply(lambda p: p, x, patch=32, stride=24)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_tiled_pipeline_matches_whole_on_pointwise(self, key):
        """A pipeline of pointwise ops must be tile-invariant."""
        from reconfigisp_tpu.pipeline import Pipeline
        pipe = Pipeline("Bayer_02_Demosaic_01_sRGB_01_11")
        state = pipe.init(key)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (1, 64, 64, 1)).astype(np.float32))
        whole = pipe(state, x)
        tiled = tiled_apply(lambda p: pipe(state, p), x, patch=32, stride=24)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(whole),
                                   atol=1e-4)
