"""Round-3 correctness fixes: per-access crop rng, uint16 GT scaling,
precision-policy jit cache, local/global loss wiring, epoch plumbing,
per-proxy fine-tune checkpoints, OnePlus best-crop retries."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reconfigisp_tpu.data.datasets import (
    SyntheticRawDataset, RawPairFolderDataset, PairRecordDataset)
from reconfigisp_tpu.utils import losses


# --------------------------------------------------------------- crop rng

def _folder_pair(tmp_path, size=32):
    root = str(tmp_path / "pairs")
    os.makedirs(os.path.join(root, "noisy"))
    os.makedirs(os.path.join(root, "gt"))
    rng = np.random.default_rng(0)
    np.save(os.path.join(root, "noisy", "a.npy"),
            rng.uniform(0, 1, (size, size)).astype(np.float32))
    np.save(os.path.join(root, "gt", "a.npy"),
            rng.uniform(0, 1, (size, size, 3)).astype(np.float32))
    return root


class TestCropRng:
    def test_train_crops_vary_per_access(self, tmp_path):
        """The same index must draw fresh crops across epochs (the reference
        draws per access, sid...dataset.py:121-124); previously the crop was
        frozen per (seed, idx) for the whole run."""
        root = _folder_pair(tmp_path)
        ds = RawPairFolderDataset(root, data_size=8, is_train=True)
        crops = [ds[0]["noisy"] for _ in range(12)]
        assert any(not np.array_equal(crops[0], c) for c in crops[1:])

    def test_resume_does_not_replay_epoch0_crops(self, tmp_path):
        """Access counters are in-memory only; a resumed run must advance
        them (set_access_base) or it re-draws exactly the crops the
        pre-resume run already trained on, in order."""
        from reconfigisp_tpu.data.datasets import set_access_base
        root = _folder_pair(tmp_path)
        ds1 = RawPairFolderDataset(root, data_size=8, is_train=True)
        seq = [ds1[0]["noisy"] for _ in range(6)]
        resumed = RawPairFolderDataset(root, data_size=8, is_train=True)
        set_access_base(resumed, 4)
        # the resumed stream continues where access 4 left off ...
        np.testing.assert_array_equal(resumed[0]["noisy"], seq[4])
        np.testing.assert_array_equal(resumed[0]["noisy"], seq[5])
        # ... instead of replaying accesses 0..N
        replayed = RawPairFolderDataset(root, data_size=8, is_train=True)
        np.testing.assert_array_equal(replayed[0]["noisy"], seq[0])

    def test_eval_crops_deterministic(self, tmp_path):
        root = _folder_pair(tmp_path)
        ds = RawPairFolderDataset(root, data_size=8, is_train=False)
        np.testing.assert_array_equal(ds[0]["noisy"], ds[0]["noisy"])

    def test_train_crops_independent_of_interleaving(self, tmp_path):
        """The k-th crop of image idx must not depend on accesses to OTHER
        indices: the train- and val-half prefetch threads share one dataset
        instance, so a global access counter would make crops depend on
        nondeterministic thread interleaving (and break run-to-run
        reproducibility under manual_seed)."""
        root = _folder_pair(tmp_path)
        os.link(os.path.join(root, "noisy", "a.npy"),
                os.path.join(root, "noisy", "b.npy"))
        os.link(os.path.join(root, "gt", "a.npy"),
                os.path.join(root, "gt", "b.npy"))
        ds1 = RawPairFolderDataset(root, data_size=8, is_train=True)
        seq_a = [ds1[0]["noisy"] for _ in range(4)]
        ds2 = RawPairFolderDataset(root, data_size=8, is_train=True)
        seq_b = []
        for _ in range(4):
            ds2[1]  # interleaved accesses to another index
            seq_b.append(ds2[0]["noisy"])
        for a, b in zip(seq_a, seq_b):
            np.testing.assert_array_equal(a, b)


class TestUint16Gt:
    def test_uint16_gt_scales_to_unit_range(self, tmp_path):
        from reconfigisp_tpu.data.backends import PackedPairWriter
        root = str(tmp_path / "packed16")
        with PackedPairWriter(root, resolution=8) as w:
            noisy = np.full((8, 8), 8191, np.uint16)
            gt16 = np.full((8, 8, 3), 65535, np.uint16)  # full-range white
            w.add_pair("noisy/0", noisy, "gt/0", gt16)
        ds = PairRecordDataset(root, white_level=16383.0)
        s = ds[0]
        np.testing.assert_allclose(s["gt"], 1.0, rtol=1e-6)
        np.testing.assert_allclose(s["noisy"], 8191 / 16383, rtol=1e-5)


# ------------------------------------------------------- precision policy

class TestPolicyJit:
    def test_policy_change_retraces(self):
        from reconfigisp_tpu import precision

        traced_with = []

        def fn(x):
            traced_with.append(precision.cnn_storage_dtype())
            return x.astype(precision.cnn_storage_dtype()) * 2

        f = precision.policy_jit(fn)
        x = jnp.ones((4,), jnp.float32)
        assert f(x).dtype == jnp.float32
        with precision.cnn_storage("bf16"):
            assert f(x).dtype == jnp.bfloat16  # NOT a stale f32 program
        assert f(x).dtype == jnp.float32
        assert traced_with == [jnp.float32, jnp.bfloat16]  # 2 traces, cached


# ------------------------------------------------------ local/global loss

class TestLocalGlobal:
    def test_gain_matching_semantics(self):
        """Local samples are gain-matched per image (clamped mean ratio):
        pred = 2*target with flag=0 gives ~zero loss; flag=1 compares
        1/4-scale downsamples without gain matching (util_loss.py:26-64)."""
        rng = np.random.default_rng(0)
        target = jnp.asarray(rng.uniform(0.2, 0.8, (2, 16, 16, 3)),
                             jnp.float32)
        pred = 2.0 * target
        flags_local = jnp.zeros((2,))
        flags_global = jnp.ones((2,))
        loss_loc = float(losses.local_global_loss(pred, target, flags_local))
        loss_glb = float(losses.local_global_loss(pred, target, flags_global))
        assert loss_loc < 1e-10          # gain 0.5 cancels the factor 2
        assert loss_glb > 1e-3           # no gain matching on global samples

    def test_gain_clamped_to_half_two(self):
        target = jnp.full((1, 8, 8, 3), 0.8, jnp.float32)
        pred = jnp.full((1, 8, 8, 3), 0.1, jnp.float32)  # ratio 8 > clamp 2
        loss = float(losses.local_global_loss(pred, target, jnp.zeros((1,))))
        np.testing.assert_allclose(loss, (0.2 - 0.8) ** 2, rtol=1e-5)

    def test_dataset_emits_glb_flag(self):
        ds = SyntheticRawDataset(n=16, size=16, global_prob=0.5, seed=3)
        flags = [float(ds[i]["glb_flag"]) for i in range(16)]
        assert set(flags) == {0.0, 1.0}
        assert ds[0]["noisy"].shape == (16, 16, 1)
        assert ds[0]["gt"].shape == (16, 16, 3)

    def test_e2e_isp_training_with_local_global(self):
        """local_global_l2 drives a fixed-pipeline training run end to end."""
        from reconfigisp_tpu.pipeline import Pipeline
        from reconfigisp_tpu.search.trainer import IspTrainer
        from reconfigisp_tpu.data.sampler import create_loader

        ds = SyntheticRawDataset(n=8, size=16, global_prob=0.4, seed=1)
        pipe = Pipeline("Bayer_02_Demosaic_02_sRGB_06")
        tr = IspTrainer(pipe, {"pixel_criterion": "local_global_l2",
                               "lr_G": 1e-2})
        loader = iter(create_loader(ds, 4))
        first = tr.train_step(next(loader))["loss"]
        for _ in range(15):
            last = tr.train_step(next(loader))["loss"]
        assert np.isfinite(last)
        assert last < first

    def test_darts_step_accepts_glb_flag(self):
        from reconfigisp_tpu.supernet import SuperNet
        from reconfigisp_tpu.search.trainer import DartsTrainer
        from reconfigisp_tpu.data.sampler import create_search_loaders

        ds = SyntheticRawDataset(n=8, size=16, global_prob=0.5, seed=2)
        net = SuperNet(n_step=1, threshold=0.2, use_proxies=False, srgb_count=3)
        tr = DartsTrainer(net, {"pixel_criterion": "local_global_l2",
                                "lr_G": 1e-3})
        tl, vl = create_search_loaders(ds, 2)
        logs = tr.search_step(next(iter(tl)), next(iter(vl)))
        assert np.isfinite(logs["loss"]) and np.isfinite(logs["val_loss"])


# ----------------------------------------------------------- epoch plumbing

class TestEpochPlumbing:
    def test_sampler_start_epoch_changes_order(self):
        from reconfigisp_tpu.data.sampler import HalfSplitSampler
        s0 = HalfSplitSampler(32, "train", enlarge=1, seed=0, start_epoch=0)
        s5 = HalfSplitSampler(32, "train", enlarge=1, seed=0, start_epoch=5)
        first0 = [i for _, i in zip(range(16), iter(s0))]
        first5 = [i for _, i in zip(range(16), iter(s5))]
        assert first0 != first5
        np.testing.assert_array_equal(first5, s5.epoch_indices(5)[:16])
        assert s0.per_epoch_len == 16

    def test_save_resume_epoch_roundtrip(self, tmp_path):
        from reconfigisp_tpu.supernet import SuperNet
        from reconfigisp_tpu.search.trainer import DartsTrainer
        from reconfigisp_tpu.utils import checkpoint

        net = SuperNet(n_step=1, threshold=0.2, use_proxies=False, srgb_count=2)
        tr = DartsTrainer(net, {"lr_G": 1e-3})
        tr.step_idx = 7
        tr.save(str(tmp_path / "m"), str(tmp_path / "s"), epoch=3)
        tr2 = DartsTrainer(net, {"lr_G": 1e-3})
        epoch = tr2.resume(checkpoint.latest_state(str(tmp_path / "s")))
        assert epoch == 3 and tr2.step_idx == 7


# ------------------------------------------------- per-proxy ft checkpoints

class TestPerProxyCheckpoints:
    def test_ft_save_exports_each_proxy(self, tmp_path):
        from reconfigisp_tpu.supernet import SuperNet
        from reconfigisp_tpu.search.trainer import DartsFtTrainer
        from reconfigisp_tpu.utils import checkpoint
        from reconfigisp_tpu.pipeline import Pipeline

        net = SuperNet(n_step=1, threshold=0.2, use_proxies=True, srgb_count=4)
        tr = DartsFtTrainer(net, {"lr_G": 1e-3}, {"ft_steps": 1})
        assert tr.ft_ops, "supernet must expose ft-eligible proxies"
        mdir = str(tmp_path / "m")
        tr.save(mdir, str(tmp_path / "s"), epoch=0)
        spec = tr.ft_ops[0]
        path = os.path.join(mdir, f"0_proxy_{spec.name}.ckpt")
        assert os.path.exists(path)

        # the exported proxy is loadable into a fixed pipeline per-step
        # (module_weight_paths mechanism, reference isp_universal.py:169-176)
        from reconfigisp_tpu.registry import op_index
        arch = f"Bayer_02_Demosaic_02_sRGB_{op_index('srgb', spec.name):02d}"
        pipe = Pipeline(arch, use_proxy=True)
        state = pipe.init(jax.random.PRNGKey(0))
        step_name = f"step3_{spec.name}"
        loaded = checkpoint.load_network(path)
        state["weights"][step_name] = jax.tree.map(jnp.asarray, loaded)
        y = pipe(state, jnp.full((1, 16, 16, 1), 0.5))
        assert y.shape == (1, 16, 16, 3)
        ref = jax.tree.leaves(tr.variables["omega"][spec.name])[0]
        got = jax.tree.leaves(state["weights"][step_name])[0]
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


# ------------------------------------------------------ OnePlus best-crop

class TestOnePlusBestCrop:
    def test_exhausted_retries_keep_highest_visibility_draw(
            self, tmp_path, monkeypatch):
        """When every draw fails the IoU >= 0.5 filter, the returned crop must
        be the one with the highest box visibility (previously: whatever the
        last draw happened to be, possibly nowhere near any object)."""
        import json
        import cv2
        from reconfigisp_tpu.data import datasets as dsmod

        # frame 128x256 -> desired 64: content band 32x64, top pad 16.
        # bright 'car' box at frame x 40..120, y 40..88
        # -> resized+padded x 10..30, y 26..38
        root = str(tmp_path / "op")
        os.makedirs(root)
        img = (np.full((128, 256), 0.1) * 1023).astype(np.uint16)
        img[40:88, 40:120] = 900  # bright box content
        cv2.imwrite(os.path.join(root, "a.png"), img)
        with open(os.path.join(root, "a.json"), "w") as f:
            json.dump({"shapes": [{"label": "car",
                                   "points": [[40, 40], [120, 88]]}]}, f)
        ds = dsmod.OnePlusDetectionDataset(root, data_size=16, desired=64,
                                           max_crop=4, seed=0)

        # draw sequence (r0, c0) pairs: miss, PARTIAL (vis ~0.3 < 0.5),
        # miss, miss — retries exhaust with zero surviving boxes
        draws = iter([16, 40,   26, 24,   16, 40,   16, 40])

        class FakeRng:
            def integers(self, lo, hi):
                return int(np.clip(next(draws), lo, hi - 1))

        monkeypatch.setattr(dsmod, "_crop_rng", lambda *a, **k: FakeRng())
        s = ds[0]
        assert (s["label"][:, 0] == 0).all()  # nothing passed the filter
        # but the kept crop is the partial-visibility one (contains bright
        # box pixels), not the final dark miss
        assert float(s["noisy"].max()) > 0.5


# ------------------------------------------------- persistent compile cache

class TestPersistentCache:
    def test_gated_off_on_cpu_backend(self, tmp_path, monkeypatch):
        from reconfigisp_tpu.utils import cache
        monkeypatch.delenv("RECONFIGISP_CACHE_CPU", raising=False)
        monkeypatch.delenv("RECONFIGISP_CACHE_DIR", raising=False)
        # conftest pins jax_platforms to "cpu" -> gate returns None
        assert cache.enable_persistent_cache(str(tmp_path / "c")) is None

    def test_cpu_opt_in_and_env_disable(self, tmp_path, monkeypatch):
        from reconfigisp_tpu.utils import cache
        monkeypatch.setenv("RECONFIGISP_CACHE_CPU", "1")
        d = str(tmp_path / "c")
        assert cache.enable_persistent_cache(d) == d
        assert jax.config.jax_compilation_cache_dir == d
        monkeypatch.setenv("RECONFIGISP_CACHE_DIR", "off")
        assert cache.enable_persistent_cache(d) is None


# ------------------------------------------------------- bench tunnel retry

class TestBenchRetry:
    def _load_bench(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "bench_under_test",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_retries_through_transient_outage(self, monkeypatch, capsys):
        import json as _json
        bench = self._load_bench()
        calls = {"n": 0}

        def fake_measure():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("UNAVAILABLE (simulated)")
            # (mps, mfu, mfu_xla, flops_per_frame, mfu_trace) — bench.py's
            # measure_tpu grew the compiler-reconciled MFU + per-frame
            # FLOPs in round 4 and the trace-derived MFU in round 5
            return 123.0, 0.25, 0.26, 1.0e12, 0.27

        monkeypatch.setenv("BENCH_TUNNEL_ATTEMPTS", "3")
        monkeypatch.setattr(bench, "measure_tpu", fake_measure)
        monkeypatch.setattr(bench, "measure_torch_baseline", lambda: 1.0)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        bench.main()
        out = _json.loads(capsys.readouterr().out)
        assert calls["n"] == 3
        assert out["value"] == 123.0 and out["mfu"] == 0.25
        assert out["mfu_trace_device"] == 0.27

    def test_raises_after_exhausted_attempts(self, monkeypatch):
        bench = self._load_bench()

        def always_down():
            raise RuntimeError("UNAVAILABLE (simulated)")

        monkeypatch.setenv("BENCH_TUNNEL_ATTEMPTS", "2")
        monkeypatch.setattr(bench, "measure_tpu", always_down)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        with pytest.raises(RuntimeError):
            bench.main()


# ------------------------------------------- import-time backend isolation

def test_package_import_initializes_no_backend():
    """Module-level jnp array constants would initialize the device backend
    at import — with the remote TPU tunnel down, merely importing the
    package then blocks in the connect-retry loop for ~30 min.  Pin that
    the full package surface imports with zero backends initialized."""
    import subprocess
    import sys
    code = (
        "import reconfigisp_tpu\n"
        "from reconfigisp_tpu.ops import denoise, tone, color, demosaic\n"
        "from reconfigisp_tpu import pipeline, supernet, deploy\n"
        "from reconfigisp_tpu.search import darts, trainer\n"
        "from reconfigisp_tpu.data import datasets, preprocessing, dng\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'backends initialized: {list(xb._backends)}'\n"
        "print('no-backend-init ok')\n")
    env = {**os.environ}
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "no-backend-init ok" in out.stdout
