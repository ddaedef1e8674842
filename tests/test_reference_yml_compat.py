"""A reference-format option file runs unmodified (except dataroot).

The keys below are verbatim from the reference's yml surface
(codes/options/train/SID_isp.yml, codes/options/test/S7ISP_test.yml):
mode strings are prefix-matched, `which_model_G: IspUniversal /
OriginUniversal` selects proxy vs native fixed pipelines
(networks.py:31-45), `n_modules` maps to the sRGB pool size, and unknown
torch-era keys (gpu_ids, machine, n_workers, strict_load) are ignored.
"""

import os

import numpy as np
import pytest
import yaml


def _pair_folder(tmp_path, size=48):
    root = str(tmp_path / "pairs")
    os.makedirs(os.path.join(root, "noisy"))
    os.makedirs(os.path.join(root, "gt"))
    rng = np.random.default_rng(0)
    for name in ("a", "b"):
        np.save(os.path.join(root, "noisy", f"{name}.npy"),
                rng.uniform(0, 1, (size, size)).astype(np.float32))
        np.save(os.path.join(root, "gt", f"{name}.npy"),
                rng.uniform(0, 1, (size, size, 3)).astype(np.float32))
    return root


def _reference_style_yml(tmp_path, dataroot, *, which="OriginUniversal"):
    """Keys copied from the reference's SID_isp.yml shape."""
    opt = {
        "name": "ref_compat",
        "use_tb_logger": False,
        "model": "isp",
        "gpu_ids": [0],           # torch-era key, ignored
        "dist": False,
        "machine": "st_sh34",     # torch-era key, ignored
        "datasets": {
            "train": {
                "mode": "SID_Sony_Ratio_RGGB2BGR_mc",  # reference string
                "dataroot": dataroot,
                "n_workers": 1,   # torch-era key, ignored
                "batch_size": 2,
                "data_size": 16,
            },
        },
        "network_G": {
            "which_model_G": which,
            "architecture": "Bayer_02_Demosaic_02_sRGB_06_01",
        },
        "path": {"pretrain_model_G": None, "strict_load": True,
                 "root": str(tmp_path)},
        "train": {
            "lr_G": 1e-3, "momentum_G": 0.9, "lr_meta": 1e-3,
            "beta1": 0.9, "beta2": 0.99, "niter": 2,
            "pixel_criterion": "l2", "warmup_iter": -1,
            "lr_scheme": "MultiStepLR", "lr_steps": [1],
            "lr_gamma": 0.5, "manual_seed": 10,
        },
        "logger": {"print_freq": 1, "save_checkpoint_freq": 1000},
    }
    path = str(tmp_path / "ref_compat.yml")
    with open(path, "w") as f:
        yaml.safe_dump(opt, f)
    return path


class TestReferenceYmlCompat:
    def test_origin_universal_fixed_training(self, tmp_path):
        from reconfigisp_tpu import config
        from reconfigisp_tpu.search.trainer import run_training
        root = _pair_folder(tmp_path)
        opt = config.parse(_reference_style_yml(tmp_path, root), is_train=True)
        summary = run_training(opt, max_iters=2)
        assert np.isfinite(summary["loss"])

    def test_isp_universal_selects_proxy_pipeline(self, tmp_path):
        """which_model_G: IspUniversal must run the pipeline through proxy
        CNNs (the reference's proxy fixed-pipeline network)."""
        from reconfigisp_tpu import config
        from reconfigisp_tpu.search.trainer import run_training
        root = _pair_folder(tmp_path)
        opt = config.parse(
            _reference_style_yml(tmp_path, root, which="IspUniversal"),
            is_train=True)
        summary = run_training(opt, max_iters=2)
        assert np.isfinite(summary["loss"])

    def test_pipeline_proxy_flag_wiring(self):
        from reconfigisp_tpu.pipeline import Pipeline
        assert Pipeline("Bayer_02_Demosaic_02_sRGB_06",
                        use_proxy=True).use_proxy

    def test_network_uses_proxy_shared_mapping(self):
        """train/test/export all resolve proxy-vs-native through ONE helper
        so a reference yml builds the same Pipeline everywhere (the export
        tool once read only use_proxy and silently built native ops for an
        IspUniversal config)."""
        from reconfigisp_tpu.config import network_uses_proxy
        assert network_uses_proxy({"which_model_G": "IspUniversal"})
        assert not network_uses_proxy({"which_model_G": "OriginUniversal"})
        assert network_uses_proxy({"use_proxy": True,
                                   "which_model_G": "OriginUniversal"})
        # an explicit use_proxy key wins EVEN when False (the shipped
        # S7ISP/yolo isp configs pair IspUniversal + use_proxy: false with
        # native-op test configs — flipping them to proxy would train a
        # weight tree the test pipeline cannot load)
        assert not network_uses_proxy({"use_proxy": False,
                                       "which_model_G": "IspUniversal"})
        assert network_uses_proxy({"use_proxy": None,
                                   "which_model_G": "IspUniversal"})
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for fname in ("test.py", os.path.join("tools", "export_pipeline.py"),
                      os.path.join("reconfigisp_tpu", "search", "trainer.py")):
            src = open(os.path.join(root, fname)).read()
            assert "network_uses_proxy" in src, fname
