"""Planted-pipeline workload (SyntheticPlantedDataset): the accuracy-axis
fixture for the flagship demo (tools/planted_demo.py).  Pins that the GT is
exactly reproducible by the planted architecture and that the planted
signals (noise / cast / gamma) each carry a real PSNR penalty — i.e. the
search problem is non-degenerate by construction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reconfigisp_tpu.data.datasets import SyntheticPlantedDataset
from reconfigisp_tpu.pipeline import Pipeline
from reconfigisp_tpu.utils.metrics import psnr as psnr_fn


def _logit(p):
    return float(np.log(p / (1 - p)))


@pytest.fixture(scope="module")
def planted_state_and_ds():
    ds = SyntheticPlantedDataset(n=4, size=64, seed=0)
    pipe = Pipeline("Demosaic_03_sRGB_11_01")
    state = pipe.init(jax.random.PRNGKey(0))
    state["logits"]["step2_wbmanual"] = jnp.asarray(
        [_logit(p) for p in ds.WB_PARAMS01], jnp.float32)
    state["logits"]["step3_gamma"] = jnp.asarray(
        [_logit(ds.GAMMA_PARAM01)], jnp.float32)
    return pipe, state, ds


class TestPlantedWorkload:
    def test_gt_exactly_reproducible(self, planted_state_and_ds):
        """The planted arch with the planted params regenerates GT from the
        clean mosaic to float precision — the search target exists."""
        pipe, state, ds = planted_state_and_ds
        ds[0]
        clean, gt = ds._gt_cache[0]
        y = pipe(state, jnp.asarray(clean)[None])
        assert float(jnp.abs(y[0] - jnp.asarray(gt)).max()) < 1e-5

    def test_noise_penalty_is_real(self, planted_state_and_ds):
        """Running the noisy mosaic through the planted pipeline WITHOUT
        denoising costs > 6 dB vs the clean-input ceiling — skip-denoise
        cannot win the search."""
        pipe, state, ds = planted_state_and_ds
        s = ds[0]
        clean, gt = ds._gt_cache[0]
        y_clean = pipe(state, jnp.asarray(clean)[None])
        y_noisy = pipe(state, jnp.asarray(s["noisy"])[None])
        p_clean = float(psnr_fn(y_clean, jnp.asarray(gt)[None])[0])
        p_noisy = float(psnr_fn(y_noisy, jnp.asarray(gt)[None])[0])
        assert p_clean > 45.0
        assert p_noisy < p_clean - 6.0

    def test_cast_and_gamma_penalties(self, planted_state_and_ds):
        """Dropping WB or gamma from the planted pipeline each costs > 3 dB
        on clean input — the search must keep both."""
        _, good_state, ds = planted_state_and_ds
        clean, gt = ds._gt_cache[0]
        gt_b = jnp.asarray(gt)[None]

        no_wb = Pipeline("Demosaic_03_sRGB_01")
        st = no_wb.init(jax.random.PRNGKey(0))
        st["logits"]["step2_gamma"] = jnp.asarray(
            [_logit(ds.GAMMA_PARAM01)], jnp.float32)
        p_no_wb = float(psnr_fn(no_wb(st, jnp.asarray(clean)[None]), gt_b)[0])

        no_gamma = Pipeline("Demosaic_03_sRGB_11")
        st2 = no_gamma.init(jax.random.PRNGKey(0))
        st2["logits"]["step2_wbmanual"] = jnp.asarray(
            [_logit(p) for p in ds.WB_PARAMS01], jnp.float32)
        p_no_gamma = float(psnr_fn(no_gamma(st2, jnp.asarray(clean)[None]),
                                   gt_b)[0])
        assert p_no_wb < 42.0
        assert p_no_gamma < 42.0

    def test_no_exposure_degeneracy(self):
        """gain=1: mean brightness of noisy mosaic ~= clean mosaic — the
        round-2 failure mode (search learns only to undo a global gain)
        cannot dominate this workload."""
        ds = SyntheticPlantedDataset(n=2, size=64, seed=1)
        s = ds[0]
        clean, _ = ds._gt_cache[0]
        assert abs(float(s["noisy"].mean()) - float(clean.mean())) < 0.02

    def test_create_dataset_mode(self):
        from reconfigisp_tpu.data.datasets import create_dataset
        ds = create_dataset({"mode": "synthetic_planted", "n": 2,
                             "data_size": 32})
        assert isinstance(ds, SyntheticPlantedDataset)
        assert ds[0]["noisy"].shape == (32, 32, 1)

    def test_ablation_arch_strings(self):
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            "planted_demo", os.path.join(
                os.path.dirname(__file__), "..", "tools", "planted_demo.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        abl = mod.ablations_of("Bayer_01_Demosaic_03_sRGB_11_01_10")
        assert abl["no_denoise"] == "Bayer_02_Demosaic_03_sRGB_11_01_10"
        assert abl["nearest_demosaic"] == "Bayer_01_Demosaic_01_sRGB_11_01_10"
        assert abl["drop_srgb_step2"] == "Bayer_01_Demosaic_03_sRGB_10_01_10"
        # the sRGB skip step itself is not ablated
        assert "drop_srgb_step4" not in abl


# ----------------------------------------------- demo ablation construction

def test_planted_demo_ablations():
    import importlib.util
    import os as _os
    spec = importlib.util.spec_from_file_location(
        "planted_demo_under_test",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "tools", "planted_demo.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    abl = demo.ablations_of("Bayer_01_Demosaic_03_sRGB_13_13_13")
    assert abl["no_denoise"] == "Bayer_02_Demosaic_03_sRGB_13_13_13"
    assert abl["nearest_demosaic"] == "Bayer_01_Demosaic_01_sRGB_13_13_13"
    # dropping any one copy of the repeated op executes the same pipeline
    # (skip is identity), so the deduped table carries ONE sRGB ablation
    # (round-5: VERDICT r4 weak #5; see tests/test_round5_fixes.py)
    drops = {k: v for k, v in abl.items() if k.startswith("drop_srgb")}
    assert list(drops.values()) == ["Bayer_01_Demosaic_03_sRGB_10_13_13"]
    # every ablation string round-trips through the pipeline parser
    from reconfigisp_tpu.pipeline import parse_architecture
    for a in abl.values():
        assert parse_architecture(a)
