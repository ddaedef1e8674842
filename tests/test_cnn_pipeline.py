"""Tests for the CNN modules, conditional ops, registry and pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconfigisp_tpu.ops import cnn, conditional
from reconfigisp_tpu import registry
from reconfigisp_tpu.pipeline import Pipeline, parse_architecture


class TestCnnModules:
    def test_srcnn_res_shapes_and_residual(self, key, bgr_batch):
        w = cnn.init_srcnn_res(key, 2)
        p = jnp.full((2, 2), 0.5, jnp.float32)
        out = cnn.apply_srcnn_res(w, jnp.asarray(bgr_batch), p)
        assert out.shape == bgr_batch.shape
        # residual architecture: output stays near input at init
        assert float(jnp.abs(out - bgr_batch).mean()) < 0.5

    def test_srcnn_res_param_padding_equivalence(self, key, bgr_batch):
        """Zero-padded conditioning channels must not change the output."""
        w = cnn.init_srcnn_res(key, 2)
        x = jnp.asarray(bgr_batch)
        p2 = jnp.full((2, 2), 0.7, jnp.float32)
        p5 = jnp.concatenate([p2, jnp.zeros((2, 3))], axis=1)
        np.testing.assert_allclose(cnn.apply_srcnn_res(w, x, p2),
                                   cnn.apply_srcnn_res(w, x, p5), atol=1e-6)

    def test_srcnn_demosaic_shape(self, key, bayer_batch):
        w = cnn.init_srcnn_demosaic(key, 0)
        out = cnn.apply_srcnn_demosaic(w, jnp.asarray(bayer_batch))
        assert out.shape == (2, 32, 32, 3)

    def test_path14_bayer_shape(self, key, bayer_batch):
        w = cnn.init_path14_bayer(key)
        out = cnn.apply_path14_bayer(w, jnp.asarray(bayer_batch))
        assert out.shape == (2, 32, 32, 1)

    def test_path14_bgr_shape(self, key, bgr_batch):
        w = cnn.init_path14_bgr(key)
        out = cnn.apply_path14_bgr(w, jnp.asarray(bgr_batch))
        assert out.shape == (2, 32, 32, 3)

    def test_pixel_shuffle_torch_semantics(self):
        from reconfigisp_tpu.ops.nn import pixel_shuffle
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 2, 2, 4)
        y = pixel_shuffle(x, 2)
        assert y.shape == (1, 4, 4, 1)
        # channel c*r*r + i*r + j: channels [0,1,2,3] of cell (0,0) tile as
        # [[0,1],[2,3]]
        np.testing.assert_array_equal(
            np.asarray(y[0, :2, :2, 0]), [[0, 1], [2, 3]])


class TestConditional:
    def test_n_params_formula(self):
        # (24,16)->1: 24*16+16 + 16*1+1 + 1 global = 418
        assert conditional.conditional_n_params((24, 16), 1) == 418

    def test_conditional_gamma_runs_and_differentiable(self, key, bgr_batch):
        n = conditional.conditional_n_params(conditional.DEFAULT_IN_CHANNELS, 1)
        flat = 0.01 * jax.random.normal(key, (n,))
        out = conditional.conditional_gamma(jnp.asarray(bgr_batch), flat)
        assert out.shape == bgr_batch.shape
        g = jax.grad(lambda f: jnp.sum(
            conditional.conditional_gamma(jnp.asarray(bgr_batch), f)))(flat)
        assert np.isfinite(np.asarray(g)).all()
        # histogram path is stop-gradiented but FC weights must get gradient
        assert float(jnp.abs(g).sum()) > 0


class TestRegistry:
    def test_pool_sizes_match_reference(self):
        assert len(registry.pool("bayer")) == 2
        assert len(registry.pool("demosaic")) == 4
        assert len(registry.pool("srgb")) == 18

    def test_indices_match_reference_order(self):
        assert registry.get_op("srgb", 1).name == "gamma"
        assert registry.get_op("srgb", 10).name == "skip"
        assert registry.get_op("srgb", 13).name == "wbquadratic"
        assert registry.get_op("srgb", 15).name == "bm3d"
        assert registry.get_op("demosaic", 3).name == "laplacian"
        assert registry.get_op("bayer", 1).name == "path_bayer"

    def test_bm3d_proxy_only(self):
        spec = registry.get_op("srgb", "bm3d")
        assert spec.proxy_only and spec.proxy_init is not None

    def test_ft_targets_match_reference(self):
        """darts_ft tunes the reference's 7 proxies (darts_ft_model.py:61-67)
        plus bm3d, whose target here is the native DCT denoiser (the
        reference shipped a fixed externally-pretrained bm3d proxy)."""
        ft = {s.name for s in registry.pool("srgb") if s.ft_target}
        assert ft == {"reinhard", "crysisengine", "filmic", "whiteworld",
                      "bilateral", "median", "fastnlm", "bm3d"}
        bm3d = registry.get_op("srgb", "bm3d")
        assert bm3d.ft_target_fn() is not None and bm3d.apply is None


class TestPipeline:
    def test_parse(self):
        steps = parse_architecture("Bayer_01_Demosaic_03_sRGB_01_13_11")
        assert steps == [("bayer", 1), ("demosaic", 3),
                         ("srgb", 1), ("srgb", 13), ("srgb", 11)]

    def test_origin_pipeline_end_to_end(self, key, bayer_batch):
        pipe = Pipeline("Bayer_02_Demosaic_03_sRGB_01_13_11")
        state = pipe.init(key)
        y, mids, latency = pipe(state, jnp.asarray(bayer_batch),
                                return_intermediates=True)
        assert y.shape == (2, 32, 32, 3)
        assert len(mids) == 5
        assert float(latency) > 0
        assert float(jnp.min(y)) >= 0 and float(jnp.max(y)) <= 1

    def test_identity_init_is_near_identity(self, key, bayer_batch):
        """Default logits give (near-)identity gamma/wb/quadratic/gtm: output
        approximately equals plain demosaic.  Tolerance 0.01 because the
        reference's identity inits are themselves approximate —
        sigmoid(0.406)=0.60013 maps to a quadratic-WB coefficient of 1.0013,
        not 1.0 (super_prune...py:134-136)."""
        from reconfigisp_tpu.ops import demosaic as dm
        pipe = Pipeline("Bayer_02_Demosaic_03_sRGB_01_13_11_14")
        state = pipe.init(key)
        y = pipe(state, jnp.asarray(bayer_batch))
        ref = dm.demosaic_malvar(jnp.asarray(bayer_batch))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-2)

    def test_proxy_pipeline_runs(self, key, bayer_batch):
        pipe = Pipeline("Bayer_01_Demosaic_02_sRGB_02_15", use_proxy=True)
        state = pipe.init(key)
        y = pipe(state, jnp.asarray(bayer_batch))
        assert y.shape == (2, 32, 32, 3)
        # proxy weights exist for proxied ops
        assert "bilinear" in state["weights"]
        assert "bm3d" in state["weights"]

    def test_pipeline_jits_and_grads(self, key, bayer_batch):
        pipe = Pipeline("Bayer_02_Demosaic_02_sRGB_01_11")
        state = pipe.init(key)
        x = jnp.asarray(bayer_batch)
        gt = jnp.zeros((2, 32, 32, 3), jnp.float32) + 0.5

        @jax.jit
        def loss_fn(logits):
            y = pipe({"logits": logits, "weights": state["weights"]}, x)
            return jnp.mean((y - gt) ** 2)

        g = jax.grad(loss_fn)(state["logits"])
        total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0

    def test_conditional_step_in_pipeline(self, key, bayer_batch):
        pipe = Pipeline("Bayer_02_Demosaic_01_sRGB_16")
        state = pipe.init(key)
        y = pipe(state, jnp.asarray(bayer_batch))
        assert y.shape == (2, 32, 32, 3)
        assert state["logits"]["step3_conditional_gamma"].shape[0] == \
            conditional.conditional_n_params(conditional.DEFAULT_IN_CHANNELS, 1)
