"""End-to-end latency-aware search + imaging utility tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reconfigisp_tpu.supernet import SuperNet
from reconfigisp_tpu.search.darts import (
    DartsConfig, init_darts_opt_state, make_darts_step)
from reconfigisp_tpu.utils import losses


class TestLatencyAwareSearch:
    def test_latency_pressure_steers_alphas(self, key, rng):
        """With a latency-weighted objective the bayer slot must drift toward
        skip (free) and away from path_bayer (expensive) — the headline
        feature that is dormant in the reference (util_loss.py:8-23)."""
        net = SuperNet(n_step=1, threshold=0.2, srgb_count=4)
        v = net.init(key)
        opt = init_darts_opt_state(v)
        crit = losses.make_criterion(
            "l2_latency", {"w": 1.0, "target_latency": 1.0})

        def fwd(theta, alphas, omega, img):
            y, aux = net({"theta": theta, "alphas": alphas, "omega": omega},
                         img, return_aux=True)
            return y, aux["latency"]

        step = jax.jit(make_darts_step(
            fwd, crit, DartsConfig(lr_theta=1e-2, lr_alpha=5e-2,
                                   lr_meta=1e-2)))
        mk = lambda c: jnp.asarray(
            rng.uniform(0.1, 0.9, (2, 16, 16, c)).astype(np.float32))
        batch = {"img": mk(1), "gt": mk(3), "val_img": mk(1), "val_gt": mk(3)}
        for _ in range(6):
            v, opt, logs = step(v, opt, batch, 1.0)
        bayer_alpha = np.asarray(v["alphas"]["bayer"])
        # index 0 = path_bayer (8 ms/MP), index 1 = skip (0)
        assert bayer_alpha[1] > bayer_alpha[0]
        assert np.isfinite(float(logs["loss"]))


class TestImagingUtils:
    def test_state_roundtrip(self):
        from reconfigisp_tpu.utils.imaging import state2tensor, tensor2state
        s = np.asarray([[0, 511, 1023]], np.uint16)
        t = state2tensor(s, 10)
        np.testing.assert_allclose(t, [[0, 511 / 1023, 1.0]], atol=1e-6)
        np.testing.assert_array_equal(tensor2state(t, 10), s)

    def test_tensor2bgr(self):
        from reconfigisp_tpu.utils.imaging import tensor2bgr
        np.testing.assert_array_equal(
            tensor2bgr(np.asarray([0.0, 0.5, 1.0, 2.0])),
            [0, 128, 255, 255])

    def test_mkdir_and_rename_archives(self, tmp_path):
        from reconfigisp_tpu.utils.imaging import mkdir_and_rename
        import os
        d = tmp_path / "exp"
        d.mkdir()
        (d / "old.txt").write_text("x")
        mkdir_and_rename(str(d))
        assert d.exists() and not (d / "old.txt").exists()
        archived = [p for p in os.listdir(tmp_path) if "archived" in p]
        assert len(archived) == 1

    def test_bayer_aware_resize_preserves_cfa(self):
        from reconfigisp_tpu.utils.imaging import bayer_aware_resize
        # constant-per-phase mosaic: each phase plane must keep its value
        m = np.zeros((64, 64), np.float32)
        m[0::2, 0::2] = 0.8
        m[0::2, 1::2] = 0.4
        m[1::2, 0::2] = 0.4
        m[1::2, 1::2] = 0.2
        out = bayer_aware_resize(m, 32)[..., 0]
        np.testing.assert_allclose(out[0::2, 0::2], 0.8, atol=1e-5)
        np.testing.assert_allclose(out[1::2, 1::2], 0.2, atol=1e-5)
