"""Tests for the mixed-op supernet and the fused DARTS bilevel step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconfigisp_tpu.supernet import SuperNet
from reconfigisp_tpu.search.darts import (
    DartsConfig, init_darts_opt_state, make_darts_step)
from reconfigisp_tpu.utils import losses


def _small_net(**kw):
    # first 6 sRGB ops (gamma..whiteworld) keep CPU compile times low
    return SuperNet(n_step=1, threshold=0.2, srgb_count=6, **kw)


def _forward(net):
    def fwd(theta, alphas, omega, img):
        y, aux = net({"theta": theta, "alphas": alphas, "omega": omega},
                     img, return_aux=True)
        return y, aux["latency"]
    return fwd


class TestSuperNet:
    def test_shapes_and_aux(self, key, bayer_batch):
        net = _small_net()
        v = net.init(key)
        y, aux = net(v, jnp.asarray(bayer_batch), return_aux=True)
        assert y.shape == (2, 32, 32, 3)
        assert len(aux["intermediates"]) == 3  # bayer, demosaic, step1
        assert aux["pruned"].shape == (3,)
        assert float(aux["latency"]) > 0

    def test_uniform_alphas_no_pruning(self, key, bayer_batch):
        """threshold*max with equal alphas keeps every path
        (reference super_prune...py:186-193)."""
        net = _small_net()
        v = net.init(key)
        _, aux = net(v, jnp.asarray(bayer_batch), return_aux=True)
        assert int(aux["pruned"].sum()) == 0

    def test_pruning_kills_low_prob_paths(self, key, bayer_batch):
        net = _small_net()
        v = net.init(key)
        v["alphas"]["step1"] = jnp.asarray([8., 0., 0., 0., 0., 0.])
        y, aux = net(v, jnp.asarray(bayer_batch), return_aux=True)
        assert int(aux["pruned"][2]) == 5
        # with everything else pruned, step1 output == pure gamma output
        from reconfigisp_tpu.ops import color
        mid_demosaic = aux["intermediates"][1]
        p = jnp.broadcast_to(jax.nn.sigmoid(
            v["theta"]["step1"]["gamma"])[None, :], (2, 1))
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(color.gamma(mid_demosaic, p)), atol=1e-5)

    def test_alpha_grads_flow(self, key, bayer_batch):
        net = _small_net()
        v = net.init(key)
        x = jnp.asarray(bayer_batch)

        def loss(alphas):
            y = net({**v, "alphas": alphas}, x)
            return jnp.mean(y ** 2)

        g = jax.grad(loss)(v["alphas"])
        for slot, arr in g.items():
            assert np.isfinite(np.asarray(arr)).all(), slot
            assert float(jnp.abs(arr).sum()) > 0, slot

    def test_latency_differentiable_wrt_alphas(self, key, bayer_batch):
        net = _small_net()
        v = net.init(key)
        x = jnp.asarray(bayer_batch)

        def lat(alphas):
            _, aux = net({**v, "alphas": alphas}, x, return_aux=True)
            return aux["latency"]

        g = jax.grad(lat)(v["alphas"])
        # latency gradient must point towards cheaper ops in the bayer slot
        # (path_bayer is expensive, skip is free)
        assert float(g["bayer"][0]) > 0 and float(g["bayer"][1]) < 0

    def test_argmax_architecture_string(self, key):
        net = SuperNet(n_step=2, threshold=0.2, srgb_count=15)
        v = net.init(key)
        v["alphas"]["bayer"] = jnp.asarray([0., 1.])
        v["alphas"]["demosaic"] = jnp.asarray([0., 0., 1., 0.])
        v["alphas"]["step1"] = jnp.zeros(15).at[0].set(1.)
        v["alphas"]["step2"] = jnp.zeros(15).at[12].set(1.)
        arch = net.argmax_architecture(v)
        assert arch == "Bayer_02_Demosaic_03_sRGB_01_13"
        from reconfigisp_tpu.pipeline import parse_architecture
        assert parse_architecture(arch)  # round-trips


@pytest.fixture(scope="module")
def darts_setup():
    """One compiled darts step shared across the step tests — each fresh
    jit closure costs ~35 s of CPU compile in this environment."""
    net = _small_net()
    v = net.init(jax.random.PRNGKey(0))
    opt = init_darts_opt_state(v)
    cfg = DartsConfig(lr_theta=1e-2, lr_alpha=1e-2, lr_meta=1e-2)
    crit = lambda pred, target, latency=None: losses.l2(pred, target)
    step = jax.jit(make_darts_step(_forward(net), crit, cfg))
    return net, v, opt, step


class TestDartsStep:
    def _batch(self, rng, n=2, s=16):
        mk = lambda: jnp.asarray(
            rng.uniform(0.1, 0.9, (n, s, s, 1)).astype(np.float32))
        gt = lambda: jnp.asarray(
            rng.uniform(0.1, 0.9, (n, s, s, 3)).astype(np.float32))
        return {"img": mk(), "gt": gt(), "val_img": mk(), "val_gt": gt()}

    def test_step_runs_and_updates(self, darts_setup, rng):
        net, v, opt, step = darts_setup
        batch = self._batch(rng)
        v2, opt2, logs = step(v, opt, batch, 1.0)
        assert np.isfinite(float(logs["loss"]))
        assert np.isfinite(float(logs["val_loss"]))
        # alphas moved
        da = sum(float(jnp.abs(v2["alphas"][s] - v["alphas"][s]).sum())
                 for s in v["alphas"])
        assert da > 0
        # theta moved
        dt = sum(float(jnp.abs(b - a).sum()) for a, b in zip(
            jax.tree.leaves(v["theta"]), jax.tree.leaves(v2["theta"])))
        assert dt > 0
        # omega untouched (frozen during search, reference keeps CNN weights
        # out of trainable_parameters — super_prune...py:164)
        for a, b in zip(jax.tree.leaves(v["omega"]),
                        jax.tree.leaves(v2["omega"])):
            np.testing.assert_array_equal(a, b)

    def test_loss_decreases_over_steps(self, darts_setup, rng):
        net, v, opt, step = darts_setup
        batch = self._batch(rng)
        first = None
        for i in range(8):
            v, opt, logs = step(v, opt, batch, 1.0)
            if first is None:
                first = float(logs["loss"])
        assert float(logs["loss"]) < first

    def test_momentum_buffer_updates(self, darts_setup, rng):
        net, v, opt, step = darts_setup
        batch = self._batch(rng)
        _, opt2, _ = step(v, opt, batch, 1.0)
        assert int(opt2["adam_t"]) == 1
        nonzero = any(float(jnp.abs(l).sum()) > 0
                      for l in jax.tree.leaves(opt2["momentum"]))
        assert nonzero

    def test_lr_scale_zero_freezes(self, darts_setup, rng):
        net, v, opt, step = darts_setup
        batch = self._batch(rng)
        v2, _, _ = step(v, opt, batch, 0.0)
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
            np.testing.assert_allclose(a, b, atol=1e-7)


class TestProxyBankFusion:
    def test_fused_matches_unfused(self, key, rng):
        """The vmapped SRCNN proxy bank must be numerically identical to
        per-op application (zero-padded conditioning channels)."""
        net = SuperNet(n_step=1, threshold=0.2, use_proxies=True,
                       srgb_count=15)
        v = net.init(key)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (2, 16, 16, 1)).astype(np.float32))
        a = net(v, x, fuse_banks=True)
        b = net(v, x, fuse_banks=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_bank_of_one_falls_back(self, key, rng):
        """A slot with a single bankable proxy must skip fusion and match."""
        net = SuperNet(n_step=1, threshold=0.2, use_proxies=True,
                       srgb_count=2)  # gamma (native) + reinhard (proxy)
        v = net.init(key)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (1, 16, 16, 1)).astype(np.float32))
        a = net(v, x, fuse_banks=True)
        b = net(v, x, fuse_banks=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestFirstOrderDarts:
    def test_order1_step_learns(self, rng):
        """order=1 (first-order DARTS, documented extension): the 2-pass step
        updates alphas on the plain val gradient, theta still steps, and the
        loss decreases."""
        net = _small_net()
        v = net.init(jax.random.PRNGKey(0))
        opt = init_darts_opt_state(v)
        cfg = DartsConfig(lr_theta=1e-2, lr_alpha=1e-2, order=1)
        crit = lambda pred, target, latency=None: losses.l2(pred, target)
        step = jax.jit(make_darts_step(_forward(net), crit, cfg))
        mk = lambda c: jnp.asarray(
            rng.uniform(0.1, 0.9, (2, 16, 16, c)).astype(np.float32))
        batch = {"img": mk(1), "gt": mk(3), "val_img": mk(1), "val_gt": mk(3)}
        first = None
        v0 = v
        for _ in range(6):
            v, opt, logs = step(v, opt, batch, 1.0)
            if first is None:
                first = float(logs["loss"])
        assert float(logs["loss"]) < first
        da = sum(float(jnp.abs(v["alphas"][s] - v0["alphas"][s]).sum())
                 for s in v0["alphas"])
        assert da > 0
        assert float(logs["eps"]) == 0.0  # no Hessian probe in order-1 mode


class TestMultiStepDispatch:
    """steps_per_dispatch: K scanned steps == K sequential steps exactly."""

    def _batch(self, rng, n=2, s=16):
        mk = lambda: jnp.asarray(
            rng.uniform(0.1, 0.9, (n, s, s, 1)).astype(np.float32))
        gt = lambda: jnp.asarray(
            rng.uniform(0.1, 0.9, (n, s, s, 3)).astype(np.float32))
        return {"img": mk(), "gt": gt(), "val_img": mk(), "val_gt": gt()}

    def test_multi_step_equals_sequential(self, darts_setup, rng):
        from reconfigisp_tpu.search.darts import make_darts_multi_step
        net, v, opt, step = darts_setup
        batches = [self._batch(rng) for _ in range(4)]
        v_seq, o_seq = v, opt
        for b in batches:
            v_seq, o_seq, logs_seq = step(v_seq, o_seq, b, 1.0)
        multi = jax.jit(make_darts_multi_step(step))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        v_m, o_m, logs_m = multi(v, opt, stacked, jnp.ones((4,), jnp.float32))
        for a, b in zip(jax.tree.leaves(v_seq), jax.tree.leaves(v_m)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        for k in ("loss", "val_loss"):
            np.testing.assert_allclose(float(logs_seq[k]), float(logs_m[k]),
                                       atol=1e-6)

    def test_trainer_buffering_and_flush(self, rng):
        """A steps_per_dispatch=4 trainer fed 5 steps (one left buffered)
        matches a single-step trainer on the same stream after flush; the
        decoded architecture is identical."""
        from reconfigisp_tpu.search.trainer import DartsTrainer
        net = SuperNet(n_step=1, threshold=0.2, srgb_count=2)
        topt = {"lr_G": 1e-2, "lr_meta": 1e-2, "pixel_criterion": "l2"}
        tr1 = DartsTrainer(net, topt, key=jax.random.PRNGKey(3))
        trk = DartsTrainer(net, {**topt, "steps_per_dispatch": 4},
                           key=jax.random.PRNGKey(3))
        mk = lambda c: rng.uniform(0.1, 0.9, (2, 16, 16, c)).astype(np.float32)
        stream = [({"noisy": mk(1), "gt": mk(3)},
                   {"noisy": mk(1), "gt": mk(3)}) for _ in range(5)]
        for tb, vb in stream:
            logs1 = tr1.search_step(tb, vb)
        for tb, vb in stream:
            logsk = trk.search_step(tb, vb)
        assert trk._buf, "5th step should still be buffered"
        assert trk.step_idx == tr1.step_idx == 5
        arch_k = trk.architecture()   # flushes the buffered step
        assert not trk._buf
        assert arch_k == tr1.architecture()
        for a, b in zip(jax.tree.leaves(tr1.variables),
                        jax.tree.leaves(trk.variables)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
