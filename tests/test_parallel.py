"""Multi-device tests on the 8-virtual-device CPU mesh.

The reference validated distributed behavior only by running real 4-GPU jobs
(SURVEY §4); these tests are the CPU-mesh substitute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconfigisp_tpu.parallel import mesh as meshlib
from reconfigisp_tpu.parallel.dp import (
    make_data_parallel_step, make_data_parallel_apply)
from reconfigisp_tpu.supernet import SuperNet
from reconfigisp_tpu.search.darts import (
    DartsConfig, init_darts_opt_state, make_darts_step)
from reconfigisp_tpu.utils import losses


def _net():
    return SuperNet(n_step=1, threshold=0.2, srgb_count=4)


def _forward(net):
    def fwd(theta, alphas, omega, img):
        return net({"theta": theta, "alphas": alphas, "omega": omega}, img), 0.0
    return fwd


def _batch(rng, n, s=16):
    mk = lambda c: jnp.asarray(rng.uniform(0.1, 0.9, (n, s, s, c)).astype(np.float32))
    return {"img": mk(1), "gt": mk(3), "val_img": mk(1), "val_gt": mk(3)}


class TestMesh:
    def test_eight_devices_available(self):
        assert jax.device_count() == 8

    def test_mesh_shapes(self):
        m = meshlib.make_mesh(8)
        assert m.shape == {"data": 8, "space": 1}
        m2 = meshlib.make_mesh(8, space=2)
        assert m2.shape == {"data": 4, "space": 2}


class TestDataParallel:
    def test_dp_apply_matches_single_device(self, key, rng):
        net = _net()
        v = net.init(key)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (8, 16, 16, 1)).astype(np.float32))
        y_single = net(v, x)
        m = meshlib.make_mesh(8)
        dp_apply = make_data_parallel_apply(lambda vv, xx: net(vv, xx), m)
        y_dp = dp_apply(meshlib.replicate(m, v), meshlib.shard_batch(m, x))
        np.testing.assert_allclose(np.asarray(y_dp), np.asarray(y_single),
                                   atol=2e-5)

    def test_dp_darts_step_matches_single_device(self, key, rng):
        """The fused bilevel step must produce identical updates whether the
        global batch lives on one device or is sharded over 8 — this is the
        property DDP gave the reference for weights only; here it must hold
        for alphas too (deliberate fix, SURVEY §2.34)."""
        net = _net()
        v = net.init(key)
        opt = init_darts_opt_state(v)
        cfg = DartsConfig(lr_theta=1e-2, lr_alpha=1e-2, lr_meta=1e-2)
        crit = lambda p, t, latency=None: losses.l2(p, t)
        step = make_darts_step(_forward(net), crit, cfg)
        batch = _batch(rng, 8)

        v1, o1, logs1 = jax.jit(step)(v, opt, batch, 1.0)

        m = meshlib.make_mesh(8)
        dp_step = make_data_parallel_step(step, m)
        v8, o8, logs8 = dp_step(meshlib.replicate(m, v),
                                meshlib.replicate(m, opt),
                                meshlib.shard_batch(m, batch), 1.0)

        np.testing.assert_allclose(float(logs8["loss"]), float(logs1["loss"]),
                                   rtol=1e-4)
        for a, b in zip(jax.tree.leaves(v1["alphas"]),
                        jax.tree.leaves(v8["alphas"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
        for a, b in zip(jax.tree.leaves(v1["theta"]),
                        jax.tree.leaves(v8["theta"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_spatial_sharding_executes(self, key, rng):
        """data x space mesh: H sharded; XLA partitioner handles conv halos."""
        net = _net()
        v = net.init(key)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (4, 32, 32, 1)).astype(np.float32))
        y_single = net(v, x)
        m = meshlib.make_mesh(8, space=2)
        dp_apply = make_data_parallel_apply(lambda vv, xx: net(vv, xx), m)
        y = dp_apply(meshlib.replicate(m, v), meshlib.shard_batch(m, x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_single),
                                   atol=2e-5)

    def test_dp_multi_step_matches_sequential_single_device(self, key, rng):
        """steps_per_dispatch under the mesh: a K-scanned data-parallel
        dispatch (batch sharded over 'data', steps axis replicated via
        shard_batch(stacked=True)) must equal K sequential single-device
        steps — the combination run_training uses with dist: true."""
        from reconfigisp_tpu.search.darts import make_darts_multi_step
        net = _net()
        v = net.init(key)
        opt = init_darts_opt_state(v)
        cfg = DartsConfig(lr_theta=1e-2, lr_alpha=1e-2, lr_meta=1e-2)
        crit = lambda p, t, latency=None: losses.l2(p, t)
        step = make_darts_step(_forward(net), crit, cfg)
        batches = [_batch(rng, 8) for _ in range(3)]

        v_seq, o_seq = v, opt
        for b in batches:
            v_seq, o_seq, logs_seq = jax.jit(step)(v_seq, o_seq, b, 1.0)

        m = meshlib.make_mesh(8)
        dp_multi = make_data_parallel_step(make_darts_multi_step(step), m)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        v_m, o_m, logs_m = dp_multi(
            meshlib.replicate(m, v), meshlib.replicate(m, opt),
            meshlib.shard_batch(m, stacked, stacked=True),
            jnp.ones((3,), jnp.float32))

        np.testing.assert_allclose(float(logs_m["loss"]),
                                   float(logs_seq["loss"]), rtol=1e-4)
        for part in ("alphas", "theta"):
            for a, b in zip(jax.tree.leaves(v_seq[part]),
                            jax.tree.leaves(v_m[part])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5)
