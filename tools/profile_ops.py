#!/usr/bin/env python
"""Honest on-device profiling of framework components.

The axon TPU tunnel memoizes identical dispatches and reports
block_until_ready optimistically (see utils/latency.py), so every
measurement here uses a unique input per iteration and syncs by fetching a
scalar computed inside the jitted program.  Per-dispatch RTT (~28 ms) is
reported separately.

Usage: python tools/profile_ops.py [pipeline|path14|malvar|bilateral|
                                    fused_path14|matmul|rtt|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

H, W = 3072, 4096  # 12.6 MP


def honest(f, mk, iters: int = 5) -> float:
    xs = [mk(i) for i in range(iters + 2)]
    float(jnp.sum(f(xs[0])))  # compile
    float(jnp.sum(f(xs[1])))  # drain
    ts = []
    for i in range(2, iters + 2):
        t0 = time.perf_counter()
        float(jnp.sum(f(xs[i])))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def mk_full(i):
    return jax.random.uniform(jax.random.PRNGKey(7000 + i), (1, H, W, 1))


def run(which: str):
    if which in ("rtt", "all"):
        f = jax.jit(lambda x: x + 1.0)
        t = honest(f, lambda i: jnp.full((8,), float(i)))
        print(f"dispatch rtt: {t * 1e3:.1f} ms")
    if which in ("matmul", "all"):
        w = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192),
                              jnp.bfloat16)
        f = jax.jit(lambda x: (x @ w).astype(jnp.bfloat16) @ w)
        t = honest(f, lambda i: jax.random.normal(
            jax.random.PRNGKey(i), (8192, 8192), jnp.bfloat16))
        print(f"matmul 2x8k^3: {t * 1e3:.1f} ms "
              f"({4 * 8192 ** 3 / t / 1e12:.0f} TFLOPS incl. rtt)")
    if which in ("pipeline", "all"):
        from reconfigisp_tpu.pipeline import Pipeline
        pipe = Pipeline("Bayer_01_Demosaic_03_sRGB_01_13_11")
        st = pipe.init(jax.random.PRNGKey(0))
        t = honest(jax.jit(lambda x: pipe(st, x)), mk_full)
        print(f"flagship pipeline 12MP: {t * 1e3:.1f} ms "
              f"-> {H * W / 1e6 / t:.1f} MP/s")
    if which in ("path14", "all"):
        from reconfigisp_tpu.ops import cnn
        w = cnn.init_path14_bayer(jax.random.PRNGKey(0))
        t = honest(jax.jit(lambda x: cnn.apply_path14_bayer(w, x)), mk_full)
        print(f"path14_bayer 12MP: {t * 1e3:.1f} ms")
    if which in ("malvar", "all"):
        from reconfigisp_tpu.ops import demosaic
        t = honest(jax.jit(demosaic.demosaic_malvar), mk_full)
        print(f"malvar 12MP: {t * 1e3:.1f} ms")
    if which in ("denoise",):
        # the Pallas windowed kernels at full 12 MP (jnp forms OOM HBM here)
        from reconfigisp_tpu.ops.pallas_kernels import (
            bilateral_pallas, median_pallas, fastnlm_pallas)
        mk3 = lambda i: jax.random.uniform(
            jax.random.PRNGKey(i), (1, H, W, 3), jnp.float32)
        for name, fn, p in [
                ("bilateral r=7", bilateral_pallas,
                 [[0.95, 0.3, 0.5]]),
                ("bilateral r=1", bilateral_pallas,
                 [[0.1, 0.3, 0.5]]),
                ("median r=3", median_pallas, [[0.35]]),
                ("fastnlm b=1 s=3", fastnlm_pallas, [[0.1, 0.35, 0.3]])]:
            pj = jnp.asarray(p, jnp.float32)
            t = honest(jax.jit(lambda x, fn=fn, pj=pj: fn(x, pj, strip=32)),
                       mk3, iters=3)
            print(f"pallas {name} 12MP: {t * 1e3:.1f} ms")
    if which in ("split", "all"):
        # tiled full-resolution inference (reference test_split.py workload:
        # patch 512 / stride 480 at 12 MP)
        from reconfigisp_tpu.pipeline import Pipeline
        from reconfigisp_tpu.parallel.tiling import tiled_apply
        from reconfigisp_tpu import precision
        pipe = Pipeline("Bayer_01_Demosaic_03_sRGB_01_13_11")
        st = pipe.init(jax.random.PRNGKey(0))
        with precision.cnn_storage("bf16"):
            # jit the WHOLE tiled program: gather + per-chunk forwards +
            # feathered blend in one dispatch (eager chunk loops paid ~130
            # per-op dispatches through the tunnel -> 14 MP/s)
            f = jax.jit(lambda x: tiled_apply(
                lambda xx: pipe(st, xx), x, patch=512, stride=480, chunk=16))
            t = honest(f, mk_full, iters=3)
        print(f"split-mode pipeline 12MP (512/480): {t * 1e3:.1f} ms "
              f"-> {H * W / 1e6 / t:.1f} MP/s")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "all")
