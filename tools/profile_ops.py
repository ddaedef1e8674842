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
    if which in ("bilateral",):
        from reconfigisp_tpu.ops.pallas_kernels import bilateral_pallas
        p = jnp.asarray([[1.0, 0.3, 0.5]], jnp.float32)
        f = jax.jit(lambda x: bilateral_pallas(x, p, strip=64))
        t = honest(f, lambda i: jax.random.uniform(
            jax.random.PRNGKey(i), (1, 512, 512, 3)), iters=3)
        print(f"pallas bilateral 512^2 (15x15): {t * 1e3:.1f} ms")
    if which in ("fused_path14",):
        from reconfigisp_tpu.ops import cnn
        from reconfigisp_tpu.ops.pallas_kernels import path14_fused_pallas
        w = cnn.init_path14_bayer(jax.random.PRNGKey(0))
        f = jax.jit(lambda x: path14_fused_pallas(w, x, th=32, tw=256))
        t = honest(f, lambda i: jax.random.uniform(
            jax.random.PRNGKey(i), (1, H // 2, W // 2, 4)), iters=3)
        print(f"fused path14 12MP: {t * 1e3:.1f} ms")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "all")
