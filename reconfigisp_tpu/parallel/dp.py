"""Data-parallel execution of training steps via jit + shardings.

The reference wraps netG in DistributedDataParallel and relies on NCCL bucket
hooks inside loss.backward() (reference codes/models/darts_model.py:31,172-174);
alpha gradients there are *not* synchronized (darts_model.py:245-268).  Here
the whole fused step is jit-compiled with the batch sharded over the mesh's
'data' axis (and image height over 'space') while variables/optimizer state
stay replicated — XLA's SPMD partitioner inserts the gradient all-reduces over
ICI for *all* gradients, weights and alphas alike, fixing the reference's
unsynced-alpha quirk (SURVEY §2.34).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh

from reconfigisp_tpu.parallel.mesh import batch_sharding, replicated


def make_data_parallel_step(step: Callable, mesh: Mesh) -> Callable:
    """step(variables, opt_state, batch, lr_scale) jitted with:
    batch sharded (N over data, H over space), everything else replicated."""
    rep = replicated(mesh)
    # prefix pytrees: one sharding covers the whole subtree.  The batch entry
    # follows the shardings committed by mesh.shard_batch (per-leaf: images
    # shard (data, space), labels/flags shard (data,)) — a single prefix spec
    # cannot cover mixed-rank batch leaves.
    return jax.jit(
        step,
        in_shardings=(rep, rep, None, None),
        out_shardings=(rep, rep, rep),
    )


def make_data_parallel_apply(apply: Callable, mesh: Mesh) -> Callable:
    """apply(variables, x) -> y jitted with x/y batch-sharded."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(apply, in_shardings=(rep, bsh), out_shardings=bsh)
