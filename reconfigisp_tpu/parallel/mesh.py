"""Device mesh construction and sharding helpers.

Replaces the reference's NCCL/DDP process-group machinery
(reference codes/train.py:20-55, darts_model.py:31-34) with single-controller
JAX: a Mesh with a 'data' axis (batch / data parallelism, the reference's only
strategy) and an optional 'space' axis (image-height sharding — the TPU-native
generalization of the reference's patch-split inference,
codes/utils/util_path_restore.py:67-134; XLA's SPMD partitioner inserts the
halo exchanges for convolutions automatically).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(n_devices: Optional[int] = None, space: int = 1) -> Mesh:
    """Mesh of shape (data, space). space divides image height."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = np.asarray(devs[:n]).reshape(n // space, space)
    return Mesh(devs, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: N over data, H over space."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, *, stacked: bool = False):
    """Place a batch pytree on the mesh: image tensors (N, H, W, C) shard
    N over data and H over space; other leading-batch arrays (labels,
    per-sample flags) shard N over data only; scalars replicate.

    stacked=True handles multi-step batches with a leading (K,) steps axis
    (search steps_per_dispatch): the steps axis replicates, the sharded
    axes shift right by one."""
    def put(x):
        ndim = getattr(x, "ndim", 0) - (1 if stacked else 0)
        if ndim == 4:
            spec = P(DATA_AXIS, SPACE_AXIS)
        elif ndim >= 1:
            spec = P(DATA_AXIS)
        else:
            spec = P()
        if stacked and ndim >= 1:
            spec = P(None, *spec)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    spec = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, spec), tree)
