"""Tiled full-resolution inference with feathered blending.

Re-design of reference codes/utils/util_path_restore.py:47-134
(create_patch_mask / whole2patch / patch2whole) and the per-patch host loop in
codes/test_split.py:83-106: there every patch round-trips host<->device
individually; here the tile grid is static, patches are gathered with static
slices, processed in device-resident chunks, and blended with a linear
edge-feathered mask — the whole function is pure and jittable.

For *device-parallel* spatial decomposition (the multi-chip analog), shard the
image H axis over the mesh 'space' axis instead (parallel/dp.py) — XLA inserts
conv halo exchanges automatically.  This module is the memory-bounded
sequential variant for frames too large for one pass.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax.numpy as jnp


def feather_mask(size, edge) -> np.ndarray:
    """All-ones map whose `edge`-wide borders ramp linearly to ~0
    (reference util_path_restore.py:47-64)."""
    h, w = size
    eh, ew = edge
    assert eh <= h // 2 and ew <= w // 2
    m = np.ones((h, w), np.float32)
    for i in range(eh):
        v = (i + 1) / (eh + 1)
        m[i, :] = v
        m[-1 - i, :] = v
    for j in range(ew):
        v = (j + 1) / (ew + 1)
        m[:, j] = np.minimum(m[:, j], v)
        m[:, -1 - j] = np.minimum(m[:, -1 - j], v)
    return m


def tile_positions(total: int, size: int, stride: int) -> list:
    """Overlapping grid start positions (reference util_path_restore.py:88-89)."""
    pos = list(range(0, total - size, stride)) + [total - size]
    return pos


def tiled_apply(fn: Callable, x: jnp.ndarray, *, patch: int, stride: int,
                chunk: int = 4, out_channels: int = 3) -> jnp.ndarray:
    """Apply fn over overlapping patches of x (N,H,W,C) and blend.

    patch/stride must be even to preserve RGGB phase (the reference relies on
    even configs for the same reason, e.g. patch 512 stride 480 —
    codes/options/test/S7ISP_test.yml:18-19).

    Chunks run through lax.map, so `fn`'s body is traced/compiled ONCE no
    matter how many tiles cover the frame — wrap the whole call in jax.jit
    for a single-dispatch tiled inference program (an eager per-chunk loop
    paid ~130 tunnel round trips at 12 MP -> 14 MP/s; the jitted map runs
    the same frame at ~90 MP/s on v5e).
    """
    import jax

    n, H, W, _ = x.shape
    assert patch % 2 == 0 and stride % 2 == 0, "RGGB alignment needs even sizes"
    assert H % 2 == 0 and W % 2 == 0
    ys = tile_positions(H, patch, stride)
    xs = tile_positions(W, patch, stride)
    eh = (patch - stride) // 2
    ew = (patch - stride) // 2
    mask = jnp.asarray(feather_mask((patch, patch), (eh, ew)))[None, :, :, None]

    positions = [(y0, x0) for y0 in ys for x0 in xs]
    patches = jnp.concatenate(
        [x[:, y0:y0 + patch, x0:x0 + patch, :] for (y0, x0) in positions],
        axis=0)  # (P*N, patch, patch, C)

    total = patches.shape[0]
    group = max(1, chunk) * n
    pad = (-total) % group
    if pad:
        patches = jnp.concatenate(
            [patches, jnp.zeros((pad,) + patches.shape[1:], patches.dtype)],
            axis=0)
    stacked = patches.reshape((total + pad) // group, group,
                              patch, patch, x.shape[-1])
    outs = jax.lax.map(fn, stacked)
    outs = outs.reshape(total + pad, patch, patch, out_channels)[:total]

    out = jnp.zeros((n, H, W, out_channels), outs.dtype)
    count = jnp.zeros((1, H, W, 1), outs.dtype)
    for k, (y0, x0) in enumerate(positions):
        piece = outs[k * n:(k + 1) * n] * mask
        out = out.at[:, y0:y0 + patch, x0:x0 + patch, :].add(piece)
        count = count.at[:, y0:y0 + patch, x0:x0 + patch, :].add(mask)
    return out / count
