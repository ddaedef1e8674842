"""Pallas TPU kernels for the windowed denoise ops.

The reference could only search these algorithms through CNN imitators
(reference codes/models/modules/tools_origin.py:673-804); ops/denoise.py gives
exact jnp implementations, but their 225-tap unrolls materialize large
intermediates and compile slowly at 12 MP.  These kernels keep the whole
window loop VMEM-resident: the image is processed in row strips DMA'd from
HBM with a 7-pixel halo, channels stay interleaved on the lane axis (a
W-shift by dx pixels is a lane shift by dx*C — no layout changes anywhere),
and per-image parameters arrive via scalar prefetch.

Layout: x (N, H, W, C) f32 -> internally (N, H+2R, (W+2R)*C) interleaved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_R = 7   # window {3..15} -> radius {1..7} (reference tools_origin.py:698)
_ROW_H = 8  # row halo padded to 8 (Mosaic: DMA row-slice sizes need
            # 8-alignment; 7 would make strip+14 rows)


def _bilateral_kernel(radius_ref, inv2sc2_ref, inv2ss2_ref,  # scalar prefetch
                      x_hbm, out_ref, scratch, sem, *, th, w, c, cp):
    n_idx = pl.program_id(0)
    s_idx = pl.program_id(1)

    # DMA the strip + halo from HBM: rows [s_idx*th, s_idx*th + th + 16)
    dma = pltpu.make_async_copy(
        x_hbm.at[n_idx, pl.ds(s_idx * th, th + 2 * _ROW_H), :],
        scratch, sem)
    dma.start()
    dma.wait()

    radius = radius_ref[n_idx]
    inv2sc2 = inv2sc2_ref[n_idx]
    inv2ss2 = inv2ss2_ref[n_idx]

    center = scratch[_ROW_H:_ROW_H + th, cp * c:cp * c + w * c]

    # Row offsets (sublanes) are unrolled statically — dynamic sublane slices
    # must be 8-aligned, which +-7 offsets are not.  Column taps come from a
    # fori_loop over dx with a dynamic lane roll (a fully unrolled 225-tap
    # loop spilled ~139 MB of registers to VMEM).
    zeros = jnp.zeros((th, w * c), jnp.float32)
    num, den = zeros, zeros
    for dy in range(-MAX_R, MAX_R + 1):
        slab = scratch[_ROW_H + dy:_ROW_H + dy + th, :]
        dy2 = float(dy * dy)
        ady = abs(dy)

        def body(j, carry, slab=slab, dy2=dy2, ady=ady):
            num, den = carry
            dx = j - MAX_R
            shifted = pltpu.roll(slab, -dx * c, axis=1)
            tap = shifted[:, cp * c:cp * c + w * c]
            chess = jnp.maximum(ady, jnp.abs(dx))
            include = (chess <= radius).astype(jnp.float32)
            w_space = jnp.exp(-(dy2 + (dx * dx).astype(jnp.float32))
                              * inv2ss2)
            diff = tap - center
            wgt = include * w_space * jnp.exp(-(diff * diff) * inv2sc2)
            return num + wgt * tap, den + wgt

        num, den = jax.lax.fori_loop(0, 2 * MAX_R + 1, body, (num, den))
    out_ref[0, :, :] = num / den


def _col_pad(w: int, c: int) -> int:
    """Smallest p >= MAX_R with (w + 2p) * c a multiple of 128 (Mosaic: DMA
    lane extents must be 128-aligned, even for full-dimension slices)."""
    p = MAX_R
    while ((w + 2 * p) * c) % 128:
        p += 1
    return p


def bilateral_pallas(x: jnp.ndarray, params: jnp.ndarray,
                     weights=None, *, strip: int = 64,
                     interpret: bool = False) -> jnp.ndarray:
    """Bilateral filter, same semantics as ops/denoise.bilateral.

    params (N, 3): [window01, sigma_color01, sigma_space01]; sigmas on the
    0..255 scale (reference tools_origin.py:698-700).  Requires w*c to be a
    multiple of 128 on real TPU (output lane alignment); callers fall back to
    the jnp implementation otherwise."""
    n, h, w, c = x.shape
    if h % strip:
        strip = max(8, h // max(h // strip, 1))
        while h % strip:
            strip //= 2
    n_strips = h // strip
    cp = _col_pad(w, c)

    radius = jnp.clip(jnp.floor(params[:, 0] * 7.0), 0, 6).astype(jnp.int32) + 1
    sigma_color = 1.0 + 99.0 * params[:, 1]
    sigma_space = 1.0 + 99.0 * params[:, 2]
    inv2sc2 = 0.5 / (sigma_color * sigma_color)
    inv2ss2 = 0.5 / (sigma_space * sigma_space)

    x255 = x * 255.0
    xp = jnp.pad(x255, ((0, 0), (_ROW_H, _ROW_H), (cp, cp), (0, 0)),
                 mode="reflect")
    flat = xp.reshape(n, h + 2 * _ROW_H, (w + 2 * cp) * c)

    kernel = functools.partial(_bilateral_kernel, th=strip, w=w, c=c, cp=cp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n, n_strips),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, strip, w * c),
            lambda i, j, *prefetch: (i, j, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((strip + 2 * _ROW_H, (w + 2 * cp) * c),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w * c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(radius, inv2sc2, inv2ss2, flat)
    return jnp.clip(out.reshape(n, h, w, c) / 255.0, 0.0, 1.0)


# --------------------------------------------------------------------------
# Fused Path-Restore-14L: the whole 14-conv residual stack over one VMEM tile
# --------------------------------------------------------------------------

def _conv3x3_valid(x, w, b):
    """x (hh, ww, cin) bf16 -> (hh-2, ww-2, cout) f32; 9 shifted MXU dots."""
    hh, ww, cin = x.shape
    cout = w.shape[-1]
    acc = None
    for dy in range(3):
        for dx in range(3):
            patch = x[dy:dy + hh - 2, dx:dx + ww - 2, :]
            term = jax.lax.dot_general(
                patch, w[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    return acc + b


_HALO = 13  # receptive-field halo of layers 2..14 (13 VALID 3x3 convs)


def _conv3x3_same(x, w, b):
    """Constant-shape 3x3 conv (zero edge): the tile keeps its full
    (th+2H, tw+2H) extent every layer so the residual loop can be a
    lax.fori_loop; edge garbage creeps inward 1 px/layer and the final
    _HALO-wide crop discards it (mathematically identical to VALID chaining
    on the kept interior)."""
    hh, ww, cin = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    return _conv3x3_valid(xp, w, b)


def _path14_kernel(x_ref, wmid_ref, bmid_ref, wlast_ref, blast_ref,
                   out_ref, *, th, tw, cout):
    """Blocks are pipeline-managed (Mosaic relayouts the 64-lane minor dim
    itself; manual DMA would demand 128-lane alignment).  The 12 mid-layer
    weights are stacked (12, 3, 3, 64, 64) and the residual blocks run as a
    fori_loop — compile-friendly (a fully unrolled 13-layer body took >30 min
    through the remote Mosaic compiler)."""
    y0 = x_ref[0, 0, :, 0, :, :]  # (th+2H, tw+2H, 64) bf16

    def block(k, y):
        # dynamic indexing on the VMEM refs (dynamic_slice on loaded values
        # is unimplemented in the Mosaic lowering)
        w1 = wmid_ref[2 * k].astype(jnp.bfloat16)
        w2 = wmid_ref[2 * k + 1].astype(jnp.bfloat16)
        t = _conv3x3_same(jnp.maximum(y, 0), w1, bmid_ref[2 * k])
        t = t.astype(jnp.bfloat16)
        t = _conv3x3_same(jnp.maximum(t, 0), w2, bmid_ref[2 * k + 1])
        return y + t.astype(jnp.bfloat16)

    y = jax.lax.fori_loop(0, 6, block, y0)
    out = _conv3x3_same(jnp.maximum(y, 0),
                        wlast_ref[...].astype(jnp.bfloat16), blast_ref[...])
    out_ref[0, 0, :, 0, :, :] = out[_HALO:_HALO + th, _HALO:_HALO + tw, :]


def path14_fused_pallas(weights: dict, feat: jnp.ndarray, *,
                        th: int = 64, tw: int = 512,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused Path-Restore-14L forward (see ops/cnn.py for the layer list).

    The unfused XLA version round-trips ~400 MB of activations through HBM
    per layer (~16 ms/layer at 12 MP on v5e).  Here conv_first runs as a
    normal XLA conv; its output is cut into overlapping (th+26, tw+26) bf16
    tiles in XLA (one gather, ~1.6x duplication), and each tile then flows
    through the remaining 13 convolutions entirely in VMEM as 9-offset
    shifted MXU dots per layer — the activation stack never touches HBM.
    In/out arrays are 6D (N, n_i, th, n_j, tw, C) so tile reassembly is a
    free reshape.  Numerics: activations stay bf16 between layers (the XLA
    path keeps f32), so outputs agree within bf16 accumulation tolerance
    (~3e-3 interior); a 13-pixel border ring differs further because the
    reference zero-pads every layer (torch Conv2d padding=1) while this
    kernel zero-pads conv_first's output once.
    """
    from reconfigisp_tpu.ops.nn import conv2d

    n, h, w, cin = feat.shape
    cout = weights["conv_last"]["w"].shape[-1]
    assert h % th == 0 and w % tw == 0, (h, w, th, tw)
    n_i, n_j = h // th, w // tw

    y1 = conv2d(feat, **weights["conv_first"])          # (N, h, w, 64) f32
    xp = jnp.pad(y1, ((0, 0), (_HALO, _HALO), (_HALO, _HALO), (0, 0)))
    xp = xp.astype(jnp.bfloat16)
    # overlapping tiles: (N, n_i, th+2H, n_j, tw+2H, 64)
    rows = jnp.stack([xp[:, i * th:i * th + th + 2 * _HALO]
                      for i in range(n_i)], axis=1)
    tiles = jnp.stack([rows[:, :, :, j * tw:j * tw + tw + 2 * _HALO]
                       for j in range(n_j)], axis=3)

    mids = []
    for blk in weights["blocks"]:
        mids += [blk["conv1"], blk["conv2"]]
    wmid = jnp.stack([l["w"] for l in mids])     # (12, 3, 3, 64, 64)
    bmid = jnp.stack([l["b"] for l in mids])     # (12, 64)
    wlast = weights["conv_last"]["w"]
    blast = weights["conv_last"]["b"]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4

    kernel = functools.partial(_path14_kernel, th=th, tw=tw, cout=cout)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n_i, th, n_j, tw, cout),
                                       jnp.float32),
        grid=(n, n_i, n_j),
        in_specs=[pl.BlockSpec(
            (1, 1, th + 2 * _HALO, 1, tw + 2 * _HALO, 64),
            lambda ni, i, j: (ni, i, 0, j, 0, 0),
            memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, 1, tw, cout), lambda ni, i, j: (ni, i, 0, j, 0, 0),
            memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tiles, wmid, bmid, wlast, blast)
    return out.reshape(n, h, w, cout)
