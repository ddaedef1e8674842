"""Spatial denoising ops: bilateral, median, fast non-local means.

The reference exposes these only through an external SpatialNoiseReduction
kernel + CNN proxies (reference codes/models/modules/tools_origin.py:673-804).
Here each algorithm is implemented natively in JAX with static 15x15 tap
unrolls + per-image radius masks, so the whole op stays inside one jitted XLA
program (no data-dependent shapes).  Sigma/decay parameters are continuous and
exactly differentiable; the discrete window size has zero gradient, as in the
reference (which detaches all params for these ops).

Parameter conventions ([0, 1] inputs, reference tools_origin.py:696-700,742-744,784-788):
  bilateral: (N, 3) [window01, sigma_color01, sigma_space01]
      window = 2*floor(window01*7)+3 in {3..15} (the reference's
      `window.int()*7*2+3` truncates to 3 for every window01<1 — an apparent
      bug; we implement the evident intent, matching its median mapping),
      sigma_* = 1 + 99*sigma01 on the 0..255 intensity scale.
  median: (N, 1) [size01], size = 2*floor(size01*7)+3, batch-uniform
      (reference uses kernel_size[0] for the whole batch).
  fastnlm: (N, 3) [block01, search01, decay01]; block/search mapped like
      window; decay h = 1 + 99*decay01 (0..255 scale).

Images are NHWC in [0, 1]; computation runs on the 0..255 scale internally to
keep sigma semantics identical to the reference wrappers (tools_origin.py:687-688).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

_MAX_R = 7  # max window 15 -> radius 7


def _size01_to_radius(p):
    """[0,1] -> integer radius in {1..7} (window {3..15})."""
    return jnp.clip(jnp.floor(p * 7.0), 0, 6).astype(jnp.int32) + 1


def _pad_reflect(x, r):
    return jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")


# ---------------------------------------------------------------------------
# Pallas dispatch: on TPU, large aligned frames route to the VMEM-resident
# kernels in ops/pallas_kernels.py — at 12 MP the jnp tap unrolls do not even
# fit in HBM (measured 16.6 GB demand vs 15.7 GB capacity).  Gradients come
# from the jnp implementation's VJP via jax.custom_vjp: search runs on small
# crops where the jnp path is used anyway, and the windowed algorithms'
# image-jacobians stay exactly as differentiable as before.
# ---------------------------------------------------------------------------

_PALLAS_MIN_PIXELS = 512 * 512


def _use_pallas(x) -> bool:
    if os.environ.get("RECONFIGISP_PALLAS", "auto") == "0":
        return False
    n, h, w, c = x.shape
    if (w * c) % 128 or h % 8:
        return False  # kernel output lane/sublane alignment
    if h * w < _PALLAS_MIN_PIXELS:
        return False  # jnp is fine (and grad-exact) for search crops
    return jax.default_backend() == "tpu"


# direct jnp VJP above this many rows does not fit in HBM (the tap-scan
# residuals scale with H); the strip VJP below recomputes per-strip instead
_VJP_DIRECT_ROWS = 640
_VJP_STRIP = 256


def _strip_vjp(jnp_fn, halo: int, x, params, g, *, strip: int = _VJP_STRIP):
    """Exact VJP of a windowed denoise op computed strip-by-strip.

    Output row j depends only on input rows within `halo` of j, so the
    full-frame Jacobian decomposes over row chunks.  Chunk s owns output
    rows [s*strip, (s+1)*strip); its window is a fixed-size slab of REAL
    frame rows, `clip(s*strip - halo, 0, h - L)` with L = strip + 2*halo.
    Running the op on the slab reproduces the full-frame values (and
    Jacobian) exactly for the owned rows: interior windows give every owned
    row its full halo of real context, and edge-clipped windows start/end at
    the true frame boundary, so the op's own reflect padding (including
    fastnlm's box-filter reflect of the *difference field*) is applied at
    exactly the rows the full-frame op applies it.  The cotangent is masked
    to the owned rows, so overlapping window rows are never double-counted.
    Peak memory is O(strip x W) instead of O(H x W) — the direct tap-scan
    backward at 12 MP demands more residual memory than a v5e chip has.
    """
    n, h, w, c = x.shape
    strip = min(strip, h)
    L = strip + 2 * halo
    if h <= L:  # too small to chunk — direct
        _, vjp = jax.vjp(jnp_fn, x, params)
        return vjp(g)
    n_chunks = -(-h // strip)

    def body(carry, s):
        gx, gp = carry
        wstart = jnp.clip(s * strip - halo, 0, h - L)
        xe = lax.dynamic_slice(x, (0, wstart, 0, 0), (n, L, w, c))
        ge = lax.dynamic_slice(g, (0, wstart, 0, 0), (n, L, w, c))
        row_ids = wstart + jnp.arange(L)
        owned = (row_ids >= s * strip) & (row_ids < (s + 1) * strip)
        ge = ge * owned.astype(ge.dtype)[None, :, None, None]
        _, vjp = jax.vjp(jnp_fn, xe, params)
        dxe, dp = vjp(ge)
        cur = lax.dynamic_slice(gx, (0, wstart, 0, 0), (n, L, w, c))
        gx = lax.dynamic_update_slice(gx, cur + dxe, (0, wstart, 0, 0))
        return (gx, jax.tree.map(jnp.add, gp, dp)), None

    (gx, gp), _ = lax.scan(
        body, (jnp.zeros_like(x), jnp.zeros_like(params)),
        jnp.arange(n_chunks))
    return gx, gp


def _make_hybrid(pallas_name: str, jnp_fn, halo: int):
    """custom_vjp op: Pallas forward; jnp-VJP backward — direct for frames
    that fit, strip-recomputed (`_strip_vjp`) for large frames so jax.grad of
    a >=512^2 denoise call cannot silently OOM."""

    @jax.custom_vjp
    def hybrid(x, params):
        from reconfigisp_tpu.ops import pallas_kernels
        return getattr(pallas_kernels, pallas_name)(x, params)

    def fwd(x, params):
        return hybrid(x, params), (x, params)

    def bwd(res, g):
        x, params = res
        if x.shape[1] <= _VJP_DIRECT_ROWS:
            _, vjp = jax.vjp(jnp_fn, x, params)
            return vjp(g)
        return _strip_vjp(jnp_fn, halo, x, params, g)

    hybrid.defvjp(fwd, bwd)
    return hybrid


# ---------------------------------------------------------------------------
# Small-frame vectorized tap path: at search-crop sizes the full 225-tap
# stack is a few MB, so the whole window runs data-parallel in ONE pass
# instead of a 15-iteration sequential fori_loop — the loops serialize the
# native search step (3 sRGB slots x 5 DARTS passes x remat recompute).
# Gate: total stacked elements, so big frames keep the rolled/Pallas forms.
# ---------------------------------------------------------------------------

_VECTOR_TAPS_MAX_ELEMS = 48 * 1024 * 1024  # ~192 MB f32 stack


def _small(x) -> bool:
    n, h, w, c = x.shape
    k2 = (2 * _MAX_R + 1) ** 2
    return n * h * w * c * k2 <= _VECTOR_TAPS_MAX_ELEMS


def _tap_stack(padded, h, w):
    """(N, H+2R, W+2R, C) -> (K2, N, H, W, C): every window offset."""
    return jnp.stack(
        [padded[:, _MAX_R + dy:_MAX_R + dy + h,
                _MAX_R + dx:_MAX_R + dx + w, :]
         for dy in range(-_MAX_R, _MAX_R + 1)
         for dx in range(-_MAX_R, _MAX_R + 1)])


def _tap_offsets():
    """(K2,) squared distance and Chebyshev radius of each offset."""
    dy, dx = jnp.meshgrid(jnp.arange(-_MAX_R, _MAX_R + 1),
                          jnp.arange(-_MAX_R, _MAX_R + 1), indexing="ij")
    dy = dy.reshape(-1).astype(jnp.float32)
    dx = dx.reshape(-1).astype(jnp.float32)
    return dy * dy + dx * dx, jnp.maximum(jnp.abs(dy), jnp.abs(dx))


def bilateral(x, params, weights=None):
    """Bilateral filter (reference tools_origin.py:673-717, proxy-only there)."""
    if _use_pallas(x):
        return _bilateral_hybrid(x, params)
    if _small(x):
        return _bilateral_vec(x, params)
    return _bilateral_jnp(x, params)


def _bilateral_vec(x, params):
    """One-pass 225-tap form of _bilateral_jnp (identical numerics)."""
    n, h, w, c = x.shape
    radius = _size01_to_radius(params[:, 0])[None, :, None, None, None]
    inv_2sc2 = (0.5 / (1.0 + 99.0 * params[:, 1]) ** 2)[None, :, None, None, None]
    inv_2ss2 = (0.5 / (1.0 + 99.0 * params[:, 2]) ** 2)[None, :, None, None, None]
    x255 = x * 255.0
    taps = _tap_stack(_pad_reflect(x255, _MAX_R), h, w)  # (K2,N,H,W,C)
    dist2, cheb = _tap_offsets()
    include = (cheb[:, None, None, None, None] <= radius).astype(x.dtype)
    wgt = include * jnp.exp(-dist2[:, None, None, None, None] * inv_2ss2
                            - (taps - x255[None]) ** 2 * inv_2sc2)
    out = jnp.sum(wgt * taps, 0) / jnp.clip(jnp.sum(wgt, 0), 1e-8, None)
    return jnp.clip(out / 255.0, 0.0, 1.0)


def _bilateral_jnp(x, params):
    """Hybrid tap loop: lax.fori_loop over the 15 column offsets (dynamic
    W-roll) with the 15 row offsets statically sliced inside the body.  The
    fully static 225-tap unroll built a ~10k-op HLO per instance — which,
    multiplied by (3 sRGB slots x 5 DARTS passes), dominated full-supernet
    compile time — while a fully rolled 225-iteration loop serialized the
    search step on device; 15 static x 15 sequential is the sweet spot."""
    n, h, w, c = x.shape
    radius = _size01_to_radius(params[:, 0])[:, None, None, None]
    sigma_color = (1.0 + 99.0 * params[:, 1])[:, None, None, None]
    sigma_space = (1.0 + 99.0 * params[:, 2])[:, None, None, None]
    x255 = x * 255.0
    padded = _pad_reflect(x255, _MAX_R)
    k = 2 * _MAX_R + 1

    inv_2sc2 = 0.5 / (sigma_color ** 2)
    inv_2ss2 = 0.5 / (sigma_space ** 2)

    def body(j, carry):
        num, den = carry
        dx = j - _MAX_R
        rolled = jnp.roll(padded, -dx, axis=2)
        adx = jnp.abs(dx)
        dx2 = (dx * dx).astype(jnp.float32)
        for dy in range(-_MAX_R, _MAX_R + 1):
            tap = rolled[:, _MAX_R + dy:_MAX_R + dy + h,
                         _MAX_R:_MAX_R + w, :]
            include = (jnp.maximum(abs(dy), adx) <= radius).astype(x.dtype)
            w_space = jnp.exp(-(dy * dy + dx2) * inv_2ss2)
            w_color = jnp.exp(-((tap - x255) ** 2) * inv_2sc2)
            wgt = include * w_space * w_color
            num = num + wgt * tap
            den = den + wgt
        return num, den

    num, den = lax.fori_loop(
        0, k, body, (jnp.zeros_like(x255), jnp.zeros_like(x255)))
    out = num / jnp.clip(den, 1e-8, None)
    return jnp.clip(out / 255.0, 0.0, 1.0)


# jnp median materializes a (..., (2r+1)^2) tap stack for the sort — 225x
# the image at r=7 (1.5 GB for a 256^2 val batch).  Rows are independent, so
# frames taller than this are processed in lax.map'ed row strips that bound
# peak memory at 225 x strip x W while keeping jnp.median's exact
# median-tap selection gradient.
_MEDIAN_STRIP = 64


def _median_taps(slab, r, rows, w):
    """(N, rows+2r, W+2r, C) padded slab -> (N, rows, W, C) median.

    The sort runs entirely under stop_gradient and the output is rebuilt as
    a tap-stack contraction with a (tie-normalized) equality mask: on TPU,
    differentiating through sort materializes a u32 permutation gather with
    a trailing unit index dim whose (8,128) lane padding inflates it 128x —
    a 225-tap window at 256^2 batch 4 demanded 93 GB of HBM at compile.
    Forward value is exactly the median (the selected taps all equal it);
    the backward routes the cotangent to the median tap (split equally
    among exact ties), the same subgradient jnp.median yields when unique.

    The sort forces the tap stack to materialize, so its layout matters.
    jnp.stack (expand_dims + concat) gives every operand a unit K2 dim;
    when XLA picks a K2-minor layout for the stacked result, each [..., 1]
    operand pads 1 -> 128 lanes — 225 taps x 96 MB padded copies = 21 GB
    for ONE median instance, which OOM'd the 256px search step.  Instead:
    fold C into the batch dim (minor dims stay (rows, W) = full (8, 128)
    tiles), concatenate the taps along the EXISTING rows axis — operands
    keep their natural unpadded layout — and split the K2 axis back out
    with a row-major reshape.  The sort is then a vectorized
    compare-exchange over lane-shaped operands on axis 1.
    """
    n, _, _, c = slab.shape
    k2 = (2 * r + 1) ** 2
    s = jnp.transpose(slab, (0, 3, 1, 2)).reshape(
        n * c, rows + 2 * r, w + 2 * r)
    taps = [s[:, r + dy:r + dy + rows, r + dx:r + dx + w]
            for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    stack = jnp.concatenate(taps, axis=1).reshape(n * c, k2, rows, w)
    stack_ng = lax.stop_gradient(stack)
    med = jnp.sort(stack_ng, axis=1)[:, k2 // 2]
    mask = (stack_ng == med[:, None]).astype(stack.dtype)
    mask = mask / jnp.sum(mask, axis=1, keepdims=True)
    out = jnp.sum(stack * mask, axis=1)
    return jnp.transpose(out.reshape(n, c, rows, w), (0, 2, 3, 1))


def _median_fixed(x, r):
    """Median filter with static radius r (window (2r+1)^2)."""
    n, h, w, c = x.shape
    padded = _pad_reflect(x, r)
    strip = _MEDIAN_STRIP
    if h <= strip:
        return _median_taps(padded, r, h, w)

    def chunk(s):
        slab = lax.dynamic_slice(
            padded, (0, s, 0, 0), (n, strip + 2 * r, w + 2 * r, c))
        return _median_taps(slab, r, strip, w)

    n_full = h // strip
    out = lax.map(chunk, jnp.arange(n_full) * strip)  # (S,N,strip,W,C)
    parts = [jnp.moveaxis(out, 0, 1).reshape(n, n_full * strip, w, c)]
    rem = h - n_full * strip
    if rem:  # trailing rows (heights not divisible by the strip, e.g. 1424)
        slab = padded[:, n_full * strip:n_full * strip + rem + 2 * r]
        parts.append(_median_taps(slab, r, rem, w))
    return jnp.concatenate(parts, axis=1) if rem else parts[0]


def median(x, params, weights=None):
    """Median filter (reference tools_origin.py:721-758, proxy-only there).

    Batch-uniform window selected with lax.switch over the 7 legal sizes —
    static shapes per branch, one branch executed.  TPU frames route to the
    Pallas bisection kernel (exact to ~2^-14 of the value range).
    """
    if _use_pallas(x):
        return _median_hybrid(x, params)
    return _median_jnp(x, params)


def _median_jnp(x, params):
    idx = jnp.clip(jnp.floor(params[0, 0] * 7.0), 0, 6).astype(jnp.int32)
    branches = [lambda v, r=r: _median_fixed(v, r) for r in range(1, 8)]
    return jnp.clip(lax.switch(idx, branches, x), 0.0, 1.0)


def _box_filter(x, r):
    """Separable (2r+1)^2 mean filter with reflect padding, static r."""
    if r == 0:
        return x
    k = 2 * r + 1
    pad_h = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="reflect")
    acc = sum(pad_h[:, i:i + x.shape[1]] for i in range(k)) / k
    pad_w = jnp.pad(acc, ((0, 0), (0, 0), (r, r), (0, 0)), mode="reflect")
    return sum(pad_w[:, :, i:i + x.shape[2]] for i in range(k)) / k


def fastnlm(x, params, weights=None):
    """Fast non-local means (reference tools_origin.py:762-804, proxy-only).

    Patch distances are box-filtered squared differences of shifted frames
    (the standard O(search^2) integral-image NLM); search offsets beyond the
    per-image search radius are masked out; the block (patch) size is
    batch-uniform via lax.switch.  The 225 search taps run as a lax.fori_loop
    with dynamic rolls — a fully unrolled tap loop inside the 7-way block
    switch produced a ~50k-op HLO that took minutes to compile; the rolled
    form compiles in seconds and the TPU hot path uses the Pallas kernel
    instead (ops/pallas_kernels.py).
    """
    if _use_pallas(x):
        return _fastnlm_hybrid(x, params)
    if _small(x):
        return _fastnlm_vec(x, params)
    return _fastnlm_jnp(x, params)


def _fastnlm_vec(x, params):
    """One-pass 225-tap form of _fastnlm_jnp (identical numerics): the
    per-tap box-filtered patch distances run with the tap axis folded into
    the batch, so all 225 search offsets are data-parallel."""
    n, h, w, c = x.shape
    k2 = (2 * _MAX_R + 1) ** 2
    search_radius = _size01_to_radius(params[:, 1])[None, :, None, None, None]
    inv_h2 = (1.0 / (1.0 + 99.0 * params[:, 2]) ** 2)[None, :, None, None, None]
    x255 = x * 255.0
    taps = _tap_stack(_pad_reflect(x255, _MAX_R), h, w)  # (K2,N,H,W,C)
    _, cheb = _tap_offsets()
    include = (cheb[:, None, None, None, None] <= search_radius).astype(x.dtype)
    diff2 = ((taps - x255[None]) ** 2).reshape(k2 * n, h, w, c)

    def run(block_r):
        d2 = _box_filter(diff2, block_r).reshape(k2, n, h, w, c)
        wgt = include * jnp.exp(-d2 * inv_h2)
        return jnp.sum(wgt * taps, 0) / jnp.clip(jnp.sum(wgt, 0), 1e-8, None)

    block_idx = jnp.clip(jnp.floor(params[0, 0] * 7.0), 0, 6).astype(jnp.int32)
    out = lax.switch(block_idx, [lambda r=r: run(r) for r in range(1, 8)])
    return jnp.clip(out / 255.0, 0.0, 1.0)


def _fastnlm_jnp(x, params):
    """Hybrid tap loop like _bilateral_jnp: fori over 15 column offsets,
    static row offsets inside; block (patch) size batch-uniform via
    lax.switch with a static separable box per branch."""
    n, h, w, c = x.shape
    block_idx = jnp.clip(jnp.floor(params[0, 0] * 7.0), 0, 6).astype(jnp.int32)
    search_radius = _size01_to_radius(params[:, 1])[:, None, None, None]
    hdecay = (1.0 + 99.0 * params[:, 2])[:, None, None, None]
    x255 = x * 255.0
    padded = _pad_reflect(x255, _MAX_R)
    k = 2 * _MAX_R + 1

    def run(block_r):
        inv_h2 = 1.0 / (hdecay ** 2)

        def body(j, carry):
            num, den = carry
            dx = j - _MAX_R
            rolled = jnp.roll(padded, -dx, axis=2)
            adx = jnp.abs(dx)
            for dy in range(-_MAX_R, _MAX_R + 1):
                tap = rolled[:, _MAX_R + dy:_MAX_R + dy + h,
                             _MAX_R:_MAX_R + w, :]
                d2 = _box_filter((tap - x255) ** 2, block_r)
                include = (jnp.maximum(abs(dy), adx)
                           <= search_radius).astype(x.dtype)
                wgt = include * jnp.exp(-d2 * inv_h2)
                num = num + wgt * tap
                den = den + wgt
            return num, den

        num, den = lax.fori_loop(
            0, k, body, (jnp.zeros_like(x255), jnp.zeros_like(x255)))
        return num / jnp.clip(den, 1e-8, None)

    out = lax.switch(block_idx, [lambda r=r: run(r) for r in range(1, 8)])
    return jnp.clip(out / 255.0, 0.0, 1.0)


# ---------------------------------------------------------------------------
# BM3D stand-in: sliding-window transform-domain hard-threshold denoiser.
# ---------------------------------------------------------------------------
# The reference never runs real BM3D in-line either (MATLAB-bound,
# origin_universal.py:11-13) — it ships a proxy CNN pretrained against it.
# This gives our BM3D proxy a native training target with the same parameter
# surface (5 params, super_prune...py:46,138-139): blockwise 2D DCT/WHT,
# hard-threshold the AC coefficients, sparsity-weighted overlap-add over 4
# half-block-shifted covers.  All transforms are b x b matmuls -> MXU work.

def _dct_matrix(b: int):
    k = jnp.arange(b, dtype=jnp.float32)
    mat = jnp.sqrt(2.0 / b) * jnp.cos(
        jnp.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * b))
    return mat.at[0].multiply(1.0 / jnp.sqrt(2.0))


def _wht_matrix(b: int):
    """Normalized Walsh-Hadamard (b must be a power of 2)."""
    h = jnp.asarray([[1.0]], jnp.float32)
    while h.shape[0] < b:
        h = jnp.block([[h, h], [h, -h]])
    return h / jnp.sqrt(float(b))


# opponent color transform used by BM3D for RGB inputs, and its inverse.
# Kept as numpy on purpose: module-level jnp arrays would initialize the
# device backend at import time — with the remote TPU tunnel down, merely
# importing the package would block in the connect-retry loop.
import numpy as _np  # noqa: E402  (module-constant use only)

_OPP = _np.asarray([[1 / 3, 1 / 3, 1 / 3],
                    [0.5, 0.0, -0.5],
                    [0.25, -0.5, 0.25]], _np.float32)
_OPP_INV = _np.asarray([[1.0, 1.0, 2 / 3],
                        [1.0, 0.0, -4 / 3],
                        [1.0, -1.0, 2 / 3]], _np.float32)
_EYE3 = _np.eye(3, dtype=_np.float32)


def _dct_denoise_fixed(x, thr, tmat, sparse_w, b: int):
    """x (N,H,W,C) 0..255; thr (N,1,1,1,1,1); tmat (N,b,b); sparse_w (N,) in
    {0,1} selecting sparsity-weighted vs uniform aggregation."""
    n, h, w, c = x.shape
    h2 = b // 2
    hp = -(-(h + b) // b) * b
    wp = -(-(w + b) // b) * b
    xp = jnp.pad(x, ((0, 0), (h2, hp - h - h2), (h2, wp - w - h2), (0, 0)),
                 mode="reflect")
    num = jnp.zeros_like(xp)
    den = jnp.zeros_like(xp)
    hb, wb = hp - b, wp - b
    tmat_t = jnp.swapaxes(tmat, 1, 2)
    for oy in (0, h2):
        for ox in (0, h2):
            view = xp[:, h2 - oy:h2 - oy + hb, h2 - ox:h2 - ox + wb, :]
            blocks = view.reshape(n, hb // b, b, wb // b, b, c)
            # 2D transform: T @ block @ T^T over the two b-axes, per image
            coef = jnp.einsum("nvu,niujbc->nivjbc", tmat, blocks,
                              preferred_element_type=jnp.float32)
            coef = jnp.einsum("nvu,niajuc->niajvc", tmat, coef,
                              preferred_element_type=jnp.float32)
            keep = jnp.abs(coef) > thr
            # always retain the DC coefficient (block mean)
            dc = jnp.zeros((b, b), bool).at[0, 0].set(True)
            keep = keep | dc[None, None, :, None, :, None]
            coef_t = jnp.where(keep, coef, 0.0)
            nkept = jnp.sum(keep.astype(jnp.float32), axis=(2, 4),
                            keepdims=True)
            wgt = jnp.where(sparse_w[:, None, None, None, None, None] > 0.5,
                            1.0 / (1.0 + nkept), jnp.ones_like(nkept))
            rec = jnp.einsum("nvu,niujbc->nivjbc", tmat_t, coef_t,
                             preferred_element_type=jnp.float32)
            rec = jnp.einsum("nvu,niajuc->niajvc", tmat_t, rec,
                             preferred_element_type=jnp.float32)
            wfull = jnp.broadcast_to(
                wgt, (n, hb // b, b, wb // b, b, c)).reshape(n, hb, wb, c)
            rec = (rec * wgt).reshape(n, hb, wb, c)
            num = num.at[:, h2 - oy:h2 - oy + hb,
                         h2 - ox:h2 - ox + wb, :].add(rec)
            den = den.at[:, h2 - oy:h2 - oy + hb,
                         h2 - ox:h2 - ox + wb, :].add(wfull)
    out = num / jnp.clip(den, 1e-8, None)
    return out[:, h2:h2 + h, h2:h2 + w, :]


def dct_denoise(x, params, weights=None):
    """Transform-domain hard-threshold denoiser: the native target for the
    BM3D proxy (params mirror super_prune...py:46's 5-vector).

    params (N, 5): [cff01, n101, cspace01, wtransform01, neighborhood01]
      cff01          -> hard threshold = 1 + 99*cff01 (0..255 scale)
      n101           -> block size 4 (<0.5) or 8 (batch-uniform, lax.switch)
      cspace01       -> >=0.5: denoise in the opponent color space
      wtransform01   -> >=0.5: WHT transform + sparsity-weighted aggregation;
                        else DCT + uniform aggregation
      neighborhood01 -> blend strength: out = lerp(x, denoised, blend)
    """
    n, h, w, c = x.shape
    thr = (1.0 + 99.0 * params[:, 0]).reshape(n, 1, 1, 1, 1, 1)
    use_opp = (params[:, 2] >= 0.5) & (c == 3)
    use_wht = params[:, 3] >= 0.5
    blend = params[:, 4][:, None, None, None]
    x255 = x * 255.0

    if c == 3:
        cmat = jnp.where(use_opp[:, None, None], _OPP[None], _EYE3[None])
        cinv = jnp.where(use_opp[:, None, None], _OPP_INV[None], _EYE3[None])
        # input is BGR; the opponent transform is defined over RGB
        xc = jnp.einsum("nij,nhwj->nhwi", cmat, x255[..., ::-1],
                        preferred_element_type=jnp.float32)
    else:
        xc = x255

    def run(b):
        tm = jnp.where(use_wht[:, None, None], _wht_matrix(b)[None],
                       _dct_matrix(b)[None])
        return _dct_denoise_fixed(xc, thr, tm, use_wht.astype(jnp.float32), b)

    den = lax.switch((params[0, 1] >= 0.5).astype(jnp.int32),
                     [lambda: run(4), lambda: run(8)])
    if c == 3:
        den = jnp.einsum("nij,nhwj->nhwi", cinv, den,
                         preferred_element_type=jnp.float32)[..., ::-1]
    out = x255 + blend * (den - x255)
    return jnp.clip(out / 255.0, 0.0, 1.0)


# hybrid instances (Pallas forward / jnp-VJP backward); defined at module
# bottom so the jnp implementations referenced in the backward passes exist.
# halo = row reach of one output pixel: window radius 7 for bilateral/median;
# fastnlm adds the block box-filter radius (7 + 7).
_bilateral_hybrid = _make_hybrid(
    "bilateral_pallas", lambda x, p: _bilateral_jnp(x, p), halo=_MAX_R)
_median_hybrid = _make_hybrid(
    "median_pallas", lambda x, p: _median_jnp(x, p), halo=_MAX_R)
_fastnlm_hybrid = _make_hybrid(
    "fastnlm_pallas", lambda x, p: _fastnlm_jnp(x, p), halo=2 * _MAX_R)
