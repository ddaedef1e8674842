"""Tests for demosaic kernels and the native denoise implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconfigisp_tpu.ops import demosaic, denoise
from reconfigisp_tpu.ops.nn import bayer_to_rggb, rggb_to_bayer

# jit the 225-tap unrolled ops: eagerly they pay ~0.2 s/dispatch in this
# environment (the whole file went from >400 s to seconds)
_median = jax.jit(denoise.median)
_bilateral = jax.jit(denoise.bilateral)
_fastnlm = jax.jit(denoise.fastnlm)
_dnearest = jax.jit(demosaic.demosaic_nearest)
_dbilinear = jax.jit(demosaic.demosaic_bilinear)
_dmalvar = jax.jit(demosaic.demosaic_malvar)


def _mosaic_from_rgb(rgb):
    """RGB (H,W,3) -> RGGB mosaic (1,H,W,1)."""
    h, w, _ = rgb.shape
    m = np.zeros((h, w), np.float32)
    m[0::2, 0::2] = rgb[0::2, 0::2, 0]
    m[0::2, 1::2] = rgb[0::2, 1::2, 1]
    m[1::2, 0::2] = rgb[1::2, 0::2, 1]
    m[1::2, 1::2] = rgb[1::2, 1::2, 2]
    return jnp.asarray(m[None, :, :, None])


class TestDemosaic:
    @pytest.mark.parametrize("fn", [_dnearest, _dbilinear, _dmalvar])
    def test_constant_image_exact(self, fn):
        """A flat gray scene must demosaic to the same flat gray."""
        rgb = np.full((16, 16, 3), 0.42, np.float32)
        out = np.asarray(fn(_mosaic_from_rgb(rgb)))
        np.testing.assert_allclose(out, 0.42, atol=1e-5)

    @pytest.mark.parametrize("fn", [_dnearest, _dbilinear, _dmalvar])
    def test_constant_color_channels(self, fn):
        """Flat but chromatic scene: channels must land in BGR order."""
        rgb = np.zeros((16, 16, 3), np.float32)
        rgb[..., 0], rgb[..., 1], rgb[..., 2] = 0.8, 0.4, 0.2  # R, G, B
        out = np.asarray(fn(_mosaic_from_rgb(rgb)))[0]
        interior = out[4:-4, 4:-4]
        np.testing.assert_allclose(interior[..., 0], 0.2, atol=1e-4)  # B
        np.testing.assert_allclose(interior[..., 1], 0.4, atol=1e-4)  # G
        np.testing.assert_allclose(interior[..., 2], 0.8, atol=1e-4)  # R

    def test_malvar_beats_bilinear_on_gradient(self, rng):
        """Gradient-corrected interpolation should win on a luminance ramp."""
        yy, xx = np.mgrid[0:32, 0:32]
        lum = ((yy + 2 * xx) / 96.0).astype(np.float32)
        rgb = np.stack([lum, lum, lum], -1)
        mosaic = _mosaic_from_rgb(rgb)
        gt_bgr = jnp.asarray(rgb[None])  # gray: BGR == RGB
        err_b = float(jnp.mean((_dbilinear(mosaic) - gt_bgr)[0, 4:-4, 4:-4] ** 2))
        err_m = float(jnp.mean((_dmalvar(mosaic) - gt_bgr)[0, 4:-4, 4:-4] ** 2))
        assert err_m <= err_b + 1e-9

    def test_rggb_pack_roundtrip(self, bayer_batch):
        packed = bayer_to_rggb(jnp.asarray(bayer_batch))
        assert packed.shape == (2, 16, 16, 4)
        np.testing.assert_array_equal(rggb_to_bayer(packed), bayer_batch)


def _p(n, vals):
    return jnp.broadcast_to(jnp.asarray(vals, jnp.float32)[None, :], (n, len(vals)))


class TestDenoise:
    def test_median_removes_impulse(self):
        x = np.full((1, 16, 16, 3), 0.5, np.float32)
        x[0, 8, 8, :] = 1.0
        out = np.asarray(_median(jnp.asarray(x), _p(1, [0.0])))  # 3x3
        np.testing.assert_allclose(out, 0.5, atol=1e-6)

    def test_median_window_from_param(self):
        """size01 -> window mapping {3..15} (reference tools_origin.py:744)."""
        # a 3-wide stripe survives a 3x3 median but not a 7x7 one
        x = np.zeros((1, 16, 16, 1), np.float32)
        x[0, :, 7:10, 0] = 1.0
        small = np.asarray(_median(jnp.asarray(x), _p(1, [0.0])))
        big = np.asarray(_median(jnp.asarray(x), _p(1, [2.5 / 7.0])))
        assert small[0, 8, 8, 0] == 1.0
        assert big[0, 8, 8, 0] == 0.0

    def test_median_strips_match_full_frame(self, rng, monkeypatch):
        """The row-strip path (incl. a trailing remainder strip for heights
        not divisible by the strip, e.g. SID's 1424) must equal the
        single-slab form exactly, in value and gradient."""
        monkeypatch.setattr(denoise, "_MEDIAN_STRIP", 8)
        x = jnp.asarray(rng.uniform(0, 1, (1, 20, 16, 1)).astype(np.float32))

        def full(v):  # reference: one slab over the whole frame
            return denoise._median_taps(denoise._pad_reflect(v, 2), 2, 20, 16)

        got = denoise._median_fixed(x, 2)  # 2 full strips + 4-row remainder
        np.testing.assert_array_equal(np.asarray(got), np.asarray(full(x)))
        g_strip = jax.grad(lambda v: jnp.sum(denoise._median_fixed(v, 2) ** 2))(x)
        g_full = jax.grad(lambda v: jnp.sum(full(v) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_strip), np.asarray(g_full),
                                   atol=1e-6)

    def test_bilateral_smooths_noise_preserves_edge(self, rng):
        x = np.zeros((1, 16, 16, 1), np.float32)
        x[0, :, 8:, 0] = 1.0
        noisy = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
        out = np.asarray(_bilateral(
            jnp.asarray(noisy), _p(1, [0.3, 0.15, 0.5])))
        # noise reduced on flats
        assert out[0, :, :4, 0].std() < noisy[0, :, :4, 0].std() * 0.7
        # edge magnitude preserved
        assert (out[0, :, 12:, 0].mean() - out[0, :, :4, 0].mean()) > 0.8

    def test_bilateral_window_mask(self, rng):
        """Radius mask: tiny window ~ no-op on smooth data vs large window."""
        noisy = rng.uniform(0.3, 0.7, (1, 16, 16, 1)).astype(np.float32)
        small = np.asarray(_bilateral(jnp.asarray(noisy), _p(1, [0.0, 0.9, 0.9])))
        large = np.asarray(_bilateral(jnp.asarray(noisy), _p(1, [1.0, 0.9, 0.9])))
        assert large.std() < small.std()

    def test_nlm_denoises(self, rng):
        clean = np.full((1, 16, 16, 1), 0.5, np.float32)
        noisy = np.clip(clean + rng.normal(0, 0.08, clean.shape).astype(np.float32), 0, 1)
        out = np.asarray(_fastnlm(
            jnp.asarray(noisy), _p(1, [0.1, 0.5, 0.3])))
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean() * 0.6
