"""Image quality metrics: MSE/PSNR/SSIM.

Re-design of reference codes/utils/util.py:141-154 (psnr) and
codes/utils/util_path_restore.py:6-44 (mse/psnr/ssim) in pure JAX so they can
run on-device inside jitted eval loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(x, y):
    axes = tuple(range(1, x.ndim)) if x.ndim == 4 else None
    return jnp.mean((x - y) ** 2, axis=axes)


def psnr(x, y, max_val: float = 1.0):
    """10*log10(max^2/mse); per-image when batched (reference util.py:141-154)."""
    m = jnp.clip(mse(x, y), 1e-12, None)
    return 10.0 * jnp.log10(max_val ** 2 / m)


def ssim(x, y, max_val: float = 1.0):
    """Gaussian-windowed SSIM (Wang et al. 2004), per image, mean over
    channels — the JAX analog of skimage compare_ssim used at
    reference util_path_restore.py:27-44."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    # 11x11 gaussian window, sigma 1.5
    g = jnp.exp(-0.5 * ((jnp.arange(11) - 5.0) / 1.5) ** 2)
    g = g / jnp.sum(g)
    win = jnp.outer(g, g)[:, :, None, None]  # (11,11,1,1)

    def filt(img):
        n, h, w, c = img.shape
        img_ = img.transpose(0, 3, 1, 2).reshape(n * c, h, w, 1)
        out = jax.lax.conv_general_dilated(
            img_, win, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        oh, ow = out.shape[1], out.shape[2]
        return out.reshape(n, c, oh, ow).transpose(0, 2, 3, 1)

    mu_x, mu_y = filt(x), filt(y)
    sxx = filt(x * x) - mu_x ** 2
    syy = filt(y * y) - mu_y ** 2
    sxy = filt(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
