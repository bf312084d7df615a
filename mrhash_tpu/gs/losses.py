"""GS training losses (mrhash/src/gs/loss_utils.cuh:16-44): L1, L2, SSIM
with an 11x11 Gaussian window, and the PSNR metric
(gaussian_utils.cuh:269-273)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

WINDOW_SIZE = 11
SIGMA = 1.5


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def _gaussian_window():
    x = jnp.arange(WINDOW_SIZE, dtype=jnp.float32) - WINDOW_SIZE // 2
    g = jnp.exp(-(x ** 2) / (2 * SIGMA ** 2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def _filter2d(img, window):
    """Depthwise 11x11 convolution over [C,H,W] with same padding."""
    c = img.shape[0]
    k = window[None, None].repeat(c, 0)            # [C,1,11,11]
    return jax.lax.conv_general_dilated(
        img[None], k, (1, 1), "SAME",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]


def ssim(pred, gt):
    """Structural similarity over [C,H,W] in [0,1]."""
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    w = _gaussian_window()
    mu1 = _filter2d(pred, w)
    mu2 = _filter2d(gt, w)
    mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(pred * pred, w) - mu1s
    s2 = _filter2d(gt * gt, w) - mu2s
    s12 = _filter2d(pred * gt, w) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1)
                                              * (s1 + s2 + c2))
    return jnp.mean(m)


def psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
