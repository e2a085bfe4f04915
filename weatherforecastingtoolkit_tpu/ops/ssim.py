"""SSIM and PSNR on (N, C, H, W) images, pure JAX.

Capability parity with the reference's torchmetrics usage
(reference pipeline/metrics.py:71-84). We implement the canonical Wang et al.
gaussian-window SSIM (kernel 11, sigma 1.5, k1=0.01, k2=0.03) with VALID
convolution — the same formulation as pytorch_msssim, which the reference
itself uses for training-time SSIM (reference experiments/ae_v2_2/train.py:17).
PSNR takes an explicit data_range (we fix 1.0 for [0,1 ] radar frames; the
reference's bare `PeakSignalNoiseRatio()` estimated range from data, a
deprecated quirk we intentionally pin down).

TPU notes: the gaussian window is separable — two depthwise 1-D convolutions
instead of one 11x11, ~5.5x fewer MACs, and XLA fuses the elementwise SSIM map
math into the second conv's epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur_valid(x: jax.Array, size: int, sigma: float) -> jax.Array:
    """Separable gaussian blur, VALID padding. x: (N, C, H, W)."""
    k = jnp.asarray(_gaussian_kernel1d(size, sigma))
    c = x.shape[1]
    # depthwise: feature_group_count = C
    kh = jnp.broadcast_to(k.reshape(1, 1, size, 1), (c, 1, size, 1))
    kw = jnp.broadcast_to(k.reshape(1, 1, 1, size), (c, 1, 1, size))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    # HIGHEST: metrics must be fp32-exact; the TPU MXU default is bf16 inputs.
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Mean SSIM over a batch of (N, C, H, W) images. Returns a scalar."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = _blur_valid(pred, kernel_size, sigma)
    mu_t = _blur_valid(target, kernel_size, sigma)
    mu_pp = _blur_valid(pred * pred, kernel_size, sigma)
    mu_tt = _blur_valid(target * target, kernel_size, sigma)
    mu_pt = _blur_valid(pred * target, kernel_size, sigma)

    var_p = mu_pp - mu_p * mu_p
    var_t = mu_tt - mu_t * mu_t
    cov = mu_pt - mu_p * mu_t

    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p * mu_p + mu_t * mu_t + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)


def psnr(pred: jax.Array, target: jax.Array,
         data_range: "float | None" = 1.0) -> jax.Array:
    """Per-image PSNR averaged over the batch (reference averages per-frame,
    pipeline/metrics.py:77-84). (N, C, H, W) -> scalar.

    data_range=None reproduces the reference's bare torchmetrics
    PeakSignalNoiseRatio() behavior: the range is ESTIMATED per frame as the
    target's max - min (a deprecated torchmetrics quirk that inflates PSNR on
    low-contrast frames). The default pins 1.0 — inputs are clamped to [0, 1]
    — which is systematically LOWER than the estimated-range numbers the
    reference reports; use data_range=None when comparing against them."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    if data_range is None:
        rng = (jnp.max(target, axis=(1, 2, 3))
               - jnp.min(target, axis=(1, 2, 3)))
        rng = jnp.maximum(rng, 1e-6)
    else:
        rng = data_range
    val = 10.0 * jnp.log10((rng ** 2) / jnp.maximum(mse, 1e-12))
    return jnp.mean(val)
