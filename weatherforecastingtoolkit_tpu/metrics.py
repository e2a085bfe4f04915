"""Forecast-verification metric suite: CSI / HSS / CRPS / SSIM / PSNR.

Semantic parity with the reference's `pipeline/metrics.py:86-133`
(`calc_metrics`): inputs are (B, T, C, H, W) — or (B, N, T, C, H, W) with an
ensemble axis — in [0, 1]; output is the same flat ~65-scalar dict, including
the SEVIR VIL thresholds {16,74,133,160,181,219}/255, avg-pooling at scales
{1, 4, 16}, and the `paper_*` aggregates.

TPU-first design: the whole suite is ONE jitted program. The reference calls
csi/hss separately per (threshold, pool) — 36 passes over the data plus a
`.item()` sync each (pipeline/metrics.py:108-114). Here every pooled field is
computed once, all 6 thresholds are broadcast into a single vectorized
contingency reduction, and a single device->host transfer returns the dict.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pooling import avg_pool2d
from .ops.ssim import psnr as _psnr_nchw
from .ops.ssim import ssim as _ssim_nchw

_EPS = 1e-8          # reference pipeline/metrics.py:7
_CRPS_EPS = 1e-10    # reference pipeline/metrics.py:21
VIL_THRESHOLDS = (16 / 255, 74 / 255, 133 / 255, 160 / 255, 181 / 255, 219 / 255)
POOL_SCALES = (1, 4, 16)


def _contingency(pred: jax.Array, target: jax.Array, thresholds: jax.Array):
    """Vectorized TP/FN/FP/TN over all thresholds at once.

    pred/target: (M, H, W) flattened frames; thresholds: (K,).
    Returns four (K,) arrays. Mirrors `_hit_miss_fa_cn`
    (reference pipeline/metrics.py:9-16) with >=-thresholding.
    """
    th = thresholds.reshape(-1, 1, 1, 1)
    p = (pred[None] >= th)
    t = (target[None] >= th)
    axes = (1, 2, 3)
    tp = jnp.sum(p & t, axis=axes).astype(jnp.float32)
    fn = jnp.sum(~p & t, axis=axes).astype(jnp.float32)
    fp = jnp.sum(p & ~t, axis=axes).astype(jnp.float32)
    tn = jnp.sum(~p & ~t, axis=axes).astype(jnp.float32)
    return tp, fn, fp, tn


def _csi(tp, fn, fp):
    return tp / (tp + fn + fp + _EPS)


def _hss(tp, fn, fp, tn):
    num = 2.0 * (tp * tn - fn * fp)
    den = (tp + fn) * (fn + tn) + (tp + fp) * (fp + tn) + _EPS
    return num / den


def _crps_gaussian(mean: jax.Array, std: jax.Array, target: jax.Array) -> jax.Array:
    """Gaussian CRPS (reference pipeline/metrics.py:18-41 formula)."""
    frac_sqrt_pi = 1.0 / np.sqrt(np.pi)
    normed = (mean - target + _CRPS_EPS) / (std + _CRPS_EPS)
    cdf = jax.scipy.stats.norm.cdf(normed)
    pdf = jax.scipy.stats.norm.pdf(normed)
    val = (std + _CRPS_EPS) * (normed * (2.0 * cdf - 1.0) + 2.0 * pdf - frac_sqrt_pi)
    return jnp.mean(val)


@functools.partial(jax.jit, static_argnames=("has_ensemble", "psnr_data_range"))
def _calc_metrics_jit(pred: jax.Array, target: jax.Array, has_ensemble: bool,
                      psnr_data_range=1.0) -> Dict[str, jax.Array]:
    pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
    target = jnp.clip(target.astype(jnp.float32), 0.0, 1.0)

    if has_ensemble:
        b, n, t = pred.shape[:3]
        ens = pred                        # (B, N, T, C, H, W)
        single = jnp.mean(pred, axis=1)   # (B, T, C, H, W)
    else:
        ens = pred[:, None]
        single = pred
        n = 1

    results: Dict[str, jax.Array] = {}

    # ---- CRPS at pool scales 1/4/16 (avg pooling) --------------------------
    # ensemble mean/std per pixel; torch.std is ddof=1; N==1 -> std 0
    def flat_frames(x):  # (B,T,C,H,W) -> (B*T*C, H, W)
        return x.reshape((-1,) + x.shape[-2:])

    ens_flat = ens.reshape((-1,) + ens.shape[-2:])  # (B*N*T*C, H, W)
    tgt_flat = flat_frames(target)
    for scale, name in ((1, "CRPS"), (4, "CRPS_4"), (16, "CRPS_16")):
        if scale == 1:
            e, g = ens_flat, tgt_flat
        else:
            e, g = avg_pool2d(ens_flat, scale), avg_pool2d(tgt_flat, scale)
        e = e.reshape(ens.shape[:4] + e.shape[-2:])  # (B,N,T,C,h,w)
        g = g.reshape(target.shape[:3] + g.shape[-2:])
        mean = jnp.mean(e, axis=1)
        if n > 1:
            std = jnp.std(e, axis=1, ddof=1)
        else:
            std = jnp.zeros_like(mean)
        results[name] = _crps_gaussian(mean, std, g)

    # ---- SSIM / PSNR on (B*T, C, H, W) -------------------------------------
    p_nchw = single.reshape((-1,) + single.shape[-3:])
    t_nchw = target.reshape((-1,) + target.shape[-3:])
    results["SSIM"] = _ssim_nchw(p_nchw, t_nchw, data_range=1.0)
    results["PSNR"] = _psnr_nchw(p_nchw, t_nchw, data_range=psnr_data_range)
    # reference-convention PSNR is ALWAYS emitted alongside: bare torchmetrics
    # estimates the range per frame (target max - min), which reports
    # systematically higher numbers (reference pipeline/metrics.py:77-84).
    # Publishing comparisons against reference-published values must quote
    # PSNR_ref; PSNR (fixed [0,1] range) is the physically pinned one.
    results["PSNR_ref"] = (results["PSNR"] if psnr_data_range is None
                           else _psnr_nchw(p_nchw, t_nchw, data_range=None))

    # ---- CSI / HSS: 6 thresholds x 3 pool scales, one pass each scale ------
    th = jnp.asarray(VIL_THRESHOLDS, dtype=jnp.float32)
    p_flat = flat_frames(single)
    for scale in POOL_SCALES:
        suffix = "" if scale == 1 else f"_{scale}"
        if scale == 1:
            pp, tt = p_flat, tgt_flat
        else:
            pp, tt = avg_pool2d(p_flat, scale), avg_pool2d(tgt_flat, scale)
        tp, fn, fp, tn = _contingency(pp, tt, th)
        csi_v = _csi(tp, fn, fp)
        hss_v = _hss(tp, fn, fp, tn)
        for i in range(len(VIL_THRESHOLDS)):
            results[f"CSI_{i}{suffix}"] = csi_v[i]
            results[f"HSS_{i}{suffix}"] = hss_v[i]
        results[f"_csi_mean{suffix}"] = jnp.mean(csi_v)
        results[f"_hss_mean{suffix}"] = jnp.mean(hss_v)

    return results


def calc_metrics(pred, target, psnr_data_range=1.0) -> Dict[str, float]:
    """Drop-in analog of reference `calc_metrics` (pipeline/metrics.py:86-133).

    pred, target: array-likes of shape (B, T, C, H, W) in [0, 1]; pred may
    carry an ensemble axis (B, N, T, C, H, W). Returns a flat dict of python
    floats including the `paper_*` aggregates.

    psnr_data_range: 1.0 (default) pins the PSNR range to the [0, 1] clamp;
    None reproduces the reference's torchmetrics default, which ESTIMATES the
    range per frame from the target (max - min) and therefore reports
    systematically HIGHER PSNR (see ops/ssim.py:psnr). Both conventions are
    always emitted: `PSNR` uses psnr_data_range, `PSNR_ref` always uses the
    reference convention — quote PSNR_ref when comparing against
    reference-published values.
    """
    pred = jnp.asarray(pred)
    target = jnp.asarray(target)
    has_ensemble = pred.ndim == 6
    raw = _calc_metrics_jit(pred, target, has_ensemble, psnr_data_range)
    raw = jax.device_get(raw)

    results: Dict[str, float] = {}
    for k, v in raw.items():
        if not k.startswith("_"):
            results[k] = float(v)

    results["paper_SSIM"] = results["SSIM"]
    results["paper_PSNR"] = results["PSNR"]
    results["paper_CRPS"] = results["CRPS"]
    for pool_name, suffix in (("POOL1", ""), ("POOL4", "_4"), ("POOL16", "_16")):
        results[f"paper_CSI_M_{pool_name}"] = float(raw[f"_csi_mean{suffix}"])
        results[f"paper_CSI_181_{pool_name}"] = results[f"CSI_4{suffix}"]
        results[f"paper_CSI_219_{pool_name}"] = results[f"CSI_5{suffix}"]
        results[f"paper_HSS_{pool_name}"] = float(raw[f"_hss_mean{suffix}"])
    return results


# Re-exports for standalone use (reference exposes csi/hss/crps/ssim/psnr).
def crps(pred, target, pool_type="none", scale=1) -> float:
    """Standalone Gaussian CRPS with optional avg/max pooling — the direct
    analog of reference `crps` (pipeline/metrics.py:18-41). `pred` is
    (B, T, C, H, W) or (B, N, T, C, H, W) with an ensemble axis; the ensemble
    std uses ddof=1 (torch.std), N==1 -> std 0. Unlike `calc_metrics` (which
    only emits avg-pooled CRPS), this exposes the reference's max-pool mode."""
    pred = jnp.asarray(pred, dtype=jnp.float32)
    target = jnp.asarray(target, dtype=jnp.float32)
    if pred.ndim == 5:
        pred = pred[:, None]
    b, n = pred.shape[:2]
    pr = pred.reshape((-1,) + pred.shape[-2:])      # (B*N*T*C, H, W)
    gt = target.reshape((-1,) + target.shape[-2:])  # (B*T*C, H, W)
    if pool_type == "avg":
        pr, gt = avg_pool2d(pr, scale), avg_pool2d(gt, scale)
    elif pool_type == "max":
        from .ops.pooling import max_pool2d
        pr, gt = max_pool2d(pr, scale), max_pool2d(gt, scale)
    pr = pr.reshape(pred.shape[:4] + pr.shape[-2:])   # (B,N,T,C,h,w)
    gt = gt.reshape(target.shape[:3] + gt.shape[-2:])
    mean = jnp.mean(pr, axis=1)
    std = jnp.std(pr, axis=1, ddof=1) if n > 1 else jnp.zeros_like(mean)
    return float(_crps_gaussian(mean, std, gt))


def csi(pred, target, threshold, pool_type="none", scale=1) -> float:
    pred = jnp.clip(jnp.asarray(pred, dtype=jnp.float32), 0, 1)
    target = jnp.clip(jnp.asarray(target, dtype=jnp.float32), 0, 1)
    pp = pred.reshape((-1,) + pred.shape[-2:])
    tt = target.reshape((-1,) + target.shape[-2:])
    if pool_type == "avg":
        pp, tt = avg_pool2d(pp, scale), avg_pool2d(tt, scale)
    elif pool_type == "max":
        from .ops.pooling import max_pool2d
        pp, tt = max_pool2d(pp, scale), max_pool2d(tt, scale)
    tp, fn, fp, _ = _contingency(pp, tt, jnp.asarray([threshold], dtype=jnp.float32))
    return float(_csi(tp, fn, fp)[0])


def hss(pred, target, threshold, pool_type="none", scale=1) -> float:
    pred = jnp.clip(jnp.asarray(pred, dtype=jnp.float32), 0, 1)
    target = jnp.clip(jnp.asarray(target, dtype=jnp.float32), 0, 1)
    pp = pred.reshape((-1,) + pred.shape[-2:])
    tt = target.reshape((-1,) + target.shape[-2:])
    if pool_type == "avg":
        pp, tt = avg_pool2d(pp, scale), avg_pool2d(tt, scale)
    elif pool_type == "max":
        from .ops.pooling import max_pool2d
        pp, tt = max_pool2d(pp, scale), max_pool2d(tt, scale)
    tp, fn, fp, tn = _contingency(pp, tt, jnp.asarray([threshold], dtype=jnp.float32))
    return float(_hss(tp, fn, fp, tn)[0])
