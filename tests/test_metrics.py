"""Metric suite tests: hand-computed contingency tables, CRPS closed form,
SSIM/PSNR cross-checks against independent numpy implementations, and the
calc_metrics dict contract (keys match reference pipeline/metrics.py:86-133).
"""

import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.metrics import calc_metrics, csi, hss
from weatherforecastingtoolkit_tpu.ops.pooling import avg_pool2d, max_pool2d
from weatherforecastingtoolkit_tpu.ops.ssim import psnr, ssim


# ---------------------------------------------------------------- pooling
def test_avg_pool_matches_numpy(rng):
    x = rng.random((3, 8, 8)).astype(np.float32)
    out = np.asarray(avg_pool2d(x, 4))
    expected = x.reshape(3, 2, 4, 2, 4).mean(axis=(2, 4))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_max_pool_matches_numpy(rng):
    x = rng.random((2, 1, 16, 16)).astype(np.float32)
    out = np.asarray(max_pool2d(x, 4))
    expected = x.reshape(2, 1, 4, 4, 4, 4).max(axis=(3, 5))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_pool_floor_semantics(rng):
    # 10x10 with window 4 -> 2x2 (torch floor behavior)
    x = rng.random((1, 10, 10)).astype(np.float32)
    assert np.asarray(avg_pool2d(x, 4)).shape == (1, 2, 2)


# ---------------------------------------------------------------- CSI / HSS
def test_csi_hand_computed():
    # 2x2 frame, threshold .5: pred hits {a}, target hits {a, b}
    pred = np.array([[[[[0.9, 0.1], [0.2, 0.3]]]]], dtype=np.float32)  # B,T,C,H,W
    target = np.array([[[[[0.8, 0.7], [0.1, 0.2]]]]], dtype=np.float32)
    # tp=1, fn=1, fp=0 -> CSI = 1/2
    assert csi(pred, target, 0.5) == pytest.approx(0.5, abs=1e-6)


def test_hss_hand_computed():
    pred = np.array([[[[[0.9, 0.1], [0.2, 0.3]]]]], dtype=np.float32)
    target = np.array([[[[[0.8, 0.7], [0.1, 0.2]]]]], dtype=np.float32)
    # tp=1 fn=1 fp=0 tn=2 -> hss = 2(1*2-1*0)/((1+1)(1+2)+(1+0)(0+2)) = 4/8
    assert hss(pred, target, 0.5) == pytest.approx(0.5, abs=1e-6)


def test_csi_perfect_forecast(rng):
    x = rng.random((2, 3, 1, 16, 16)).astype(np.float32)
    assert csi(x, x, 0.3) == pytest.approx(1.0, abs=1e-4)
    assert hss(x, x, 0.3) == pytest.approx(1.0, abs=1e-4)


# ---------------------------------------------------------------- CRPS
def test_crps_deterministic_closed_form(rng):
    """With N=1 (std=0) CRPS reduces to ~|mean - target| (up to eps terms)."""
    pred = rng.random((2, 4, 1, 8, 8)).astype(np.float32)
    target = rng.random((2, 4, 1, 8, 8)).astype(np.float32)
    m = calc_metrics(pred, target)
    # std -> 0: val = (0+eps)*(huge*(2*Heaviside-1) ...) -> |mean-target|
    expected = np.abs(np.clip(pred, 0, 1) - np.clip(target, 0, 1)).mean()
    assert m["CRPS"] == pytest.approx(expected, abs=1e-4)


def test_crps_ensemble_gaussian():
    """Known gaussian CRPS: mean==target, std=1 -> crps = sigma*(2/sqrt(2pi) - 1/sqrt(pi))."""
    from weatherforecastingtoolkit_tpu.metrics import _crps_gaussian
    import jax.numpy as jnp
    val = float(_crps_gaussian(jnp.zeros((4, 4)), jnp.ones((4, 4)), jnp.zeros((4, 4))))
    expected = 2 / np.sqrt(2 * np.pi) - 1 / np.sqrt(np.pi)
    assert val == pytest.approx(expected, abs=1e-4)


# ---------------------------------------------------------------- SSIM / PSNR
def _ssim_numpy_ref(a, b, size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Slow independent gaussian SSIM (valid conv) for cross-checking."""
    from scipy.ndimage import correlate
    coords = np.arange(size) - (size - 1) / 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    k2d = np.outer(g, g)

    def blur(x):
        out = correlate(x, k2d, mode="constant")
        pad = size // 2
        return out[pad:-pad, pad:-pad]

    c1, c2 = k1 ** 2, k2 ** 2
    mu_a, mu_b = blur(a), blur(b)
    va = blur(a * a) - mu_a ** 2
    vb = blur(b * b) - mu_b ** 2
    cov = blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))
    return s.mean()


def test_ssim_identical_is_one(rng):
    x = rng.random((2, 1, 32, 32)).astype(np.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_numpy_reference(rng):
    a = rng.random((32, 32)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((32, 32)).astype(np.float32), 0, 1)
    ours = float(ssim(a[None, None], b[None, None]))
    theirs = _ssim_numpy_ref(a.astype(np.float64), b.astype(np.float64))
    assert ours == pytest.approx(theirs, abs=1e-4)


def test_psnr_hand_computed():
    a = np.zeros((1, 1, 8, 8), dtype=np.float32)
    b = np.full((1, 1, 8, 8), 0.1, dtype=np.float32)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-4)


def test_psnr_estimated_range_mode():
    """data_range=None estimates the range per frame from the target
    (max - min), matching the reference's bare torchmetrics
    PeakSignalNoiseRatio() (reference pipeline/metrics.py:77-84)."""
    a = np.zeros((1, 1, 8, 8), dtype=np.float32)
    b = np.full((1, 1, 8, 8), 0.1, dtype=np.float32)
    b[0, 0, 0, 0] = 0.6  # target range = 0.5
    mse = float(np.mean((a - b) ** 2))
    want = 10 * np.log10(0.5 ** 2 / mse)
    assert float(psnr(a, b, data_range=None)) == pytest.approx(want, abs=1e-4)
    # the pinned-range default reports LOWER values than estimated-range
    # whenever the target doesn't span [0, 1]
    assert float(psnr(a, b, data_range=None)) < float(psnr(a, b))
    # calc_metrics passthrough
    p = np.zeros((1, 2, 1, 8, 8), np.float32)
    t = np.full((1, 2, 1, 8, 8), 0.1, np.float32)
    m1 = calc_metrics(p, t)
    m2 = calc_metrics(p, t, psnr_data_range=None)
    assert m2["PSNR"] < m1["PSNR"]  # constant target -> estimated range ~0
    # BOTH conventions are always emitted (published comparisons quote
    # PSNR_ref, the torchmetrics estimated-range convention)
    assert m1["PSNR_ref"] == pytest.approx(m2["PSNR"], abs=1e-4)
    assert m2["PSNR_ref"] == m2["PSNR"]


# ---------------------------------------------------------------- calc_metrics contract
EXPECTED_KEYS = (
    ["CRPS", "CRPS_4", "CRPS_16", "SSIM", "PSNR", "PSNR_ref"]
    + [f"{m}_{i}{s}" for m in ("CSI", "HSS") for i in range(6) for s in ("", "_4", "_16")]
    + ["paper_SSIM", "paper_PSNR", "paper_CRPS"]
    + [f"paper_{m}_{p}" for p in ("POOL1", "POOL4", "POOL16")
       for m in ("CSI_M", "CSI_181", "CSI_219", "HSS")]
)


def test_calc_metrics_keys_and_types(rng):
    pred = rng.random((2, 5, 1, 64, 64)).astype(np.float32)
    target = rng.random((2, 5, 1, 64, 64)).astype(np.float32)
    m = calc_metrics(pred, target)
    assert set(m.keys()) == set(EXPECTED_KEYS)
    assert all(isinstance(v, float) for v in m.values())
    # paper aggregates are consistent
    assert m["paper_CSI_181_POOL1"] == m["CSI_4"]
    assert m["paper_CSI_219_POOL16"] == m["CSI_5_16"]
    assert m["paper_CSI_M_POOL4"] == pytest.approx(
        np.mean([m[f"CSI_{i}_4"] for i in range(6)]), abs=1e-6)


def test_calc_metrics_ensemble_axis(rng):
    pred = rng.random((2, 3, 5, 1, 32, 32)).astype(np.float32)  # B,N,T,C,H,W
    target = rng.random((2, 5, 1, 32, 32)).astype(np.float32)
    m = calc_metrics(pred, target)
    assert np.isfinite(m["CRPS"]) and np.isfinite(m["SSIM"])


def test_crps_standalone_matches_reference(rng):
    """Standalone crps() (incl. max pooling, which calc_metrics doesn't emit)
    vs a torch transcription of the reference formula (the reference module
    itself imports torchmetrics, absent here; transcribed from
    pipeline/metrics.py:18-41)."""
    import torch
    import torch.nn.functional as F

    from weatherforecastingtoolkit_tpu.metrics import crps

    def ref_crps(pred, target, pool_type="none", scale=1):
        normal = torch.distributions.Normal(0, 1)
        eps = 1e-10
        if pred.ndim == 5:
            pred = pred.unsqueeze(1)
        b, n, t, c, h, w = pred.shape
        gt = target.reshape(b * t, c, h, w)
        pr = pred.reshape(b * n * t, c, h, w)
        if pool_type == "avg":
            pr = F.avg_pool2d(pr, scale, stride=scale)
            gt = F.avg_pool2d(gt, scale, stride=scale)
        elif pool_type == "max":
            pr = F.max_pool2d(pr, scale, stride=scale)
            gt = F.max_pool2d(gt, scale, stride=scale)
        gt = gt.reshape(b, t, c, gt.shape[-2], gt.shape[-1])
        pr = pr.reshape(b, n, t, c, pr.shape[-2], pr.shape[-1])
        mean = torch.mean(pr, dim=1)
        std = torch.std(pr, dim=1) if n > 1 else torch.zeros_like(mean)
        normed = (mean - gt + eps) / (std + eps)
        cdf = normal.cdf(normed)
        pdf = normal.log_prob(normed).exp()
        val = (std + eps) * (normed * (2 * cdf - 1) + 2 * pdf
                             - 1 / np.sqrt(np.pi))
        return float(torch.mean(val).item())

    target = rng.random((2, 3, 1, 16, 16)).astype(np.float32)
    for pred_shape in ((2, 3, 1, 16, 16), (2, 4, 3, 1, 16, 16)):
        pred = rng.random(pred_shape).astype(np.float32)
        for pool_type, scale in (("none", 1), ("avg", 4), ("max", 4)):
            ours = crps(pred, target, pool_type, scale)
            ref = ref_crps(torch.from_numpy(pred), torch.from_numpy(target),
                           pool_type, scale)
            assert ours == pytest.approx(ref, abs=2e-5), (pred_shape,
                                                          pool_type, scale)


def test_csi_hss_max_pooling(rng):
    pred = rng.random((1, 2, 1, 16, 16)).astype(np.float32)
    target = rng.random((1, 2, 1, 16, 16)).astype(np.float32)
    v_avg = csi(pred, target, 0.5, "avg", 4)
    v_max = csi(pred, target, 0.5, "max", 4)
    assert 0.0 <= v_avg <= 1.0 and 0.0 <= v_max <= 1.0
    # identical fields: CSI is 1 whenever any exceedance exists; HSS needs
    # BOTH classes present (all-hit fields give TN=0 -> HSS=0, the reference
    # formula's degenerate case), so use a high threshold that splits classes
    assert csi(pred, pred, 0.5, "max", 4) == pytest.approx(1.0, abs=1e-5)
    assert hss(pred, pred, 0.95, "max", 4) == pytest.approx(1.0, abs=1e-4)
