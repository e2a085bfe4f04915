"""LPIPS parity and wiring tests.

The parity test pins the repo LPIPS math against a torch transcription of the
reference implementation (reference autoencoderkl/losses/lpips.py:17-129)
using shared RANDOM weights — torchvision isn't installed in this image, so
the reference module can't be imported directly; the torch side below is the
reference's forward math verbatim (ScalingLayer constants, VGG16 feature
slices, normalize_tensor eps=1e-10, bias-free 1x1 lin conv, spatial average,
sum over slices).
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.models.losses.lpips import (LPIPS,
                                                               lpips_params_from_torch)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# torchvision VGG16 `features` conv indices and the LPIPS slice boundaries
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_SLICES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


def _random_vgg_state(rng):
    """A torchvision-format VGG16 `features.*` state dict with random weights."""
    sd = {}
    in_ch = 3
    k = 0
    for ch, n_convs in _SLICES:
        for _ in range(n_convs):
            li = _CONV_IDX[k]
            sd[f"features.{li}.weight"] = rng.normal(
                0, 0.05, (ch, in_ch, 3, 3)).astype(np.float32)
            sd[f"features.{li}.bias"] = rng.normal(0, 0.01, (ch,)).astype(np.float32)
            in_ch = ch
            k += 1
    return sd


def _random_lin_state(rng):
    return {f"lin{i}.model.1.weight": rng.normal(0, 0.2, (1, c, 1, 1)
                                                 ).astype(np.float32)
            for i, (c, _) in enumerate(_SLICES)}


def _torch_lpips(x0, x1, vgg_sd, lin_sd):
    """Reference LPIPS forward math in plain torch (lpips.py:64-140)."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x - shift) / scale
        outs = []
        k = 0
        for s, (ch, n_convs) in enumerate(_SLICES):
            if s > 0:
                h = F.max_pool2d(h, 2, 2)
            for _ in range(n_convs):
                li = _CONV_IDX[k]
                h = F.relu(F.conv2d(h, torch.from_numpy(vgg_sd[f"features.{li}.weight"]),
                                    torch.from_numpy(vgg_sd[f"features.{li}.bias"]),
                                    padding=1))
                k += 1
            outs.append(h)
        return outs

    def normalize(t, eps=1e-10):
        return t / (torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True)) + eps)

    f0, f1 = feats(x0), feats(x1)
    val = 0.0
    for i in range(5):
        diff = (normalize(f0[i]) - normalize(f1[i])) ** 2
        w = torch.from_numpy(lin_sd[f"lin{i}.model.1.weight"])
        lin = F.conv2d(diff, w)  # bias-free 1x1 (NetLinLayer, eval: no dropout)
        val = val + lin.mean([2, 3], keepdim=True)
    return val


def test_lpips_matches_reference_math_fp32(rng):
    torch = pytest.importorskip("torch")

    vgg_sd = _random_vgg_state(rng)
    lin_sd = _random_lin_state(rng)
    x0 = rng.random((2, 3, 64, 64)).astype(np.float32)
    x1 = rng.random((2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        ref = _torch_lpips(torch.from_numpy(x0), torch.from_numpy(x1),
                           vgg_sd, lin_sd).numpy()

    lpips = LPIPS()
    variables = lpips_params_from_torch(vgg_sd, lin_sd)
    with jax.default_matmul_precision("highest"):
        out = np.asarray(lpips.apply(variables, x0, x1))

    assert out.shape == ref.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-6)


def test_lpips_zero_for_identical_inputs(rng):
    x = rng.random((1, 3, 32, 32)).astype(np.float32)
    lpips = LPIPS()
    variables = lpips.init(jax.random.key(0), x, x)
    out = np.asarray(lpips.apply(variables, x, x))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_ae_gan_trains_with_lpips_enabled(tmp_path):
    """perceptual_weight > 0 smoke: the LPIPS term is wired into the
    experiment loss (random weights — wiring, not quality)."""
    script = os.path.join(REPO, "experiments", "ae_gan", "train.py")
    overrides = [
        "dataset.batch_size=2", "dataset.num_workers=2",
        "dataset.synthetic_events=6", "dataset.img_size=32",
        "dataset.seq_len=4",
        "trainer.max_epochs=1", "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1", "trainer.run_test=false",
        "logging.log_every_n_steps=1", "logging.val_every_n=10.0",
        "trainer.save_every_n_steps=10.0",
        "model.latent_dim=32", "model.latent_channels=4",
        "model.enc_channels=[8,16]", "model.dec_channels=[16,8,8]",
        "model.num_blocks=1", "lpips.disc_num_layers=1",
        "lpips.disc_ndf=8", "lpips.disc_start=0",
        "lpips.perceptual_weight=0.1",
        f"experiment_path={tmp_path}/ae_gan_lpips"]
    env = dict(os.environ)
    env["WX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run([sys.executable, script, *overrides],
                            capture_output=True, text=True, timeout=900,
                            env=env, cwd=REPO)
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}")
    assert "done" in result.stdout.splitlines()[-1]
