"""Real-artifact torch checkpoint ingestion rehearsal.

The reference workflow is anchored on torch-SERIALIZED pretrained weights:
the CasCast VAE checkpoint loaded through key surgery (reference
pipeline/helpers.py:14-32; consumed by experiments/ae_s2/train.py:19-27) and
the LPIPS VGG16 weights (losses/util.py:5-45, losses/lpips.py:17-60). The
other tests pass in-memory state dicts; here the artifacts go through
``torch.save`` -> disk -> ``load_torch_state_dict`` — the exact path a user
holding real pretrained files hits:

 * a CasCast-style wrapper dict ({'model': {submodel: {'module.'+k: v}}})
   round-trips from disk to fp32 golden-latent parity with live torch;
 * the same file drives a REAL latent-forecaster training run via
   ``ae_kl.ckpt_path`` (the reference's frozen-pretrained-VAE workflow);
 * a torchvision-format VGG16 + LPIPS lin-head pair saved as .pth files
   drives a training run with ``perceptual_weight>0`` — LPIPS actually ON,
   real weights flowing through the loss (finite logged p_loss).
"""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_lpips import _random_lin_state, _random_vgg_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/reference")

# the tiny-geometry overrides the experiment smoke tests use (fast compiles)
from tests.test_experiments import COMMON, SPECIFIC  # noqa: E402

AKL_SMALL = dict(in_channels=1, out_channels=1, block_out_channels=(8, 16),
                 layers_per_block=1, latent_channels=4, norm_num_groups=4)


def _save_cascast_style_ckpt(tmp_path, seed=0):
    """torch.save a reference-format wrapper checkpoint and return its path.

    Shape: {'model': {'autoencoder_kl': {'module.<key>': tensor}}} — the
    nesting + prefix conventions load_checkpoint_cascast strips (reference
    pipeline/helpers.py:14-32).
    """
    torch = pytest.importorskip("torch")
    from pipeline.models.autoencoderkl.autoencoder_kl import (
        AutoencoderKL as TorchAKL)

    torch.manual_seed(seed)
    tmodel = TorchAKL(in_channels=1, out_channels=1,
                      down_block_types=("DownEncoderBlock2D",) * 2,
                      up_block_types=("UpDecoderBlock2D",) * 2,
                      block_out_channels=(8, 16), layers_per_block=1,
                      latent_channels=4, norm_num_groups=4).eval()
    wrapped = {"model": {"autoencoder_kl": {
        f"module.{k}": v for k, v in tmodel.state_dict().items()}}}
    path = os.path.join(str(tmp_path), "cascast_vae.pt")
    torch.save(wrapped, path)
    return path, tmodel


def test_torch_saved_cascast_ckpt_golden_latent(tmp_path, rng):
    """torch.save -> load_torch_state_dict(submodel=...) -> from_torch ->
    fp32 latent parity with the live torch model (the ingestion gate run on a
    real serialized artifact, not an in-memory dict)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (
        AutoencoderKL, from_torch_state_dict)
    from weatherforecastingtoolkit_tpu.training.checkpoint import (
        load_torch_state_dict)

    path, tmodel = _save_cascast_style_ckpt(tmp_path)
    sd = load_torch_state_dict(path, submodel="autoencoder_kl")
    assert all(not k.startswith("module.") for k in sd)  # prefixes stripped

    model = AutoencoderKL(**AKL_SMALL)
    variables = from_torch_state_dict(model, sd, example_shape=(1, 1, 32, 32))

    x = rng.random((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_moments = tmodel.encode(torch.from_numpy(x)).parameters.numpy()
    j_post = model.apply(variables, jnp.asarray(x), method=model.encode)
    np.testing.assert_allclose(np.asarray(j_post.parameters), t_moments,
                               atol=2e-4, rtol=1e-3)


def _run(script, overrides, tmp_path, name):
    env = dict(os.environ)
    env["WX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "experiments", script, "train.py"),
         *overrides, f"experiment_path={tmp_path}/{name}"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}")
    assert "done" in result.stdout.splitlines()[-1]
    return result


def test_frozen_vae_training_from_torch_file(tmp_path):
    """The reference's Path-B anchor workflow (ae_s2/train.py:19-27): a
    torch-serialized pretrained VAE file feeds a latent-forecaster training
    run end-to-end via ae_kl.ckpt_path + ae_kl.submodel."""
    path, _ = _save_cascast_style_ckpt(tmp_path)
    result = _run("latent_linear", COMMON + SPECIFIC["latent_linear"] + [
        f"ae_kl.ckpt_path={path}", "ae_kl.submodel=autoencoder_kl",
    ], tmp_path, "latent_from_torch")
    assert f"[frozen-vae] loaded torch checkpoint {path}" in result.stdout


def test_lpips_training_with_real_torch_weight_files(tmp_path):
    """LPIPS actually ON: VGG16 + lin-head .pth files (reference
    losses/lpips.py:17-60 load path) flow through a real ae_gan training run;
    the perceptual term lands in the logged metrics as a finite p_loss."""
    torch = pytest.importorskip("torch")
    r = np.random.default_rng(3)
    vgg_path = os.path.join(str(tmp_path), "vgg16.pth")
    lin_path = os.path.join(str(tmp_path), "vgg_lin.pth")
    torch.save({k: torch.from_numpy(v) for k, v in _random_vgg_state(r).items()},
               vgg_path)
    # real LPIPS lin heads are non-negative (learned distances); keep that
    # property so the p_loss>0 invariant below is meaningful
    torch.save({k: torch.from_numpy(np.abs(v))
                for k, v in _random_lin_state(r).items()}, lin_path)

    result = _run("ae_gan", COMMON + SPECIFIC["ae_gan"] + [
        "lpips.perceptual_weight=1.0", f"lpips.vgg_path={vgg_path}",
        f"lpips.lin_path={lin_path}",
    ], tmp_path, "ae_gan_lpips")
    assert f"[lpips] loaded VGG weights from {vgg_path}" in result.stdout

    from weatherforecastingtoolkit_tpu.training.logging import (
        read_jsonl_metrics)
    run_dirs = {os.path.dirname(p) for p in glob.glob(
        f"{tmp_path}/ae_gan_lpips/**/metrics.jsonl", recursive=True)}
    assert run_dirs, "training run wrote no metrics.jsonl"
    p_losses = [rec["train_p_loss"] for d in run_dirs
                for rec in read_jsonl_metrics(d) if "train_p_loss" in rec]
    assert p_losses, "perceptual term never reached the logged metrics"
    assert all(np.isfinite(v) and v > 0 for v in p_losses)
