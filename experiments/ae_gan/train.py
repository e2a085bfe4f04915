"""Adversarial frame-autoencoder experiment (conv AE or VAE + PatchGAN).

Capability of the reference's ae_v2_2 (PosAwareAE + hinge GAN + adaptive
weight, experiments/ae_v2_2/train.py:31-159) and — with model.name
autoencoder_kl + lpips.kl_weight set — ae_gan_kl / LPIPSWithDiscriminator
(autoencoderkl/losses/contperceptual.py:33-169).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from experiments.common import main  # noqa: E402
from weatherforecastingtoolkit_tpu.models.losses.gan import NLayerDiscriminator  # noqa: E402
from weatherforecastingtoolkit_tpu.models.registry import build_model  # noqa: E402
from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task  # noqa: E402


def build_task(cfg, dm):
    kwargs = {k: v for k, v in cfg.model.items() if k != "name"}
    model = build_model(cfg.model.name, **kwargs)
    is_vae = cfg.model.name == "autoencoder_kl"
    hw = cfg.dataset.get("img_size", 128)

    if is_vae:
        def generator_apply(params, frames, rng):
            recon, posterior = model.apply(params, frames, sample_posterior=True,
                                           rng=rng, return_posterior=True)
            return recon, posterior.kl()
        last_layer = ("params", "decoder", "conv_out", "kernel")
        eval_apply = lambda p, f: model.apply(p, f)  # noqa: E731
    else:
        def generator_apply(params, frames, rng):
            recon, _z = model.apply(params, frames)
            return recon, None
        last_layer = ("params", "dec_out", "kernel")
        eval_apply = lambda p, f: model.apply(p, f)[0]  # noqa: E731

    disc = NLayerDiscriminator(input_nc=1, ndf=cfg.lpips.get("disc_ndf", 64),
                               n_layers=cfg.lpips.disc_num_layers)
    disc_tx = optax.adam(cfg.lpips.get("disc_lr", 4.5e-5), b1=0.5, b2=0.9)

    # perceptual (LPIPS) term — reference losses/contperceptual.py:103-106,
    # weights auto-downloaded there (losses/util.py:5-45); here they are
    # user-provided torch files (no egress in this environment)
    perceptual_apply = None
    if float(cfg.lpips.get("perceptual_weight", 0.0)) > 0:
        import jax

        from weatherforecastingtoolkit_tpu.models.losses.lpips import (
            LPIPS, lpips_params_from_torch)

        lpips = LPIPS()
        vgg_path = cfg.lpips.get("vgg_path", None)
        lin_path = cfg.lpips.get("lin_path", None)
        if vgg_path and lin_path:
            from weatherforecastingtoolkit_tpu.training.checkpoint import (
                load_torch_state_dict)
            lp_vars = lpips_params_from_torch(load_torch_state_dict(str(vgg_path)),
                                              load_torch_state_dict(str(lin_path)))
            print(f"[lpips] loaded VGG weights from {vgg_path}")
        else:
            print("[lpips] WARNING: perceptual_weight > 0 but no "
                  "lpips.vgg_path/lin_path — using randomly initialized LPIPS "
                  "(wiring smoke only; provide torch weight files for a real "
                  "perceptual loss)")
            z = jnp.zeros((1, 3, hw, hw))
            lp_vars = lpips.init(jax.random.key(0), z, z)
        perceptual_apply = lambda a, b: lpips.apply(lp_vars, a, b)  # noqa: E731

    return make_vae_gan_task(
        name=cfg.experiment_name,
        generator_apply=generator_apply,
        gen_init=lambda rng: model.init(rng, jnp.zeros((1, 1, hw, hw))),
        disc_apply=lambda p, f: disc.apply(p, f),
        disc_init=lambda rng: disc.init(rng, jnp.zeros((1, 1, hw, hw))),
        disc_tx=disc_tx,
        last_layer_path=last_layer,
        eval_apply=eval_apply,
        recon_weight=cfg.lpips.get("recon_weight", 1.0),
        perceptual_apply=perceptual_apply,
        perceptual_weight=cfg.lpips.get("perceptual_weight", 0.0),
        # weight-free perceptual term (PatchGAN feature matching) — fills the
        # role the reference's LPIPS plays (contperceptual.py:103-106)
        # without pretrained VGG weights; on by default via config
        disc_feats_apply=lambda p, f: disc.apply(p, f, return_features=True),
        feature_matching_weight=cfg.lpips.get("feature_matching_weight", 0.0),
        kl_weight=cfg.lpips.get("kl_weight", None),
        disc_weight=cfg.lpips.disc_weight,
        disc_factor=cfg.lpips.get("disc_factor", 1.0),
        disc_start=int(cfg.lpips.disc_start),
        disc_loss=cfg.lpips.get("disc_loss", "hinge"),
        mixed_precision=cfg.trainer.get("mixed_precision", False))


if __name__ == "__main__":
    main(__file__, build_task)
