"""Second-stage latent autoencoder on frozen-VAE latents.

Capability of reference pretrained_ae_convae_sevir (ConvModel + Huber,
train.py:155-178) and pretrained_ae_conv_disc (adds a PatchGAN in LATENT
space with its own optimizer/schedule, train.py:208-318) via lpips.enabled.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from experiments.common import main  # noqa: E402
from experiments.latent_common import build_frozen_vae  # noqa: E402
from weatherforecastingtoolkit_tpu.models.latent_ae import ConvModel  # noqa: E402
from weatherforecastingtoolkit_tpu.models.losses.gan import NLayerDiscriminator  # noqa: E402
from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task  # noqa: E402
from weatherforecastingtoolkit_tpu.training.tasks import (Task, dequantize,  # noqa: E402
                                                          pixel_loss)

def build_task(cfg, dm):
    encode_apply, _m, decode_apply, latent_shape = build_frozen_vae(cfg)
    c, h, w = latent_shape
    model = ConvModel(latent_dim=cfg.model.latent_dim, in_channels=c)

    def frames_to_latents(batch, rng):
        x = dequantize(batch["vil"])
        b, t = x.shape[:2]
        frames = x.reshape((b * t,) + x.shape[2:])
        return encode_apply(frames, rng), (b, t)

    if cfg.lpips.get("enabled", False):
        disc = NLayerDiscriminator(input_nc=c, ndf=cfg.lpips.get("disc_ndf", 64),
                                   n_layers=cfg.lpips.disc_num_layers)
        disc_tx = optax.adam(cfg.lpips.get("disc_lr", 4.5e-5), b1=0.5, b2=0.9)

        def generator_apply(params, latents, rng):
            _z, recon = model.apply(params, latents)
            return recon, None

        task = make_vae_gan_task(
            name=cfg.experiment_name,
            generator_apply=generator_apply,
            gen_init=lambda rng: model.init(rng, jnp.zeros((1, c, h, w))),
            disc_apply=lambda p, f: disc.apply(p, f),
            disc_init=lambda rng: disc.init(rng, jnp.zeros((1, c, h, w))),
            disc_tx=disc_tx,
            last_layer_path=("params", "decoder", "conv_out", "kernel"),
            pixel_loss=cfg.get("loss", "huber"),
            disc_weight=cfg.lpips.disc_weight,
            disc_factor=cfg.lpips.get("disc_factor", 1.0),
            disc_start=int(cfg.lpips.disc_start),
            disc_loss=cfg.lpips.get("disc_loss", "hinge"),
            mixed_precision=cfg.trainer.get("mixed_precision", False))

        # the GAN task consumes pixel batches; wrap its fns to encode first
        inner_step = task.custom_train_step
        inner_loss = task.loss_fn

        def custom_train_step(state, batch, tx):
            rng = jax.random.fold_in(state.rng, 1)
            latents, _bt = frames_to_latents(batch, rng)
            return inner_step(state, {"vil": latents[:, None]}, tx)

        def loss_fn(params, batch, rng, step):
            latents, _bt = frames_to_latents(batch, rng)
            return inner_loss(params, {"vil": latents[:, None]}, rng, step)

        task.custom_train_step = custom_train_step
        task.loss_fn = loss_fn
        task.eval_fn = _make_eval(model, frames_to_latents, decode_apply,
                                  latent_shape, gan=True)
        return task

    px = pixel_loss(cfg.get("loss", "huber"))

    def init_params(rng):
        return model.init(rng, jnp.zeros((1, c, h, w)))

    def loss_fn(params, batch, rng, step):
        latents, _bt = frames_to_latents(batch, rng)
        _z, recon = model.apply(params, latents)
        return px(recon, latents), {}

    task = Task(name=cfg.experiment_name, init_params=init_params,
                loss_fn=loss_fn,
                eval_fn=_make_eval(model, frames_to_latents, decode_apply,
                                   latent_shape, gan=False))
    return task


def _make_eval(model, frames_to_latents, decode_apply, latent_shape, gan):
    def eval_fn(params, batch, rng):
        latents, (b, t) = frames_to_latents(batch, rng)
        p = params["gen"] if gan else params
        _z, recon = model.apply(p, latents)  # ConvModel returns (z, recon)
        dec_recon = decode_apply(recon)
        dec_orig = decode_apply(latents)
        return (dec_recon.reshape((b, t) + dec_recon.shape[1:]),
                dec_orig.reshape((b, t) + dec_orig.shape[1:]))
    return eval_fn


if __name__ == "__main__":
    main(__file__, build_task)
