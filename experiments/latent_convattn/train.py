"""Second-stage attention latent AE on frozen-VAE latents.

Capability of reference pretrained_ae_convattn_ae_sevir (ConvAttnModel on
4x48x48 latents + Huber, train.py:58-178; its torch.compile becomes jit here
for free).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax.numpy as jnp  # noqa: E402

from experiments.common import main  # noqa: E402
from experiments.latent_common import build_frozen_vae  # noqa: E402
from weatherforecastingtoolkit_tpu.models.latent_ae import ConvAttnModel  # noqa: E402
from weatherforecastingtoolkit_tpu.training.tasks import (Task, dequantize,  # noqa: E402
                                                          pixel_loss)


def build_task(cfg, dm):
    encode_apply, _m, decode_apply, latent_shape = build_frozen_vae(cfg)
    c, h, w = latent_shape
    model = ConvAttnModel(in_channels=c, embed_dim=cfg.model.embed_dim,
                          nhead=cfg.model.nhead,
                          num_tf_layers=cfg.model.num_tf_layers,
                          latent_dim=cfg.model.latent_dim, grid=h // 4)
    px = pixel_loss(cfg.get("loss", "huber"))

    def to_latents(batch, rng):
        x = dequantize(batch["vil"])
        b, t = x.shape[:2]
        frames = x.reshape((b * t,) + x.shape[2:])
        return encode_apply(frames, rng), (b, t)

    def init_params(rng):
        return model.init(rng, jnp.zeros((1, c, h, w)))

    def loss_fn(params, batch, rng, step):
        latents, _bt = to_latents(batch, rng)
        recon, _z = model.apply(params, latents)
        return px(recon, latents), {}

    def eval_fn(params, batch, rng):
        latents, (b, t) = to_latents(batch, rng)
        recon, _z = model.apply(params, latents)
        dec_r = decode_apply(recon)
        dec_o = decode_apply(latents)
        return (dec_r.reshape((b, t) + dec_r.shape[1:]),
                dec_o.reshape((b, t) + dec_o.shape[1:]))

    return Task(name=cfg.experiment_name, init_params=init_params,
                loss_fn=loss_fn, eval_fn=eval_fn)


if __name__ == "__main__":
    main(__file__, build_task)
