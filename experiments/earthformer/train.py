"""Earthformer-style cuboid-transformer nowcasting with the
advection-diffusion physics prior.

Fills the reference's empty earthformer placeholder
(reference pipeline/models/earthformer/* are 0-byte stubs; README.md:111-127
names the direction) — BASELINE.json config #5.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax.numpy as jnp  # noqa: E402

from experiments.common import main  # noqa: E402
from weatherforecastingtoolkit_tpu.models.earthformer import Earthformer  # noqa: E402
from weatherforecastingtoolkit_tpu.ops.pallas.stencil import (  # noqa: E402
    advection_diffusion_prior)
from weatherforecastingtoolkit_tpu.training.tasks import (Task, dequantize,  # noqa: E402
                                                          pixel_loss)


def build_task(cfg, dm):
    m = cfg.model
    model = Earthformer(t_in=m.t_in, t_out=m.t_out, in_channels=m.in_channels,
                        patch=m.patch, dim=m.dim, depth=m.depth,
                        num_heads=m.num_heads, window=tuple(m.window),
                        residual_out=m.get("residual_out", False))
    px = pixel_loss(cfg.get("loss", "mse"))
    prior = cfg.get("physics_prior", {})
    hw = cfg.dataset.get("img_size", 128)

    def split(batch):
        x = dequantize(batch["vil"])
        return x[:, :m.t_in], x[:, m.t_in:m.t_in + m.t_out]

    def init_params(rng):
        return model.init(rng, jnp.zeros((1, m.t_in, m.in_channels, hw, hw)))

    def loss_fn(params, batch, rng, step):
        frames_in, frames_gt = split(batch)
        pred = model.apply(params, frames_in)
        total = px(pred, frames_gt)
        aux = {}
        if prior.get("enabled", False):
            p = advection_diffusion_prior(
                pred, jnp.asarray(prior.get("u", 0.0)),
                jnp.asarray(prior.get("v", 0.0)),
                jnp.asarray(prior.get("kappa", 0.05)))
            total = total + prior.get("weight", 1e-3) * p
            aux["physics_prior"] = p
        return total, aux

    def eval_fn(params, batch, rng):
        frames_in, frames_gt = split(batch)
        return model.apply(params, frames_in), frames_gt

    return Task(name=cfg.experiment_name, init_params=init_params,
                loss_fn=loss_fn, eval_fn=eval_fn)


if __name__ == "__main__":
    main(__file__, build_task)
