"""AlphaPre spectral amplitude/phase forecasting.

Capability of the reference's AlphaPre model + get_model factory
(reference pipeline/models/alphapre/alpha.py:192-311; the reference never
wired a training experiment for it — this completes that path), with the
optional advection-diffusion physics prior from the README's future-work list
(README.md:111-127) as a Pallas stencil regularizer.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from experiments.common import main  # noqa: E402
from weatherforecastingtoolkit_tpu.models.alphapre import get_model  # noqa: E402
from weatherforecastingtoolkit_tpu.ops.pallas.stencil import (  # noqa: E402
    advection_diffusion_prior)
from weatherforecastingtoolkit_tpu.training.tasks import Task, dequantize  # noqa: E402


def build_task(cfg, dm):
    model = get_model(cfg.model)
    t_in, t_out = cfg.model.T_in, cfg.model.T_out
    prior = cfg.get("physics_prior", {})

    def split(batch):
        x = dequantize(batch["vil"])
        return x[:, :t_in], x[:, t_in:t_in + t_out]

    def init_params(rng):
        h, w = cfg.model.input_shape
        # jit the init: eager dispatch of the spectral ops (rfft2 path) hits
        # UNIMPLEMENTED on the axon TPU backend; compiled XLA supports them
        return jax.jit(model.init)(
            rng, jnp.zeros((1, t_in, cfg.model.img_channels, h, w)))

    def loss_fn(params, batch, rng, step):
        frames_in, frames_gt = split(batch)
        pred, loss = model.apply(params, frames_in, frames_gt,
                                 compute_loss=True, step=step,
                                 method=model.predict)
        total = loss["total_loss"]
        aux = {k: v for k, v in loss.items() if k != "total_loss"}
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
        pred, _ = model.apply(params, frames_in, method=model.predict)
        return jnp.clip(pred, 0.0, 1.0), frames_gt

    return Task(name=cfg.experiment_name, init_params=init_params,
                loss_fn=loss_fn, eval_fn=eval_fn)


if __name__ == "__main__":
    main(__file__, build_task)
