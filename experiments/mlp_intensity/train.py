"""Scalar storm-intensity forecasting with a time MLP.

Capability of reference experiments/v1_experiments/prediff_mlp_sevir
(train.py:20-68): per-frame mean intensity of the VIL field, MLP maps the
input_frames intensities to pred_frames intensities, MSE loss.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax.numpy as jnp  # noqa: E402

from experiments.common import main  # noqa: E402
from weatherforecastingtoolkit_tpu.models.forecasters import TimeMLP  # noqa: E402
from weatherforecastingtoolkit_tpu.training.tasks import Task, dequantize  # noqa: E402


def build_task(cfg, dm):
    t_in = cfg.dataset.input_frames
    t_out = cfg.dataset.pred_frames
    model = TimeMLP(t_in=t_in, t_out=t_out, hidden_dim=cfg.model.hidden_dim)

    def intensities(batch):
        x = dequantize(batch["vil"])               # (B, T, C, H, W)
        return jnp.mean(x, axis=(2, 3, 4))          # (B, T)

    def init_params(rng):
        return model.init(rng, jnp.zeros((1, t_in)))

    def loss_fn(params, batch, rng, step):
        s = intensities(batch)
        inp, tgt = s[:, :t_in], s[:, t_in:t_in + t_out]
        pred = model.apply(params, inp)
        return jnp.mean((pred - tgt) ** 2), {}

    return Task(name=cfg.experiment_name, init_params=init_params,
                loss_fn=loss_fn, eval_fn=None)


if __name__ == "__main__":
    main(__file__, build_task)
