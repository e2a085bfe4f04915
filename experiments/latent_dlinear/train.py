"""Frozen-VAE latent DLinear forecasting (the Path-B flagship).

Capability of reference experiments/ae_s2/train.py (+ the
pretrained_ae_dlinear_sevir/_ind variants via dlinear.individual): encode with
a frozen VAE, persistence-anchor the latents, DLinear forecast, MSE in latent
space; validation decodes and logs the full metric dict.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

from experiments.common import main  # noqa: E402
from experiments.latent_common import build_frozen_vae  # noqa: E402
from weatherforecastingtoolkit_tpu.models.forecasters import DLinear  # noqa: E402
from weatherforecastingtoolkit_tpu.training.tasks import latent_forecast_task  # noqa: E402


def build_task(cfg, dm):
    encode_apply, _encode_mode, decode_apply, latent_shape = build_frozen_vae(cfg)
    d = int(np.prod(latent_shape))
    forecaster = DLinear(
        seq_len=cfg.dataset.input_frames, pred_len=cfg.dataset.pred_frames,
        kernel_size=cfg.dlinear.kernel_size,
        individual=cfg.dlinear.get("individual", False),
        channels=d)
    return latent_forecast_task(
        frozen_ae_apply=encode_apply,
        forecaster=forecaster,
        input_frames=cfg.dataset.input_frames,
        pred_frames=cfg.dataset.pred_frames,
        latent_shape=latent_shape,
        decode_apply=decode_apply,
        name=cfg.experiment_name)


if __name__ == "__main__":
    main(__file__, build_task)
