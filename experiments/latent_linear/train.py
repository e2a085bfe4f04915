"""Frozen-VAE + per-pixel Linear latent forecaster.

Capability of reference experiments/v1_experiments/pretrained_ae_linear_sevir:
at each latent pixel, a Linear maps the stacked (T_in * C) features to
(T_out * C), with last-frame residual anchoring (train.py:67-98).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from flax import linen as nn  # noqa: E402

from experiments.common import main  # noqa: E402
from experiments.latent_common import build_frozen_vae  # noqa: E402
from weatherforecastingtoolkit_tpu.models.forecasters import PerPixelLinear  # noqa: E402
from weatherforecastingtoolkit_tpu.training.tasks import latent_forecast_task  # noqa: E402


class FlatAdapter(nn.Module):
    """latent_forecast_task speaks (B, T, D); PerPixelLinear wants spatial."""

    t_in: int
    t_out: int
    latent_shape: tuple

    @nn.compact
    def __call__(self, z):
        b = z.shape[0]
        c, h, w = self.latent_shape
        spatial = z.reshape(b, self.t_in, c, h, w)
        out = PerPixelLinear(self.t_in, self.t_out, name="pixel_linear")(spatial)
        return out.reshape(b, self.t_out, -1)


def build_task(cfg, dm):
    encode_apply, _m, decode_apply, latent_shape = build_frozen_vae(cfg)
    forecaster = FlatAdapter(t_in=cfg.dataset.input_frames,
                             t_out=cfg.dataset.pred_frames,
                             latent_shape=tuple(latent_shape))
    return latent_forecast_task(
        frozen_ae_apply=encode_apply, forecaster=forecaster,
        input_frames=cfg.dataset.input_frames,
        pred_frames=cfg.dataset.pred_frames,
        latent_shape=latent_shape, decode_apply=decode_apply,
        name=cfg.experiment_name)


if __name__ == "__main__":
    main(__file__, build_task)
