"""Frame-autoencoder reconstruction experiment.

The capability of the reference's ae_v2 / ae_v2_2 (sans GAN) and the Path-A
reconstruction runs — model chosen by cfg.model.name from the registry
(reference pattern: experiments/v1_experiments/ae_gan/train.py:403-416).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from experiments.common import main  # noqa: E402
from weatherforecastingtoolkit_tpu.models.registry import build_model  # noqa: E402
from weatherforecastingtoolkit_tpu.training.tasks import reconstruction_task  # noqa: E402


def build_task(cfg, dm):
    kwargs = {k: v for k, v in cfg.model.items() if k != "name"}
    model = build_model(cfg.model.name, **kwargs)
    return reconstruction_task(
        model, loss=cfg.get("loss", "l1"), name=cfg.experiment_name,
        mixed_precision=cfg.trainer.get("mixed_precision", False))


if __name__ == "__main__":
    main(__file__, build_task)
