"""VAE-KL + PatchGAN (LPIPSWithDiscriminator semantics): the ae_gan task with
kl_weight set — reference experiments/v1_experiments/ae_gan_kl/train.py plus
autoencoderkl/losses/contperceptual.py:33-169."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from experiments.ae_gan.train import build_task  # noqa: E402
from experiments.common import main  # noqa: E402

if __name__ == "__main__":
    main(__file__, build_task)
