"""Full-resolution SEVIR VAE: AutoencoderKL at 384^2 -> 4x48x48 latents.

The reference's main VAE configuration (reference autoencoder_kl.py:80-113,
loaded from the CasCast checkpoint via helpers.py:14-32; full-res dataset
preset sevir/sevir.py:1111-1130). Same VAE-GAN task as vae_gan_kl, at the
geometry the reference actually serves — with remat on so full-res
activations trade FLOPs for HBM.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from experiments.ae_gan.train import build_task  # noqa: E402
from experiments.common import main  # noqa: E402

if __name__ == "__main__":
    main(__file__, build_task)
