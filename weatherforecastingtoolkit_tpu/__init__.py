"""weatherforecastingtoolkit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) nowcasting framework.

A from-scratch re-design of the capabilities of Autobot37/weatherforecastingtoolkit
(latent-space radar nowcasting on SEVIR): data pipeline, model zoo (conv/ViT/VAE-KL
autoencoders, latent forecasters, AlphaPre spectral predictor, PatchGAN stack),
forecast-verification metrics, and a config-driven training harness.

Design stance (not a port):
  * all compute paths are pure-functional JAX, jitted end to end;
  * convolutions run NHWC (TPU native); the public array contract stays
    ``(B, T, C, H, W)`` like the reference so experiments translate 1:1;
  * normalization is GroupNorm (BatchNorm state under pjit/DP is deliberately
    avoided — see models/conv_ae.py docstring);
  * data parallelism is a 1-D ``jax.sharding.Mesh`` with NamedSharding over the
    batch axis; metric reductions are ``psum`` (the `sync_dist=True` analog);
  * the encode -> latent-step -> decode rollout is a single compiled
    ``jax.lax.scan`` program (see models/rollout.py).
"""

__version__ = "0.1.0"

# Convenience re-exports of the primary public API. Heavier submodules
# (models, training, data) are imported lazily by users to keep import cheap.
from .metrics import calc_metrics  # noqa: E402,F401
from .utils.config import Config  # noqa: E402,F401
