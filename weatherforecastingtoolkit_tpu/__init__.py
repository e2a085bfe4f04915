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

# Lazy top-level aliases for the symbols a reference user reaches for first
# (docs/api.md is the full surface). PEP 562: resolved on first attribute
# access, so `import weatherforecastingtoolkit_tpu` stays cheap.
_LAZY = {
    "SEVIRDataModule": ".data.datamodule",
    "SEVIRDataset": ".data.dataset",
    "PosAwareAE": ".models.conv_ae",
    "AutoencoderKL": ".models.vae.autoencoder_kl",
    "CustomAutoencoderKL": ".models.vae.custom_akl",
    "ViTAE": ".models.vit_ae",
    "DLinear": ".models.forecasters",
    "Earthformer": ".models.earthformer",
    "AlphaPre": ".models.alphapre",
    "make_forecast_pipeline": ".models.rollout",
    "make_ensemble_pipeline": ".models.rollout",
    "make_streaming_forecaster": ".models.rollout",
    "persistence_baseline": ".models.rollout",
    "Trainer": ".training.trainer",
    "reconstruction_task": ".training.tasks",
    "latent_forecast_task": ".training.tasks",
    "make_vae_gan_task": ".training.gan",
    "CheckpointManager": ".training.checkpoint",
    "build_optimizer": ".training.trainer",
    "evaluate_protocol": ".evaluation",
    "EvalReport": ".evaluation",
    "make_mesh": ".parallel.mesh",
    "make_dp_serving_fn": ".parallel.serving",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name], __name__)
        value = getattr(module, name)
        globals()[name] = value  # cache: next access skips __getattr__
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
