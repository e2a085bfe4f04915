"""Model registry: name -> constructor, config-driven.

The reference picks models by cfg.model.name string inside experiments
(reference experiments/v1_experiments/ae_gan/train.py:403-416); this registry
centralizes that so every experiment and the CLI resolve the same names.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def build_model(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"Unknown model {name!r}; available: {sorted(_REGISTRY)}")
    # YAML lists -> tuples (flax module attributes must be hashable/static)
    kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()}
    return _REGISTRY[name](**kwargs)


def available_models():
    return sorted(_REGISTRY)


def _populate():
    from .alphapre import AlphaPre
    from .conv_ae import PosAwareAE, PosAwareAETF
    from .earthformer import Earthformer
    from .token_forecaster import TokenSequenceForecaster
    from .forecasters import DLinear, LinearForecaster, PerPixelLinear, TimeMLP
    from .latent_ae import ConvAttnModel, ConvModel
    from .legacy import StructuredConvAE
    from .path_a import AttentionChargedAutoencoder, ConvAutoencoder
    from .vae.autoencoder_kl import AutoencoderKL
    from .vae.custom_akl import CustomAutoencoderKL
    from .vit_ae import ViTAE

    entries = {
        # frame autoencoders
        "pos_aware_ae": PosAwareAE,             # ae_64x8x8_lin
        "pos_aware_ae_tf": PosAwareAETF,        # ae_64x8x8_tf
        "vit_ae": ViTAE,                        # ae_vit AE_ViT_2048
        "autoencoder_kl": AutoencoderKL,        # diffusers-style VAE
        "custom_autoencoder_kl": CustomAutoencoderKL,  # timeseries-bottleneck VAE
        "structured_conv_ae": StructuredConvAE,  # ae_old spatial-latent family
        "conv_autoencoder": ConvAutoencoder,    # Path-A ae_gan models
        "attention_charged_ae": AttentionChargedAutoencoder,
        # latent-space second-stage AEs
        "latent_conv_model": ConvModel,
        "latent_conv_attn": ConvAttnModel,
        # latent forecasters
        "dlinear": DLinear,
        "linear_forecaster": LinearForecaster,
        "per_pixel_linear": PerPixelLinear,
        "time_mlp": TimeMLP,
        # spatio-temporal backbones
        "earthformer": Earthformer,
        "token_sequence_forecaster": TokenSequenceForecaster,
        # physics/spectral
        "alphapre": AlphaPre,
    }
    for k, v in entries.items():
        _REGISTRY.setdefault(k, v)


_populate()
