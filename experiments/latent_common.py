"""Shared frozen-autoencoder wiring for latent forecasting experiments.

The reference loads a pretrained frozen VAE from a torch .pt and encodes every
batch with it (reference experiments/ae_s2/train.py:19-51,
pretrained_ae_linear_sevir/train.py). Here:
  * cfg.ae_kl.ckpt_path set   -> ingest the torch checkpoint
    (training/checkpoint.load_torch_state_dict + vae.from_torch_state_dict)
  * ckpt_path null            -> a seed-fixed random frozen VAE (hermetic
    smoke/demo mode; the latent geometry is identical)
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (  # noqa: E402
    AutoencoderKL, from_torch_state_dict)
from weatherforecastingtoolkit_tpu.training.checkpoint import (  # noqa: E402
    load_torch_state_dict)


def build_frozen_vae(cfg):
    """Returns (encode_apply(frames, rng) -> latents, decode_apply, latent_shape).

    encode samples the posterior like the reference (ae_s2/train.py:36
    `.sample()`); decode is deterministic.
    """
    ae_cfg = cfg.ae_kl
    hw = cfg.dataset.get("img_size", 128)
    model = AutoencoderKL(
        in_channels=ae_cfg.get("in_channels", 1),
        out_channels=ae_cfg.get("out_channels", 1),
        block_out_channels=tuple(ae_cfg.get("block_out_channels",
                                            [64, 128, 256, 512, 512])),
        layers_per_block=ae_cfg.get("layers_per_block", 1),
        latent_channels=ae_cfg.get("latent_channels", 64),
        norm_num_groups=ae_cfg.get("norm_num_groups", 32))

    ckpt_path = ae_cfg.get("ckpt_path")
    if ckpt_path:
        sd = load_torch_state_dict(str(ckpt_path),
                                   submodel=ae_cfg.get("submodel"))
        variables = from_torch_state_dict(model, sd,
                                          example_shape=(1, 1, hw, hw))
        print(f"[frozen-vae] loaded torch checkpoint {ckpt_path}")
    else:
        variables = model.init(jax.random.key(ae_cfg.get("init_seed", 7)),
                               jnp.zeros((1, 1, hw, hw), jnp.float32))
        print("[frozen-vae] no ckpt_path; using seed-fixed random frozen VAE")
    variables = jax.lax.stop_gradient(variables)

    n_down = len(model.block_out_channels) - 1
    latent_hw = hw // (2 ** n_down)
    latent_shape = (model.latent_channels, latent_hw, latent_hw)

    # trainer.mixed_precision: the frozen encoder is the latent experiments'
    # dominant compute — run it bf16 (latents come back fp32 for the
    # forecaster loss); decode stays fp32 (metric-grade eval path)
    if cfg.get("trainer", {}).get("mixed_precision", False):
        from weatherforecastingtoolkit_tpu.ops.amp import cast_floats
        enc_vars = cast_floats(variables)

        def encode_apply(frames, rng):
            posterior = model.apply(enc_vars, cast_floats(frames),
                                    method=model.encode)
            return posterior.sample(rng).astype(jnp.float32)

        def encode_mode(frames):
            return model.apply(enc_vars, cast_floats(frames),
                               method=model.encode).mode().astype(jnp.float32)
    else:
        def encode_apply(frames, rng):
            posterior = model.apply(variables, frames, method=model.encode)
            return posterior.sample(rng)

        def encode_mode(frames):
            return model.apply(variables, frames, method=model.encode).mode()

    def decode_apply(latents):
        return model.apply(variables, latents, method=model.decode)

    return encode_apply, encode_mode, decode_apply, latent_shape
