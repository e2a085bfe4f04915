"""Tests for the remaining model-zoo members: Path-A AEs, latent AEs,
structured-latent legacy family, transformer decoder, registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.models.latent_ae import ConvAttnModel, ConvModel
from weatherforecastingtoolkit_tpu.models.legacy import StructuredConvAE
from weatherforecastingtoolkit_tpu.models.path_a import (AttentionChargedAutoencoder,
                                                         ConvAutoencoder,
                                                         ResidualBlock)
from weatherforecastingtoolkit_tpu.models.registry import (available_models,
                                                           build_model)
from weatherforecastingtoolkit_tpu.models.transformer import (TransformerDecoder)


def test_residual_block_shapes(rng):
    blk = ResidualBlock(16, stride=2)
    x = jnp.asarray(rng.random((2, 8, 8, 4)).astype(np.float32))
    y = blk.apply(blk.init(jax.random.key(0), x), x)
    assert y.shape == (2, 4, 4, 16)


def test_conv_autoencoder_small(rng):
    # 16x16 input with a 4-level ladder reaches 1x1
    model = ConvAutoencoder(latent_dim=32, enc_channels=(8, 16, 32, 32),
                            dec_channels=(16, 8, 8, 8))
    x = jnp.asarray(rng.random((2, 1, 16, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    recon, z = model.apply(params, x)
    assert recon.shape == (2, 1, 16, 16)
    assert z.shape == (2, 32)
    assert float(recon.max()) <= 1.0


def test_attention_charged_ae(rng):
    model = AttentionChargedAutoencoder(
        latent_dim=32, initial_res=4, embed_dim=32, num_heads=4, num_layers=1,
        enc_channels=(8, 16, 32), enc_strides=(2, 2, 4),
        dec_channels=(16, 8))
    x = jnp.asarray(rng.random((2, 1, 16, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    recon, z = model.apply(params, x)
    assert z.shape == (2, 32)
    assert recon.shape == (2, 1, 16, 16)


def test_latent_conv_model(rng):
    model = ConvModel(latent_dim=64, in_channels=64)
    x = jnp.asarray(rng.random((2, 64, 16, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    z, recon = model.apply(params, x)
    assert z.shape == (2, 64)
    assert recon.shape == (2, 64, 16, 16)


def test_conv_attn_model(rng):
    model = ConvAttnModel(in_channels=4, embed_dim=32, nhead=4,
                          num_tf_layers=1, latent_dim=64, grid=12)
    x = jnp.asarray(rng.random((2, 4, 48, 48)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    recon, z = model.apply(params, x)
    assert z.shape == (2, 64)
    assert recon.shape == (2, 4, 48, 48)


@pytest.mark.parametrize("tf_depth", [0, 1])
def test_structured_conv_ae(tf_depth, rng):
    model = StructuredConvAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                             num_blocks=1, latent_channels=4, latent_hw=8,
                             tf_depth=tf_depth, tf_heads=2)
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    recon, z = model.apply(params, x)
    assert z.shape == (2, 4, 8, 8)   # structured spatial latent
    assert recon.shape == (2, 1, 32, 32)


def test_transformer_decoder(rng):
    dec = TransformerDecoder(depth=2, dim=16, num_heads=4, ffn_dim=32)
    tgt = jnp.asarray(rng.random((2, 5, 16)).astype(np.float32))
    mem = jnp.asarray(rng.random((2, 3, 16)).astype(np.float32))
    out = dec.apply(dec.init(jax.random.key(0), tgt, mem), tgt, mem)
    assert out.shape == (2, 5, 16)


def test_registry():
    names = available_models()
    for expected in ("pos_aware_ae", "vit_ae", "autoencoder_kl", "dlinear",
                     "alphapre", "latent_conv_attn", "structured_conv_ae"):
        assert expected in names
    m = build_model("dlinear", seq_len=4, pred_len=2, kernel_size=3)
    assert m.seq_len == 4
    with pytest.raises(KeyError):
        build_model("nonexistent_model")
