"""Second-stage latent autoencoders: compress a frozen VAE's spatial latent.

Capability parity with the reference's latent-space models:
  * ConvModel — 16x16x64 latent -> conv ladder to 1x1 -> Linear(512) -> mirror
    (reference experiments/v1_experiments/pretrained_ae_conv_disc/train.py:140-206;
    also pretrained_ae_convae_sevir)
  * ConvAttnModel — 48x48x4 latent -> conv to 12x12 tokens -> pre-LN
    transformer encoder -> attention pooling to one latent vector -> learned
    decoder queries + transformer decoder -> deconv
    (reference pretrained_ae_convattn_ae_sevir/train.py:58-160)

Both operate on (B, C, H, W) latents (NCHW API edge) and use kaiming init
like the reference.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import nchw_to_nhwc, nhwc_to_nchw
from .transformer import CrossAttention, TransformerDecoder, TransformerEncoder

kaiming = nn.initializers.he_normal()


class LatentConvEncoder(nn.Module):
    latent_dim: int = 512
    channels: Sequence[int] = (128, 256, 512, 1024)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nchw_to_nhwc(x)
        for i, c in enumerate(self.channels):
            h = nn.Conv(c, (3, 3), strides=2, padding=1, kernel_init=kaiming,
                        name=f"conv_{i}")(h)
            h = nn.silu(h)
        h = nn.Conv(self.channels[-1], (1, 1), kernel_init=kaiming,
                    name="conv_out")(h)
        return nn.Dense(self.latent_dim, kernel_init=kaiming,
                        name="fc")(h.reshape(h.shape[0], -1))


class LatentConvDecoder(nn.Module):
    out_channels: int = 64
    channels: Sequence[int] = (1024, 512, 256, 128)

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.channels[0], kernel_init=kaiming, name="fc")(z)
        h = h.reshape(z.shape[0], 1, 1, self.channels[0])
        for i, c in enumerate(self.channels):
            h = nn.ConvTranspose(c, (3, 3), strides=(2, 2), padding="SAME",
                                 kernel_init=kaiming, name=f"deconv_{i}")(h)
            h = nn.silu(h)
        h = nn.Conv(self.out_channels, (1, 1), kernel_init=kaiming,
                    name="conv_out")(h)
        return nhwc_to_nchw(h)


class ConvModel(nn.Module):
    """Latent-space AE: (B, 64, 16, 16) -> z (B, latent_dim) -> back."""

    latent_dim: int = 512
    in_channels: int = 64

    def setup(self):
        self.encoder = LatentConvEncoder(self.latent_dim)
        self.decoder = LatentConvDecoder(self.in_channels)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encoder(x)
        return z, self.decoder(z)   # (z, recon) ordering like the reference


class ConvAttnModel(nn.Module):
    """Latent AE with positional attention instead of naive flattening."""

    in_channels: int = 4
    embed_dim: int = 128
    nhead: int = 8
    num_tf_layers: int = 4
    latent_dim: int = 512
    grid: int = 12  # 48 / 4

    def setup(self):
        d = self.embed_dim
        n_tok = self.grid * self.grid
        self.enc_conv1 = nn.Conv(64, (3, 3), strides=2, padding=1,
                                 kernel_init=kaiming)
        self.enc_norm1 = nn.GroupNorm(num_groups=8)
        self.enc_conv2 = nn.Conv(d, (3, 3), strides=2, padding=1,
                                 kernel_init=kaiming)
        self.enc_norm2 = nn.GroupNorm(num_groups=8)
        self.encoder_pos_embedding = self.param(
            "enc_pos", nn.initializers.normal(1.0), (1, n_tok, d))
        self.encoder_tf = TransformerEncoder(self.num_tf_layers, d, self.nhead,
                                             4 * d)
        self.pooling_query = self.param("pool_q", nn.initializers.normal(1.0),
                                        (1, 1, d))
        self.attention_pool = CrossAttention(d, d, self.nhead)
        self.head_norm = nn.LayerNorm()
        self.head_fc = nn.Dense(self.latent_dim, kernel_init=kaiming)

        self.decoder_head = nn.Dense(d, kernel_init=kaiming)
        self.decoder_queries = self.param("dec_q", nn.initializers.normal(1.0),
                                          (1, n_tok, d))
        self.decoder_pos_embedding = self.param(
            "dec_pos", nn.initializers.normal(1.0), (1, n_tok, d))
        self.decoder_tf = TransformerDecoder(self.num_tf_layers, d, self.nhead,
                                             4 * d)
        self.dec_deconv1 = nn.ConvTranspose(64, (4, 4), strides=(2, 2),
                                            padding="SAME", kernel_init=kaiming)
        self.dec_norm1 = nn.GroupNorm(num_groups=8)
        self.dec_deconv2 = nn.ConvTranspose(self.in_channels, (4, 4),
                                            strides=(2, 2), padding="SAME",
                                            kernel_init=kaiming)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        h = nchw_to_nhwc(x)
        h = nn.gelu(self.enc_norm1(self.enc_conv1(h)))
        h = nn.gelu(self.enc_norm2(self.enc_conv2(h)))
        tokens = h.reshape(b, -1, self.embed_dim) + self.encoder_pos_embedding
        context = self.encoder_tf(tokens)
        q = jnp.broadcast_to(self.pooling_query, (b, 1, self.embed_dim))
        pooled = self.attention_pool(q, context)
        return self.head_fc(self.head_norm(pooled))[:, 0]

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        b = z.shape[0]
        memory = self.decoder_head(z)[:, None, :]
        q = jnp.broadcast_to(self.decoder_queries,
                             (b,) + self.decoder_queries.shape[1:])
        q = q + self.decoder_pos_embedding
        patches = self.decoder_tf(q, memory)
        h = patches.reshape(b, self.grid, self.grid, self.embed_dim)
        h = nn.gelu(self.dec_norm1(self.dec_deconv1(h)))
        return nhwc_to_nchw(self.dec_deconv2(h))

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encode(x)
        return self.decode(z), z
