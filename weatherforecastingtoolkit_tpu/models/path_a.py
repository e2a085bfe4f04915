"""Path-A conv autoencoders: compress a frame to a single flat vector.

Capability parity with the reference's in-experiment Path-A models
(reference experiments/v1_experiments/ae_gan/train.py:46-332):
  * ResidualBlock (3x3 stride conv + norm + GELU x2, projected shortcut)
  * UpsampleBlock (nearest 2x + ResidualBlock)
  * ConvAutoencoder family — stride-2 residual ladder 128 -> 1x1, Linear to a
    flat latent (1024/2048/256 in the reference variants ConvAutoencoder /
    ConvAutoencoderBIG / ConvAutoencoder2 — here one class, configurable)
  * AttentionChargedAutoencoder — conv encoder to a flat latent; decoder is a
    transformer decoder whose learned positional queries cross-attend to the
    latent, then an upsample ladder (ae_gan/train.py:273-332)

Path A is the documented dead end (reference README.md:17-35) but remains
part of the reproducible capability surface. Norms are GroupNorm (see
models/common.py docstring).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import _num_groups, nchw_to_nhwc, nhwc_to_nchw
from .transformer import TransformerDecoder


class ResidualBlock(nn.Module):
    out_ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC in/out."""
        in_ch = x.shape[-1]
        h = nn.Conv(self.out_ch, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        h = nn.GroupNorm(num_groups=_num_groups(self.out_ch), name="norm1")(h)
        h = nn.gelu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = nn.GroupNorm(num_groups=_num_groups(self.out_ch), name="norm2")(h)
        if self.stride != 1 or in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), strides=self.stride,
                        use_bias=False, name="short_conv")(x)
            x = nn.GroupNorm(num_groups=_num_groups(self.out_ch),
                             name="short_norm")(x)
        return nn.gelu(x + h)


class UpsampleBlock(nn.Module):
    out_ch: int
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * self.scale_factor,
                                 w * self.scale_factor, c), method="nearest")
        return ResidualBlock(self.out_ch, name="resblock")(x)


class ConvAutoencoder(nn.Module):
    """Stride-2 residual ladder to 1x1, Linear bottleneck, upsample ladder.

    Default channels replicate the reference ConvAutoencoder (latent 1024);
    pass latent_dim=2048 + wider channels for the BIG variant, 256 for v2.
    """

    in_channels: int = 1
    latent_dim: int = 1024
    enc_channels: Sequence[int] = (64, 128, 256, 512, 1024, 1024, 1024)
    dec_channels: Sequence[int] = (512, 256, 128, 64, 64, 64, 64)

    def setup(self):
        self.enc_blocks = [ResidualBlock(c, stride=2) for c in self.enc_channels]
        self.fc_enc = nn.Dense(self.latent_dim)
        self.fc_dec = nn.Dense(self.enc_channels[-1])
        self.dec_init = ResidualBlock(self.enc_channels[-1])
        self.dec_blocks = [UpsampleBlock(c) for c in self.dec_channels]
        self.final_conv = nn.Conv(self.in_channels, (3, 3), padding=1)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nchw_to_nhwc(x)
        for blk in self.enc_blocks:
            h = blk(h)
        h = h.reshape(h.shape[0], -1)  # (B, C) at 1x1
        return self.fc_enc(h)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h = self.fc_dec(z).reshape(z.shape[0], 1, 1, self.enc_channels[-1])
        h = self.dec_init(h)
        for blk in self.dec_blocks:
            h = blk(h)
        h = self.final_conv(h)
        return nn.sigmoid(nhwc_to_nchw(h))

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encode(x)
        return self.decode(z), z


class AttentionChargedAutoencoder(nn.Module):
    """Conv encoder -> flat latent; transformer-decoder queries reconstruct the
    spatial grid from the latent memory, then an upsample ladder."""

    in_channels: int = 1
    latent_dim: int = 512
    initial_res: int = 8
    embed_dim: int = 768
    num_heads: int = 12
    num_layers: int = 6
    enc_channels: Sequence[int] = (64, 128, 256, 512, 1024)
    enc_strides: Sequence[int] = (2, 2, 2, 4, 4)
    dec_channels: Sequence[int] = (512, 256, 128, 64)

    def setup(self):
        self.enc_blocks = [ResidualBlock(c, stride=s)
                           for c, s in zip(self.enc_channels, self.enc_strides)]
        self.fc_enc = nn.Dense(self.latent_dim)
        self.fc_dec = nn.Dense(self.embed_dim)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(1.0),
            (1, self.initial_res * self.initial_res, self.embed_dim))
        self.decoder_tf = TransformerDecoder(
            depth=self.num_layers, dim=self.embed_dim, num_heads=self.num_heads,
            ffn_dim=4 * self.embed_dim, dropout=0.1)
        self.dec_blocks = [UpsampleBlock(c) for c in self.dec_channels]
        self.final_conv = nn.Conv(self.in_channels, (3, 3), padding=1)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nchw_to_nhwc(x)
        for blk in self.enc_blocks:
            h = blk(h)
        return self.fc_enc(h.reshape(h.shape[0], -1))

    def decode(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b = z.shape[0]
        memory = self.fc_dec(z)[:, None, :]
        queries = jnp.broadcast_to(
            self.pos_embed, (b,) + self.pos_embed.shape[1:])
        tokens = self.decoder_tf(queries, memory, deterministic=deterministic)
        r = self.initial_res
        h = tokens.reshape(b, r, r, self.embed_dim)
        for blk in self.dec_blocks:
            h = blk(h)
        return nhwc_to_nchw(self.final_conv(h))

    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encode(x)
        return self.decode(z, deterministic=deterministic), z
