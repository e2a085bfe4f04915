"""Structured-latent conv AEs (the reference's ae_old evolution chain).

The reference keeps nine legacy model files for provenance
(reference pipeline/models/ae_old/*.py, SURVEY §2.2). Their distinct
capabilities — beyond what PosAwareAE/ViTAE already configure — are:
  * a STRUCTURED spatial latent (e.g. 64x8x8 grid) with no flatten
    (ae_old/ae_64x8x8.py:35-110, also 64x16x16 / 16x16x16 geometries)
  * a coordinate embedding + transformer over latent tokens around the
    bottleneck (ae_old/ae_64x8x8_lin_t.py:120-245)

This module provides both as one configurable family instead of nine frozen
copies; the flat-latent variants are PosAwareAE configs (models/conv_ae.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import DecBlock, EncBlock, nchw_to_nhwc, nhwc_to_nchw
from .transformer import TransformerEncoder


class CoordEmbedding(nn.Module):
    """Learned per-position embedding added to latent tokens
    (ae_old/ae_64x8x8_lin_t.py CoordEmbedding capability)."""

    n_tokens: int
    dim: int

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        emb = self.param("coord", nn.initializers.normal(0.02),
                         (1, self.n_tokens, self.dim))
        return tokens + emb


class StructuredConvAE(nn.Module):
    """Conv AE with a spatial latent grid — encode() returns (B, C_l, h, w).

    latent geometry = latent_channels x latent_hw x latent_hw; with
    tf_depth > 0, latent tokens pass through a coordinate-embedded
    transformer on both the encode and decode sides.
    """

    in_channels: int = 1
    latent_channels: int = 64
    latent_hw: int = 8
    groups: int = 8
    enc_channels: Sequence[int] = (256, 512, 1024, 1024)
    dec_channels: Sequence[int] = (1024, 1024, 512, 256, 128)
    num_blocks: int = 4
    tf_depth: int = 0
    tf_heads: int = 8

    def setup(self):
        lc, hw = self.latent_channels, self.latent_hw
        self.enc_blocks = [EncBlock(c, self.num_blocks, self.groups)
                           for c in self.enc_channels]
        self.enc_out = nn.Conv(lc, (1, 1))
        if self.tf_depth > 0:
            self.coord = CoordEmbedding(hw * hw, lc)
            self.latent_tf = TransformerEncoder(self.tf_depth, lc,
                                                self.tf_heads, 4 * lc)
        self.dec_in = nn.Conv(self.dec_channels[0], (1, 1))
        self.dec_blocks = [DecBlock(c, self.num_blocks, self.groups)
                           for c in self.dec_channels[1:]]
        self.dec_out = nn.Conv(self.in_channels, (3, 3), padding=1)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nchw_to_nhwc(x)
        for blk in self.enc_blocks:
            h = blk(h)
        h = self.enc_out(h)
        if self.tf_depth > 0:
            b = h.shape[0]
            tokens = h.reshape(b, -1, self.latent_channels)
            tokens = self.latent_tf(self.coord(tokens))
            h = tokens.reshape(b, self.latent_hw, self.latent_hw,
                               self.latent_channels)
        return nhwc_to_nchw(h)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nchw_to_nhwc(z)
        h = self.dec_in(h)
        for blk in self.dec_blocks:
            h = blk(h)
        return nn.sigmoid(nhwc_to_nchw(self.dec_out(h)))

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encode(x)
        return self.decode(z), z
