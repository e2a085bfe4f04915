"""ViT autoencoder with a global cross-attention bottleneck.

Capability parity with the reference `AE_ViT_2048`
(reference pipeline/models/ae_vit.py:84-162): 16x16 patch embed -> 64 tokens
d=512 (+ learned pos-emb) -> 6-layer transformer encoder -> cross-attention
collapse to one 2048-d latent -> cross-attention expansion back to 64 tokens
-> 6-layer decoder -> transposed-conv unpatchify. Attention is
jax.nn.dot_product_attention throughout (fused on TPU).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import nchw_to_nhwc, nhwc_to_nchw
from .transformer import CrossAttention, TransformerEncoder


class ViTAE(nn.Module):
    img_size: int = 128
    patch: int = 16
    in_channels: int = 1
    d_token: int = 512
    d_latent: int = 2048
    depth_enc: int = 6
    depth_dec: int = 6
    heads: int = 8
    dropout: float = 0.1

    @property
    def grid(self) -> int:
        return self.img_size // self.patch

    @property
    def n_patches(self) -> int:
        return self.grid * self.grid

    def setup(self):
        self.patch_embed = nn.Conv(self.d_token, (self.patch, self.patch),
                                   strides=self.patch, padding="VALID")
        self.pos_embed = self.param("pos_embed", nn.initializers.normal(1.0),
                                    (1, self.n_patches, self.d_token))
        self.encoder = TransformerEncoder(self.depth_enc, self.d_token, self.heads,
                                          4 * self.d_token, self.dropout)
        self.query_vec = self.param("query_vec", nn.initializers.normal(1.0),
                                    (1, 1, self.d_latent))
        self.to_latent = CrossAttention(self.d_latent, self.d_token, self.heads)
        self.dec_queries = self.param("dec_queries", nn.initializers.normal(1.0),
                                      (1, self.n_patches, self.d_token))
        self.from_latent = CrossAttention(self.d_token, self.d_latent, self.heads)
        self.decoder = TransformerEncoder(self.depth_dec, self.d_token, self.heads,
                                          4 * self.d_token, self.dropout)
        self.unpatch = nn.ConvTranspose(self.in_channels, (self.patch, self.patch),
                                        strides=(self.patch, self.patch),
                                        padding="VALID")

    def encode_tokens(self, x: jnp.ndarray, deterministic: bool = True
                      ) -> jnp.ndarray:
        """(B, C, H, W) -> structured token latent (B, n_patches, d_token).

        The [64, 512] token-sequence latent the reference README proposes for
        Path B (README.md:96-109) — kept as a sequence instead of collapsing
        to one vector, for token-sequence forecasters."""
        b = x.shape[0]
        z = self.patch_embed(nchw_to_nhwc(x))              # (B, g, g, d)
        z = z.reshape(b, self.n_patches, self.d_token)
        z = z + self.pos_embed
        return self.encoder(z, deterministic=deterministic)

    def decode_tokens(self, tokens: jnp.ndarray, deterministic: bool = True
                      ) -> jnp.ndarray:
        """(B, n_patches, d_token) -> (B, C, H, W)."""
        b = tokens.shape[0]
        z = tokens + self.pos_embed
        z = self.decoder(z, deterministic=deterministic)
        z = z.reshape(b, self.grid, self.grid, self.d_token)
        return nhwc_to_nchw(self.unpatch(z))

    def encode(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, C, H, W) -> (B, d_latent)."""
        b = x.shape[0]
        z = self.encode_tokens(x, deterministic=deterministic)
        q = jnp.broadcast_to(self.query_vec, (b, 1, self.d_latent))
        return self.to_latent(q, z)[:, 0]                   # (B, d_latent)

    def decode(self, latent: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, d_latent) -> (B, C, H, W)."""
        b = latent.shape[0]
        dec_q = jnp.broadcast_to(self.dec_queries, (b, self.n_patches, self.d_token))
        z = self.from_latent(dec_q, latent[:, None, :])
        z = z + self.pos_embed
        z = self.decoder(z, deterministic=deterministic)
        z = z.reshape(b, self.grid, self.grid, self.d_token)
        return nhwc_to_nchw(self.unpatch(z))

    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        latent = self.encode(x, deterministic=deterministic)
        return self.decode(latent, deterministic=deterministic), latent
