"""Position-aware convolutional autoencoders with a flat bottleneck latent.

Capability parity with the reference's current conv AEs:
  * `PosAwareAE`    — reference pipeline/models/ae_64x8x8_lin.py:52-106
  * `PosAwareAETF`  — reference pipeline/models/ae_64x8x8_tf.py:52-116
    (adds an 8-layer transformer over the 64 latent tokens in the decoder)

Architecture: 4x stride-2 EncBlocks (1->256->512->1024->1024 ch) to an 8x8
map, 1x1 conv to `latent_channels`, learned 8x8 positional embedding, Linear
to a flat `latent_dim` vector; mirrored transposed-conv decoder with a sigmoid
head. Public contract matches the reference: `encode(x) -> (B, latent_dim)`,
`decode(z) -> (B, C, H, W)`, `__call__(x) -> (recon, z)` with NCHW at the API
edge (converted to NHWC internally for the MXU).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import DecBlock, EncBlock, nchw_to_nhwc, nhwc_to_nchw
from .transformer import TransformerEncoder


class PosAwareAE(nn.Module):
    in_channels: int = 1
    latent_channels: int = 64
    groups: int = 8
    latent_dim: int = 2048
    enc_channels: Sequence[int] = (256, 512, 1024, 1024)
    dec_channels: Sequence[int] = (1024, 1024, 512, 256, 128)
    num_blocks: int = 4
    latent_hw: int = 8           # 128 / 2**4
    decoder_tf_depth: int = 0    # >0 switches on the _tf variant behavior
    tf_heads: int = 8
    tf_ffn: int = 2048
    remat: bool = False  # jax.checkpoint each Enc/DecBlock: recompute block
    # activations in the backward pass instead of storing them (HBM capacity
    # for FLOPs — the training batch is the throughput knob, RESULTS.md)

    def setup(self):
        hw, lc = self.latent_hw, self.latent_channels
        enc_cls = nn.remat(EncBlock) if self.remat else EncBlock
        dec_cls = nn.remat(DecBlock) if self.remat else DecBlock
        self.enc_blocks = [enc_cls(c, self.num_blocks, self.groups)
                           for c in self.enc_channels]
        self.enc_out = nn.Conv(lc, (1, 1))
        self.pos_emb = self.param("pos_emb", nn.initializers.normal(1.0),
                                  (1, hw, hw, lc))
        self.to_latent = nn.Dense(self.latent_dim)
        self.from_latent = nn.Dense(hw * hw * lc)
        if self.decoder_tf_depth > 0:
            self.latent_tf = TransformerEncoder(
                depth=self.decoder_tf_depth, dim=lc, num_heads=self.tf_heads,
                ffn_dim=self.tf_ffn, dropout=0.1)
        self.dec_in = nn.Conv(self.dec_channels[0], (1, 1))
        self.dec_blocks = [dec_cls(c, self.num_blocks, self.groups)
                           for c in self.dec_channels[1:]]
        self.dec_out = nn.Conv(self.in_channels, (3, 3), padding=1)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, C, H, W) -> (B, latent_dim)."""
        h = nchw_to_nhwc(x)
        for blk in self.enc_blocks:
            h = blk(h)
        h = self.enc_out(h)
        h = h + self.pos_emb
        # flatten matching the reference's NCHW .flatten(1) ordering so
        # latent vector indices are layout-independent
        h = nhwc_to_nchw(h).reshape(h.shape[0], -1)
        return self.to_latent(h)

    def decode(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, latent_dim) -> (B, C, H, W), sigmoid-bounded."""
        b = z.shape[0]
        hw, lc = self.latent_hw, self.latent_channels
        h = self.from_latent(z).reshape(b, lc, hw, hw)  # NCHW like reference
        h = nchw_to_nhwc(h)
        if self.decoder_tf_depth > 0:
            tokens = h.reshape(b, hw * hw, lc)
            tokens = self.latent_tf(tokens, deterministic=deterministic)
            h = tokens.reshape(b, hw, hw, lc)
        h = self.dec_in(h)
        for blk in self.dec_blocks:
            h = blk(h)
        h = self.dec_out(h)
        return nn.sigmoid(nhwc_to_nchw(h))

    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encode(x)
        return self.decode(z, deterministic=deterministic), z


def PosAwareAETF(**kwargs) -> PosAwareAE:
    """The `_tf` variant: 8-layer transformer over 64 latent tokens in the
    decoder (reference ae_64x8x8_tf.py:77-80,107-109)."""
    kwargs.setdefault("decoder_tf_depth", 8)
    return PosAwareAE(**kwargs)
