"""Transformer encoder blocks (flax.linen).

Replaces the reference's nn.TransformerEncoder usage
(reference pipeline/models/ae_vit.py:105-126, ae_64x8x8_tf.py:77-80) with a
TPU-first block: `jax.nn.dot_product_attention` (lowered by XLA to fused
flash-style attention on TPU) instead of materialized baddbmm attention.
Post-LayerNorm ordering matches torch's TransformerEncoderLayer default
(norm_first=False) so behavior stays comparable.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class SelfAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, d = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, l, self.num_heads, hd)

        out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
        out = out.reshape(b, l, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer: x = LN(x + MHA(x)); x = LN(x + FFN(x))."""

    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = SelfAttention(self.dim, self.num_heads)(x)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = nn.LayerNorm()(x + h)
        h = nn.Dense(self.ffn_dim)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm()(x + h)


class TransformerEncoder(nn.Module):
    depth: int
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for _ in range(self.depth):
            x = TransformerEncoderLayer(self.dim, self.num_heads, self.ffn_dim,
                                        self.dropout, self.activation)(
                                            x, deterministic=deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """Pre-LN decoder layer: self-attn over queries, cross-attn to memory,
    FFN (torch TransformerDecoderLayer norm_first=True equivalent — used by
    the reference's AttentionChargedAutoencoder and ConvAttnModel)."""

    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h = nn.LayerNorm()(tgt)
        h = SelfAttention(self.dim, self.num_heads, name="self_attn")(h)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=deterministic)(h)

        h = nn.LayerNorm()(tgt)
        h = CrossAttention(self.dim, memory.shape[-1], self.num_heads,
                           name="cross_attn")(h, memory)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=deterministic)(h)

        h = nn.LayerNorm()(tgt)
        h = nn.Dense(self.ffn_dim)(h)
        h = self.activation(h)
        h = nn.Dense(self.dim)(h)
        return tgt + nn.Dropout(self.dropout, deterministic=deterministic)(h)


class TransformerDecoder(nn.Module):
    depth: int
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        for _ in range(self.depth):
            tgt = TransformerDecoderLayer(self.dim, self.num_heads, self.ffn_dim,
                                          self.dropout)(tgt, memory,
                                                        deterministic=deterministic)
        return tgt


class CrossAttention(nn.Module):
    """Generic multi-head cross-attention: queries attend to kv tokens.

    Covers both GlobalCrossEncode (collapse L tokens -> 1 latent vector) and
    GlobalCrossDecode (expand 1 latent -> L tokens) from the reference
    (pipeline/models/ae_vit.py:4-82): project kv into the query width, attend,
    output-project.
    """

    q_dim: int
    kv_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, q: jnp.ndarray, kv: jnp.ndarray) -> jnp.ndarray:
        b, lq, _ = q.shape
        hd = self.q_dim // self.num_heads
        qh = nn.Dense(self.q_dim, name="q_proj")(q)
        kvh = nn.Dense(2 * self.q_dim, name="kv_proj")(kv)
        k, v = jnp.split(kvh, 2, axis=-1)

        def heads(t):
            return t.reshape(b, t.shape[1], self.num_heads, hd)

        out = jax.nn.dot_product_attention(heads(qh), heads(k), heads(v))
        out = out.reshape(b, lq, self.q_dim)
        return nn.Dense(self.q_dim, name="out")(out)
