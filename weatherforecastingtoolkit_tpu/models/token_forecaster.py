"""Token-sequence latent forecaster: temporal transformer over ViT tokens.

Closes the reference's planned-but-unbuilt Path-B variant: "keep a structured
[64, 512] token-sequence latent from the ViT AE and forecast the token
sequence" (reference README.md:96-109; BASELINE.json config #3). The design
is factorized (axial) spatio-temporal attention — the TPU-friendly form:

  per token position: causal-free attention along T (time mixing)
  per timestep:       attention across the token grid (space mixing)

Input (B, T_in, N, D) -> output (B, T_out, N, D) in one shot via learned
temporal queries (no autoregression needed for fixed-horizon nowcasting; for
autoregressive rollouts use models/rollout.py with this as the step fn).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .transformer import CrossAttention, TransformerEncoderLayer


class TokenSequenceForecaster(nn.Module):
    t_in: int
    t_out: int
    d_token: int = 512
    num_heads: int = 8
    depth: int = 2          # (time-mix + space-mix) pairs
    dropout: float = 0.0

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        """tokens: (B, T_in, N, D) -> (B, T_out, N, D)."""
        b, t, n, d = tokens.shape
        assert t == self.t_in and d == self.d_token

        h = tokens + self.param("time_pos", nn.initializers.normal(0.02),
                                (1, self.t_in, 1, d))
        for i in range(self.depth):
            # time mixing: fold tokens into batch, attend along T
            ht = h.transpose(0, 2, 1, 3).reshape(b * n, t, d)
            ht = TransformerEncoderLayer(d, self.num_heads, 4 * d, self.dropout,
                                         name=f"time_{i}")(
                                             ht, deterministic=deterministic)
            h = ht.reshape(b, n, t, d).transpose(0, 2, 1, 3)
            # space mixing: fold time into batch, attend across tokens
            hs = h.reshape(b * t, n, d)
            hs = TransformerEncoderLayer(d, self.num_heads, 4 * d, self.dropout,
                                         name=f"space_{i}")(
                                             hs, deterministic=deterministic)
            h = hs.reshape(b, t, n, d)

        # learned temporal queries cross-attend into the encoded history
        queries = self.param("horizon_queries", nn.initializers.normal(0.02),
                             (1, self.t_out, 1, d))
        q = jnp.broadcast_to(queries, (b, self.t_out, n, d))
        # per token position: queries (T_out) attend over history (T_in)
        qf = q.transpose(0, 2, 1, 3).reshape(b * n, self.t_out, d)
        kf = h.transpose(0, 2, 1, 3).reshape(b * n, self.t_in, d)
        out = CrossAttention(d, d, self.num_heads, name="readout")(qf, kf)
        out = out.reshape(b, n, self.t_out, d).transpose(0, 2, 1, 3)
        # residual persistence anchor: last frame's tokens
        return out + h[:, -1:, :, :]


class LatentTokenForecaster(nn.Module):
    """TokenSequenceForecaster over a VAE latent GRID, with the DLinear-flat
    interface — the drop-in that promotes token attention into the Path-B
    pipeline (reference README.md:96-109 proposes the token latent; the
    reference only ever shipped Linear/DLinear, ae_s2/train.py:86-133).

    The (C, h, w) latent grid becomes h*w spatial tokens of dim C, embedded
    to d_model, mixed by factorized time/space attention, projected back.
    __call__: (B, T_in, C*h*w) -> (B, T_out, C*h*w), so every call site that
    takes DLinear (rollout engine, demo, serving) accepts it unchanged.
    """

    t_in: int
    t_out: int
    latent_shape: Tuple[int, int, int]    # (C, h, w)
    d_model: int = 128
    num_heads: int = 8
    depth: int = 2

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        b, t, d_flat = z.shape
        c, h, w = self.latent_shape
        assert d_flat == c * h * w and t == self.t_in, (z.shape,
                                                        self.latent_shape)
        tokens = z.reshape(b, t, c, h * w).transpose(0, 1, 3, 2)  # (B,T,N,C)
        tokens = nn.Dense(self.d_model, name="embed")(tokens)
        tokens = tokens + self.param("space_pos",
                                     nn.initializers.normal(0.02),
                                     (1, 1, h * w, self.d_model))
        out = TokenSequenceForecaster(
            t_in=self.t_in, t_out=self.t_out, d_token=self.d_model,
            num_heads=self.num_heads, depth=self.depth, name="core")(
                tokens, deterministic=deterministic)
        out = nn.Dense(c, name="unembed",
                       kernel_init=nn.initializers.zeros)(out)  # (B,T_out,N,C)
        # zero-init head: the untrained forecaster predicts zero deltas =
        # persistence when the caller anchors (same trick that fixed
        # earthformer's held-out generalization, RESULTS.md round 2)
        return out.transpose(0, 1, 3, 2).reshape(b, self.t_out, d_flat)
