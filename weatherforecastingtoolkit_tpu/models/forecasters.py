"""Latent temporal forecasters: Linear, MLP, DLinear (+ per-channel variants).

Capability parity with the reference's forecaster family:
  * per-pixel Linear over (T_in*C -> T_out*C)
    (reference experiments/v1_experiments/pretrained_ae_linear_sevir/train.py:67,79-82)
  * time-MLP intensity forecaster
    (reference experiments/v1_experiments/prediff_mlp_sevir/train.py:20-38)
  * DLinear with moving-average trend/seasonal decomposition, shared or
    `individual` per-channel linears
    (reference experiments/ae_s2/train.py:55-133,
     pretrained_ae_dlinear_ind/train.py:53-98)

TPU-first notes: the reference's `individual` DLinear loops over channels in
python (ae_s2-style train.py:125-127) — here per-channel weights are a single
(C, T_in, T_out) tensor contracted with one einsum, so the MXU sees one batched
matmul instead of C tiny ones. The 1/seq_len constant weight init of the
reference (ae_s2/train.py:107-116) is preserved.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import MLP as _MLPStack


class LinearForecaster(nn.Module):
    """Per-position linear map over stacked (time, channel) features.

    x: (B, T_in, D) -> (B, T_out, D). Internally a Dense over the flattened
    (T_in*D) features per sample position would be enormous for latent grids;
    the reference applies it per spatial position with D = channels. This
    module matches that: the caller reshapes so the last axis is the feature
    axis and time folds in.
    """

    t_in: int
    t_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, d = x.shape
        assert t == self.t_in, f"expected T_in={self.t_in}, got {t}"
        h = x.reshape(b, t * d)
        h = nn.Dense(self.t_out * d)(h)
        return h.reshape(b, self.t_out, d)


class PerPixelLinear(nn.Module):
    """The pretrained_ae_linear_sevir head: at each latent pixel, map the
    stacked (T_in * C) channel-time features to (T_out * C).

    x: (B, T_in, C, H, W) -> (B, T_out, C, H, W).
    """

    t_in: int
    t_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, c, h, w = x.shape
        assert t == self.t_in
        feat = jnp.transpose(x, (0, 3, 4, 1, 2)).reshape(b, h, w, t * c)
        out = nn.Dense(self.t_out * c)(feat)
        out = out.reshape(b, h, w, self.t_out, c)
        return jnp.transpose(out, (0, 3, 4, 1, 2))


class TimeMLP(nn.Module):
    """(…, T_in) -> (…, T_out) MLP over the trailing time axis."""

    t_in: int
    t_out: int
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _MLPStack([self.hidden_dim, self.hidden_dim, self.t_out])(x)


def moving_avg(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Trend extraction: replicate-pad the time ends, then average-pool along
    T (reference ae_s2/train.py:55-71). x: (B, T, D)."""
    pad = (kernel_size - 1) // 2
    front = jnp.repeat(x[:, :1], pad, axis=1)
    end = jnp.repeat(x[:, -1:], pad, axis=1)
    xp = jnp.concatenate([front, x, end], axis=1)
    # cumulative-sum trick: one pass, no conv needed for a box filter
    cs = jnp.cumsum(xp, axis=1)
    zeros = jnp.zeros_like(cs[:, :1])
    cs = jnp.concatenate([zeros, cs], axis=1)
    out = (cs[:, kernel_size:] - cs[:, :-kernel_size]) / kernel_size
    return out


def series_decomp(x: jnp.ndarray, kernel_size: int):
    """(residual/seasonal, trend) decomposition (reference ae_s2/train.py:73-84)."""
    trend = moving_avg(x, kernel_size)
    return x - trend, trend


class DLinear(nn.Module):
    """Decomposition-Linear forecaster. x: (B, T_in, D) -> (B, T_out, D).

    individual=True keeps a separate (T_in -> T_out) linear per feature
    channel, vectorized as one (D, T_in, T_out) einsum.
    """

    seq_len: int
    pred_len: int
    kernel_size: int = 25
    individual: bool = False
    channels: int = 1  # required when individual=True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        seasonal, trend = series_decomp(x, self.kernel_size)
        ones_init = nn.initializers.constant(1.0 / self.seq_len)

        if self.individual:
            d = x.shape[-1]
            assert d == self.channels, f"channels={self.channels} != D={d}"
            w_s = self.param("seasonal_w", ones_init, (d, self.seq_len, self.pred_len))
            b_s = self.param("seasonal_b", nn.initializers.zeros, (d, self.pred_len))
            w_t = self.param("trend_w", ones_init, (d, self.seq_len, self.pred_len))
            b_t = self.param("trend_b", nn.initializers.zeros, (d, self.pred_len))
            s_out = jnp.einsum("btd,dto->bod", seasonal, w_s) + b_s.T[None]
            t_out = jnp.einsum("btd,dto->bod", trend, w_t) + b_t.T[None]
        else:
            w_s = self.param("seasonal_w", ones_init, (self.seq_len, self.pred_len))
            b_s = self.param("seasonal_b", nn.initializers.zeros, (self.pred_len,))
            w_t = self.param("trend_w", ones_init, (self.seq_len, self.pred_len))
            b_t = self.param("trend_b", nn.initializers.zeros, (self.pred_len,))
            s_out = jnp.einsum("btd,to->bod", seasonal, w_s) + b_s[None, :, None]
            t_out = jnp.einsum("btd,to->bod", trend, w_t) + b_t[None, :, None]
        return s_out + t_out
