"""Shared model building blocks (flax.linen, NHWC, TPU-first).

Norm policy: the reference's conv AEs use BatchNorm2d
(reference pipeline/models/ae_64x8x8_lin.py:14-18,32,43). BatchNorm carries
batch statistics that desync under pjit data parallelism and complicate the
functional train step, so this framework standardizes on GroupNorm — an
explicit, documented capability-equivalent swap (same normalization role,
state-free, DP-safe). All convolutions run NHWC (the TPU-native layout XLA
tiles onto the MXU without relayout copies).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn


def _num_groups(channels: int, preferred: int = 8) -> int:
    g = min(preferred, channels)
    while channels % g:
        g -= 1
    return g


class Bottleneck(nn.Module):
    """Pre-activation bottleneck residual: GN-GELU-1x1 / GN-GELU-3x3(grouped) /
    GN-GELU-1x1, matching the reference Bottleneck's shape contract
    (reference pipeline/models/ae_64x8x8_lin.py:7-22)."""

    channels: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.channels // 4
        g = _num_groups(mid, self.groups)
        h = nn.GroupNorm(num_groups=_num_groups(self.channels))(x)
        h = nn.gelu(h)
        h = nn.Conv(mid, (1, 1), use_bias=False)(h)
        h = nn.GroupNorm(num_groups=_num_groups(mid))(h)
        h = nn.gelu(h)
        h = nn.Conv(mid, (3, 3), padding=1, feature_group_count=g, use_bias=False)(h)
        h = nn.GroupNorm(num_groups=_num_groups(mid))(h)
        h = nn.gelu(h)
        h = nn.Conv(self.channels, (1, 1), use_bias=False)(h)
        return x + h


class EncBlock(nn.Module):
    """Stride-2 4x4 conv downsample + N bottleneck residuals
    (reference ae_64x8x8_lin.py:27-36)."""

    out_ch: int
    num_blocks: int = 2
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.out_ch, (4, 4), strides=2, padding=1, use_bias=False)(x)
        x = nn.GroupNorm(num_groups=_num_groups(self.out_ch))(x)
        x = nn.gelu(x)
        for _ in range(self.num_blocks):
            x = Bottleneck(self.out_ch, self.groups)(x)
        return x


class DecBlock(nn.Module):
    """Stride-2 4x4 transposed-conv upsample + N bottleneck residuals
    (reference ae_64x8x8_lin.py:38-47)."""

    out_ch: int
    num_blocks: int = 2
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # SAME padding with kernel 4 / stride 2 gives exact 2x upsampling
        # (torch ConvTranspose2d(4, stride=2, padding=1) equivalent geometry)
        x = nn.ConvTranspose(self.out_ch, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False)(x)
        x = nn.GroupNorm(num_groups=_num_groups(self.out_ch))(x)
        x = nn.gelu(x)
        for _ in range(self.num_blocks):
            x = Bottleneck(self.out_ch, self.groups)(x)
        return x


class MLP(nn.Module):
    """Linear stack with an activation between layers."""

    features: Sequence[int]
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1:
                x = self.activation(x)
        return x


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 3, 1, 2))


def space_to_depth(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Lossless (N, H, W, C) -> (N, H/f, W/f, f*f*C) repack; channel index
    (u*f + v)*C + c for subpixel (u, v). The TPU-first stem trick: moving
    pixels into the channel (lane) dimension turns poorly-shaped full-res
    convs into well-shaped ones at 1/f^2 the positions (measured rationale:
    experiments/perf/space_to_depth.py)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // factor, w // factor, factor * factor * c)


def depth_to_space(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    n, h, w, cf = x.shape
    c = cf // (factor * factor)
    x = x.reshape(n, h, w, factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h * factor, w * factor, c)
