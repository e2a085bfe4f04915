"""2-D pooling primitives on (..., H, W) arrays.

TPU-native replacements for the reference's `F.avg_pool2d` / `F.max_pool2d`
usage in the metric suite (reference pipeline/metrics.py:27-32,43-52) and the
dataset runtime downsampler (pipeline/datasets/sevir/sevir.py:753-755).
Implemented with `jax.lax.reduce_window`, which XLA lowers to fused
vector-unit loops; no im2col materialization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool2d(x: jax.Array, window: int, stride: int = None) -> jax.Array:
    """Average-pool the trailing two axes. Floor semantics like torch
    (trailing remainder pixels are dropped when size % window != 0)."""
    stride = window if stride is None else stride
    ndim = x.ndim
    dims = (1,) * (ndim - 2) + (window, window)
    strides = (1,) * (ndim - 2) + (stride, stride)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, "VALID")
    return summed / float(window * window)


def max_pool2d(x: jax.Array, window: int, stride: int = None) -> jax.Array:
    """Max-pool the trailing two axes (floor semantics)."""
    stride = window if stride is None else stride
    ndim = x.ndim
    dims = (1,) * (ndim - 2) + (window, window)
    strides = (1,) * (ndim - 2) + (stride, stride)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides, "VALID")
