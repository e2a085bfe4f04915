"""VAE posterior distribution utilities.

Parity with reference pipeline/models/autoencoderkl/distributions.py:26-101
(`DiagonalGaussianDistribution`: mean/logvar chunk, logvar clamp [-30, 20],
sample/kl/nll/mode) and `normal_kl` (:1-24). Sampling takes an explicit JAX
PRNG key — the reference used torch's hidden global generator.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


class DiagonalGaussianDistribution:
    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        """parameters: (..., 2*C, H, W) — mean/logvar chunked on the channel
        axis (axis 1, matching the reference's NCHW contract)."""
        self.parameters = parameters
        mean, logvar = jnp.split(parameters, 2, axis=1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.std = jnp.zeros_like(self.mean)
            self.var = jnp.zeros_like(self.mean)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        noise = jax.random.normal(rng, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None
           ) -> jnp.ndarray:
        """KL divergence summed over (C, H, W) per sample -> (B,)."""
        if self.deterministic:
            return jnp.zeros(self.mean.shape[0], dtype=self.mean.dtype)
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean ** 2 + self.var - 1.0 - self.logvar,
                                 axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes)

    def nll(self, sample: jnp.ndarray, axes: Tuple[int, ...] = (1, 2, 3)
            ) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(sample.shape[0], dtype=sample.dtype)
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=axes)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two gaussians with broadcasting (reference
    distributions.py:66-101)."""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))
