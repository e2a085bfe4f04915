"""Custom Path-A VAE: spatial-latent VAE with a flat "timeseries" bottleneck.

Capability parity with the reference's custom_akl fork
(reference pipeline/models/autoencoderkl/custom_akl.py:17-1215):
  * Downsample4x2D / Upsample4x2D — two stacked 2x resampling stages
    (custom_akl.py:131-206)
  * SinusoidalPosEmb2D — precomputed 2-D sin/cos embedding added to the
    latent grid (custom_akl.py:970-1019)
  * to_timeseries / from_timeseries — Linear projections between the
    flattened (C*H*W) latent grid and a flat `timeseries_dim` vector
    (custom_akl.py:1093-1103)
  * forward returns (reconstruction, z_timeseries, posterior)
    (custom_akl.py:1167-1190); decode() reshapes a flat vector back to the
    latent grid before the conv decoder (custom_akl.py:1133)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common import nchw_to_nhwc, nhwc_to_nchw
from .blocks import Downsample4x, Upsample4x  # noqa: F401 (public re-export)
from .distributions import DiagonalGaussianDistribution
from .vae import Decoder, Encoder


def sinusoidal_pos_emb_2d(channels: int, height: int, width: int) -> np.ndarray:
    """(1, C, H, W) precomputed 2-D sin/cos embedding
    (reference custom_akl.py:991-1012 layout: [y_sin|y_cos|x_sin|x_cos])."""
    if channels % 4 != 0:
        raise ValueError("Channels must be divisible by 4 for 2D sinusoidal embeddings.")
    cq = channels // 4
    inv_freq = 1.0 / (10000 ** (np.arange(cq, dtype=np.float32) / cq))
    pos_y = np.arange(height, dtype=np.float32)[:, None] * inv_freq[None]
    pos_x = np.arange(width, dtype=np.float32)[:, None] * inv_freq[None]
    y_emb = np.concatenate([np.sin(pos_y), np.cos(pos_y)], axis=1)   # (H, C/2)
    x_emb = np.concatenate([np.sin(pos_x), np.cos(pos_x)], axis=1)   # (W, C/2)
    y_full = np.repeat(y_emb[:, None, :], width, axis=1)             # (H, W, C/2)
    x_full = np.repeat(x_emb[None, :, :], height, axis=0)            # (H, W, C/2)
    emb = np.concatenate([y_full, x_full], axis=2)                   # (H, W, C)
    return emb.transpose(2, 0, 1)[None]                              # (1, C, H, W)


class CustomAutoencoderKL(nn.Module):
    """VAE whose user-facing latent is a flat timeseries vector.

    encode(x) -> posterior over the (latent_channels, latent_hw, latent_hw)
    grid; __call__ adds the sinusoidal pos-emb, projects through the
    timeseries bottleneck, decodes the reconstructed grid, and returns
    (reconstruction, z_timeseries, posterior).
    """

    in_channels: int = 1
    out_channels: int = 1
    block_out_channels: Sequence[int] = (128, 256, 512, 512, 512)
    layers_per_block: int = 1
    latent_channels: int = 64
    norm_num_groups: int = 32
    latent_hw: int = 8
    timeseries_dim: int = 2048
    # per-block resample factor (2 or 4): the reference's `scales` lists
    # (custom_akl.py:823-825,919-921 — the stride-4 stacked resamplers of
    # custom_akl.py:131-206). None -> all 2x (the shipped reference default).
    scales: Optional[Sequence[int]] = None
    remat: bool = False  # jax.checkpoint each enc/dec block (training memory)

    def setup(self):
        # encoder downsamples after blocks 0..n-2 with scales[i]; the decoder
        # mirrors them in reverse (up block j inverts encoder block n-2-j)
        dec_scales = None
        if self.scales:
            s = tuple(self.scales)
            dec_scales = tuple(reversed(s[:-1])) + s[-1:]
        self.encoder = Encoder(
            out_channels=self.latent_channels,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            norm_num_groups=self.norm_num_groups, double_z=True,
            scales=self.scales, remat=self.remat)
        self.decoder = Decoder(
            out_channels=self.out_channels,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            norm_num_groups=self.norm_num_groups,
            scales=dec_scales, remat=self.remat)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1))
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1))
        self.to_timeseries = nn.Dense(self.timeseries_dim)
        self.from_timeseries = nn.Dense(
            self.latent_channels * self.latent_hw * self.latent_hw)
        self.pe = jnp.asarray(sinusoidal_pos_emb_2d(
            self.latent_channels, self.latent_hw, self.latent_hw))

    def encode(self, x: jnp.ndarray) -> DiagonalGaussianDistribution:
        h = self.encoder(nchw_to_nhwc(x))
        moments = self.quant_conv(h)
        return DiagonalGaussianDistribution(nhwc_to_nchw(moments))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Accepts the latent grid OR a flat vector (hard-reshaped like the
        reference custom_akl.py:1133)."""
        z = z.reshape(z.shape[0], self.latent_channels, self.latent_hw,
                      self.latent_hw)
        h = self.post_quant_conv(nchw_to_nhwc(z))
        return nhwc_to_nchw(self.decoder(h))

    def __call__(self, x: jnp.ndarray, sample_posterior: bool = False,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, DiagonalGaussianDistribution]:
        posterior = self.encode(x)
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("gaussian")
            z2d = posterior.sample(rng)
        else:
            z2d = posterior.mode()
        z2d = z2d + self.pe
        z_flat = z2d.reshape(z2d.shape[0], -1)
        z_ts = self.to_timeseries(z_flat)
        z_rec = self.from_timeseries(z_ts)
        recon = self.decode(z_rec)
        return recon, z_ts, posterior


def from_torch_state_dict(model: CustomAutoencoderKL, state_dict: dict,
                          example_shape=(1, 1, 128, 128)) -> dict:
    """Build flax params from a reference custom_akl torch state dict
    (reference custom_akl.py:1093-1190: encoder/decoder/quant convs plus the
    to_timeseries/from_timeseries Linears; the pos-emb buffer is
    non-persistent and recomputed here). Strict both ways, like the
    AutoencoderKL loader."""
    from .autoencoder_kl import from_torch_state_dict as _generic
    return _generic(model, state_dict, example_shape)
