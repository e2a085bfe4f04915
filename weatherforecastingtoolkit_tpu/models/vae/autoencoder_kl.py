"""AutoencoderKL: the diffusers-style VAE with quant convs and a gaussian
posterior (reference autoencoderkl/autoencoder_kl.py:9-141).

Public contract (NCHW at the API edge, matching the reference):
  encode(x)  -> DiagonalGaussianDistribution over (B, latent_C, h, w)
  decode(z)  -> (B, C, H, W)
  __call__(x, sample_posterior, rng) -> recon [, posterior]

`from_torch_state_dict` ingests reference/CasCast torch checkpoints
(key surgery per reference pipeline/helpers.py:14-32 happens in
training/checkpoint.load_torch_state_dict; here we map names and transpose
conv kernels OIHW->HWIO and linear kernels (out,in)->(in,out)).

The reference's sliced decoding (autoencoder_kl.py:91-113) is a GPU memory
workaround; on TPU the same program is compiled once and XLA schedules HBM —
`decode` takes any batch. The flag is accepted for API compatibility.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common import (depth_to_space, nchw_to_nhwc, nhwc_to_nchw,
                      space_to_depth)
from .distributions import DiagonalGaussianDistribution
from .vae import Decoder, Encoder


class AutoencoderKL(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Sequence[int] = (64,)
    layers_per_block: int = 1
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    use_slicing: bool = False  # accepted for API parity; no-op on TPU
    fused_norm: bool = False   # Pallas fused GroupNorm+SiLU (same params)
    conv_mode: str = "native"  # "int8" = quantized serving (ops/quant.py);
    # identical param tree, so fp32-trained checkpoints serve quantized as-is
    remat: bool = False  # jax.checkpoint each enc/dec block: recompute
    # activations in backward instead of storing (identical params + math;
    # unlocks larger train batches on the bandwidth-bound GAN step)
    pixel_unshuffle: int = 1  # >1: lossless space-to-depth stem — pack f x f
    # pixels into channels before conv_in and unpack after conv_out, so NO
    # conv ever runs at full resolution. The TPU-first serving redesign the
    # s2d measurement motivates (experiments/perf/space_to_depth.py): the
    # reference VAE's 64-channel full-res convs cap encoder MFU at 42%.
    # Each factor-2 of unshuffle replaces one conv up/downsample stage, so
    # pass fewer block_out_channels to keep the same latent geometry.
    scales: Optional[Sequence[int]] = None  # per-block resample factor
    # (2 or 4), forwarded to Encoder/Decoder (the custom_akl stacked-4x
    # geometry, reference custom_akl.py:810-945)

    def setup(self):
        f = self.pixel_unshuffle
        dec_scales = None
        if self.scales:
            s = tuple(self.scales)
            dec_scales = tuple(reversed(s[:-1])) + s[-1:]
        self.encoder = Encoder(
            out_channels=self.latent_channels,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            norm_num_groups=self.norm_num_groups, double_z=True,
            fused_norm=self.fused_norm, conv_mode=self.conv_mode,
            remat=self.remat, scales=self.scales)
        self.decoder = Decoder(
            out_channels=self.out_channels * f * f,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            norm_num_groups=self.norm_num_groups,
            fused_norm=self.fused_norm, conv_mode=self.conv_mode,
            remat=self.remat, scales=dec_scales)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1))
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1))

    def encode(self, x: jnp.ndarray) -> DiagonalGaussianDistribution:
        h = nchw_to_nhwc(x)
        if self.pixel_unshuffle > 1:
            h = space_to_depth(h, self.pixel_unshuffle)
        h = self.encoder(h)
        moments = self.quant_conv(h)
        return DiagonalGaussianDistribution(nhwc_to_nchw(moments))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h = self.post_quant_conv(nchw_to_nhwc(z))
        h = self.decoder(h)
        if self.pixel_unshuffle > 1:
            h = depth_to_space(h, self.pixel_unshuffle)
        return nhwc_to_nchw(h)

    def __call__(self, x: jnp.ndarray, sample_posterior: bool = False,
                 rng: Optional[jax.Array] = None,
                 return_posterior: bool = False
                 ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, DiagonalGaussianDistribution]]:
        posterior = self.encode(x)
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("gaussian")
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        dec = self.decode(z)
        if return_posterior:
            return dec, posterior
        return dec


# --------------------------------------------------------------------------
# torch checkpoint ingestion
# --------------------------------------------------------------------------
def _convert_tensor(key: str, v: np.ndarray) -> np.ndarray:
    if v.ndim == 4:          # conv OIHW -> HWIO
        return np.transpose(v, (2, 3, 1, 0))
    if v.ndim == 2:          # linear (out, in) -> (in, out)
        return np.transpose(v, (1, 0))
    return v


def _rename(key: str) -> Optional[str]:
    """torch module path -> our flax param path (dot-separated)."""
    k = key
    # list-module indices: down_blocks.0.resnets.1.conv1.weight ->
    #   down_blocks_0.resnets_1.conv1
    parts = k.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    k = ".".join(out)
    k = k.replace(".weight", ".__W").replace(".bias", ".__B")
    return k


def from_torch_state_dict(model: AutoencoderKL, state_dict: dict,
                          example_shape=(1, 1, 128, 128)) -> dict:
    """Build flax params from a reference torch AutoencoderKL state dict.

    Returns the {'params': ...} pytree. Raises KeyError on any missing or
    unconsumed weight (strict=True semantics, like the reference loader).
    """
    variables = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros(example_shape, jnp.float32))
    flat = _flatten(variables["params"])

    converted = {}
    for tk, tv in state_dict.items():
        nk = _rename(tk)
        converted[nk] = np.asarray(tv)

    new_flat = {}
    for path, ref in flat.items():
        # path like 'encoder.down_blocks_0.resnets_0.conv1.kernel'
        leaf = path.rsplit(".", 1)
        torch_suffix = {"kernel": "__W", "bias": "__B", "scale": "__W"}[leaf[1]]
        tkey = f"{leaf[0]}.{torch_suffix}"
        if tkey not in converted:
            raise KeyError(f"Missing torch weight for {path} (looked for {tkey})")
        v = converted.pop(tkey)
        if leaf[1] == "kernel":
            v = _convert_tensor(tkey, v)
        if tuple(v.shape) != tuple(ref.shape):
            raise ValueError(f"Shape mismatch at {path}: torch {v.shape} vs "
                             f"flax {ref.shape}")
        new_flat[path] = jnp.asarray(v, dtype=ref.dtype)
    if converted:
        raise KeyError(f"Unconsumed torch weights: {sorted(converted)[:8]} ...")
    return {"params": _unflatten(new_flat)}


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
