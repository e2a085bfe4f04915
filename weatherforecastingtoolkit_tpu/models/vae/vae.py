"""VAE Encoder / Decoder stacks (reference autoencoderkl/vae.py:9-166).

`scales` (per-block 2 or 4) selects the stacked 4x resamplers of the
custom_akl fork (reference custom_akl.py:810-945 `scales` lists wired into
get_down_block/get_up_block `scale=`); None means all-2x (the shipped
reference default)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.quant import QConv
from .blocks import (DownEncoderBlock2D, GroupNormSiLU, UNetMidBlock2D,
                     UpDecoderBlock2D)


class Encoder(nn.Module):
    """conv_in -> N DownEncoderBlocks -> mid (resnet/attn/resnet) ->
    GroupNorm/SiLU/conv_out. NHWC; emits 2*out_channels when double_z."""

    out_channels: int = 3
    block_out_channels: Sequence[int] = (64,)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    double_z: bool = True
    fused_norm: bool = False
    scales: Optional[Sequence[int]] = None  # per-block downsample factor
    conv_mode: str = "native"  # "int8" = quantized serving (ops/quant.py)
    remat: bool = False  # jax.checkpoint each block (training memory knob)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        down_cls = (nn.remat(DownEncoderBlock2D) if self.remat
                    else DownEncoderBlock2D)
        mid_cls = nn.remat(UNetMidBlock2D) if self.remat else UNetMidBlock2D
        x = QConv(self.block_out_channels[0], (3, 3), padding=1,
                  mode=self.conv_mode, name="conv_in")(x)
        n = len(self.block_out_channels)
        scales = self.scales or (2,) * n
        for i, ch in enumerate(self.block_out_channels):
            x = down_cls(
                out_channels=ch, num_layers=self.layers_per_block,
                resnet_groups=self.norm_num_groups,
                add_downsample=(i != n - 1), fused_norm=self.fused_norm,
                scale=scales[i] if i < len(scales) else 2,
                conv_mode=self.conv_mode,
                name=f"down_blocks_{i}")(x)
        x = mid_cls(resnet_groups=self.norm_num_groups,
                    fused_norm=self.fused_norm,
                    conv_mode=self.conv_mode, name="mid_block")(x)
        x = GroupNormSiLU(self.norm_num_groups, 1e-6, fused=self.fused_norm,
                          name="conv_norm_out")(x)
        out_ch = 2 * self.out_channels if self.double_z else self.out_channels
        return QConv(out_ch, (3, 3), padding=1, mode=self.conv_mode,
                     name="conv_out")(x)


class Decoder(nn.Module):
    """conv_in -> mid -> N UpDecoderBlocks (reversed channels) ->
    GroupNorm/SiLU/conv_out."""

    out_channels: int = 3
    block_out_channels: Sequence[int] = (64,)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    fused_norm: bool = False
    scales: Optional[Sequence[int]] = None  # per-block upsample factor
    conv_mode: str = "native"  # "int8" = quantized serving (ops/quant.py)
    remat: bool = False  # jax.checkpoint each block (training memory knob)

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        up_cls = (nn.remat(UpDecoderBlock2D) if self.remat
                  else UpDecoderBlock2D)
        mid_cls = nn.remat(UNetMidBlock2D) if self.remat else UNetMidBlock2D
        rev: Tuple[int, ...] = tuple(reversed(self.block_out_channels))
        x = QConv(rev[0], (3, 3), padding=1, mode=self.conv_mode,
                  name="conv_in")(z)
        x = mid_cls(resnet_groups=self.norm_num_groups,
                    fused_norm=self.fused_norm,
                    conv_mode=self.conv_mode, name="mid_block")(x)
        n = len(rev)
        scales = self.scales or (2,) * n
        for i, ch in enumerate(rev):
            x = up_cls(
                out_channels=ch, num_layers=self.layers_per_block + 1,
                resnet_groups=self.norm_num_groups,
                add_upsample=(i != n - 1), fused_norm=self.fused_norm,
                scale=scales[i] if i < len(scales) else 2,
                conv_mode=self.conv_mode,
                name=f"up_blocks_{i}")(x)
        x = GroupNormSiLU(self.norm_num_groups, 1e-6, fused=self.fused_norm,
                          name="conv_norm_out")(x)
        return QConv(self.out_channels, (3, 3), padding=1,
                     mode=self.conv_mode, name="conv_out")(x)
