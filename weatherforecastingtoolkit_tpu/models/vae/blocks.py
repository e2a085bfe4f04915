"""Diffusers-style VAE building blocks (flax.linen, NHWC).

Capability parity with the reference's block set:
  * ResnetBlock2D        — reference autoencoderkl/resnet.py:367-497
    (GroupNorm(32, eps 1e-6) + SiLU + 3x3 conv x2, 1x1 shortcut on channel change)
  * Downsample2D         — resnet.py:123-192 (stride-2 conv, asymmetric (0,1)
    padding when downsample_padding=0, as the VAE Encoder configures it)
  * Upsample2D           — resnet.py:77-121 (2x nearest + 3x3 conv)
  * AttentionBlock       — attention.py:48-189 (GN(32, eps 1e-5), q/k/v linear,
    single-head default, residual; fused jax.nn.dot_product_attention replaces
    the reference's baddbmm + xformers branches)
  * DownEncoderBlock2D / UpDecoderBlock2D / UNetMidBlock2D
                         — unet_2d_blocks.py:20-278

All blocks are time-embedding-free (the VAE never passes temb; reference
vae.py:47,117 sets temb_channels=None).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.quant import QConv


class GroupNormSiLU(nn.Module):
    """GroupNorm followed by SiLU; optionally the fused Pallas kernel.

    Parameter names ('scale', 'bias') match nn.GroupNorm exactly so fused and
    unfused variants share checkpoints.
    """

    num_groups: int
    epsilon: float = 1e-6
    fused: bool = False
    silu: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.fused:
            from ...ops.pallas.groupnorm import fused_group_norm_silu

            return fused_group_norm_silu(x, scale, bias, self.num_groups,
                                         self.epsilon, self.silu)
        from ...ops.pallas.groupnorm import _gn_silu_reference

        return _gn_silu_reference(x, scale, bias, self.num_groups,
                                  self.epsilon, self.silu)


class ResnetBlock2D(nn.Module):
    out_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    output_scale_factor: float = 1.0
    fused_norm: bool = False
    conv_mode: str = "native"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = GroupNormSiLU(min(self.groups, in_ch), self.eps,
                          fused=self.fused_norm, name="norm1")(x)
        h = QConv(out_ch, (3, 3), padding=1, mode=self.conv_mode,
                  name="conv1")(h)
        h = GroupNormSiLU(min(self.groups, out_ch), self.eps,
                          fused=self.fused_norm, name="norm2")(h)
        h = QConv(out_ch, (3, 3), padding=1, mode=self.conv_mode,
                  name="conv2")(h)
        if in_ch != out_ch:
            x = QConv(out_ch, (1, 1), mode=self.conv_mode,
                      name="conv_shortcut")(x)
        return (x + h) / self.output_scale_factor


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv with the VAE's asymmetric (0, 1) edge padding."""

    out_channels: Optional[int] = None
    conv_mode: str = "native"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.out_channels or x.shape[-1]
        # the reference's (0, 1) edge pad, expressed as conv padding so XLA
        # never materializes a padded copy of the full-res tensor
        return QConv(out_ch, (3, 3), strides=2, padding=((0, 1), (0, 1)),
                     mode=self.conv_mode, name="conv")(x)


class Upsample2D(nn.Module):
    """2x nearest-neighbor upsample + 3x3 conv."""

    out_channels: Optional[int] = None
    conv_mode: str = "native"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.out_channels or x.shape[-1]
        b, h, w, c = x.shape
        # nearest-neighbor 2x via broadcast+reshape: identical values to
        # jax.image.resize(method='nearest') but lowers to a copy-free
        # broadcast instead of a gather
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
                             ).reshape(b, 2 * h, 2 * w, c)
        return QConv(out_ch, (3, 3), padding=1, mode=self.conv_mode,
                     name="conv")(x)


class Downsample4x(nn.Module):
    """Two stacked stride-2 downsamples (4x total) — reference
    custom_akl.py:170-206 Downsample4x2D (torch keys down1.conv/down2.conv)."""

    out_channels: Optional[int] = None
    conv_mode: str = "native"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Downsample2D(self.out_channels, self.conv_mode, name="down1")(x)
        return Downsample2D(self.out_channels, self.conv_mode, name="down2")(x)


class Upsample4x(nn.Module):
    """Two stacked 2x nearest+conv upsamples (4x total) — reference
    custom_akl.py:131-168 Upsample4x2D (torch keys up1.conv/up2.conv)."""

    out_channels: Optional[int] = None
    conv_mode: str = "native"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Upsample2D(self.out_channels, self.conv_mode, name="up1")(x)
        return Upsample2D(self.out_channels, self.conv_mode, name="up2")(x)


class AttentionBlock(nn.Module):
    """Spatial self-attention over the HxW grid with a residual connection."""

    num_head_channels: Optional[int] = None
    norm_num_groups: int = 32
    eps: float = 1e-5
    rescale_output_factor: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        heads = c // self.num_head_channels if self.num_head_channels else 1
        residual = x
        hidden = nn.GroupNorm(num_groups=min(self.norm_num_groups, c),
                              epsilon=self.eps, name="group_norm")(x)
        tokens = hidden.reshape(b, h * w, c)
        q = nn.Dense(c, name="query")(tokens)
        k = nn.Dense(c, name="key")(tokens)
        v = nn.Dense(c, name="value")(tokens)
        hd = c // heads

        def split(t):
            return t.reshape(b, h * w, heads, hd)

        out = jax.nn.dot_product_attention(split(q), split(k), split(v))
        out = out.reshape(b, h * w, c)
        out = nn.Dense(c, name="proj_attn")(out)
        out = out.reshape(b, h, w, c)
        return (out + residual) / self.rescale_output_factor


def _fir_kernel_2d(kernel=(1, 3, 3, 1)) -> jnp.ndarray:
    k = jnp.asarray(kernel, dtype=jnp.float32)
    k2 = jnp.outer(k, k)
    return k2 / jnp.sum(k2)


def fir_upsample_2d(x: jnp.ndarray, kernel=(1, 3, 3, 1), factor: int = 2
                    ) -> jnp.ndarray:
    """FIR-filtered 2x upsample (the reference's StyleGAN-style
    upsample_2d/upfirdn2d path, resnet.py:193-366,638+). NHWC."""
    b, h, w, c = x.shape
    k = _fir_kernel_2d(kernel) * (factor ** 2)
    # zero-stuff then depthwise-convolve with the FIR kernel
    up = jnp.zeros((b, h, factor, w, factor, c), x.dtype)
    up = up.at[:, :, 0, :, 0, :].set(x)
    up = up.reshape(b, h * factor, w * factor, c)
    kh = k.shape[0]
    pad = ((kh - factor + 1) // 2 + factor - 1, (kh - factor) // 2)
    kern = jnp.broadcast_to(k.reshape(1, 1, kh, kh), (c, 1, kh, kh))
    dn = jax.lax.conv_dimension_numbers(
        (b, c, 1, 1), (c, 1, kh, kh), ("NHWC", "OIHW", "NHWC"))
    return jax.lax.conv_general_dilated(
        up, kern.astype(x.dtype), (1, 1), [pad, pad], dimension_numbers=dn,
        feature_group_count=c)


def fir_downsample_2d(x: jnp.ndarray, kernel=(1, 3, 3, 1), factor: int = 2
                      ) -> jnp.ndarray:
    """FIR-filtered 2x downsample (reference resnet.py downsample_2d). NHWC."""
    b, h, w, c = x.shape
    k = _fir_kernel_2d(kernel)
    kh = k.shape[0]
    pad = ((kh - factor + 1) // 2, (kh - factor) // 2)
    kern = jnp.broadcast_to(k.reshape(1, 1, kh, kh), (c, 1, kh, kh))
    dn = jax.lax.conv_dimension_numbers(
        (b, c, 1, 1), (c, 1, kh, kh), ("NHWC", "OIHW", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (factor, factor), [pad, pad],
        dimension_numbers=dn, feature_group_count=c)


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 1
    resnet_groups: int = 32
    resnet_eps: float = 1e-6
    add_downsample: bool = True
    fused_norm: bool = False
    scale: int = 2  # 2 -> Downsample2D, 4 -> Downsample4x (custom_akl.py:713-733)
    conv_mode: str = "native"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, self.resnet_groups,
                              self.resnet_eps, fused_norm=self.fused_norm,
                              conv_mode=self.conv_mode,
                              name=f"resnets_{i}")(x)
        if self.add_downsample:
            if self.scale == 4:
                x = Downsample4x(self.out_channels, self.conv_mode,
                                 name="downsamplers_0")(x)
            else:
                x = Downsample2D(self.out_channels, self.conv_mode,
                                 name="downsamplers_0")(x)
        return x


class UpDecoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 1
    resnet_groups: int = 32
    resnet_eps: float = 1e-6
    add_upsample: bool = True
    fused_norm: bool = False
    scale: int = 2  # 2 -> Upsample2D, 4 -> Upsample4x (custom_akl.py:783-791)
    conv_mode: str = "native"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, self.resnet_groups,
                              self.resnet_eps, fused_norm=self.fused_norm,
                              conv_mode=self.conv_mode,
                              name=f"resnets_{i}")(x)
        if self.add_upsample:
            if self.scale == 4:
                x = Upsample4x(self.out_channels, self.conv_mode,
                               name="upsamplers_0")(x)
            else:
                x = Upsample2D(self.out_channels, self.conv_mode,
                               name="upsamplers_0")(x)
        return x


class UNetMidBlock2D(nn.Module):
    resnet_groups: int = 32
    resnet_eps: float = 1e-6
    attn_num_head_channels: Optional[int] = None
    output_scale_factor: float = 1.0
    num_layers: int = 1
    fused_norm: bool = False
    conv_mode: str = "native"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[-1]
        x = ResnetBlock2D(ch, self.resnet_groups, self.resnet_eps,
                          self.output_scale_factor,
                          fused_norm=self.fused_norm,
                          conv_mode=self.conv_mode, name="resnets_0")(x)
        for i in range(self.num_layers):
            x = AttentionBlock(self.attn_num_head_channels, self.resnet_groups,
                               rescale_output_factor=self.output_scale_factor,
                               name=f"attentions_{i}")(x)
            x = ResnetBlock2D(ch, self.resnet_groups, self.resnet_eps,
                              self.output_scale_factor,
                              fused_norm=self.fused_norm,
                              conv_mode=self.conv_mode,
                              name=f"resnets_{i + 1}")(x)
        return x
