"""Earthformer-style cuboid-attention spatio-temporal backbone.

The reference planned an Earthformer integration but left 0-byte stubs
(reference pipeline/models/earthformer/{model.py,test.py}; README.md:111-127
names "Earthformer-class backbones" as the future direction, and
BASELINE.json config #5 pairs it with the advection-diffusion prior). This
module supplies that capability TPU-natively.

Design (faithful to the cuboid idea, shaped for XLA):
  * per-frame patch embedding -> (B, T, H', W', D) spatio-temporal tokens
  * stacks of cuboid attention blocks: full attention WITHIN local
    (T x wh x ww) cuboids, alternating aligned and shifted window tilings
    (the shift gives cross-cuboid information flow, Swin-style) — each block
    is a dense batched attention over fixed-size cuboids, which XLA fuses
    onto the MXU with zero dynamic shapes;
  * `global_tokens=G` enables Earthformer's signature GLOBAL VECTORS: every
    cuboid's keys/values are extended with G learned global tokens, and the
    globals cross-attend back over the full token field each block — global
    information flow without global attention cost;
  * `hierarchy=2` enables the hierarchical encoder-decoder: half the blocks
    run on a 2x2 patch-merged coarse grid at double width, expanded back and
    fused with a fine-scale skip (the paper's UNet-style cuboid stack);
  * learned horizon queries cross-attend per spatial site over the input
    time axis to emit T_out frames; transposed-conv unpatchify + sigmoid.

Pair with ops/pallas/stencil.advection_diffusion_prior for the physics-
regularized configuration.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import nchw_to_nhwc, nhwc_to_nchw
from .transformer import CrossAttention, SelfAttention


def _window_partition(x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """(B, T, H, W, D) -> (B*nH*nW, T*wh*ww, D) cuboid token groups."""
    b, t, h, w, d = x.shape
    x = x.reshape(b, t, h // wh, wh, w // ww, ww, d)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)  # B nH nW T wh ww D
    return x.reshape(b * (h // wh) * (w // ww), t * wh * ww, d)


def _window_merge(x: jnp.ndarray, b: int, t: int, h: int, w: int,
                  wh: int, ww: int) -> jnp.ndarray:
    d = x.shape[-1]
    x = x.reshape(b, h // wh, w // ww, t, wh, ww, d)
    x = x.transpose(0, 3, 1, 4, 2, 5, 6)
    return x.reshape(b, t, h, w, d)


class CuboidBlock(nn.Module):
    """Pre-LN cuboid attention + FFN; optional half-window shift.

    With global vectors (the signature Earthformer mechanism, its paper §3.2):
    every cuboid's keys/values are extended with G learned global tokens, and
    the globals in turn cross-attend over the FULL token field — long-range
    information flows through the globals in one block instead of needing
    log(HW) shifted layers."""

    dim: int
    num_heads: int
    window: Tuple[int, int] = (4, 4)
    shifted: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray = None):
        """x: (B, T, H, W, D); g: optional (B, G, D) global vectors.
        Returns x' (and g' when g is given)."""
        b, t, h, w, d = x.shape
        wh, ww = self.window
        sh, sw = (wh // 2, ww // 2) if self.shifted else (0, 0)

        res = x
        hdn = nn.LayerNorm()(x)
        if sh or sw:
            hdn = jnp.roll(hdn, (-sh, -sw), axis=(2, 3))
        tokens = _window_partition(hdn, wh, ww)
        if g is not None:
            # cuboids read the globals: KV = [cuboid tokens ; globals]
            n_win = tokens.shape[0] // b
            gn = nn.LayerNorm(name="g_norm")(g)
            gk = jnp.repeat(gn, n_win, axis=0)            # (B*nWin, G, D)
            kv = jnp.concatenate([tokens, gk], axis=1)
            tokens = CrossAttention(self.dim, self.dim, self.num_heads,
                                    name="attn")(tokens, kv)
        else:
            tokens = SelfAttention(self.dim, self.num_heads,
                                   name="attn")(tokens)
        hdn = _window_merge(tokens, b, t, h, w, wh, ww)
        if sh or sw:
            hdn = jnp.roll(hdn, (sh, sw), axis=(2, 3))
        x = res + hdn

        hdn = nn.LayerNorm()(x)
        hdn = nn.Dense(4 * self.dim)(hdn)
        hdn = nn.gelu(hdn)
        hdn = nn.Dense(self.dim)(hdn)
        x = x + hdn

        if g is None:
            return x
        # globals read the whole field, then mix (pre-LN + FFN)
        field = x.reshape(b, t * h * w, d)
        g = g + CrossAttention(self.dim, self.dim, self.num_heads,
                               name="g_attn")(nn.LayerNorm(name="g_norm2")(g),
                                              field)
        gf = nn.LayerNorm(name="g_norm3")(g)
        gf = nn.Dense(4 * self.dim, name="g_ffn1")(gf)
        gf = nn.gelu(gf)
        g = g + nn.Dense(self.dim, name="g_ffn2")(gf)
        return x, g


class PatchMerge(nn.Module):
    """2x2 spatial merge -> wider channels (hierarchical downsample)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, d = x.shape
        x = x.reshape(b, t, h // 2, 2, w // 2, 2, d)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h // 2, w // 2,
                                                     4 * d)
        return nn.Dense(self.out_dim, name="merge")(nn.LayerNorm()(x))


class PatchExpand(nn.Module):
    """2x upsample (depth-to-space) -> narrower channels."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, d = x.shape
        x = nn.Dense(4 * self.out_dim, name="expand")(nn.LayerNorm()(x))
        x = x.reshape(b, t, h, w, 2, 2, self.out_dim)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)
        return x.reshape(b, t, 2 * h, 2 * w, self.out_dim)


class Earthformer(nn.Module):
    """Cuboid-transformer nowcaster: (B, T_in, C, H, W) -> (B, T_out, C, H, W)."""

    t_in: int = 13
    t_out: int = 12
    in_channels: int = 1
    patch: int = 8
    dim: int = 128
    depth: int = 4
    num_heads: int = 4
    window: Tuple[int, int] = (4, 4)
    sigmoid_head: bool = True
    residual_out: bool = False  # predict deltas off the persistence frame
    hierarchy: int = 1          # 2 = hierarchical encoder-decoder: half the
    # blocks run on a 2x2-patch-merged coarse grid at 2x width, expanded back
    # and fused with a skip (Earthformer's hierarchical UNet structure)
    global_tokens: int = 0      # G>0 threads G learned global vectors through
    # every encoder cuboid block (Earthformer's signature mechanism)

    @nn.compact
    def __call__(self, frames: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        b, t, c, hh, wwd = frames.shape
        assert t == self.t_in
        # per-frame patch embedding
        x = frames.reshape(b * t, c, hh, wwd)
        x = nn.Conv(self.dim, (self.patch, self.patch), strides=self.patch,
                    padding="VALID", name="patch_embed")(nchw_to_nhwc(x))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, t, gh, gw, self.dim)
        x = x + self.param("st_pos", nn.initializers.normal(0.02),
                           (1, self.t_in, gh, gw, self.dim))

        g = None
        if self.global_tokens > 0:
            g = jnp.broadcast_to(
                self.param("global_init", nn.initializers.normal(0.02),
                           (1, self.global_tokens, self.dim)),
                (b, self.global_tokens, self.dim))

        def run(x, g, dim, heads, depth, window, prefix):
            for i in range(depth):
                blk = CuboidBlock(dim, heads, window, shifted=bool(i % 2),
                                  name=f"{prefix}{i}")
                if g is not None:
                    x, g = blk(x, g)
                else:
                    x = blk(x)
            return x, g

        if self.hierarchy <= 1:
            x, g = run(x, g, self.dim, self.num_heads, self.depth,
                       self.window, "cuboid_")
        else:
            d_fine = max(1, self.depth // 2)
            d_coarse = max(1, self.depth - d_fine)
            x, g = run(x, g, self.dim, self.num_heads, d_fine, self.window,
                       "cuboid_")
            skip = x
            x = PatchMerge(2 * self.dim, name="down")(x)
            g = (nn.Dense(2 * self.dim, name="g_down")(g)
                 if g is not None else None)
            cw = (min(self.window[0], x.shape[2]),
                  min(self.window[1], x.shape[3]))
            x, g = run(x, g, 2 * self.dim, 2 * self.num_heads, d_coarse, cw,
                       "coarse_")
            x = PatchExpand(self.dim, name="up")(x)
            x = nn.Dense(self.dim, name="fuse")(
                jnp.concatenate([x, skip], axis=-1))

        # horizon readout: per spatial site, T_out queries attend over T_in
        q = self.param("horizon_queries", nn.initializers.normal(0.02),
                       (1, self.t_out, 1, 1, self.dim))
        q = jnp.broadcast_to(q, (b, self.t_out, gh, gw, self.dim))
        qf = q.transpose(0, 2, 3, 1, 4).reshape(b * gh * gw, self.t_out, self.dim)
        kf = x.transpose(0, 2, 3, 1, 4).reshape(b * gh * gw, self.t_in, self.dim)
        out = CrossAttention(self.dim, self.dim, self.num_heads,
                             name="readout")(qf, kf)
        out = out.reshape(b, gh, gw, self.t_out, self.dim
                          ).transpose(0, 3, 1, 2, 4)

        # refine the emitted frames with two more cuboid blocks
        for i in range(2):
            out = CuboidBlock(self.dim, self.num_heads, self.window,
                              shifted=bool(i % 2), name=f"dec_cuboid_{i}")(out)

        # unpatchify per frame
        y = out.reshape(b * self.t_out, gh, gw, self.dim)
        kinit = (nn.initializers.zeros if self.residual_out
                 else nn.linear.default_kernel_init)
        y = nn.ConvTranspose(self.in_channels, (self.patch, self.patch),
                             strides=(self.patch, self.patch), padding="VALID",
                             kernel_init=kinit, name="unpatch")(y)
        y = nhwc_to_nchw(y).reshape(b, self.t_out, self.in_channels, hh, wwd)
        if self.residual_out:
            # persistence-anchored deltas (zero-init head => the model starts
            # EXACTLY at the persistence baseline and learns corrections) —
            # the same anchoring trick the Path-B latents use (rollout.py:76).
            # sigmoid_head keeps its meaning: True clamps to the VIL range
            # (clip, since the anchor is already in [0,1]); False returns the
            # raw anchored output for unbounded-loss training.
            out = frames[:, -1:] + y
            return jnp.clip(out, 0.0, 1.0) if self.sigmoid_head else out
        return nn.sigmoid(y) if self.sigmoid_head else y
