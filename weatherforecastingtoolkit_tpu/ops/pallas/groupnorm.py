"""Fused GroupNorm(+SiLU) Pallas kernel.

Profile-guided: a device trace of the rollout benchmark attributes ~30% of
step time to XLA's convert+reduce GroupNorm fusions in the VAE decoder
(RESULTS.md). Each XLA GN is several HBM passes (moments reduce, normalize,
activation); this kernel does ONE VMEM pass per frame: load the (H, W, C)
activation block, compute per-group mean/variance, normalize, affine, SiLU,
store. A 128x128x64 bf16 frame is 2 MB — comfortably VMEM-resident.

Forward runs the kernel; backward is the standard GN gradient in XLA (the
backward is matmul-free elementwise work XLA already fuses well, and training
steps are compile-once anyway). Used by the VAE blocks behind
`fused_norm=True`; numerics match flax GroupNorm to fp32 tolerance
(tested in interpret mode on CPU and compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, out_ref, *, groups: int,
                    eps: float, silu: bool):
    x = x_ref[0].astype(jnp.float32)          # (H, W, C)
    h, w, c = x.shape
    gs = c // groups
    x2d = x.reshape(h * w, c)                 # collapse leading dims only
    # Mosaic can't reshape the lane (channel) axis; do the per-group
    # reductions as tiny matmuls with a one-hot (C, G) group map instead.
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // gs
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    gmap = (ch == grp).astype(jnp.float32)    # (C, G) one-hot
    s = jnp.sum(x2d, axis=0, keepdims=True)           # (1, C)
    ss = jnp.sum(x2d * x2d, axis=0, keepdims=True)    # (1, C)
    n_per_group = h * w * gs
    sum_g = jnp.dot(s, gmap, preferred_element_type=jnp.float32)
    ssq_g = jnp.dot(ss, gmap, preferred_element_type=jnp.float32)
    mean_g = sum_g / n_per_group
    var_g = ssq_g / n_per_group - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(mean_g, gmap.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, gmap.T, preferred_element_type=jnp.float32)
    y = (x2d - mean_c) * inv_c
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.reshape(h, w, c).astype(out_ref.dtype)


def _gn_silu_forward(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     groups: int, eps: float, silu: bool,
                     interpret: bool) -> jnp.ndarray:
    n, h, w, c = x.shape
    kernel = functools.partial(_gn_silu_kernel, groups=groups, eps=eps,
                               silu=silu)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale, bias)


def _gn_silu_reference(x, scale, bias, groups, eps, silu):
    """XLA reference semantics (also the CPU fallback and VJP recompute).

    The whole chain — moments, normalize, affine, SiLU — runs in fp32 with a
    single cast back to the activation dtype at the end. A bf16-elementwise
    variant (folded per-channel mul/add applied in bf16) was measured: it
    bought only ~1% rollout throughput (XLA fuses the converts into the
    surrounding conv epilogues anyway) but the extra per-layer roundings
    dropped the bench's bf16-vs-fp32 SSIM gate below 0.995 — a bad trade, so
    fp32 elementwise is the keeper.
    """
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xn = ((xf - mean) * inv).reshape(n, h, w, c)
    y = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm_silu(x, scale, bias, groups: int = 32, eps: float = 1e-6,
                          silu: bool = True, interpret: bool = False):
    """GroupNorm + optional SiLU over NHWC activations in one VMEM pass.

    x: (N, H, W, C); scale/bias: (C,). Falls back to the fused-XLA reference
    off-TPU. Differentiable (backward recomputes via the XLA reference —
    cheap elementwise work, and forward stays single-pass).
    """
    if jax.default_backend() == "cpu" and not interpret:
        return _gn_silu_reference(x, scale, bias, groups, eps, silu)
    # one frame must fit in VMEM with fp32 working copies (~4 live buffers
    # incl. pipeline double-buffering); oversized layers use the XLA path
    frame_bytes = int(np.prod(x.shape[1:])) * 4
    if frame_bytes * 4 > 14 * 1024 * 1024:
        return _gn_silu_reference(x, scale, bias, groups, eps, silu)
    return _gn_silu_forward(x, scale, bias, groups, eps, silu, interpret)


def _fwd(x, scale, bias, groups, eps, silu, interpret):
    y = fused_group_norm_silu(x, scale, bias, groups, eps, silu, interpret)
    return y, (x, scale, bias)


def _bwd(groups, eps, silu, interpret, res, g):
    x, scale, bias = res

    def f(x_, s_, b_):
        return _gn_silu_reference(x_, s_, b_, groups, eps, silu
                                  ).astype(jnp.float32)

    _, vjp = jax.vjp(f, x, scale, bias)
    return vjp(g.astype(jnp.float32))


fused_group_norm_silu.defvjp(_fwd, _bwd)
