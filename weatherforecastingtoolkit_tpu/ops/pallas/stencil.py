"""Advection–diffusion physics-prior stencil (Pallas TPU kernel).

The reference's README names an advection–diffusion regularizer as the planned
physics prior (reference README.md:111-127); AlphaPre's spec_mask is its
first spectral step. This module provides the finite-difference version as a
training regularizer:

    r = d x/dt + u * dx/dw + v * dx/dh - kappa * laplacian(x)
    loss = mean(r^2)

over a predicted sequence x: (B, T, C, H, W) with learned or fixed advection
velocities (u, v) and diffusivity kappa.

Why Pallas here (and not for convs/attention): this is pure memory-bound
stencil work — 2 frame reads, 1 scalar partial-sum write. A hand kernel fuses
the temporal difference, both first-order central differences, the 5-point
laplacian, and the squared-residual reduction into ONE VMEM pass per frame
pair, instead of XLA materializing the shifted intermediates in HBM. A full
128x128 fp32 frame pair is 128 KB — comfortably VMEM-resident.

A pure-XLA implementation (`advection_diffusion_residual_xla`) is the
reference semantics; the Pallas path is tested against it (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interior_residual(x0, x1, u, v, kappa):
    """Residual on the interior of a single (H, W) frame pair."""
    dt = x1 - x0
    # central differences / laplacian on x0's interior
    c = x0[1:-1, 1:-1]
    dh = (x0[2:, 1:-1] - x0[:-2, 1:-1]) * 0.5
    dw = (x0[1:-1, 2:] - x0[1:-1, :-2]) * 0.5
    lap = (x0[2:, 1:-1] + x0[:-2, 1:-1] + x0[1:-1, 2:] + x0[1:-1, :-2]
           - 4.0 * c)
    return dt[1:-1, 1:-1] + u * dw + v * dh - kappa * lap


def advection_diffusion_residual_xla(x: jnp.ndarray, u, v, kappa) -> jnp.ndarray:
    """Reference semantics: x (..., T, H, W) -> mean squared residual."""
    x0 = x[..., :-1, :, :]
    x1 = x[..., 1:, :, :]
    dt = x1 - x0
    c = x0[..., 1:-1, 1:-1]
    dh = (x0[..., 2:, 1:-1] - x0[..., :-2, 1:-1]) * 0.5
    dw = (x0[..., 1:-1, 2:] - x0[..., 1:-1, :-2]) * 0.5
    lap = (x0[..., 2:, 1:-1] + x0[..., :-2, 1:-1] + x0[..., 1:-1, 2:]
           + x0[..., 1:-1, :-2] - 4.0 * c)
    r = dt[..., 1:-1, 1:-1] + u * dw + v * dh - kappa * lap
    return jnp.mean(r * r)


def _stencil_kernel(params_ref, x0_ref, x1_ref, out_ref):
    u = params_ref[0]
    v = params_ref[1]
    kappa = params_ref[2]
    x0 = x0_ref[0]
    x1 = x1_ref[0]
    r = _interior_residual(x0, x1, u, v, kappa)
    s = jnp.sum(r * r)
    # TPU grid steps run sequentially on one core; accumulate the scalar
    # partial sums into ONE SMEM cell (a (1, 1) block can't be a per-step
    # output row — Mosaic requires the last two block dims be (8, 128)-tiled
    # or equal to the full array's)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = s

    @pl.when(i > 0)
    def _acc():
        out_ref[0, 0] += s


def advection_diffusion_loss(x: jnp.ndarray, u, v, kappa,
                             use_pallas: bool = True,
                             interpret: bool = False) -> jnp.ndarray:
    """Mean squared advection-diffusion residual over (B, T, C, H, W).

    use_pallas=False falls back to the XLA implementation (used off-TPU and
    in the custom-VJP backward, where XLA's fusion is already optimal for the
    gradient stencils).
    """
    b, t, c, h, w = x.shape
    if t < 2:
        raise ValueError("need at least 2 frames for a temporal difference")
    if use_pallas and not interpret and jax.default_backend() == "cpu":
        # compiled Pallas is TPU-only; on CPU the fused-XLA path is both
        # supported and faster than interpret mode
        use_pallas = False
    if not use_pallas:
        return advection_diffusion_residual_xla(
            x.transpose(0, 2, 1, 3, 4).reshape(b * c, t, h, w), u, v, kappa)

    frames = x.transpose(0, 2, 1, 3, 4).reshape(b * c, t, h, w)
    x0 = frames[:, :-1].reshape(-1, h, w)
    x1 = frames[:, 1:].reshape(-1, h, w)
    n = x0.shape[0]
    params = jnp.stack([jnp.asarray(u, jnp.float32),
                        jnp.asarray(v, jnp.float32),
                        jnp.asarray(kappa, jnp.float32)])

    total = pl.pallas_call(
        _stencil_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(params, x0, x1)
    denom = n * (h - 2) * (w - 2)
    return total[0, 0] / denom


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def advection_diffusion_prior(x, u, v, kappa, interpret=False):
    """Differentiable physics prior: Pallas forward, XLA backward.

    The backward stencils (adjoint of the 5-point laplacian etc.) are plain
    elementwise shifts that XLA fuses well; only the forward runs the hand
    kernel. Gradients flow to x, u, v, and kappa.
    """
    return advection_diffusion_loss(x, u, v, kappa, use_pallas=True,
                                    interpret=interpret)


def _prior_fwd(x, u, v, kappa, interpret=False):
    out = advection_diffusion_loss(x, u, v, kappa, use_pallas=True,
                                   interpret=interpret)
    return out, (x, u, v, kappa)


def _prior_bwd(interpret, res, g):
    x, u, v, kappa = res

    def f(x_, u_, v_, k_):
        b, t, c, h, w = x_.shape
        return advection_diffusion_residual_xla(
            x_.transpose(0, 2, 1, 3, 4).reshape(b * c, t, h, w), u_, v_, k_)

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, u, v, kappa)
    return tuple(jax.tree_util.tree_map(lambda gr: gr * g, grads))


advection_diffusion_prior.defvjp(_prior_fwd, _prior_bwd)
