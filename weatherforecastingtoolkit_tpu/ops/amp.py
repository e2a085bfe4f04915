"""bf16 mixed-precision training helpers (fp32 master params, bf16 compute).

The standard TPU training recipe: optimizer state and master params stay
fp32; the network's forward/backward runs in bf16 (MXU-native, half the HBM
traffic); loss math runs fp32. bf16 shares fp32's exponent range, so unlike
fp16 there is NO loss scaling — the cast is a plain differentiable convert
and gradients flow back to the fp32 masters through it.

Usage: tasks cast params + inputs with `cast_floats` right before
`model.apply` and cast network outputs back to fp32 before computing the
loss (`reconstruction_task(mixed_precision=True)`,
`make_vae_gan_task(mixed_precision=True)`). The reference trains fp32-only
(torch Lightning defaults); this is TPU-native capability beyond it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype=jnp.bfloat16):
    """Cast every fp32 array leaf to `dtype`; everything else unchanged.

    Matches on dtype, not array class, so host numpy leaves (orbax restores,
    un-prefetched batches) are cast too — not just jax Arrays/tracers."""
    def _cast(a):
        if getattr(a, "dtype", None) == jnp.float32:
            return jnp.asarray(a, dtype)
        return a
    return jax.tree_util.tree_map(_cast, tree)


def to_f32(tree):
    """Cast floating leaves back to fp32 (loss math / metric precision)."""
    def _cast(a):
        dt = getattr(a, "dtype", None)
        if dt is not None and jnp.issubdtype(dt, jnp.floating):
            return jnp.asarray(a, jnp.float32)
        return a
    return jax.tree_util.tree_map(_cast, tree)


def mixed_loss(loss_fn):
    """Wrap a Task loss_fn(params, batch, rng, step) for bf16 compute.

    Generic recipe for custom experiment losses: params and batch are cast
    to bf16 (fp32 masters stay outside), the loss/aux come back fp32. The
    loss REDUCTION itself runs in the dtype the wrapped fn produces — tasks
    wanting fp32 reductions over bf16 activations should cast explicitly
    (see reconstruction_task / make_vae_gan_task for that finer pattern)."""
    def wrapped(params, batch, rng, step):
        loss, aux = loss_fn(cast_floats(params), cast_floats(batch), rng, step)
        return jnp.asarray(loss, jnp.float32), to_f32(aux)
    return wrapped
