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
    """Cast every fp32 array leaf to `dtype`; everything else unchanged."""
    def _cast(a):
        if isinstance(a, jnp.ndarray) and a.dtype == jnp.float32:
            return a.astype(dtype)
        return a
    return jax.tree_util.tree_map(_cast, tree)


def to_f32(tree):
    """Cast floating leaves back to fp32 (loss math / metric precision)."""
    def _cast(a):
        if isinstance(a, jnp.ndarray) and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(jnp.float32)
        return a
    return jax.tree_util.tree_map(_cast, tree)
