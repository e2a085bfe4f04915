"""Fully-sharded data parallelism (ZeRO-3 style) via GSPMD shardings.

Beyond-reference scaling capability (the reference's only parallelism is
DDP-style replication, SURVEY §2.5): instead of replicating parameters and
optimizer state on every device, shard every large leaf over the 'dp' mesh
axis and let XLA's GSPMD partitioner insert the collectives — all-gather of
each weight right before use, reduce-scatter of its gradient, and a fully
sharded optimizer update. This is the TPU-native equivalent of ZeRO-3 /
torch FSDP: no wrapper modules, no hooks, no hand-written communication —
the sharding annotations on the *state* are the entire implementation.

Memory per device for params + optimizer state drops ~Nx on an N-device
axis (measured by `shard_fraction`), which is what lets a model whose
replicated state exceeds one chip's HBM train on a slice.

Usage:
    mesh = make_mesh(("dp",))
    trainer = Trainer(cfg, task, mesh=mesh)   # cfg.trainer.fsdp: true
    # or directly:
    state = shard_train_state(state, mesh)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated: sharding tiny biases/scales buys
# nothing and costs an all-gather dispatch each.
MIN_SHARD_ELEMS = 4096


def fsdp_spec(shape, axis_size: int, axis: str = "dp",
              min_shard_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec sharding the largest axis-size-divisible dim of `shape`
    over `axis`; replicated when the leaf is small or nothing divides.

    Ties prefer the LAST divisible dim — for conv kernels (kh, kw, cin, cout)
    that is the output-feature axis, which keeps the all-gathered operand
    layout contiguous in the lane dimension.
    """
    if not shape or int(np.prod(shape)) < min_shard_elems:
        return P()
    best = None
    for d, n in enumerate(shape):
        if n % axis_size == 0 and (best is None or n >= shape[best]):
            best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_sharding(leaf, mesh: Mesh, axis: str = "dp",
                  min_shard_elems: int = MIN_SHARD_ELEMS) -> NamedSharding:
    shape = getattr(leaf, "shape", ())
    size = mesh.shape[axis]
    return NamedSharding(mesh, fsdp_spec(shape, size, axis, min_shard_elems))


def shard_tree(tree: Any, mesh: Mesh, axis: str = "dp",
               min_shard_elems: int = MIN_SHARD_ELEMS) -> Any:
    """device_put every leaf with its shape-derived FSDP sharding.

    The rule is purely shape-based, so it applies uniformly to params AND to
    optimizer state (adam's mu/nu mirror the param shapes and land on the
    same shards; scalar counts replicate).
    """
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, fsdp_sharding(leaf, mesh, axis, min_shard_elems)), tree)


def shard_train_state(state, mesh: Mesh, axis: str = "dp",
                      min_shard_elems: int = MIN_SHARD_ELEMS):
    """Shard a TrainState for fully-sharded training: params, opt_state and
    extra (e.g. a GAN discriminator's params + moments) sharded over `axis`;
    step counter and rng replicated."""
    rep = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
        params=shard_tree(state.params, mesh, axis, min_shard_elems),
        opt_state=shard_tree(state.opt_state, mesh, axis, min_shard_elems),
        extra=(None if state.extra is None
               else shard_tree(state.extra, mesh, axis, min_shard_elems)),
    )


def init_sharded(init_fn, rng, mesh: Mesh, axis: str = "dp",
                 min_shard_elems: int = MIN_SHARD_ELEMS):
    """Run `init_fn(rng)` jitted with FSDP out_shardings, so every leaf is
    CREATED already sharded — the full replicated state never materializes
    on any single device (which is the regime FSDP exists for: replicated
    params + optimizer moments exceeding one chip's HBM)."""
    abstract = jax.eval_shape(init_fn, rng)
    shardings = jax.tree_util.tree_map(
        lambda a: fsdp_sharding(a, mesh, axis, min_shard_elems), abstract)
    return jax.jit(init_fn, out_shardings=shardings)(rng)


def shard_fraction(tree: Any) -> float:
    """Bytes of `tree` resident on the first device / total bytes — the
    memory-saving evidence (1.0 when replicated, ~1/N when fully sharded)."""
    dev0 = None
    local = total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        total += leaf.nbytes
        for s in leaf.addressable_shards:
            if dev0 is None:
                dev0 = s.device
            if s.device == dev0:
                local += s.data.nbytes
    return local / total if total else 1.0
