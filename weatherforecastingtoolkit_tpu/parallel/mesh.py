"""Device mesh + sharding helpers (the framework's parallelism layer).

The reference's only real parallelism is data parallelism (shard-aware data
loading + Lightning `strategy="auto"` + `sync_dist=True`; SURVEY §2.5). Here
that maps to:

  * a 1-D ('dp',) Mesh over all devices — single- or multi-host (ICI within a
    slice, DCN across hosts via jax.distributed);
  * batches sharded over 'dp' with NamedSharding, params replicated;
  * gradients all-reduced by XLA automatically inside the jitted step, and
    metric reductions likewise — no hand-written collectives needed.

A 2-D ('dp', 'mp') mesh is also provided: the flat-bottleneck AEs have
2048x4096 dense layers whose weights shard naturally over 'mp' (tensor
parallelism over ICI) — used by the multichip dryrun and available for large
configs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("dp",), shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axes))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'dp'; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, dp_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def mp_dense_spec(mesh: Mesh, axis: str = "mp") -> P:
    """PartitionSpec for a (in, out) dense kernel sharded over its output
    features — the natural TP layout for the bottleneck linears."""
    return P(None, axis)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialization. No-op when single-process."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
