"""Data-parallel batch inference for jitted pipelines (serving scale-out).

The rollout pipeline (models/rollout.py) is embarrassingly parallel over the
batch axis: every sample's encode -> forecast -> decode chain is independent.
Scaling it over a chip pod is therefore pure dp sharding — params replicated,
batch split over 'dp', zero collectives in the program. XLA partitions the
convs/matmuls per shard and each chip runs the identical single-chip program
on its slice; throughput scales linearly with chips until the per-chip batch
drops below the MXU-saturating size (bench.py's sweep: ~32+ frames per chip).

Reference capability parity: the reference serves its Path-B chain on a single
GPU in a python loop (reference experiments/ae_s2/train.py:29-51); this module
is the corresponding production path, designed mesh-first.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import dp_sharding, replicated


def make_dp_serving_fn(pipeline: Callable, mesh: Mesh,
                       params=None) -> Callable:
    """Wrap pipeline(params, frames) for dp-sharded batch serving.

    Returns serve(frames, params=None) -> np.ndarray predictions, where
    frames (B, T, C, H, W) is host data. Handles batches not divisible by the
    dp size by padding with the last sample and stripping the padding after.
    The jitted program is compiled once per (padded) batch shape.
    """
    dp = mesh.devices.size
    rep = replicated(mesh)
    shard = dp_sharding(mesh)
    fixed_params = jax.device_put(params, rep) if params is not None else None

    jitted = jax.jit(pipeline, in_shardings=(rep, shard),
                     out_shardings=shard)

    def serve(frames, params=None):
        p = (jax.device_put(params, rep) if params is not None
             else fixed_params)
        if p is None:
            raise ValueError("params must be given at build or call time")
        b = frames.shape[0]
        pad = (-b) % dp
        if pad:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], pad, axis=0)], axis=0)
        out = jitted(p, jax.device_put(jnp.asarray(frames), shard))
        return np.asarray(out)[:b]

    return serve


def make_member_parallel_ensemble(*, mesh: Mesh, n_members: int,
                                  **ensemble_kw) -> Callable:
    """Ensemble members sharded across the mesh (probabilistic serving).

    Ensemble rollouts (models/rollout.py::make_ensemble_pipeline) are
    embarrassingly parallel over the MEMBER axis: each member's
    perturb -> forecast -> decode chain is independent. This builds a
    per-shard ensemble of n_members/n_devices members and fans it out with
    params/frames replicated and the member axis split over the mesh —
    an N-member probabilistic forecast at ~single-member latency, with
    zero collectives in the program.

    Takes the same keyword args as make_ensemble_pipeline (minus n_members,
    passed separately; n_members must divide evenly by the mesh size).
    Returns ensemble(fc_params, frames, key, noise_std) ->
    (B, n_members, T_out, C, H, W) sharded P(None, 'dp') on the member axis.
    """
    from ..models.rollout import make_ensemble_pipeline

    ndev = mesh.devices.size
    if n_members % ndev:
        raise ValueError(f"n_members={n_members} must be divisible by the "
                         f"mesh size {ndev}")
    local = make_ensemble_pipeline(n_members=n_members // ndev, **ensemble_kw)

    def fanout(fc_params, frames, key, noise_std):
        keys = jax.random.split(key, ndev)
        out = jax.vmap(lambda k: local(fc_params, frames, k, noise_std))(keys)
        # (ndev, B, n_local, ...) -> (B, ndev * n_local, ...): ndev-major, so
        # the merged member axis shards cleanly over 'dp'
        out = jnp.moveaxis(out, 0, 1)
        return out.reshape((out.shape[0], n_members) + out.shape[3:])

    rep = replicated(mesh)
    member_shard = NamedSharding(mesh, P(None, "dp"))
    return jax.jit(fanout, in_shardings=(rep, rep, None, None),
                   out_shardings=member_shard)


def export_pipeline(pipeline, params, example_frames, path: str,
                    batch_symbolic: bool = True) -> None:
    """Serialize the jitted pipeline to a StableHLO artifact (jax.export).

    The artifact contains compiler IR + the calling convention — it can be
    loaded (`load_pipeline`) and served WITHOUT the Python model code, which
    is the deployment story the reference lacks entirely (its serving is
    "import the training repo and call torch modules").

    batch_symbolic=True exports with a symbolic batch dimension so one
    artifact serves any batch size.
    """
    from jax import export as jexport

    fn = jax.jit(pipeline)
    if batch_symbolic:
        scope = jexport.SymbolicScope()
        b = jexport.symbolic_shape("b", scope=scope)[0]
        frames_spec = jax.ShapeDtypeStruct((b,) + example_frames.shape[1:],
                                           example_frames.dtype)
    else:
        frames_spec = jax.ShapeDtypeStruct(example_frames.shape,
                                           example_frames.dtype)
    params_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        params)
    exported = jexport.export(fn)(params_spec, frames_spec)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_pipeline(path: str) -> Callable:
    """Load a `export_pipeline` artifact; returns call(params, frames)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
