"""Shared tiny model + DP step for the multi-host test (imported by both the
spawned child processes and the in-process single-device ground truth, so the
program is identical on both sides)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

N_LOCAL = 4  # windows per shard: 8 events / 2 shards, 1 window per event


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, T, 1, H, W) -> same
        b, t = x.shape[:2]
        h = x.reshape((b * t,) + x.shape[2:]).transpose(0, 2, 3, 1)  # NHWC
        h = nn.Conv(8, (3, 3))(h)
        h = nn.relu(h)
        h = nn.Conv(1, (3, 3))(h)
        return h.transpose(0, 3, 1, 2).reshape(x.shape)


def make_step(mesh):
    """Returns (step, params0, opt_state0) with params/opt replicated on the
    mesh; step(params, opt_state, global_batch) -> (new_params, loss). The
    batch is sharded over 'dp'; GSPMD inserts the gradient all-reduce."""
    model = TinyNet()
    tx = optax.adam(1e-3)
    host_params = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 4, 1, 32, 32))))
    host_opt = jax.device_get(tx.init(host_params))
    rep = NamedSharding(mesh, P())

    def put_rep(x):
        x = np.asarray(x)
        # every process contributes its (full) addressable replica
        return jax.make_array_from_single_device_arrays(
            x.shape, rep,
            [jax.device_put(x, d) for d in rep.addressable_devices])

    params0 = jax.tree_util.tree_map(put_rep, host_params)
    opt0 = jax.tree_util.tree_map(put_rep, host_opt)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            pred = model.apply(p, batch)
            return jnp.mean((pred - batch) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    return step, params0, opt0


def make_fsdp_step(mesh):
    """Fully-sharded variant: every dp-divisible leaf of params AND optimizer
    state is SPLIT over the mesh's 'dp' axis (fsdp_spec rule,
    min_shard_elems=1) — across process boundaries in the multi-host test, so
    no process holds the full state. Same step function; GSPMD turns the
    state shardings into all-gather-on-use + reduce-scatter-gradients."""
    from weatherforecastingtoolkit_tpu.parallel.fsdp import fsdp_spec

    model = TinyNet()
    tx = optax.adam(1e-3)
    host_params = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 4, 1, 32, 32))))
    host_opt = jax.device_get(tx.init(host_params))
    size = mesh.shape["dp"]

    def put_fsdp(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, fsdp_spec(x.shape, size, min_shard_elems=1))
        # each process's callback is invoked only for its own devices' slices
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    params0 = jax.tree_util.tree_map(put_fsdp, host_params)
    opt0 = jax.tree_util.tree_map(put_fsdp, host_opt)

    def _step(params, opt_state, batch):
        def loss_fn(p):
            pred = model.apply(p, batch)
            return jnp.mean((pred - batch) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    # pin output shardings so each child can persist exactly its own shard
    param_sh = jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, fsdp_spec(np.asarray(x).shape, size, min_shard_elems=1)),
        host_params)
    step = jax.jit(_step, out_shardings=(param_sh, NamedSharding(mesh, P())))
    return step, params0, opt0
