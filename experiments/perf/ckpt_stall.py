"""Measure the training stall a checkpoint save costs: sync vs async.

The state is the bench GAN's (PosAwareAE 80.8M params + PatchGAN disc, both
with Adam moments — the realistic production state, ~1 GB fp32). Reports:

  * sync save stall: CheckpointManager(async_save=False).save() wall time
  * async save stall: save() return time (device->host snapshot only)
  * write drain time: wait_until_finished() after the async save
  * steps overlapped: how many GAN train steps complete while the async
    write drains (the work a sync save would have blocked)

Run on the TPU (any backend works): python experiments/perf/ckpt_stall.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import optax

    from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
    from weatherforecastingtoolkit_tpu.models.losses.gan import (
        NLayerDiscriminator)
    from weatherforecastingtoolkit_tpu.training.checkpoint import (
        CheckpointManager)
    from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task
    from weatherforecastingtoolkit_tpu.training.trainer import TrainState
    from weatherforecastingtoolkit_tpu.utils.compile_cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    print("devices:", jax.devices())
    small = "--small" in sys.argv  # CPU smoke: tiny model, same code path
    HW, B, T = (32, 2, 2) if small else (128, 4, 4)
    model = PosAwareAE(latent_dim=2048) if not small else PosAwareAE(
        enc_channels=(8, 16), dec_channels=(16, 8, 8), num_blocks=1,
        latent_hw=8, latent_channels=4, latent_dim=64)
    disc = NLayerDiscriminator(input_nc=1, ndf=8 if small else 64,
                               n_layers=1 if small else 3)
    task = make_vae_gan_task(
        name="ckpt_stall",
        generator_apply=lambda p, f, r: (model.apply(p, f)[0], None),
        gen_init=lambda r: model.init(r, jnp.zeros((1, 1, HW, HW))),
        disc_apply=lambda p, f: disc.apply(p, f),
        disc_init=lambda r: disc.init(r, jnp.zeros((1, 1, HW, HW))),
        disc_tx=optax.adam(4.5e-5, b1=0.5, b2=0.9),
        last_layer_path=("params", "dec_out", "kernel"),
        disc_weight=0.5, disc_start=0)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    rng = jax.random.key(0)
    params = task.init_params(rng)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=rng,
                       extra=task.init_extra(rng, params))
    nbytes = sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(state))
    print(f"state: {nbytes / 1e9:.2f} GB")
    batch = {"vil": jax.device_put(
        np.random.default_rng(0).random((B, T, 1, HW, HW), np.float32))}
    step = jax.jit(lambda s, b: task.custom_train_step(s, b, tx))
    t0 = time.time()
    state, aux = step(state, batch)
    float(aux["loss"])
    print(f"step compiled in {time.time() - t0:.1f}s")
    times = []
    for _ in range(5):
        t0 = time.time()
        state, aux = step(state, batch)
        float(aux["loss"])
        times.append(time.time() - t0)
    t_step = float(np.median(times))
    print(f"train step: {t_step * 1000:.1f} ms")

    tmp = tempfile.mkdtemp(prefix="ckpt_stall_")

    # -- sync save ----------------------------------------------------------
    sync_mgr = CheckpointManager(os.path.join(tmp, "sync"), async_save=False)
    t0 = time.time()
    sync_mgr.save(1, state)
    t_sync = time.time() - t0
    print(f"sync save stall: {t_sync:.2f}s "
          f"({t_sync / t_step:.1f} train steps blocked)")
    sync_mgr.close()

    # -- async save ---------------------------------------------------------
    async_mgr = CheckpointManager(os.path.join(tmp, "async"), async_save=True)
    t0 = time.time()
    async_mgr.save(1, state)
    t_async = time.time() - t0
    print(f"async save stall: {t_async:.2f}s (snapshot only)")
    # how many steps run while the write drains?
    overlapped = 0
    t0 = time.time()
    while True:
        state, aux = step(state, batch)
        float(aux["loss"])
        overlapped += 1
        # wait_until_finished would block; probe the public passthrough
        if not async_mgr.is_saving_in_progress():
            break
        if time.time() - t0 > 120:
            break
    t_drain = time.time() - t0
    print(f"write drained in {t_drain:.2f}s; {overlapped} train steps "
          f"overlapped the write")
    async_mgr.close()
    print(f"SUMMARY stall_sync={t_sync:.2f}s stall_async={t_async:.2f}s "
          f"step={t_step * 1000:.0f}ms overlapped={overlapped}")


if __name__ == "__main__":
    main()
