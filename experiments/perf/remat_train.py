"""Measure what per-block rematerialization buys the GAN train step.

RESULTS.md's training roofline: the two-optimizer PosAwareAE+PatchGAN step
is HBM-bandwidth-bound and frames/s scales with batch (103 -> 201 from 4x4
to 16x4 at pinned ~75% HBM-BW). The ceiling on batch is activation memory;
`remat=True` (jax.checkpoint per Enc/DecBlock, models/conv_ae.py) trades
stored activations for recompute. This probe times bf16 train steps at
B in {16, 32} x T=4 frames with remat off/on and prints steps/s, frames/s,
and live HBM, answering: does remat unlock a larger, faster-per-frame batch?

Round-3 measurements (one v5e; B=64 run separately — see RESULTS.md):

    remat=off 16x4: 3.18 steps/s (203 f/s)   remat=on 16x4: 2.30 (147 f/s)
    remat=off 32x4: 2.10 steps/s (269 f/s)   remat=on 32x4: 1.73 (221 f/s)
    remat=off 64x4: compile FAILS (HBM OOM)  remat=on 64x4: 0.84 (214 f/s)

Verdict: remat makes 64x4 FIT but un-rematted 32x4 stays the throughput
optimum for this model/resolution; remat is the capacity knob for bigger
models, higher resolution, or longer sequences.

Usage: ``python experiments/perf/remat_train.py`` (TPU, ~10 min).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

from weatherforecastingtoolkit_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE  # noqa: E402
from weatherforecastingtoolkit_tpu.models.losses.gan import (  # noqa: E402
    NLayerDiscriminator,
)
from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task  # noqa: E402
from weatherforecastingtoolkit_tpu.training.profiling import (  # noqa: E402
    device_memory_stats,
)
from weatherforecastingtoolkit_tpu.training.trainer import TrainState  # noqa: E402

HW, T = 128, 4


def measure(remat: bool, bsz: int) -> None:
    model = PosAwareAE(latent_dim=2048, remat=remat)
    disc = NLayerDiscriminator(input_nc=1, ndf=64, n_layers=3)
    task = make_vae_gan_task(
        name="remat_probe",
        generator_apply=lambda p, f, r: (model.apply(p, f)[0], None),
        gen_init=lambda r: model.init(r, jnp.zeros((1, 1, HW, HW))),
        disc_apply=lambda p, f: disc.apply(p, f),
        disc_init=lambda r: disc.init(r, jnp.zeros((1, 1, HW, HW))),
        disc_tx=optax.adam(4.5e-5, b1=0.5, b2=0.9),
        last_layer_path=("params", "dec_out", "kernel"),
        disc_weight=0.5, disc_start=0, mixed_precision=True)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    rng = jax.random.key(0)
    params = task.init_params(rng)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=rng,
                       extra=task.init_extra(rng, params))
    batch = {"vil": jax.device_put(np.random.default_rng(0).random(
        (bsz, T, 1, HW, HW), np.float32))}
    tag = f"remat={'on ' if remat else 'off'} B={bsz}x{T}"
    step = jax.jit(lambda s, b: task.custom_train_step(s, b, tx))
    try:
        t0 = time.time()
        state, aux = step(state, batch)
        float(aux["loss"])
        compile_s = time.time() - t0
        times = []
        for _ in range(8):
            t0 = time.time()
            state, aux = step(state, batch)
            float(aux["loss"])  # scalar read-back: the reliable axon sync
            times.append(time.time() - t0)
        t = float(np.median(times))
        mem = device_memory_stats()
        peak = mem.get("peak_bytes_in_use", mem.get("bytes_in_use", 0))
        print(f"{tag}: compile {compile_s:.1f}s, {t*1000:.1f} ms/step -> "
              f"{1/t:.2f} steps/s ({bsz*T/t:.1f} frames/s), "
              f"peak HBM {peak/2**30:.2f} GiB", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)


def main() -> None:
    for bsz in (16, 32):
        for remat in (False, True):
            measure(remat, bsz)


if __name__ == "__main__":
    main()
