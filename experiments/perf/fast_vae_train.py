"""GAN TRAINING throughput of the pixel-unshuffle (no-full-res-conv) VAE.

The round-3 training roofline (RESULTS.md) showed the two-optimizer VAE-GAN
step is HBM-bandwidth-bound (~75-86% HBM, <20% MFU): the step re-reads
weights and full-resolution activations every iteration. The fast serving
VAE (`AutoencoderKL(pixel_unshuffle=4, block_out_channels=(128,256,512))`)
eliminates every full-resolution conv, which cuts exactly the traffic the
roofline says is binding — so the serving redesign should also be a
TRAINING speedup. This probe measures it: the complete adversarial train
step (recon + KL + adaptive-weight GAN, both optimizers; reference loop
`experiments/ae_v2_2/train.py:126-159`, loss semantics
`autoencoderkl/losses/contperceptual.py:33-169`) for the reference-shape
AutoencoderKL vs the fast one, bf16 mixed precision, at the reference's
canonical 4x4 batch and at larger batches.

Usage: ``python experiments/perf/fast_vae_train.py``.
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

import bench  # noqa: E402
from weatherforecastingtoolkit_tpu.models.losses.gan import (  # noqa: E402
    NLayerDiscriminator,
)
from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (  # noqa: E402
    AutoencoderKL,
)
from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task  # noqa: E402
from weatherforecastingtoolkit_tpu.training.trainer import TrainState  # noqa: E402

HW = bench.HW
REFERENCE_SHAPE = dict(block_out_channels=(64, 128, 256, 512, 512))
FAST_SHAPE = dict(pixel_unshuffle=4, block_out_channels=(128, 256, 512))


def build_step(vae_kwargs, mixed=True):
    model = AutoencoderKL(in_channels=1, out_channels=1, layers_per_block=1,
                          latent_channels=bench.LATENT_C,
                          norm_num_groups=bench.NORM_GROUPS, **vae_kwargs)
    disc = NLayerDiscriminator(input_nc=1, ndf=64, n_layers=3)

    def generator_apply(params, frames, rng):
        recon, posterior = model.apply(params, frames, sample_posterior=True,
                                       rng=rng, return_posterior=True)
        return recon, posterior.kl()

    task = make_vae_gan_task(
        name="fast_vae_train",
        generator_apply=generator_apply,
        gen_init=lambda rng: model.init(rng, jnp.zeros((1, 1, HW, HW))),
        disc_apply=lambda p, f: disc.apply(p, f),
        disc_init=lambda rng: disc.init(rng, jnp.zeros((1, 1, HW, HW))),
        disc_tx=optax.adam(4.5e-5, b1=0.5, b2=0.9),
        last_layer_path=("params", "decoder", "conv_out", "kernel"),
        kl_weight=1e-6, disc_weight=0.5, disc_start=0,
        mixed_precision=mixed)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    rng = jax.random.key(0)
    params = task.init_params(rng)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=rng,
                       extra=task.init_extra(rng, params))
    step = jax.jit(lambda s, b: task.custom_train_step(s, b, tx))
    return step, state, n_params


def measure(tag, vae_kwargs, bsz, tsz=4):
    step, state, n_params = build_step(vae_kwargs)
    batch = {"vil": jax.device_put(np.random.default_rng(0).random(
        (bsz, tsz, 1, HW, HW), np.float32))}
    t0 = time.time()
    state, aux = step(state, batch)
    jax.block_until_ready(state.params)
    compile_s = time.time() - t0
    times = []
    for _ in range(10):
        t0 = time.time()
        state, aux = step(state, batch)
        float(aux["loss"])  # host readback: the only reliable sync on axon
        times.append(time.time() - t0)
    t_step = float(np.median(times))
    flops, nbytes = bench._xla_cost(step, state, batch)
    mfu, bwu = bench._utilization(flops, nbytes, t_step)
    util = "" if mfu is None else f", MFU {mfu*100:.1f}% HBM {bwu*100:.1f}%"
    print(f"{tag} B={bsz}x{tsz} ({n_params/1e6:.1f}M gen params): "
          f"compile {compile_s:.1f}s, {t_step*1000:.1f} ms/step -> "
          f"{1/t_step:.2f} steps/s ({bsz*tsz/t_step:.1f} frames/s){util}",
          flush=True)
    return 1.0 / t_step


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for bsz in (4, 16, 32):
        measure("reference-shape", REFERENCE_SHAPE, bsz)
        measure("fast (s2d stem)", FAST_SHAPE, bsz)


if __name__ == "__main__":
    main()
