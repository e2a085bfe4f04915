"""Quantization-aware fine-tuning for the int8_static serving path.

RESULTS.md round 3 settled post-training int8: static calibration reaches
2,392 fps (+10% over bf16) but SSIM-vs-fp32 0.838 — the 0.995 serving gate
needs quantization-aware training. This experiment runs that QAT, on
TRAINED weights (the regime that matters for deployment; the bench's gate
measures random-init weights):

  1. train the bench-shape AutoencoderKL (64,128,256,512,512 -> 64x8x8
     latent, the reference VAE geometry `pipeline/models/autoencoderkl/
     vae.py:9-166`) as a roundtrip AE on synthetic VIL;
  2. calibrate per-conv per-input-channel activation scales (ops/quant.py);
  3. measure the deployed int8_static path before QAT: SSIM vs the fp32
     output (the serving gate) and SSIM vs the input frames (task quality);
  4. fine-tune under conv_mode="fake_quant" (int8 numerics with
     straight-through-estimator gradients, fixed calibration scales);
  5. re-measure both SSIMs for int8_static(W_qat).

Usage: ``python experiments/perf/int8_qat.py [--steps 2000] [--qat-steps
800]``. TPU, ~15 min.
"""

from __future__ import annotations

import argparse
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

from weatherforecastingtoolkit_tpu.data.synthetic import (  # noqa: E402
    synthetic_vil_events,
)
from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (  # noqa: E402
    AutoencoderKL,
)
from weatherforecastingtoolkit_tpu.ops.quant import calibrate  # noqa: E402
from weatherforecastingtoolkit_tpu.ops.ssim import ssim  # noqa: E402

HW = 128
KW = dict(in_channels=1, out_channels=1,
          block_out_channels=(64, 128, 256, 512, 512), layers_per_block=1,
          latent_channels=64, norm_num_groups=32)
BATCH = 16  # frames per optimizer step


def frame_pool(n_events, seed):
    ev = synthetic_vil_events(n_events, HW, HW, 13, seed=seed)  # (N,H,W,T) u8
    frames = np.transpose(ev, (0, 3, 1, 2)).reshape(-1, 1, HW, HW)
    return frames.astype(np.float32) / 255.0


def make_train_step(model, tx):
    def loss_fn(params, extra_cols, batch):
        recon = model.apply({"params": params, **extra_cols}, batch,
                            sample_posterior=False)
        return jnp.mean(jnp.abs(recon - batch))

    @jax.jit
    def step(params, opt_state, extra_cols, batch):
        loss, g = jax.value_and_grad(loss_fn)(params, extra_cols, batch)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def train(model, params, extra_cols, frames, steps, lr, tag):
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(steps):
        idx = rng.integers(0, len(frames), BATCH)
        batch = jax.device_put(frames[idx])
        params, opt_state, loss = step(params, opt_state, extra_cols, batch)
        if i == 0 or (i + 1) % max(1, steps // 8) == 0:
            print(f"  {tag} step {i+1}/{steps}: L1 {float(loss):.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return params


def eval_ssim(model, variables, frames_eval, bsz=32):
    outs = []
    ap = jax.jit(lambda v, x: model.apply(v, x, sample_posterior=False))
    for i in range(0, len(frames_eval), bsz):
        x = jax.device_put(frames_eval[i:i + bsz])
        outs.append(np.asarray(ap(variables, x)))
    return np.concatenate(outs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--qat-steps", type=int, default=800)
    p.add_argument("--qat-lr", type=float, default=2e-5)
    p.add_argument("--events", type=int, default=192)
    args = p.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    train_frames = frame_pool(args.events, seed=0)
    eval_frames = frame_pool(48, seed=1)[:256]

    native = AutoencoderKL(**KW)
    calib = AutoencoderKL(conv_mode="calibrate", **KW)
    static = AutoencoderKL(conv_mode="int8_static", **KW)
    fq = AutoencoderKL(conv_mode="fake_quant", **KW)

    nv = native.init(jax.random.key(0), jnp.zeros((1, 1, HW, HW)))
    n_params = sum(int(np.prod(a.shape))
                   for a in jax.tree_util.tree_leaves(nv))
    print(f"AutoencoderKL {n_params/1e6:.1f}M params; "
          f"{len(train_frames)} train frames", flush=True)

    # ---- stage 1: train the fp32 AE ------------------------------------
    params = train(native, nv["params"], {}, train_frames, args.steps,
                   1e-4, "fp32")

    # ---- calibrate static scales on training-distribution batches ------
    calib_batches = [jax.device_put(train_frames[i * 32:(i + 1) * 32])
                     for i in range(4)]
    capply = jax.jit(lambda v, b: calib.apply(
        v, b, sample_posterior=False, mutable=["qstats"]))
    qscales = jax.device_get(
        calibrate(capply, {"params": params}, calib_batches))

    def report(tag, p_):
        out_fp32 = eval_ssim(native, {"params": p_}, eval_frames)
        out_int8 = eval_ssim(static, {"params": p_, "qscales": qscales},
                             eval_frames)
        gate = float(ssim(out_fp32, out_int8))
        task_fp32 = float(ssim(eval_frames, out_fp32))
        task_int8 = float(ssim(eval_frames, out_int8))
        print(f"{tag}: int8-vs-fp32 SSIM {gate:.5f} | task SSIM "
              f"fp32 {task_fp32:.5f} int8 {task_int8:.5f}", flush=True)
        return gate, task_fp32, task_int8

    print("--- before QAT ---", flush=True)
    report("post-training int8_static", params)

    # ---- stage 2: QAT fine-tune under fake_quant -----------------------
    params_qat = train(fq, params, {"qscales": qscales}, train_frames,
                       args.qat_steps, args.qat_lr, "qat")

    print("--- after QAT ---", flush=True)
    report("int8_static(W_qat)", params_qat)
    # the float path of the QAT weights (what a fp32/bf16 fallback would
    # serve): shows whether QAT sacrificed the float model
    out_fp32_qat = eval_ssim(native, {"params": params_qat}, eval_frames)
    print(f"fp32(W_qat) task SSIM {float(ssim(eval_frames, out_fp32_qat)):.5f}",
          flush=True)


if __name__ == "__main__":
    main()
