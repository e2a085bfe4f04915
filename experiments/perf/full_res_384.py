"""Full-resolution 384^2 VAE-GAN on-chip: HBM fit, step time, recon panel.

Proves the reference's MAIN VAE geometry (384^2 -> 4x48x48, reference
autoencoder_kl.py:80-113; dataset preset sevir/sevir.py:1111-1130) trains
on one chip with remat — the configuration that previously existed only as
a constants entry. Uses the vae_sevir384 experiment config verbatim
(bf16 mixed precision, remat on, feature-matching perceptual term) on
synthetic full-res data, reports:

  * HBM in use after init and at steady state (device_memory_stats)
  * median step time + frames/s at the config batch
  * a reconstruction panel PNG (the run-dir artifact)

Usage: python experiments/perf/full_res_384.py [--steps 200] [--batch 1]
TPU, ~20-30 min (first compile dominates).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from weatherforecastingtoolkit_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import numpy as np  # noqa: E402


def gb(x):
    return x / (1024 ** 3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--out", default="outputs_root/vae_sevir384_perf")
    p.add_argument("overrides", nargs="*",
                   help="extra key=val config overrides (CPU trials)")
    args = p.parse_args()

    import jax

    from experiments.common import build_datamodule, load_config
    from weatherforecastingtoolkit_tpu.training.logging import RunLogger
    from weatherforecastingtoolkit_tpu.training.profiling import (
        device_memory_stats)
    from weatherforecastingtoolkit_tpu.training.trainer import (Trainer,
                                                                derive_steps)

    from weatherforecastingtoolkit_tpu.utils.backend import wait_for_backend

    print(f"devices: {wait_for_backend()}", flush=True)
    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "vae_sevir384", "config.yaml")

    class _A:
        config = cfg_path

    cfg = load_config(cfg_path, _A, [
        f"dataset.batch_size={args.batch}",
        f"experiment_path={args.out}",
        "trainer.save_every_n_steps=10.0",  # no checkpoint stalls in timing
        "logging.val_every_n=10.0",
        "logging.log_every_n_steps=25",
    ] + list(args.overrides))
    dm = build_datamodule(cfg)
    train_loader = dm.train_loader()
    cfg = derive_steps(cfg, len(train_loader), 1, 1)
    cfg.trainer.total_train_steps = args.steps
    if cfg.lpips.disc_start <= 1.0:
        # fractional disc_start is a fraction of total steps (same rule as
        # experiments/common.py), computed against the --steps override
        cfg.lpips.disc_start = int(cfg.lpips.disc_start * args.steps)

    from experiments.ae_gan.train import build_task
    task = build_task(cfg, dm)
    trainer = Trainer(cfg, task)
    state = trainer.init_state()
    m0 = device_memory_stats()
    if m0:
        print(f"HBM after init: {gb(m0.get('bytes_in_use', 0)):.2f} GiB in "
              f"use / {gb(m0.get('bytes_limit', 0)):.2f} GiB limit", flush=True)

    def batches():
        while True:
            for b in train_loader:
                yield b

    it = batches()
    first = next(it)
    bt = first["vil"].shape[:2]
    print(f"batch: {bt[0]} x {bt[1]} frames of 384^2 "
          f"({bt[0]*bt[1]} frames/step)", flush=True)

    t0 = time.time()
    state, aux = trainer._train_step(state, first)
    float(aux["loss"] if "loss" in aux else aux["rec_loss"])
    print(f"first step (compile): {time.time()-t0:.1f}s", flush=True)

    times = []
    peak = 0
    for i in range(args.steps):
        b = next(it)
        t0 = time.time()
        state, aux = trainer._train_step(state, b)
        # host readback, not block_until_ready: over the axon tunnel the
        # latter can return once the remote execution is SCHEDULED, not
        # finished (same caveat as bench.py::_time_pipeline) — a dispatch
        # time would wildly overstate frames/s.
        float(aux["loss"] if "loss" in aux else aux["rec_loss"])
        times.append(time.time() - t0)
        if i in (2, args.steps // 2, args.steps - 1):
            m = device_memory_stats()
            if m:
                peak = max(peak, m.get("peak_bytes_in_use",
                                       m.get("bytes_in_use", 0)))
    med = float(np.median(times))
    frames = bt[0] * bt[1]
    print(f"steady state: median {med*1000:.1f} ms/step -> "
          f"{frames/med:.2f} frames/s at 384^2 (train, GAN step)", flush=True)
    if peak:
        print(f"HBM peak: {gb(peak):.2f} GiB", flush=True)
    for k in ("rec_loss", "fm_loss", "disc_loss", "kl_loss"):
        if k in aux:
            print(f"final {k}: {float(aux[k]):.5f}", flush=True)

    # recon panel: the task's eval view (encode->decode of the last batch)
    recon, target = task.eval_fn(state.params, b, jax.random.key(0))
    logger = RunLogger(trainer.run_dir)
    logger.log_images(np.clip(np.asarray(recon), 0, 1), np.asarray(target),
                      "recon384", args.steps)
    print(f"panel written under {trainer.run_dir}", flush=True)
    trainer.close()


if __name__ == "__main__":
    main()
