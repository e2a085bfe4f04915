"""Mixed int8/float serving: per-layer sensitivity sweep on the reference-
shape VAE rollout.

Round-2/3 settled that FULL static W8A8 on the reference-shape pipeline
fails the bench's 0.995-SSIM-vs-fp32 gate (0.759), while QAT narrows the
task-tier gap but not the gate. The standard next lever is MIXED precision
per layer: find which conv families the quantization error actually comes
from, keep those in float, quantize the rest — int8 MXU rate where it's
safe, float where it isn't.

Protocol (single chip, ~30 min):
  1. fp32 native rollout -> reference output; bf16 rollout -> bf16 fps.
  2. calibrate per-conv activation abs-max once (global 'calibrate' mode).
  3. leave-one-IN: for each conv family F, quantize ONLY F
     (spec = ((F/*, int8_static), ('*', 'native'))), measure SSIM vs fp32.
     Ranks families by quantization damage.
  4. greedy mix: add families in least-damage order; after each addition
     measure SSIM; keep the largest set that still passes > 0.995.
  5. measure the winning mix's fps vs bf16 fps (both at BATCH).

Prints a table + the winning spec as a python literal.

MEASURED VERDICTS (round 5, one v5e chip; full tables in RESULTS.md):
  * reference shape: NEGATIVE — no single conv family quantizes under the
    0.995 gate (best: encoder/down_blocks_4 at 0.99249 vs the bf16 base's
    0.99506, which leaves only 6e-5 of headroom), so no mixed policy can
    pass and the greedy stage short-circuits. int8_static remains the
    task-tier throughput path there, bf16 the gated headline.
  * --fast (pixel_unshuffle=4 deployment VAE): POSITIVE — bf16 self-gates
    at 0.99753, encoder/mid_block alone fits (0.99510 PASS), every pair
    fails; the winning mix serves 11,413 fps vs bf16's 10,932 (+4.4%).
    That spec ships as bench.py::INT8_MIXED_SPEC and is re-measured by the
    bench JSON contract every round.
Re-run this sweep only if the serving architecture or the gate changes.

Usage: python experiments/perf/int8_mixed.py [--fast] [--batch N]
--fast sweeps the pixel-unshuffle fast VAE instead (3 blocks; gated against
its OWN fp32 output, the same self-gate bench.py applies to its bf16
recipe) — the deployment architecture, where full int8_static already runs
+20% but at the ~0.9-SSIM task tier.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

import bench  # noqa: E402  (enables the persistent compile cache on import)

GATE = 0.995

FAST_KW = bench.FAST_VAE_KW  # the deployment recipe, single source of truth


def families(n_blocks):
    """Conv families of an AutoencoderKL with n_blocks enc/dec blocks.
    quant_conv/post_quant_conv are plain 1x1 nn.Conv (never quantized)."""
    return (
        ["encoder/conv_in", "encoder/mid_block", "encoder/conv_out",
         "decoder/conv_in", "decoder/mid_block", "decoder/conv_out"]
        + [f"encoder/down_blocks_{i}" for i in range(n_blocks)]
        + [f"decoder/up_blocks_{i}" for i in range(n_blocks)]
    )


FAMILIES = families(len(bench.VAE_CHANNELS))


def main():
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true",
                   help="sweep the pixel-unshuffle fast VAE (self-gated)")
    p.add_argument("--batch", type=int, default=None)
    args = p.parse_args()
    vae_kwargs = FAST_KW if args.fast else None
    fams = families(len(FAST_KW["block_out_channels"])) if args.fast \
        else FAMILIES
    batch = args.batch or (bench.FAST_BATCH if args.fast else bench.BATCH)

    from weatherforecastingtoolkit_tpu.data.synthetic import (
        synthetic_vil_events)
    from weatherforecastingtoolkit_tpu.ops.ssim import ssim

    from weatherforecastingtoolkit_tpu.utils.backend import wait_for_backend

    print(f"devices: {wait_for_backend()}", flush=True)
    print(f"arch: {'fast (pixel_unshuffle=4)' if args.fast else 'reference'}"
          f" shape, batch {batch}", flush=True)
    events = synthetic_vil_events(batch, bench.HW, bench.HW,
                                  bench.T_IN, seed=0)
    frames = np.transpose(events, (0, 3, 1, 2))[:, :, None]
    frames = jax.device_put(frames.astype(np.float32) / 255.0)

    # calibrate ONCE (protocol step 2): the abs-max tree depends only on
    # (architecture, calib batch), never on the per-layer spec, so every
    # sweep point below reuses it instead of redoing the calibration forward
    qscales = bench.calibrate_qscales(frames, vae_kwargs=vae_kwargs)

    def run(dtype, mode, n_rep=10):
        pipe, fc = bench.build_jax_pipeline(
            dtype, conv_mode=mode, vae_kwargs=vae_kwargs,
            qscales=None if mode == "native" else qscales)
        t, _c, out = bench._time_pipeline(pipe, fc, frames, n_rep=n_rep)
        return t, np.asarray(out).reshape(-1, 1, bench.HW, bench.HW)

    t32, ref = run("float32", "native")
    t16, out16 = run("bfloat16", "native")
    fps16 = batch * bench.T_OUT / t16
    print(f"bf16: {fps16:.1f} fps, SSIM vs fp32 "
          f"{float(ssim(ref, out16)):.5f}", flush=True)

    # ---- stage 3: leave-one-IN sensitivity ---------------------------------
    damage = []
    for fam in fams:
        spec = ((fam + "*", "int8_static"), ("*", "native"))
        t0 = time.time()
        _t, out = run("bfloat16", spec, n_rep=2)
        s = float(ssim(ref, out))
        damage.append((1.0 - s, fam))
        print(f"  only {fam:<28} int8 -> SSIM {s:.5f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    damage.sort()

    # ---- stage 4: greedy mix, least-damage first ----------------------------
    # While `chosen` is empty each greedy trial is a SINGLE family — stage 3
    # already measured those, so reuse its SSIMs (saves one recompile per
    # family; if no single family passes the gate, no superset will either
    # and the whole greedy stage is skipped as a measured negative).
    chosen, s_mix = [], None
    for d, fam in damage:
        s = 1.0 - d
        ok = s > GATE
        print(f"  mix+{fam:<27} SSIM {s:.5f} "
              f"{'PASS' if ok else 'FAIL'} (stage-3 reuse)", flush=True)
        if ok:
            chosen, s_mix = [fam], s
            break
    for _d, fam in damage:
        if not chosen:
            break
        if fam in chosen:
            continue
        trial = chosen + [fam]
        spec = tuple((f + "*", "int8_static") for f in trial) + \
            (("*", "native"),)
        _t, out = run("bfloat16", spec, n_rep=2)
        s = float(ssim(ref, out))
        ok = s > GATE
        print(f"  mix+{fam:<27} SSIM {s:.5f} {'PASS' if ok else 'FAIL'}",
              flush=True)
        if ok:
            chosen, s_mix = trial, s

    if not chosen:
        print("RESULT: no family quantizes under the gate — mixed int8 is a "
              "measured negative on this architecture", flush=True)
        return

    spec = tuple((f + "*", "int8_static") for f in chosen) + \
        (("*", "native"),)
    t_mix, out = run("bfloat16", spec)
    fps_mix = batch * bench.T_OUT / t_mix
    s_final = float(ssim(ref, out))
    print(f"\nRESULT: {len(chosen)}/{len(fams)} families int8, "
          f"SSIM {s_final:.5f} (gate {GATE}), "
          f"{fps_mix:.1f} fps vs bf16 {fps16:.1f} "
          f"({(fps_mix/fps16-1)*100:+.1f}%)", flush=True)
    print("INT8_MIXED_SPEC =", repr(spec), flush=True)


if __name__ == "__main__":
    main()
