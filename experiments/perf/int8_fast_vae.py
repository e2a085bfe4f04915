"""int8_static x fast VAE: do the two serving wins compose?

Round 3 produced two independent serving results on the 12-step rollout
(RESULTS.md): the pixel-unshuffle fast VAE (8,077 fps bf16 — no conv ever
runs at full resolution) and calibrated static W8A8 (+10% over bf16 on the
reference-shape VAE, MXU int8 rate 2x bf16). This probe measures their
composition: the fast VAE with conv_mode="int8_static", at the serving
batch (B=64) and the single-event latency point (B=1), each against the
fast VAE's own fp32 output (the same self-gate bench.py applies to the
fast VAE's bf16 recipe).

The interesting physics: the fast VAE is far more compute-dense than the
reference shape (every conv is wide and at low resolution), so if anything
the int8 MXU rate should matter MORE here — unless the step has already
gone bandwidth-bound, in which case int8's halved weight bytes show up at
B=1 rather than B=64.

Usage: ``python experiments/perf/int8_fast_vae.py``. TPU, ~10 min.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

import bench  # noqa: E402  (enables the persistent compile cache on import)

FAST_KW = dict(pixel_unshuffle=4, block_out_channels=(128, 256, 512))


def main():
    import jax

    from weatherforecastingtoolkit_tpu.data.synthetic import (
        synthetic_vil_events,
    )
    from weatherforecastingtoolkit_tpu.ops.ssim import ssim

    print(f"devices: {jax.devices()}", flush=True)
    events = synthetic_vil_events(bench.BATCH, bench.HW, bench.HW,
                                  bench.T_IN, seed=0)
    frames = np.transpose(events, (0, 3, 1, 2))[:, :, None]
    frames = jax.device_put(frames.astype(np.float32) / 255.0)

    rows = []
    outs = {}
    for tag, dtype, mode in (("fp32", "float32", "native"),
                             ("bf16", "bfloat16", "native"),
                             ("int8_static", "bfloat16", "int8_static")):
        t0 = time.time()
        pipe, fc = bench.build_jax_pipeline(
            dtype, conv_mode=mode, vae_kwargs=FAST_KW,
            calib_frames=frames if mode == "int8_static" else None)
        t64, c, out = bench._time_pipeline(pipe, fc, frames)
        t1, _, _ = bench._time_pipeline(pipe, fc, frames[:1])
        outs[tag] = np.asarray(out)
        rows.append((tag, t64, bench.BATCH * bench.T_OUT / t64, t1))
        print(f"{tag}: compile {c:.0f}s (total {time.time()-t0:.0f}s), "
              f"B=64 {t64*1000:.1f} ms -> {rows[-1][2]:.0f} fps, "
              f"B=1 {t1*1000:.1f} ms", flush=True)

    ref = outs["fp32"].reshape(-1, 1, bench.HW, bench.HW)
    print("\n| path | B=64 median | frames/s | B=1 latency | SSIM vs own fp32 |",
          flush=True)
    print("|---|---|---|---|---|", flush=True)
    for tag, t64, fps, t1 in rows:
        s = float(ssim(ref, outs[tag].reshape(-1, 1, bench.HW, bench.HW)))
        print(f"| {tag} | {t64*1000:.1f} ms | {fps:,.0f} | {t1*1000:.1f} ms "
              f"| {s:.5f} |", flush=True)


if __name__ == "__main__":
    main()
