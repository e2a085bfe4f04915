"""Fast-VAE serving roofline: batch sweep + MFU, bf16 and int8_static.

The pixel-unshuffle VAE serves the 12-step rollout at 8,152 fps (B=64
bf16) / 9,789 fps (int8_static) — but is that its ceiling? This probe
answers with the same method the reference-shape rollout got (RESULTS.md
round 2): sweep the serving batch, score each point against the fast
VAE's OWN fp32 output at that batch (the self-gate bench.py applies), and
read MFU/HBM-BW off the XLA cost model. The fast VAE has no
full-resolution activations, so large batches fit where the reference
shape OOMs (fp32 B=96 needed 22.6 GB there); if fps still scales past
B=64 the deployment number moves again.

Usage: ``python experiments/perf/fast_vae_sweep.py [B ...]`` (default
64 128 256). TPU, ~20 min for the default grid.
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
BATCHES = tuple(int(a) for a in sys.argv[1:]) or (64, 128, 256)


def main():
    import jax

    from weatherforecastingtoolkit_tpu.data.synthetic import (
        synthetic_vil_events,
    )
    from weatherforecastingtoolkit_tpu.ops.ssim import ssim

    print(f"devices: {jax.devices()}", flush=True)
    events = synthetic_vil_events(max(BATCHES), bench.HW, bench.HW,
                                  bench.T_IN, seed=0)
    all_frames = np.transpose(events, (0, 3, 1, 2))[:, :, None]
    all_frames = all_frames.astype(np.float32) / 255.0

    rows = []
    for B in BATCHES:
        frames = jax.device_put(all_frames[:B])
        # fp32 reference output at THIS batch (same events -> same gate
        # basis). Computed in chunks of <=256 events: every op in the
        # pipeline is per-sample (convs, GroupNorm, DLinear), so chunking
        # is numerically equivalent and keeps fp32 activations inside HBM
        # at batches where a single fp32 pass would OOM.
        t0 = time.time()
        chunk = min(B, 256)
        pipe32, fc32 = bench.build_jax_pipeline("float32", vae_kwargs=FAST_KW)
        refs = []
        for i in range(0, B, chunk):
            _, _, out32 = bench._time_pipeline(
                pipe32, fc32, frames[i:i + chunk], n_rep=1)
            refs.append(np.asarray(out32).reshape(-1, 1, bench.HW, bench.HW))
            del out32
        ref = np.concatenate(refs) if len(refs) > 1 else refs[0]
        del refs
        print(f"B={B}: fp32 reference done ({time.time()-t0:.0f}s)",
              flush=True)

        for tag, dtype, mode in (("bf16", "bfloat16", "native"),
                                 ("int8_static", "bfloat16", "int8_static")):
            pipe, fc = bench.build_jax_pipeline(
                dtype, conv_mode=mode, vae_kwargs=FAST_KW,
                calib_frames=frames if mode == "int8_static" else None)
            t, c, out = bench._time_pipeline(pipe, fc, frames)
            fps = B * bench.T_OUT / t
            s = float(ssim(ref, np.asarray(out).reshape(-1, 1, bench.HW,
                                                        bench.HW)))
            flops, nbytes = bench._xla_cost(pipe, fc, frames)
            mfu, bwu = bench._utilization(
                flops, nbytes, t, "int8" if mode == "int8_static" else "bf16")
            util = ("" if mfu is None
                    else f", MFU {mfu*100:.1f}% HBM {bwu*100:.1f}%")
            gate = "PASS" if s >= 0.995 else "fail"
            rows.append((B, tag, t, fps, s, gate, mfu, bwu))
            print(f"B={B} {tag}: compile {c:.0f}s, {t*1000:.1f} ms -> "
                  f"{fps:,.0f} fps, self-gate {s:.5f} {gate}{util}",
                  flush=True)

    print("\n| B | path | median | frames/s | self-gate | MFU | HBM-BW |",
          flush=True)
    print("|---|---|---|---|---|---|---|", flush=True)
    for B, tag, t, fps, s, gate, mfu, bwu in rows:
        mfu_s = "-" if mfu is None else f"{mfu*100:.1f}%"
        bwu_s = "-" if bwu is None else f"{bwu*100:.1f}%"
        print(f"| {B} | {tag} | {t*1000:.1f} ms | {fps:,.0f} | {s:.5f} "
              f"{gate} | {mfu_s} | {bwu_s} |", flush=True)


if __name__ == "__main__":
    main()
