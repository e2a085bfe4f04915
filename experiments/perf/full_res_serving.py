"""Full-resolution 384^2 SERVING rollout: reference-shape vs fast (pixel-
unshuffle) VAE at the reference's main geometry.

The deployment architecture (pixel_unshuffle=4, RESULTS.md rounds 3-4) was
only ever measured at 128^2. This probe composes it with the reference's
MAIN VAE geometry — 384^2 frames -> 4x48x48 latents (reference
autoencoder_kl.py:80-113; dataset preset sevir/sevir.py:1111-1130) — and
measures the 12-step rollout for both architectures:

  * reference shape: block_out_channels (64,128,256,512), 3 downsamples
    (384 -> 48), full-resolution convs present;
  * fast: pixel_unshuffle=4 + (128,256), one conv downsample (96 -> 48) —
    same 384^2 -> 4x48x48 mapping, zero full-resolution convs.

Both bf16 recipes are gated against their OWN fp32 output (the bench's
self-gate; the two architectures are different models, so cross-gating is
meaningless). fp32 references are computed in B-chunks when the single
program would OOM (every op is per-sample => numerically equivalent).

An OOM on any (arch, B) point is recorded as a result, not a crash — at
384^2 the reference shape's decoder temps exceed HBM at modest batch
(measured: B=16 needs 15.83G of 15.75G), and that bound is part of what
this probe exists to measure.

Usage: python experiments/perf/full_res_serving.py [--batches 4,8]
                                                   [--fast-batches 4,16,64]
TPU, ~20-30 min.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

import bench  # noqa: E402  (enables the persistent compile cache on import)

# the reference's full-res geometry
bench.HW = 384
bench.LATENT_C = 4
bench.LATENT_HW = 48

REFERENCE_SHAPE = dict(block_out_channels=(64, 128, 256, 512),
                       latent_channels=4)
FAST_SHAPE = dict(pixel_unshuffle=4, block_out_channels=(128, 256),
                  latent_channels=4)
GATE = 0.995
CHUNK = 4  # fp32-reference chunk size (full-res fp32 OOMs above ~B=4)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="4,8",
                   help="reference-shape batch sizes")
    p.add_argument("--fast-batches", default="4,16,64",
                   help="fast-arch batch sizes (no full-res activations, "
                        "so it scales much further)")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    fast_batches = [int(b) for b in args.fast_batches.split(",")]

    import jax

    from weatherforecastingtoolkit_tpu.data.synthetic import (
        synthetic_vil_events)
    from weatherforecastingtoolkit_tpu.ops.ssim import ssim
    from weatherforecastingtoolkit_tpu.utils.backend import wait_for_backend

    print(f"devices: {wait_for_backend()}", flush=True)
    bmax = max(batches + fast_batches)
    events = synthetic_vil_events(bmax, bench.HW, bench.HW, bench.T_IN,
                                  seed=0)
    all_frames = np.transpose(events, (0, 3, 1, 2))[:, :, None]
    all_frames = all_frames.astype(np.float32) / 255.0

    for tag, kw, blist in (("reference-shape", REFERENCE_SHAPE, batches),
                           ("fast (s2d stem)", FAST_SHAPE, fast_batches)):
        for B in blist:
            try:
                frames = jax.device_put(all_frames[:B])
                # fp32 self-gate reference, chunked to dodge full-res OOM
                pipe32, fc32 = bench.build_jax_pipeline("float32",
                                                        vae_kwargs=kw)
                refs = []
                for i in range(0, B, CHUNK):
                    _t, _c, out = bench._time_pipeline(
                        pipe32, fc32,
                        jax.device_put(all_frames[i:i + CHUNK]), n_rep=1)
                    refs.append(np.asarray(out))
                ref = np.concatenate(refs).reshape(-1, 1, bench.HW,
                                                   bench.HW)

                pipe16, fc16 = bench.build_jax_pipeline("bfloat16",
                                                        vae_kwargs=kw)
                t16, compile_s, out16 = bench._time_pipeline(
                    pipe16, fc16, frames, n_rep=10)
                out16 = np.asarray(out16).reshape(-1, 1, bench.HW,
                                                  bench.HW)
                s = float(ssim(ref, out16))
                fps = B * bench.T_OUT / t16
                print(f"{tag:<18} B={B:<3} bf16: compile {compile_s:.1f}s,"
                      f" median {t16 * 1000:.1f} ms -> {fps:.1f} frames/s "
                      f"@384^2, self-gate {s:.5f} "
                      f"{'PASS' if s > GATE else 'FAIL'}", flush=True)
            except Exception as e:  # OOM at full res IS a measurement
                msg = str(e).splitlines()
                oom = next((ln for ln in msg if "memory" in ln.lower()),
                           msg[0] if msg else repr(e))
                print(f"{tag:<18} B={B:<3} bf16: DOES NOT FIT — "
                      f"{oom.strip()[:160]}", flush=True)


if __name__ == "__main__":
    main()
