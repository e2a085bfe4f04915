"""Serving throughput of the pixel-unshuffle (no-full-res-conv) VAE.

The round-3 perf verdict (RESULTS.md): the reference VAE's full-resolution
64-channel convs are architecture-bound at ~42% encoder MFU, and only a
redesigned serving VAE can pass them. This probe measures that redesign:
`AutoencoderKL(pixel_unshuffle=4, block_out_channels=(128, 256, 512))` —
a lossless 4x4 space-to-depth stem, so the shallowest conv runs at 32x32
with 128 channels (full MXU lanes), same 64ch 8x8 latent, same DLinear,
same 12-step rollout program as bench.py's headline.

NOTE on quality: this is a *different architecture* — its weights must be
trained; the probe times random weights (valid: conv timing is
weight-value-independent) and the quality ceiling is established separately
in the demo protocol (`demo_path_b.py --vae-unshuffle 4`).

Round-3 measurement (one v5e, B=64, bf16 recipe):

    reference-shape: 352.5 ms -> 2,179 fps  (MFU 57.7%, HBM 38.7%)
    fast (s2d stem):  95.1 ms -> 8,077 fps  (MFU 43.3%, HBM 26.1%)  3.7x

Usage: ``python experiments/perf/fast_vae_probe.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

from weatherforecastingtoolkit_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache()

import jax  # noqa: E402

import bench  # noqa: E402
from weatherforecastingtoolkit_tpu.data.synthetic import (  # noqa: E402
    synthetic_vil_events,
)

FAST_VAE = dict(pixel_unshuffle=4, block_out_channels=(128, 256, 512))


def main() -> None:
    ev = synthetic_vil_events(bench.BATCH, bench.HW, bench.HW, bench.T_IN,
                              seed=0)
    fr = jax.device_put(
        np.transpose(ev, (0, 3, 1, 2))[:, :, None].astype(np.float32) / 255.0)
    for tag, kwargs in (("reference-shape", None), ("fast (s2d stem)",
                                                    FAST_VAE)):
        p, fc = bench.build_jax_pipeline("bfloat16", vae_kwargs=kwargs)
        t, c, _ = bench._time_pipeline(p, fc, fr)
        flops, nbytes = bench._xla_cost(p, fc, fr)
        mfu, bwu = bench._utilization(flops, nbytes, t)
        util = "" if mfu is None else f", MFU {mfu*100:.1f}% HBM {bwu*100:.1f}%"
        print(f"{tag}: compile {c:.1f}s median {t*1000:.1f} ms -> "
              f"{bench.BATCH * bench.T_OUT / t:.1f} fps{util}", flush=True)


if __name__ == "__main__":
    main()
