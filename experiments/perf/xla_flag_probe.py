"""Probe whether a given XLA flag exists in this build and what it buys.

VERDICT-r2 asked for measurement instead of assertion on the latency-hiding
XLA flags. This script sets XLA_FLAGS before importing jax, compiles the
bf16 rollout fresh (persistent cache deliberately NOT enabled — a flag must
affect a clean compile), and times it.

Round-3 result on this image's libtpu/XLA build (see /tmp logs + RESULTS.md):

    --xla_tpu_enable_latency_hiding_scheduler=true
        -> F parse_flags_from_env: "Unknown flag in XLA_FLAGS" (hard abort)
    --xla_tpu_scoped_vmem_limit_kib=65536
        -> same abort

i.e. the TPU-tuning flags public XLA documents are NOT compiled into this
axon/libtpu build — the round-2 claim "not in this build" is now shown, not
asserted. Usage: ``python experiments/perf/xla_flag_probe.py [--flag=...]``.
"""

from __future__ import annotations

import os
import sys

flag = sys.argv[1] if len(sys.argv) > 1 else ""
if flag:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " " + flag).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

import bench  # noqa: E402
from weatherforecastingtoolkit_tpu.data.synthetic import (  # noqa: E402
    synthetic_vil_events,
)


def main() -> None:
    ev = synthetic_vil_events(bench.BATCH, bench.HW, bench.HW, bench.T_IN,
                              seed=0)
    fr = jax.device_put(
        np.transpose(ev, (0, 3, 1, 2))[:, :, None].astype(np.float32) / 255.0)
    p, fc = bench.build_jax_pipeline("bfloat16")
    t, c, _ = bench._time_pipeline(p, fc, fr)
    print(f"FLAG[{flag}] compile {c:.1f}s median {t * 1000:.1f} ms "
          f"-> {bench.BATCH * bench.T_OUT / t:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
