"""B=1 latency floor: where do the ~24 ms of a fast-VAE streaming tick go?

Round-3/4 levers against the B=1 operational latency (streaming latent
window, fast VAE) bought single digits; the verdict asked for a trace-backed
answer: dispatch/tunnel overhead, or decoder HBM? Decomposition:

  1. dispatch floor — a trivial jitted program (tiny add + host readback)
     timed exactly like the tick: the pure host->tunnel->chip->host cost any
     program pays per call;
  2. the pipeline's parts at B=1 (encode 13 frames / forecast / decode 12
     frames), each its own jitted program with host-readback sync;
  3. XLA cost model of the decode: bytes / HBM peak = the bandwidth floor
     the decoder could ever reach on-chip.

If (1) dominates the tick, the floor is the axon tunnel, not the model —
levers on the program can't move it. Optional: --trace DIR writes a
jax.profiler trace of 5 ticks for offline inspection.

Usage: python experiments/perf/b1_latency_profile.py [--trace DIR]
TPU, ~10 min.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def timed(fn, *args, n_rep=30, sync=None):
    """Median seconds per call with host-readback sync (axon caveat:
    block_until_ready can return once execution is merely scheduled)."""
    out = fn(*args)
    (sync or (lambda o: np.asarray(o).ravel()[0]))(out)  # compile + sync
    times = []
    for _ in range(n_rep):
        t0 = time.time()
        out = fn(*args)
        (sync or (lambda o: np.asarray(o).ravel()[0]))(out)
        times.append(time.time() - t0)
    return float(np.median(times))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from weatherforecastingtoolkit_tpu.data.synthetic import (
        synthetic_vil_events)
    from weatherforecastingtoolkit_tpu.utils.backend import wait_for_backend

    print(f"devices: {wait_for_backend()}", flush=True)

    # ---- 1. dispatch floor ---------------------------------------------------
    tiny = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(np.zeros((8,), np.float32))
    t_disp = timed(tiny, x)
    print(f"dispatch floor (tiny jitted add, host readback): "
          f"{t_disp * 1000:.2f} ms", flush=True)

    # ---- 2. pipeline parts at B=1 -------------------------------------------
    events = synthetic_vil_events(1, bench.HW, bench.HW, bench.T_IN, seed=0)
    frames = np.transpose(events, (0, 3, 1, 2))[:, :, None]
    frames = jax.device_put(frames.astype(np.float32) / 255.0)

    for tag, kw in (("fast", bench.FAST_VAE_KW), ("reference-shape", None)):
        pipe, fc = bench.build_jax_pipeline("bfloat16", vae_kwargs=kw)
        t_full = timed(pipe, fc, frames)

        from weatherforecastingtoolkit_tpu.models.forecasters import DLinear
        from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (
            AutoencoderKL)
        vkw = dict(in_channels=1, out_channels=1,
                   block_out_channels=bench.VAE_CHANNELS,
                   layers_per_block=1, latent_channels=bench.LATENT_C,
                   norm_num_groups=bench.NORM_GROUPS)
        vkw.update(kw or {})
        vae = AutoencoderKL(**vkw)
        rng = jax.random.key(0)
        vv = vae.init(rng, jnp.zeros((1, 1, bench.HW, bench.HW)))
        vv = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), vv)
        d = bench.LATENT_C * bench.LATENT_HW ** 2
        fcm = DLinear(seq_len=bench.T_IN, pred_len=bench.T_OUT,
                      kernel_size=25)
        fv = fcm.init(rng, jnp.zeros((1, bench.T_IN, d)))

        enc = jax.jit(lambda f: vae.apply(
            vv, f.astype(jnp.bfloat16), method=vae.encode).mode())
        flat_in = frames.reshape((-1,) + frames.shape[2:])
        t_enc = timed(enc, flat_in)
        z = enc(flat_in).astype(jnp.float32).reshape(1, bench.T_IN, d)

        fcast = jax.jit(lambda p, zz: fcm.apply(p, zz - zz[:, -1:])
                        + zz[:, -1:])
        t_fc = timed(fcast, fv, z)
        zp = fcast(fv, z).reshape((bench.T_OUT, bench.LATENT_C,
                                   bench.LATENT_HW, bench.LATENT_HW))

        dec = jax.jit(lambda zz: vae.apply(
            vv, zz.astype(jnp.bfloat16), method=vae.decode))
        t_dec = timed(dec, zp)

        # ---- 3. decode bandwidth floor (XLA cost model) ----------------------
        flops, nbytes = bench._xla_cost(dec, zp)
        kind = jax.devices()[0].device_kind
        matches = [k for k in bench.DEVICE_PEAKS if kind.startswith(k)]
        peak_bw = (bench.DEVICE_PEAKS[max(matches, key=len)][1]
                   if matches else None)
        floor_ms = (nbytes / peak_bw * 1000) if (nbytes and peak_bw) else None

        parts = t_enc + t_fc + t_dec
        print(f"{tag}: full tick {t_full*1000:.1f} ms | parts: "
              f"encode {t_enc*1000:.1f} + forecast {t_fc*1000:.1f} + "
              f"decode {t_dec*1000:.1f} = {parts*1000:.1f} ms "
              f"(3 dispatches vs 1)", flush=True)
        if floor_ms is not None:
            print(f"{tag}: decode cost model {flops/1e9:.1f} GFLOP, "
                  f"{nbytes/1e6:.0f} MB -> HBM floor {floor_ms:.2f} ms; "
                  f"dispatch floor {t_disp*1000:.2f} ms", flush=True)

    if args.trace:
        import jax.profiler as prof
        pipe, fc = bench.build_jax_pipeline("bfloat16",
                                            vae_kwargs=bench.FAST_VAE_KW)
        np.asarray(pipe(fc, frames)).ravel()[0]
        with prof.trace(args.trace):
            for _ in range(5):
                np.asarray(pipe(fc, frames)).ravel()[0]
        print(f"profiler trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
