#!/usr/bin/env python
"""Benchmark: 12-step SEVIR-LR VIL latent rollout on one TPU chip.

The north-star path from BASELINE.json: encode 13 input frames with a frozen
VAE (128x128 -> 64x8x8 latent), forecast 12 latent steps with DLinear
(persistence-anchored residuals), decode back to pixels — ONE jitted XLA
program (weatherforecastingtoolkit_tpu/models/rollout.py).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/sec", "vs_baseline": N}

vs_baseline = our TPU frames/sec divided by the reference PyTorch pipeline's
frames/sec measured on this container's CPU (the only hardware the torch
reference can run on here; measured once and cached in .bench_baseline.json).
The reference pipeline is imported from /root/reference at runtime — its
per-frame python encode/decode loop (ae_s2/train.py:29-51) is benchmarked
as-written.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from weatherforecastingtoolkit_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

BATCH = 64  # throughput-serving batch: 1719 fps @16 / 2078 @32 / 2285 @64 /
            # 2342 @96 (diminishing past 64; 336 ms latency keeps the 5-min
            # SEVIR cadence trivially real-time)
FAST_BATCH = 256  # the fast VAE's throughput-optimal batch (no full-res
                  # activations -> keeps scaling: 8,188 fps @64 / 9,549 @128 /
                  # 10,717 @256, self-gate passes at every point; sweep in
                  # experiments/perf/fast_vae_sweep.py)
# the pixel-unshuffle deployment VAE recipe — the single source of truth for
# every consumer (bench_jax, experiments/perf/int8_mixed.py, fast_vae_*):
# a sweep computed for a different architecture than the one bench serves
# would be silently wrong
FAST_VAE_KW = dict(pixel_unshuffle=4, block_out_channels=(128, 256, 512))
# The measured winner of the per-layer int8/bf16 sweep on the fast VAE
# (experiments/perf/int8_mixed.py --fast, RESULTS.md round 5): exactly one
# conv family fits under the 0.995 self-gate (SSIM 0.99510) and buys +4.4%
# fps over bf16. Applies to FAST_VAE_KW only — on the reference shape the
# sweep is a measured negative (6e-5 of gate headroom; no family fits).
INT8_MIXED_SPEC = (("encoder/mid_block*", "int8_static"), ("*", "native"))
T_IN, T_OUT = 13, 12
HW = 128
LATENT_C, LATENT_HW = 64, 8
VAE_CHANNELS = (64, 128, 256, 512, 512)  # 4 downsamples: 128 -> 8
NORM_GROUPS = 32
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")

# peak specs per device kind for MFU / HBM-BW utilization estimates:
# {kind prefix: (bf16 matmul FLOP/s, HBM bytes/s, int8 OP/s)}. Matched on the
# LONGEST prefix ("TPU v5 lite" must win over "TPU v5" regardless of dict
# order). int8 peak is 2x bf16 on every listed generation — used so an int8
# headline's MFU is scored against the int8 roofline, not the bf16 one.
DEVICE_PEAKS = {
    "TPU v5 lite": (197e12, 819e9, 394e12),
    "TPU v5": (459e12, 1228e9, 918e12),
    "TPU v4": (275e12, 1200e9, 275e12),  # v4 has no 2x int8 MXU path
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# Bounded retry around backend init (BENCH_r03 died at jax.devices() on a
# tunnel flake) — shared by every TPU entry point, not just the bench.
from weatherforecastingtoolkit_tpu.utils.backend import wait_for_backend  # noqa: E402


def calibrate_qscales(calib_frames, vae_kwargs=None):
    """One global 'calibrate' pass over the serving batch: per-conv
    per-input-channel activation abs-max for the bench VAE geometry
    (ops/quant.py::calibrate). The result depends only on (architecture,
    calib batch) — NOT on the int8/float per-layer spec — so sweeps over
    many specs (experiments/perf/int8_mixed.py) call this once and pass the
    tree to every build_jax_pipeline(qscales=...)."""
    import jax
    import jax.numpy as jnp

    from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import AutoencoderKL
    from weatherforecastingtoolkit_tpu.ops.quant import calibrate

    kw = dict(in_channels=1, out_channels=1,
              block_out_channels=VAE_CHANNELS, layers_per_block=1,
              latent_channels=LATENT_C, norm_num_groups=NORM_GROUPS,
              conv_mode="calibrate")
    kw.update(vae_kwargs or {})
    cvae = AutoencoderKL(**{**kw, "conv_mode": "calibrate"})
    rng = jax.random.key(0)
    frame = jnp.zeros((1, 1, HW, HW), jnp.float32)
    cvars = cvae.init(rng, frame)  # fp32, same init seed as the pipeline

    def _flatten_frames(x):
        return x.reshape((-1,) + x.shape[2:])

    @jax.jit
    def _calib_step(v, frames):
        post, mut = cvae.apply(v, _flatten_frames(frames),
                               method=cvae.encode, mutable=["qstats"])
        _, mut2 = cvae.apply({**{k: v[k] for k in ("params",)},
                              "qstats": mut["qstats"]},
                             post.mode(), method=cvae.decode,
                             mutable=["qstats"])
        return None, mut2

    return calibrate(_calib_step, cvars, [calib_frames])


def build_jax_pipeline(dtype="float32", conv_mode="native", calib_frames=None,
                       autoregressive=False, vae_kwargs=None, streaming=False,
                       qscales=None):
    import jax
    import jax.numpy as jnp

    from weatherforecastingtoolkit_tpu.models.forecasters import DLinear
    from weatherforecastingtoolkit_tpu.models.rollout import (
        make_forecast_pipeline, make_streaming_forecaster)
    from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import AutoencoderKL

    kw = dict(in_channels=1, out_channels=1,
              block_out_channels=VAE_CHANNELS, layers_per_block=1,
              latent_channels=LATENT_C, norm_num_groups=NORM_GROUPS,
              conv_mode=conv_mode)
    kw.update(vae_kwargs or {})
    vae = AutoencoderKL(**kw)
    d = LATENT_C * LATENT_HW * LATENT_HW
    forecaster = DLinear(seq_len=T_IN, pred_len=T_OUT, kernel_size=25)

    rng = jax.random.key(0)
    frame = jnp.zeros((1, 1, HW, HW), jnp.float32)
    vae_vars = vae.init(rng, frame)
    fc_vars = forecaster.init(rng, jnp.zeros((1, T_IN, d), jnp.float32))
    jdtype = jnp.dtype(dtype)
    if jdtype != jnp.float32:
        # bf16 params + activations for the conv stacks (where the FLOPs are);
        # the latent path (residual anchoring + DLinear) stays fp32 — the
        # anchor subtraction cancels near-equal latents, which bf16's 8-bit
        # mantissa butchers, and the forecaster is <0.1% of pipeline FLOPs
        vae_vars = jax.tree_util.tree_map(lambda a: a.astype(jdtype), vae_vars)

    from weatherforecastingtoolkit_tpu.ops.quant import mixed_mode_uses
    if mixed_mode_uses(conv_mode, "int8_static"):
        # post-training calibration: per-conv per-input-channel abs-max over
        # the serving batch, folded into the weights at compile time
        # (ops/quant.py::int8_conv_static). Stats are recorded at fp32.
        # conv_mode may be a MIXED per-layer spec (tuple of (pattern, mode)
        # pairs, ops/quant.py::resolve_conv_mode) — calibration still covers
        # every conv; unquantized convs simply never read their qscales.
        # A precomputed `qscales` tree (calibrate_qscales) skips the pass —
        # the scales depend only on (architecture, calib batch), so sweeps
        # over many specs calibrate ONCE and reuse.
        if qscales is None:
            assert calib_frames is not None, "int8_static needs calib_frames"
            qscales = calibrate_qscales(calib_frames, vae_kwargs=vae_kwargs)
        vae_vars = {**vae_vars, "qscales": jax.device_get(qscales)}

    def encode_apply(frames):
        return vae.apply(vae_vars, frames.astype(jdtype),
                         method=vae.encode).mode().astype(jnp.float32)

    def decode_apply(latents):
        return vae.apply(vae_vars, latents.astype(jdtype), method=vae.decode
                         ).astype(jnp.float32)

    if streaming:
        # operational mode: sliding latent window, one-frame encode per tick
        lat = jax.eval_shape(encode_apply,
                             jax.ShapeDtypeStruct((1, 1, HW, HW), jnp.float32))
        init, step = make_streaming_forecaster(
            encode_apply=encode_apply, decode_apply=decode_apply,
            forecaster_apply=lambda p, z: forecaster.apply(p, z),
            input_frames=T_IN, pred_frames=T_OUT, latent_shape=lat.shape[1:])
        return (jax.jit(init), jax.jit(step, donate_argnums=(1,))), fc_vars

    pipeline = make_forecast_pipeline(
        encode_apply=encode_apply, decode_apply=decode_apply,
        forecaster_apply=lambda p, z: forecaster.apply(p, z),
        input_frames=T_IN, pred_frames=T_OUT, autoregressive=autoregressive)
    return jax.jit(pipeline), fc_vars


def _time_pipeline(pipeline, fc_vars, frames, n_rep=10):
    import time as _t
    t0 = _t.time()
    out = pipeline(fc_vars, frames)
    out.block_until_ready()
    np.asarray(out[(0,) * out.ndim])  # readback: real sync (see loop below)
    compile_s = _t.time() - t0
    times = []
    for _ in range(n_rep):
        t0 = _t.time()
        out = pipeline(fc_vars, frames)
        # host read-back of one output element: the only reliable sync on
        # the axon backend (block_until_ready can return once the remote
        # execution is scheduled, not finished)
        np.asarray(out[(0,) * out.ndim])
        times.append(_t.time() - t0)
    return float(np.median(times)), compile_s, out


def _xla_cost(jitted, *args):
    """(flops, bytes accessed) from XLA's cost model; (None, None) if n/a."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None, \
            float(ca.get("bytes accessed", 0.0)) or None
    except Exception as e:  # noqa: BLE001 — cost model is best-effort
        log(f"cost_analysis unavailable: {type(e).__name__}: {e}")
        return None, None


def _utilization(flops, nbytes, seconds, precision="bf16"):
    """(MFU, HBM-BW utilization) vs this chip's peaks; Nones pass through.
    `precision` selects the matmul roofline ("int8" scores against the int8
    peak; everything else against bf16)."""
    import jax
    kind = jax.devices()[0].device_kind
    matches = [k for k in DEVICE_PEAKS if kind.startswith(k)]
    if not matches:
        log(f"no peak table for device kind {kind!r}")
        return None, None
    peaks = DEVICE_PEAKS[max(matches, key=len)]
    flop_peak = peaks[2] if precision == "int8" else peaks[0]
    mfu = flops / seconds / flop_peak if flops else None
    bwu = nbytes / seconds / peaks[1] if nbytes else None
    return mfu, bwu


def bench_jax():
    import jax

    from weatherforecastingtoolkit_tpu.data.synthetic import synthetic_vil_events

    log(f"devices: {jax.devices()}")
    events = synthetic_vil_events(BATCH, HW, HW, T_IN, seed=0)  # (B,H,W,T) u8
    frames = np.transpose(events, (0, 3, 1, 2))[:, :, None]     # (B,T,1,H,W)
    frames = jax.device_put(frames.astype(np.float32) / 255.0)

    log("compiling fp32 rollout pipeline ...")
    pipe32, fc32 = build_jax_pipeline("float32")
    t32, c32, out32 = _time_pipeline(pipe32, fc32, frames)
    fps32 = BATCH * T_OUT / t32
    log(f"fp32: compile {c32:.1f}s, median {t32*1000:.1f} ms -> {fps32:.1f} frames/s")

    log("compiling bf16 rollout pipeline ...")
    pipe16, fc16 = build_jax_pipeline("bfloat16")
    t16, c16, out16 = _time_pipeline(pipe16, fc16, frames)
    fps16 = BATCH * T_OUT / t16
    log(f"bf16: compile {c16:.1f}s, median {t16*1000:.1f} ms -> {fps16:.1f} frames/s")

    log("compiling int8_static rollout pipeline (calibrated W8A8 convs) ...")
    try:
        pipe8, fc8 = build_jax_pipeline("bfloat16", conv_mode="int8_static",
                                        calib_frames=frames)
        t8, c8, out8 = _time_pipeline(pipe8, fc8, frames)
        fps8 = BATCH * T_OUT / t8
        log(f"int8_static: compile {c8:.1f}s, median {t8*1000:.1f} ms "
            f"-> {fps8:.1f} frames/s")
    except Exception as e:  # noqa: BLE001 — experimental path must not kill
        log(f"int8 pipeline unavailable ({type(e).__name__}: {e}); skipping")
        pipe8 = fps8 = out8 = t8 = None

    # quality gates: every reduced-precision path must track fp32 closely to
    # be headline-eligible; the fastest gated path wins
    from weatherforecastingtoolkit_tpu.ops.ssim import ssim as _ssim
    a = np.asarray(out32).reshape(-1, 1, HW, HW)

    def gate(out):
        return float(_ssim(a, np.asarray(out).reshape(-1, 1, HW, HW)))

    s16 = gate(out16)
    s8 = gate(out8) if out8 is not None else None
    log(f"SSIM vs fp32: bf16 {s16:.5f}, int8 "
        f"{'n/a' if s8 is None else format(s8, '.5f')}")
    candidates = [("fp32", fps32, pipe32, fc32, t32, 1.0),
                  ("bf16", fps16, pipe16, fc16, t16, s16)]
    if s8 is not None:
        candidates.append(("int8", fps8, pipe8, fc8, t8, s8))
    eligible = [cnd for cnd in candidates if cnd[5] > 0.995]
    name, fps, pipe, fcv, t_step, _ = max(eligible, key=lambda cnd: cnd[1])
    log(f"headline: {name} (quality-gated)")

    flops, nbytes = _xla_cost(pipe, fcv, frames)
    mfu, bwu = _utilization(flops, nbytes, t_step, precision=name)
    if mfu is not None:
        log(f"rollout: {flops/1e9:.1f} GFLOP, {nbytes/1e9:.2f} GB accessed "
            f"-> MFU {mfu*100:.1f}%, HBM-BW {bwu*100:.1f}% of peak")

    # the scan-autoregressive variant (BASELINE.json's north-star phrasing):
    # sliding latent window, one forecast step per scan iteration
    log("compiling autoregressive (scan) rollout variant ...")
    try:
        pipe_ar, fc_ar = build_jax_pipeline("bfloat16", autoregressive=True)
        t_ar, c_ar, out_ar = _time_pipeline(pipe_ar, fc_ar, frames)
        fps_ar = BATCH * T_OUT / t_ar
        s_ar = float(_ssim(np.asarray(out16).reshape(-1, 1, HW, HW),
                           np.asarray(out_ar).reshape(-1, 1, HW, HW)))
        log(f"autoregressive: compile {c_ar:.1f}s, median {t_ar*1000:.1f} ms "
            f"-> {fps_ar:.1f} frames/s, SSIM vs one-shot {s_ar:.5f}")
    except Exception as e:  # noqa: BLE001
        log(f"autoregressive variant failed: {type(e).__name__}: {e}")
        fps_ar = s_ar = None

    # the pixel-unshuffle fast serving VAE (a DIFFERENT architecture — its
    # quality is evidenced end-to-end in the demo protocol where it BEATS the
    # reference-shape pipeline on CSI-M/HSS, RESULTS.md round 3 — so it is
    # not SSIM-gated against the reference-shape fp32 output; instead its
    # bf16 serving recipe is gated against ITS OWN fp32 run, the same
    # precision contract the headline honors). Measured at ITS
    # throughput-optimal batch: no full-resolution activations, so fps keeps
    # scaling past the reference shape's B=64 (sweep in
    # experiments/perf/fast_vae_sweep.py — self-gate passes at every batch)
    log(f"compiling fast-VAE (pixel_unshuffle=4) rollout variant "
        f"(B={FAST_BATCH}) ...")
    fast_kw = FAST_VAE_KW
    try:
        fast_events = synthetic_vil_events(FAST_BATCH, HW, HW, T_IN, seed=0)
        fast_frames = np.transpose(fast_events, (0, 3, 1, 2))[:, :, None]
        fast_frames = jax.device_put(fast_frames.astype(np.float32) / 255.0)
        pipe_f, fc_f = build_jax_pipeline("bfloat16", vae_kwargs=fast_kw)
        t_f, c_f, out_f = _time_pipeline(pipe_f, fc_f, fast_frames)
        fps_fast = FAST_BATCH * T_OUT / t_f
        pipe_f32, fc_f32 = build_jax_pipeline("float32", vae_kwargs=fast_kw)
        _, _, out_f32 = _time_pipeline(pipe_f32, fc_f32, fast_frames, n_rep=1)
        s_fast = float(_ssim(np.asarray(out_f32).reshape(-1, 1, HW, HW),
                             np.asarray(out_f).reshape(-1, 1, HW, HW)))
        log(f"fast-VAE: compile {c_f:.1f}s, median {t_f*1000:.1f} ms "
            f"-> {fps_fast:.1f} frames/s, bf16-vs-own-fp32 SSIM {s_fast:.5f}")
    except Exception as e:  # noqa: BLE001
        log(f"fast-VAE variant failed: {type(e).__name__}: {e}")
        fps_fast = s_fast = None

    # fast-VAE x mixed int8: the sweep's measured winner (INT8_MIXED_SPEC),
    # gated against the fast VAE's own fp32 like the bf16 recipe above
    fps_mix = s_mix = None
    if fps_fast is not None:
        log("compiling fast-VAE int8-mixed variant (INT8_MIXED_SPEC) ...")
        try:
            pipe_m, fc_m = build_jax_pipeline(
                "bfloat16", conv_mode=INT8_MIXED_SPEC,
                calib_frames=fast_frames, vae_kwargs=fast_kw)
            t_m, c_m, out_m = _time_pipeline(pipe_m, fc_m, fast_frames)
            fps_mix = FAST_BATCH * T_OUT / t_m
            s_mix = float(_ssim(np.asarray(out_f32).reshape(-1, 1, HW, HW),
                                np.asarray(out_m).reshape(-1, 1, HW, HW)))
            log(f"fast-VAE int8-mixed: compile {c_m:.1f}s, median "
                f"{t_m*1000:.1f} ms -> {fps_mix:.1f} frames/s, "
                f"SSIM vs own fp32 {s_mix:.5f} "
                f"(gate {'PASS' if s_mix > 0.995 else 'FAIL'})")
        except Exception as e:  # noqa: BLE001
            log(f"fast-VAE int8-mixed variant failed: {type(e).__name__}: {e}")
            fps_mix = s_mix = None

    # single-event serving latency (B=1): the real-time nowcasting number —
    # one 12-frame forecast from 13 input frames, end to end on chip
    log("compiling B=1 latency variants ...")
    lat_ms = lat_fast_ms = None
    try:
        f1 = frames[:1]
        t_l, _, _ = _time_pipeline(pipe16, fc16, f1)  # same jit, B=1 shape
        lat_ms = t_l * 1000
        if fps_fast is not None:
            t_lf, _, _ = _time_pipeline(pipe_f, fc_f, f1)
            lat_fast_ms = t_lf * 1000
        log(f"B=1 latency: reference-shape {lat_ms:.1f} ms" +
            ("" if lat_fast_ms is None else f", fast-VAE {lat_fast_ms:.1f} ms"))
    except Exception as e:  # noqa: BLE001
        log(f"B=1 latency variant failed: {type(e).__name__}: {e}")

    # streaming tick (B=1): the operational 5-min-cadence radar loop —
    # sliding latent window, so each new frame costs ONE frame encode +
    # forecast + decode instead of re-encoding all T_IN frames
    def _stream_tick(vae_kwargs=None, n_rep=20):
        """Median ms per streaming tick (B=1). Same sync protocol as
        _time_pipeline: host readback of one element — on the axon backend
        block_until_ready can return once the remote execution is scheduled,
        not finished."""
        import time as _t

        (s_init, s_step), fc_s = build_jax_pipeline(
            "bfloat16", streaming=True, vae_kwargs=vae_kwargs)
        state = s_init(frames[:1])
        new_frame = frames[:1, -1]
        state, out_s = s_step(fc_s, state, new_frame)   # compile + warm
        np.asarray(out_s[(0,) * out_s.ndim])
        ticks = []
        for _ in range(n_rep):
            t0 = _t.time()
            state, out_s = s_step(fc_s, state, new_frame)
            np.asarray(out_s[(0,) * out_s.ndim])
            ticks.append(_t.time() - t0)
        return float(np.median(ticks)) * 1000

    log("compiling streaming (sliding-latent-window) tick ...")
    lat_stream_ms = None
    try:
        lat_stream_ms = _stream_tick()
        log(f"streaming tick (B=1): {lat_stream_ms:.1f} ms"
            + ("" if lat_ms is None else
               f" (full re-encode rollout: {lat_ms:.1f} ms)"))
    except Exception as e:  # noqa: BLE001
        log(f"streaming variant failed: {type(e).__name__}: {e}")

    # fast-VAE streaming tick: the decoder dominates the B=1 tick (round-3
    # measurement: one-frame encode saves only ~4% at B=1), so the decoder-
    # side lever is the pixel-unshuffle architecture — no conv at full res
    # in the DECODER either
    lat_stream_fast_ms = None
    try:
        lat_stream_fast_ms = _stream_tick(vae_kwargs=fast_kw)
        log(f"fast-VAE streaming tick (B=1): {lat_stream_fast_ms:.1f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"fast-VAE streaming variant failed: {type(e).__name__}: {e}")

    return fps, mfu, bwu, {
        "int8_frames_per_sec": round(fps8, 2) if fps8 is not None else None,
        "int8_ssim_vs_fp32": round(s8, 5) if s8 is not None else None,
        "bf16_ssim_vs_fp32": round(s16, 5),
        "autoregressive_frames_per_sec": (round(fps_ar, 2)
                                          if fps_ar is not None else None),
        "autoregressive_ssim_vs_oneshot": (round(s_ar, 5)
                                           if s_ar is not None else None),
        "fast_vae_frames_per_sec": (round(fps_fast, 2)
                                    if fps_fast is not None else None),
        "fast_vae_ssim_vs_own_fp32": (round(s_fast, 5)
                                      if s_fast is not None else None),
        "int8_mixed_frames_per_sec": (round(fps_mix, 2)
                                      if fps_mix is not None else None),
        "int8_mixed_ssim_vs_fp32": (round(s_mix, 5)
                                    if s_mix is not None else None),
        "latency_ms_b1": round(lat_ms, 2) if lat_ms is not None else None,
        "fast_vae_latency_ms_b1": (round(lat_fast_ms, 2)
                                   if lat_fast_ms is not None else None),
        "streaming_tick_ms_b1": (round(lat_stream_ms, 2)
                                 if lat_stream_ms is not None else None),
        "fast_vae_streaming_tick_ms_b1": (
            round(lat_stream_fast_ms, 2)
            if lat_stream_fast_ms is not None else None)}


def bench_train():
    """Full-size PosAwareAE + PatchGAN two-optimizer train step (the
    reference's canonical loop, ae_v2_2/train.py:126-159) — steps/s on chip."""
    import jax
    import jax.numpy as jnp
    import optax

    from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
    from weatherforecastingtoolkit_tpu.models.losses.gan import NLayerDiscriminator
    from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task
    from weatherforecastingtoolkit_tpu.training.trainer import TrainState

    B, T = 4, 4  # 16 frames of 128^2 per optimizer step
    model = PosAwareAE(latent_dim=2048)
    disc = NLayerDiscriminator(input_nc=1, ndf=64, n_layers=3)

    def build_task(mixed):
        return make_vae_gan_task(
            name="bench_gan",
            generator_apply=lambda p, f, r: (model.apply(p, f)[0], None),
            gen_init=lambda r: model.init(r, jnp.zeros((1, 1, HW, HW))),
            disc_apply=lambda p, f: disc.apply(p, f),
            disc_init=lambda r: disc.init(r, jnp.zeros((1, 1, HW, HW))),
            disc_tx=optax.adam(4.5e-5, b1=0.5, b2=0.9),
            last_layer_path=("params", "dec_out", "kernel"),
            disc_weight=0.5, disc_start=0, mixed_precision=mixed)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    rng = jax.random.key(0)
    batch = {"vil": jax.device_put(
        np.random.default_rng(0).random((B, T, 1, HW, HW), np.float32))}

    def measure(mixed, batch_frames=None, tag=None):
        this_batch = batch if batch_frames is None else batch_frames
        bsz, tsz = this_batch["vil"].shape[:2]
        task = build_task(mixed)
        params = task.init_params(rng)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params), rng=rng,
                           extra=task.init_extra(rng, params))
        if not mixed and batch_frames is None:
            n_params = sum(int(np.prod(p.shape))
                           for p in jax.tree_util.tree_leaves(params))
            log(f"train bench: PosAwareAE {n_params/1e6:.1f}M params + "
                f"PatchGAN, batch {B}x{T} frames of {HW}^2")
        tag = tag or ("bf16" if mixed else "fp32")
        step = jax.jit(lambda s, b: task.custom_train_step(s, b, tx))
        t0 = time.time()
        state, aux = step(state, this_batch)
        jax.block_until_ready(state.params)
        log(f"train step ({tag}) compiled in {time.time()-t0:.1f}s")
        times = []
        for _ in range(10):
            t0 = time.time()
            state, aux = step(state, this_batch)
            # host read-back of a step-dependent scalar: the only reliable
            # sync on the axon backend (block_until_ready can return once
            # the remote execution is scheduled, not finished)
            float(aux["loss"])
            times.append(time.time() - t0)
        t_step = float(np.median(times))
        sps = 1.0 / t_step
        # training roofline: XLA cost model over the WHOLE train step
        # (fwd + bwd + both optimizers). The MXU runs fp32 matmuls through
        # the same unit as bf16 on v5e, so both are scored against the bf16
        # peak — MFU here means "fraction of the chip's matmul ceiling".
        flops, nbytes = _xla_cost(step, state, this_batch)
        mfu, bwu = _utilization(flops, nbytes, t_step)
        util = ("" if mfu is None else
                f", MFU {mfu*100:.1f}% HBM-BW {bwu*100:.1f}%")
        log(f"train {tag}: {t_step*1000:.1f} ms/step "
            f"-> {sps:.2f} steps/s ({sps * bsz * tsz:.1f} frames/s), "
            f"loss {float(aux['loss']):.4f}{util}")
        return sps, mfu

    sps32, mfu32 = measure(False)
    try:
        sps16, mfu16 = measure(True)  # bf16 mixed precision (ops/amp.py)
    except Exception as e:  # noqa: BLE001
        log(f"mixed-precision train bench failed: {type(e).__name__}: {e}")
        sps16 = mfu16 = None
    # batch sweep (bf16): where does steps/s saturate? (keep per-step frame
    # count growing by 2x; 4x4 is the reference's canonical 16-frame step)
    sweep = {}
    for bsz in (8, 16):
        try:
            big = {"vil": jax.device_put(np.random.default_rng(0).random(
                (bsz, T, 1, HW, HW), np.float32))}
            sps_b, _ = measure(True, batch_frames=big, tag=f"bf16 B={bsz}x{T}")
            sweep[f"gan_train_bf16_steps_per_sec_b{bsz}"] = round(sps_b, 2)
        except Exception as e:  # noqa: BLE001
            log(f"train batch sweep b={bsz} failed: {type(e).__name__}: {e}")
    return sps32, sps16, mfu32, mfu16, sweep


def bench_fast_vae_train():
    """Fast-VAE (pixel-unshuffle) GAN training throughput — the deployment
    TRAINING story (the serving redesign deletes the full-res activation
    traffic that binds the reference-shape step; see RESULTS.md round 3).
    One bf16 point at B=16x4, the demonstrated 3.3x regime."""
    import jax

    from experiments.perf.fast_vae_train import FAST_SHAPE, build_step

    B, T = 16, 4
    step, state, _n = build_step(FAST_SHAPE, mixed=True)
    batch = {"vil": jax.device_put(np.random.default_rng(0).random(
        (B, T, 1, HW, HW), np.float32))}
    t0 = time.time()
    state, aux = step(state, batch)
    jax.block_until_ready(state.params)
    log(f"fast-VAE train step (bf16 B={B}x{T}) compiled in {time.time()-t0:.1f}s")
    times = []
    for _ in range(10):
        t0 = time.time()
        state, aux = step(state, batch)
        float(aux["loss"])  # host readback: the only reliable sync on axon
        times.append(time.time() - t0)
    t_step = float(np.median(times))
    sps = 1.0 / t_step
    log(f"fast-VAE train bf16 B={B}x{T}: {t_step*1000:.1f} ms/step -> "
        f"{sps:.2f} steps/s ({sps*B*T:.1f} frames/s)")
    return sps


def bench_torch_reference():
    """Reference pipeline (torch CPU): per-frame encode loop -> DLinear ->
    per-frame decode loop, structured exactly like ae_s2/train.py."""
    import torch

    sys.path.insert(0, "/root/reference")
    from pipeline.models.autoencoderkl.autoencoder_kl import AutoencoderKL as TorchAKL

    torch.set_num_threads(os.cpu_count() or 8)

    class Cfg:  # DLinear config shim (reference ae_s2 config)
        seq_len, pred_len, kernel_size, individual = T_IN, T_OUT, 25, False
        enc_in = LATENT_C * LATENT_HW * LATENT_HW

    # The reference's own ae_s2/train.py imports wandb/lightning (absent here),
    # so the same DLinear is built inline (structure per ae_s2/train.py:86-133).
    import torch.nn as nn

    class moving_avg(nn.Module):
        def __init__(self, kernel_size, stride):
            super().__init__()
            self.kernel_size = kernel_size
            self.avg = nn.AvgPool1d(kernel_size=kernel_size, stride=stride, padding=0)

        def forward(self, x):
            front = x[:, 0:1, :].repeat(1, (self.kernel_size - 1) // 2, 1)
            end = x[:, -1:, :].repeat(1, (self.kernel_size - 1) // 2, 1)
            x = torch.cat([front, x, end], dim=1)
            return self.avg(x.permute(0, 2, 1)).permute(0, 2, 1)

    class DLinearT(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.ma = moving_avg(c.kernel_size, 1)
            self.ls = nn.Linear(c.seq_len, c.pred_len)
            self.lt = nn.Linear(c.seq_len, c.pred_len)

        def forward(self, x):
            trend = self.ma(x)
            seasonal = x - trend
            out = self.ls(seasonal.permute(0, 2, 1)) + self.lt(trend.permute(0, 2, 1))
            return out.permute(0, 2, 1)

    vae = TorchAKL(in_channels=1, out_channels=1,
                   down_block_types=("DownEncoderBlock2D",) * len(VAE_CHANNELS),
                   up_block_types=("UpDecoderBlock2D",) * len(VAE_CHANNELS),
                   block_out_channels=VAE_CHANNELS, layers_per_block=1,
                   latent_channels=LATENT_C, norm_num_groups=NORM_GROUPS).eval()
    dl = DLinearT(Cfg).eval()

    x = torch.rand(BATCH, T_IN, 1, HW, HW)

    @torch.no_grad()
    def rollout(x):
        # per-frame encode loop (reference ae_s2/train.py:29-38)
        zs = [vae.encode(x[:, i]).mode().unsqueeze(1) for i in range(T_IN)]
        z = torch.cat(zs, dim=1)
        b, t, c, h, w = z.shape
        anchor = z[:, -1:].reshape(b, 1, -1)
        zin = z.reshape(b, t, -1) - anchor
        zp = dl(zin) + anchor
        zp = zp.reshape(b, T_OUT, c, h, w)
        outs = [vae.decode(zp[:, i]).unsqueeze(1) for i in range(T_OUT)]
        return torch.cat(outs, dim=1)

    rollout(x)  # warmup
    times = []
    for _ in range(3):
        t0 = time.time()
        rollout(x)
        times.append(time.time() - t0)
    t_step = float(np.median(times))
    fps = BATCH * T_OUT / t_step
    log(f"torch reference (CPU): {t_step*1000:.1f} ms -> {fps:.2f} frames/sec")
    return fps


def get_baseline_fps():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_fps"]
    log("measuring torch reference baseline (one-time, cached) ...")
    try:
        fps = bench_torch_reference()
    except Exception as e:  # noqa: BLE001 — reference tree/torch may be absent
        log(f"baseline measurement unavailable ({type(e).__name__}: {e}); "
            "using the last recorded value")
        return 1.6757  # measured on this container 2026-08-16 (see RESULTS.md)
    try:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"torch_cpu_fps": fps, "note":
                       "reference pipeline (per-frame loops) on container CPU"}, f)
    except OSError:
        pass
    return fps


def main():
    # The driver's end-of-round bench is the round's perf evidence; ride out
    # tunnel outages on wall-clock, not attempt count (override: WX_BACKEND_WAIT_S).
    wait_for_backend(deadline_s=float(os.environ.get("WX_BACKEND_WAIT_S", "2700")))
    fps, mfu, bwu, extra = bench_jax()
    try:
        (train_sps, train_sps_bf16, train_mfu32, train_mfu16,
         train_sweep) = bench_train()
    except Exception as e:  # noqa: BLE001 — keep the headline JSON line alive
        log(f"train bench failed: {type(e).__name__}: {e}")
        train_sps = train_sps_bf16 = train_mfu32 = train_mfu16 = None
        train_sweep = {}
    if train_sps_bf16 is not None:
        extra["gan_train_bf16_steps_per_sec"] = round(train_sps_bf16, 2)
    if train_mfu32 is not None:
        extra["gan_train_mfu_fp32"] = round(train_mfu32, 4)
    if train_mfu16 is not None:
        extra["gan_train_mfu_bf16"] = round(train_mfu16, 4)
    extra.update(train_sweep)
    try:
        extra["fast_vae_train_steps_per_sec"] = round(bench_fast_vae_train(), 2)
    except Exception as e:  # noqa: BLE001 — keep the headline JSON line alive
        log(f"fast-VAE train bench failed: {type(e).__name__}: {e}")
    baseline = get_baseline_fps()
    out = {
        "metric": "sevirlr_12step_rollout_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline, 2),
        # chip-utilization + training-throughput telemetry (driver-tracked)
        "mfu": round(mfu, 4) if mfu is not None else None,
        "hbm_bw_util": round(bwu, 4) if bwu is not None else None,
        "gan_train_steps_per_sec": (round(train_sps, 2)
                                    if train_sps is not None else None),
        **extra,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
