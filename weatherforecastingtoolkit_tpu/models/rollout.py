"""The latent forecast rollout engine — the framework's benchmark path.

Capability parity with the reference's Path-B inference chain
(reference experiments/ae_s2/train.py:154-217): encode frames with a frozen
VAE, residual-anchor the latents against the last input frame, forecast with
a latent temporal model, de-anchor, decode back to pixels. Plus the
persistence baseline the reference measures against (README.md:80-92).

TPU-first design (why this is >10x the reference loop):
  * the reference encodes/decodes ONE FRAME AT A TIME in python
    (ae_s2/train.py:29-51) — here all T frames fold into the batch axis, so
    the MXU sees (B*T)-sized conv batches;
  * encode -> forecast -> decode is ONE jitted program: no host round-trips,
    XLA fuses the rescale/anchoring elementwise work into the conv epilogues;
  * the autoregressive variant is a jax.lax.scan whose carry is the sliding
    latent window — weights stay resident in HBM/VMEM across steps instead of
    being re-dispatched per python iteration;
  * frames can arrive as uint8 and are dequantized on-chip (4x less PCIe/DMA).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def persistence_baseline(frames_in: jnp.ndarray, n_steps: int) -> jnp.ndarray:
    """Repeat the last input frame n_steps times: (B,T,C,H,W) -> (B,n,C,H,W)."""
    last = frames_in[:, -1:]
    return jnp.repeat(last, n_steps, axis=1)


def _fold(x: jnp.ndarray) -> jnp.ndarray:
    b, t = x.shape[:2]
    return x.reshape((b * t,) + x.shape[2:])


def _unfold(x: jnp.ndarray, b: int, t: int) -> jnp.ndarray:
    return x.reshape((b, t) + x.shape[1:])


def _make_forecast_decode(
    decode_apply: Callable,
    forecaster_apply: Callable,
    pred_frames: int,
    residual_anchor: bool,
    autoregressive: bool,
) -> Callable:
    """Shared latent-forecast-and-decode core: (fc_params, z (B,T_in,D),
    latent_shape) -> frames (B, pred_frames, C, H, W)."""

    def forecast_decode(fc_params, z, latent_shape):
        b = z.shape[0]
        anchor = z[:, -1:] if residual_anchor else jnp.zeros_like(z[:, -1:])
        zin = z - anchor

        if not autoregressive:
            zpred = forecaster_apply(fc_params, zin)  # (B, T_out, D)
        else:
            def step(window, _):
                nxt = forecaster_apply(fc_params, window)[:, :1]  # one step
                window = jnp.concatenate([window[:, 1:], nxt], axis=1)
                return window, nxt[:, 0]

            _, steps = jax.lax.scan(step, zin, None, length=pred_frames)
            zpred = jnp.transpose(steps, (1, 0, 2))   # (B, T_out, D)

        zpred = zpred + anchor
        dec_in = zpred.reshape((b * pred_frames,) + latent_shape)
        frames = decode_apply(dec_in)                 # (B*T_out, C, H, W)
        return _unfold(frames, b, pred_frames)

    return forecast_decode


def make_forecast_pipeline(
    *,
    encode_apply: Callable,   # (frames (N,C,H,W)) -> latents (N, ...)
    decode_apply: Callable,   # (latents (N, ...)) -> frames (N,C,H,W)
    forecaster_apply: Callable,  # (fc_params, (B,T,D)) -> (B,T_out,D)
    input_frames: int,
    pred_frames: int,
    residual_anchor: bool = True,
    autoregressive: bool = False,
    dequantize: bool = True,
) -> Callable:
    """Build pipeline(fc_params, frames_in) -> predicted frames.

    frames_in: (B, input_frames, C, H, W) float in [0,1] or uint8.
    Returns (B, pred_frames, C, H, W). The returned function is jittable; wrap
    with jax.jit once at the call site (bench/eval does).

    autoregressive=True forecasts ONE latent step per scan iteration with a
    sliding window (window length = input_frames); False emits all pred_frames
    in one shot (the reference DLinear semantics).
    """
    forecast_decode = _make_forecast_decode(
        decode_apply, forecaster_apply, pred_frames, residual_anchor,
        autoregressive)

    def pipeline(fc_params, frames_in):
        x = frames_in
        if dequantize and x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        b = x.shape[0]
        z = encode_apply(_fold(x))                    # (B*T_in, ...)
        latent_shape = z.shape[1:]
        z = z.reshape(b, input_frames, -1)            # (B, T_in, D)
        return forecast_decode(fc_params, z, latent_shape)

    return pipeline


def make_ensemble_pipeline(
    *,
    encode_apply: Callable,   # (frames (N,C,H,W)) -> latents (N, ...)
    decode_apply: Callable,   # (latents (N, ...)) -> frames (N,C,H,W)
    forecaster_apply: Callable,  # (fc_params, (B,T,D)) -> (B,T_out,D)
    input_frames: int,
    pred_frames: int,
    n_members: int,
    encode_sample_apply: Optional[Callable] = None,  # (key, frames) -> latents
    residual_anchor: bool = True,
    autoregressive: bool = False,
    dequantize: bool = True,
) -> Callable:
    """Build ensemble(fc_params, frames_in, key, noise_std) ->
    (B, n_members, pred_frames, C, H, W) — a probabilistic rollout whose
    output plugs straight into `calc_metrics`' ensemble axis (the reference's
    CRPS, pipeline/metrics.py:18-41, is Gaussian-over-ensemble but every
    reference call site feeds it a single member, degenerating it to MAE;
    this is the producer that makes the metric mean something).

    Spread sources (composable):
      * latent-noise perturbation: each member adds N(0, noise_std^2) to the
        anchored input latents. noise_std is a TRACED scalar argument of the
        returned function, so calibration sweeps it without recompiling.
      * posterior sampling: pass encode_sample_apply (key, frames) -> z that
        samples the VAE posterior instead of taking its mode; members then
        also differ by encoder uncertainty.

    TPU-first: members are a jax.vmap axis — one compiled program computes
    all N rollouts batched on the MXU; when encode_sample_apply is None the
    (deterministic) encoder runs ONCE outside the vmap and only the
    forecast+decode is replicated.
    """
    forecast_decode = _make_forecast_decode(
        decode_apply, forecaster_apply, pred_frames, residual_anchor,
        autoregressive)

    def ensemble(fc_params, frames_in, key, noise_std):
        x = frames_in
        if dequantize and x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        b = x.shape[0]
        keys = jax.random.split(key, n_members)

        if encode_sample_apply is None:
            z = encode_apply(_fold(x))                # (B*T_in, ...)
            latent_shape = z.shape[1:]
            z = z.reshape(b, input_frames, -1)

            def member(k):
                zn = z + noise_std * jax.random.normal(k, z.shape, z.dtype)
                return forecast_decode(fc_params, zn, latent_shape)
        else:
            flat = _fold(x)
            latent_shape = jax.eval_shape(
                lambda kk: encode_sample_apply(kk, flat), keys[0]).shape[1:]

            def member(k):
                k_enc, k_noise = jax.random.split(k)
                z = encode_sample_apply(k_enc, flat)
                z = z.reshape(b, input_frames, -1)
                zn = z + noise_std * jax.random.normal(k_noise, z.shape,
                                                       z.dtype)
                return forecast_decode(fc_params, zn, latent_shape)

        out = jax.vmap(member)(keys)   # (N, B, T_out, C, H, W)
        return jnp.moveaxis(out, 0, 1)

    return ensemble


def make_streaming_forecaster(
    *,
    encode_apply: Callable,   # (frames (N,C,H,W)) -> latents (N, ...)
    decode_apply: Callable,   # (latents (N, ...)) -> frames (N,C,H,W)
    forecaster_apply: Callable,  # (fc_params, (B,T,D)) -> (B,T_out,D)
    input_frames: int,
    pred_frames: int,
    latent_shape: Tuple[int, ...],
    residual_anchor: bool = True,
    autoregressive: bool = False,
    dequantize: bool = True,
) -> Tuple[Callable, Callable]:
    """Operational (streaming) serving mode: keep a sliding LATENT window so
    each new radar frame costs ONE frame encode + forecast + decode — the
    batch pipeline re-encodes all `input_frames` every call.

    Returns (init, step), both jittable:
      init(frames_in (B, input_frames, C, H, W)) -> state   (latent window)
      step(fc_params, state, frame (B, C, H, W)) -> (state, forecast)
    with forecast (B, pred_frames, C, H, W) identical to running the batch
    pipeline on the window ending at `frame` (tests pin this equality).

    latent_shape is the per-frame latent shape the decoder expects (e.g.
    (64, 8, 8)) — static, so the caller supplies it. The reference has no
    serving path at all (evaluation is a Trainer mode, SURVEY §3.3); this is
    the 5-minute-cadence radar loop it would have needed in production.
    """
    forecast_decode = _make_forecast_decode(
        decode_apply, forecaster_apply, pred_frames, residual_anchor,
        autoregressive)

    def _dequant(x):
        if dequantize and x.dtype == jnp.uint8:
            return x.astype(jnp.float32) * (1.0 / 255.0)
        return x

    def init(frames_in):
        x = _dequant(frames_in)
        b = x.shape[0]
        z = encode_apply(_fold(x))
        return z.reshape(b, input_frames, -1)

    def step(fc_params, z_window, frame):
        x = _dequant(frame)
        z_new = encode_apply(x).reshape(x.shape[0], 1, -1)
        z_window = jnp.concatenate([z_window[:, 1:], z_new], axis=1)
        return z_window, forecast_decode(fc_params, z_window, latent_shape)

    return init, step


def make_ensemble_eval_fn(ensemble: Callable, input_frames: int,
                          pred_frames: int, dequantize: bool = True
                          ) -> Callable:
    """(fc_params, full_seq (B,T_in+T_out,C,H,W), key, noise_std) ->
    (ens_pred (B,N,T_out,C,H,W), target, persistence)."""

    def eval_fn(fc_params, seq, key, noise_std):
        x = seq
        if dequantize and x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        frames_in = x[:, :input_frames]
        target = x[:, input_frames:input_frames + pred_frames]
        pred = ensemble(fc_params, frames_in, key, noise_std)
        persist = persistence_baseline(frames_in, pred_frames)
        return pred, target, persist

    return eval_fn


def calibrate_noise_std(ensemble_eval_fn: Callable, fc_params, batches,
                        stds, key) -> Tuple[float, dict]:
    """Pick the latent-noise std minimizing ensemble CRPS on held-out batches.

    Because noise_std is a traced argument of the ensemble program, the whole
    sweep reuses ONE compiled executable. Returns (best_std, {std: crps});
    stds should include 0.0 so the deterministic baseline is in the table.
    """
    from ..metrics import crps as _crps

    jitted = jax.jit(ensemble_eval_fn)
    batches = list(batches)
    table = {}
    for s in stds:
        tot = 0.0
        for i, batch in enumerate(batches):
            k = jax.random.fold_in(key, i)   # same member draws across stds
            pred, target, _ = jitted(fc_params, batch, k, float(s))
            tot += _crps(pred, target)
        table[float(s)] = tot / max(len(batches), 1)
    best = min(table, key=table.get)
    return best, table


def make_eval_fn(pipeline: Callable, input_frames: int, pred_frames: int,
                 dequantize: bool = True) -> Callable:
    """(fc_params, full_seq (B, T_in+T_out, C, H, W)) ->
    (pred, target, persistence) pixel tensors for metric computation."""

    def eval_fn(fc_params, seq):
        x = seq
        if dequantize and x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        frames_in = x[:, :input_frames]
        target = x[:, input_frames:input_frames + pred_frames]
        pred = pipeline(fc_params, frames_in)
        persist = persistence_baseline(frames_in, pred_frames)
        return pred, target, persist

    return eval_fn


def evaluate_vs_persistence(eval_fn: Callable, fc_params, batches,
                            calc_metrics: Optional[Callable] = None):
    """Aggregate the full metric dict for model and persistence over batches.

    Returns (model_metrics, persistence_metrics) averaged over batches —
    the reference's test_step + persistence comparison
    (README.md:80-92, ae_s2/train.py:194-217)."""
    if calc_metrics is None:
        from ..metrics import calc_metrics as _cm
        calc_metrics = _cm
    sums_m, sums_p, n = {}, {}, 0
    jitted = jax.jit(eval_fn)
    for batch in batches:
        pred, target, persist = jitted(fc_params, batch)
        for store, p in ((sums_m, pred), (sums_p, persist)):
            m = calc_metrics(p, target)
            for k, v in m.items():
                store[k] = store.get(k, 0.0) + v
        n += 1
    return ({k: v / n for k, v in sums_m.items()},
            {k: v / n for k, v in sums_p.items()})
