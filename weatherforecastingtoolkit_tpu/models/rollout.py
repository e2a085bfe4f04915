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

    def pipeline(fc_params, frames_in):
        x = frames_in
        if dequantize and x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        b = x.shape[0]
        z = encode_apply(_fold(x))                    # (B*T_in, ...)
        latent_shape = z.shape[1:]
        z = z.reshape(b, input_frames, -1)            # (B, T_in, D)

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

    return pipeline


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
