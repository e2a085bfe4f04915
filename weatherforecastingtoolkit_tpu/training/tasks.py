"""Standard training tasks: frame reconstruction and latent forecasting.

These are the jit-ready objective definitions the reference spread across its
per-experiment LightningModules:
  * reconstruction (AE / AE+TF / ViT-AE): experiments/ae_v2*/train.py
  * latent forecasting on a frozen AE with last-frame residual anchoring:
    experiments/ae_s2/train.py:154-217 and the pretrained_ae_* family.

TPU-first: the reference encodes/decodes frame-by-frame in python loops
(ae_s2/train.py:29-51); here all T frames fold into the batch axis for one
big MXU-friendly conv batch, and the whole loss is one XLA program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from .trainer import Task


def _frames(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C, H, W) -> (B*T, C, H, W)."""
    b, t = x.shape[:2]
    return x.reshape((b * t,) + x.shape[2:])


def _unframes(x: jnp.ndarray, b: int, t: int) -> jnp.ndarray:
    return x.reshape((b, t) + x.shape[1:])


def pixel_loss(kind: str) -> Callable:
    if kind == "l1":
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    if kind == "mse":
        return lambda a, b: jnp.mean((a - b) ** 2)
    if kind == "huber":
        def huber(a, b, delta=1.0):
            d = a - b
            ad = jnp.abs(d)
            return jnp.mean(jnp.where(ad <= delta, 0.5 * d * d,
                                      delta * (ad - 0.5 * delta)))
        return huber
    raise ValueError(kind)


def dequantize(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 batches are shipped raw and dequantized on-device (see
    data/hdf5.py docstring); float batches pass through."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * (1.0 / 255.0)
    return x


def reconstruction_task(model, key: str = "vil", loss: str = "l1",
                        name: str = "recon",
                        mixed_precision: bool = False) -> Task:
    """Frame autoencoder objective. Batch: {key: (B, T, C, H, W)}.

    mixed_precision=True runs the network forward/backward in bf16 against
    fp32 master params (ops/amp.py); the loss reduction stays fp32."""
    loss_fn_px = pixel_loss(loss)

    def init_params(rng):
        dummy = jnp.zeros((1, 1) + _example_hw(model), jnp.float32)
        return model.init(rng, dummy)

    def loss_fn(params, batch, rng, step):
        x = dequantize(batch[key])
        b, t = x.shape[:2]
        frames = _frames(x)
        if mixed_precision:
            from ..ops.amp import cast_floats
            recon, z = model.apply(cast_floats(params), cast_floats(frames),
                                   deterministic=False, rngs={"dropout": rng})
            recon, z = recon.astype(jnp.float32), z.astype(jnp.float32)
        else:
            recon, z = model.apply(params, frames, deterministic=False,
                                   rngs={"dropout": rng})
        loss_val = loss_fn_px(recon, frames)
        return loss_val, {"latent_norm": jnp.mean(jnp.abs(z))}

    def eval_fn(params, batch, rng):
        x = dequantize(batch[key])
        b, t = x.shape[:2]
        recon, _ = model.apply(params, _frames(x))
        return _unframes(recon, b, t), x

    return Task(name=name, init_params=init_params, loss_fn=loss_fn,
                eval_fn=eval_fn)


def _example_hw(model):
    size = getattr(model, "img_size", None)
    if size is not None:
        return (size, size)
    n_down = len(getattr(model, "enc_channels", (0,) * 4))
    hw = getattr(model, "latent_hw", 8) * (2 ** n_down)
    return (hw, hw)


def latent_forecast_task(frozen_ae_apply: Callable, forecaster,
                         input_frames: int, pred_frames: int,
                         latent_shape, decode_apply: Optional[Callable] = None,
                         key: str = "vil", name: str = "latent_forecast",
                         residual_anchor: bool = True,
                         channel_fold: bool = False) -> Task:
    """Forecast a frozen encoder's latents; MSE in latent space.

    frozen_ae_apply(frames (N,C,H,W), rng) -> latents (N, *latent_shape);
    decode_apply(latents) -> frames, used only for eval metrics/panels.
    `residual_anchor` subtracts the last input latent (persistence-anchored
    deltas, reference ae_s2/train.py:158-161).

    `channel_fold=True` folds latent channels into the SEQUENCE axis: the
    forecaster sees (B, T*C, h*w) — time-and-channel rows over spatial
    features — instead of (B, T, C*h*w). The reference's `_indc_indp`
    variant (pretrained_ae_dlinear_indc_indp/train.py:73-89,161): its
    DLinear linears are (seq_len*4 -> pred_len*4) over the folded axis, with
    `individual` giving each spatial position its own linear. Size the
    forecaster with seq_len=input_frames*C, pred_len=pred_frames*C.
    """
    c_lat = int(latent_shape[0]) if channel_fold else 1

    def _fold(z, b, t):
        # (B, T, C, hw) -> (B, T*C, hw) | identity for the flat layout
        return z.reshape(b, t * c_lat, -1) if channel_fold else z

    def init_params(rng):
        d = int(jnp.prod(jnp.asarray(latent_shape)))
        if channel_fold:
            dummy = jnp.zeros((1, input_frames * c_lat, d // c_lat), jnp.float32)
        else:
            dummy = jnp.zeros((1, input_frames, d), jnp.float32)
        return forecaster.init(rng, dummy)

    def _encode_seq(x, rng):
        b, t = x.shape[:2]
        z = frozen_ae_apply(_frames(x), rng)          # (B*T, *latent_shape)
        if channel_fold:
            return z.reshape(b, t, c_lat, -1)         # (B, T, C, hw)
        return z.reshape(b, t, -1)                    # (B, T, D)

    def _split_anchor(z):
        # works on both layouts: the anchor (last input frame) broadcasts
        # over the time axis, per-channel in the 4-D channel_fold layout
        inp, tgt = z[:, :input_frames], z[:, input_frames:]
        if residual_anchor:
            anchor = inp[:, -1:]
            return inp - anchor, tgt - anchor, anchor
        return inp, tgt, jnp.zeros_like(inp[:, -1:])

    def loss_fn(params, batch, rng, step):
        x = dequantize(batch[key])
        b = x.shape[0]
        z = _encode_seq(x, rng)
        inp, tgt, _ = _split_anchor(z)
        pred = forecaster.apply(params, _fold(inp, b, input_frames))
        loss_val = jnp.mean((pred - _fold(tgt, b, pred_frames)) ** 2)
        return loss_val, {}

    def eval_fn(params, batch, rng):
        x = dequantize(batch[key])
        b = x.shape[0]
        z = _encode_seq(x, rng)
        inp, tgt, anchor = _split_anchor(z)
        pred = forecaster.apply(params, _fold(inp, b, input_frames))
        if channel_fold:
            pred = pred.reshape(tgt.shape)
        pred = pred + anchor
        tgt = tgt + anchor
        if decode_apply is None:
            # latent-space "images" for loss-only eval
            if channel_fold:
                pred = pred.reshape(b, pred_frames, -1)
                tgt = tgt.reshape(b, pred_frames, -1)
            return pred[..., None, None, :], tgt[..., None, None, :]
        shp = (b * pred_frames,) + tuple(latent_shape)
        dec_pred = decode_apply(pred.reshape(shp))
        dec_tgt = decode_apply(tgt.reshape(shp))
        return (_unframes(dec_pred, b, pred_frames),
                _unframes(dec_tgt, b, pred_frames))

    return Task(name=name, init_params=init_params, loss_fn=loss_fn,
                eval_fn=eval_fn)
