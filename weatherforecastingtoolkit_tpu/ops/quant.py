"""int8 quantized convolution for the TPU serving path.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (measured on this
chip: ~200 TOP/s sustained vs ~116 TFLOP/s for the same chained conv — a
1.7x kernel-level win). This module provides post-training dynamic
quantization for conv stacks:

  * weights: symmetric per-output-channel scales (max|w| / 127), quantized
    in-graph from the fp32/bf16 checkpoint — no separate quantized
    checkpoint format, XLA folds the quantization of the (small) weight
    tensors outside the hot loop;
  * activations: symmetric per-tensor dynamic scale (max|x| / 127) computed
    on the fly — one extra reduction per conv, fused by XLA into the
    producer;
  * accumulation in int32 on the MXU, dequantize + bias in fp32 epilogue.

`QConv` is a drop-in for the `nn.Conv` call sites in the VAE blocks: the
parameter tree ('kernel', 'bias', lecun-normal init, HWIO layout) is
IDENTICAL to nn.Conv, so existing checkpoints load unchanged and
`mode="native"` reproduces nn.Conv numerics exactly. The bench's SSIM gate
(bench.py) is the quality contract for the int8 path, as it is for bf16.

Modes: "native" (nn.Conv numerics), "int8" (dynamic per-tensor activation
scales), "calibrate" (native compute + sow per-input-channel abs-max into a
'qstats' collection), "int8_static" (calibrated scales folded into the
weights — the fast deployment path), and "fake_quant" (int8_static numerics
in float math with straight-through-estimator gradients — quantization-aware
fine-tuning so trained weights adapt to the int8 grid before deployment;
`experiments/perf/int8_qat.py` is the end-to-end recipe).

No reference counterpart (the reference serves fp32 torch,
experiments/ae_s2/train.py:29-51); this is TPU-native serving capability.
"""

from __future__ import annotations

import fnmatch
from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

CONV_MODES = ("native", "int8", "int8_static", "calibrate", "fake_quant")

# a conv mode is either one of CONV_MODES (global) or a MIXED spec: a tuple of
# (fnmatch pattern over the module path, mode) pairs, first match wins,
# unmatched convs run native. Lets the serving path keep the few
# quantization-SENSITIVE conv families in bf16/fp32 while the rest run
# int8_static (per-layer sensitivity sweep: experiments/perf/int8_mixed.py).
ConvMode = Union[str, Tuple[Tuple[str, str], ...]]


def resolve_conv_mode(mode: ConvMode, path: Sequence[str]) -> str:
    """Resolve a (possibly mixed) conv-mode spec for the conv at `path`.

    `path` is the flax module path (QConv's `self.path`). String specs apply
    globally; tuple specs are (pattern, mode) pairs matched with fnmatch
    against "/".join(path) — e.g. (("decoder/conv_out", "native"),
    ("*", "int8_static")). Unmatched paths default to "native".
    """
    if isinstance(mode, str):
        return mode
    p = "/".join(path)
    for pat, m in mode:
        if fnmatch.fnmatch(p, pat):
            return m
    return "native"


def mixed_mode_uses(mode: ConvMode, target: str) -> bool:
    """True if `mode` is (or can resolve to) `target` anywhere."""
    if isinstance(mode, str):
        return mode == target
    return any(m == target for _pat, m in mode)


def _as_pad(padding: Union[str, int, Sequence[Tuple[int, int]]], nd: int = 2):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding),) * nd
    return tuple(tuple(p) for p in padding)


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias, strides, padding
              ) -> jnp.ndarray:
    """Dynamically quantized NHWC conv: int8 MXU matmuls, fp32 epilogue.

    x: (N, H, W, Cin); kernel: (kh, kw, Cin, Cout) in fp32/bf16.
    Returns x.dtype. Degenerate all-zero tensors map to scale 1 (outputs 0).
    """
    kf = kernel.astype(jnp.float32)
    w_absmax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))            # (Cout,)
    s_w = jnp.where(w_absmax > 0, w_absmax / 127.0, 1.0)
    wq = jnp.round(kf / s_w).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    x_absmax = jnp.max(jnp.abs(xf))
    s_x = jnp.where(x_absmax > 0, x_absmax / 127.0, 1.0)
    xq = jnp.round(xf / s_x).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(xq, wq, strides, _as_pad(padding),
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * s_w)                    # (Cout,) bcast
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def calibrate(model_apply, variables, batches):
    """Collect per-conv per-input-channel abs-max over calibration batches.

    `model_apply(variables, batch)` must run the model built with
    conv_mode="calibrate" and `mutable=["qstats"]`, returning
    (out, mutated_variables). Maxima accumulate across batches (sow
    reduce_fn). Returns the collection to pass as variables["qscales"] to the
    conv_mode="int8_static" model — its structure mirrors the param tree, and
    the 'params' collection itself is untouched (fp32/bf16 checkpoints serve
    quantized as-is).
    """
    qscales = None
    for batch in batches:
        v = dict(variables)
        if qscales is not None:
            v["qstats"] = qscales
        _, mut = model_apply(v, batch)
        qscales = mut["qstats"]
    if qscales is None:
        raise ValueError("calibrate() needs at least one batch")
    return qscales


def int8_conv_static(x: jnp.ndarray, kernel: jnp.ndarray, bias,
                     strides, padding, act_absmax: jnp.ndarray) -> jnp.ndarray:
    """Statically-calibrated W8A8 conv: per-INPUT-channel activation scales
    folded into the weights, so the activation path is one fused
    multiply+round+clip+cast — no per-batch abs-max reduction pass (the
    measured cost that made dynamic int8 a net loss, RESULTS.md round 2).

    act_absmax: (Cin,) calibration abs-max of this conv's input. The folding
    identity: sum_k (x_k / s_k) * (w_k * s_k) == sum_k x_k w_k, with the
    weight-side product quantized per output channel. Everything weight-side
    is constant-folded by XLA at compile time (static scales).
    """
    s_a = jnp.maximum(act_absmax.astype(jnp.float32), 1e-12) / 127.0  # (Cin,)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_a), -127, 127
                  ).astype(jnp.int8)

    kf = kernel.astype(jnp.float32) * s_a[None, None, :, None]
    w_absmax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))               # (Cout,)
    s_w = jnp.where(w_absmax > 0, w_absmax / 127.0, 1.0)
    wq = jnp.round(kf / s_w).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(xq, wq, strides, _as_pad(padding),
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s_w
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ste_round(v: jnp.ndarray) -> jnp.ndarray:
    """round() with a straight-through-estimator gradient (identity)."""
    return v + lax.stop_gradient(jnp.round(v) - v)


def fake_quant_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias,
                    strides, padding, act_absmax: jnp.ndarray) -> jnp.ndarray:
    """Quantization-aware-training forward: `int8_conv_static` numerics
    simulated in float math with straight-through-estimator gradients.

    Identical scale/round/clip pipeline to `int8_conv_static` (same folded
    per-input-channel activation scales, same per-output-channel weight
    scales), except the integer matmul runs in fp32 — so a model fine-tuned
    in this mode sees (to within int32-vs-fp32 accumulation) exactly the
    values the deployed int8_static path will produce, and its weights adapt
    to the quantization grid. Gradients: rounds are STE (identity), the
    activation clip is a clipped-STE (zero outside [-127, 127] counts), and
    the weight scale s_w is treated as a constant (stop_gradient), the
    standard fixed-scale QAT recipe.
    """
    s_a = jnp.maximum(act_absmax.astype(jnp.float32), 1e-12) / 127.0  # (Cin,)
    xq = jnp.clip(_ste_round(x.astype(jnp.float32) / s_a), -127.0, 127.0)

    kf = kernel.astype(jnp.float32) * s_a[None, None, :, None]
    w_absmax = lax.stop_gradient(jnp.max(jnp.abs(kf), axis=(0, 1, 2)))
    s_w = jnp.where(w_absmax > 0, w_absmax / 127.0, 1.0)       # (Cout,)
    wq = _ste_round(kf / s_w)

    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(xq, wq, strides, _as_pad(padding),
                                 dimension_numbers=dn)
    y = y * s_w
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class QConv(nn.Module):
    """nn.Conv-compatible conv with a quantized serving mode.

    mode="native" is numerically identical to flax nn.Conv (same params,
    same init, same promotion rule); mode="int8" runs `int8_conv`. A tuple
    mode is a mixed per-layer spec resolved against this conv's module path
    (see `resolve_conv_mode`).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Any = "SAME"
    use_bias: bool = True
    mode: ConvMode = "native"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mode = resolve_conv_mode(self.mode, self.path)
        if mode not in CONV_MODES:
            raise ValueError(f"conv mode {mode!r} not in {CONV_MODES}")
        kh, kw = self.kernel_size
        strides = ((self.strides,) * 2 if isinstance(self.strides, int)
                   else tuple(self.strides))
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if mode == "int8":
            return int8_conv(x, kernel, bias, strides, self.padding)
        if mode in ("int8_static", "fake_quant"):
            # calibration scales live in their own 'qscales' collection so the
            # 'params' tree stays checkpoint-identical to nn.Conv
            absmax = self.variable(
                "qscales", "act_absmax",
                lambda: jnp.ones((x.shape[-1],), jnp.float32))
            fn = (int8_conv_static if mode == "int8_static"
                  else fake_quant_conv)
            return fn(x, kernel, bias, strides, self.padding, absmax.value)
        if mode == "calibrate":
            # record per-input-channel abs-max into 'qstats' (reduce=max over
            # calls/batches), compute natively
            self.sow("qstats", "act_absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32)),
                             axis=tuple(range(x.ndim - 1))),
                     reduce_fn=lambda a, b: jnp.maximum(a, b),
                     init_fn=lambda: jnp.zeros((x.shape[-1],), jnp.float32))
        # native: mirror nn.Conv's dtype promotion (inputs & params promote)
        dtype = jnp.promote_types(x.dtype, kernel.dtype)
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(x.astype(dtype), kernel.astype(dtype),
                                     strides, _as_pad(self.padding),
                                     dimension_numbers=dn)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y
