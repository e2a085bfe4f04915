"""AlphaPre: FFT amplitude/phase decomposition forecaster.

Capability parity with the reference's physics-direction model
(reference pipeline/models/alphapre/alpha.py):
  * AmpTimeCell — rfft2 over (H, W), complex linear mixing over the T axis via
    explicit real/imag einsums with ReLU between stages, irfft2, + time-MLP
    bias (alpha.py:9-47)
  * AmpCell — time-MLP residual + AmpTimeCell + (T*C)-channel conv residual
    (alpha.py:50-76)
  * AmpliNet — per-frame ResnetBlock conv-in, AmpCell stack, conv-out, global
    time-MLP skip (alpha.py:79-112)
  * PhaseNet — predict future PHASE from past phases + (u, v) frequency
    coordinates via three parallel ResNet branches; reconstruct frames with
    the last amplitude and predicted phase (alpha.py:115-164)
  * AlphaMixer — low-frequency spec_mask recombination + conv mixer
    (alpha.py:166-189)
  * AlphaPre.predict — 4-term loss: MSE + masked phase-cosine + linearly
    decayed amplitude MSE + AmpliNet MSE (alpha.py:229-255). The reference
    mutates self.amp_weight per call; here the decay is a pure function of
    the step counter (jit-safe, resume-correct).

TPU notes: rfft2/irfft2 lower to XLA FFT; the complex time-mixing einsums are
MXU matmuls batched over (B, C, H, W_f); everything is one jittable program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ----------------------------------------------------------------- primitives
class Block(nn.Module):
    """conv(k) + GroupNorm + SiLU on (N, C, H, W) (reference alpha.py:258-269)."""

    dim_out: int
    groups: int = 8
    kernel_size: int = 3
    padding_mode: str = "zeros"  # 'zeros' | 'circular'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jnp.transpose(x, (0, 2, 3, 1))
        pad = self.kernel_size // 2
        if self.padding_mode == "circular" and pad:
            h = jnp.pad(h, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="wrap")
            padding = "VALID"
        else:
            padding = pad
        h = nn.Conv(self.dim_out, (self.kernel_size, self.kernel_size),
                    padding=padding, name="proj")(h)
        h = nn.GroupNorm(num_groups=min(self.groups, self.dim_out),
                         name="norm")(h)
        h = nn.silu(h)
        return jnp.transpose(h, (0, 3, 1, 2))


class ResnetBlock(nn.Module):
    dim_out: int
    groups: int = 8
    kernel_size: int = 3
    padding_mode: str = "zeros"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Block(self.dim_out, self.groups, self.kernel_size,
                  self.padding_mode, name="block1")(x)
        h = Block(self.dim_out, self.groups, self.kernel_size,
                  self.padding_mode, name="block2")(h)
        if x.shape[1] != self.dim_out:
            res = jnp.transpose(
                nn.Conv(self.dim_out, (1, 1), name="res_conv")(
                    jnp.transpose(x, (0, 2, 3, 1))), (0, 3, 1, 2))
        else:
            res = x
        return h + res


class TimeMLP(nn.Module):
    """Linear-SELU-Linear over the trailing time axis (reference tmlp)."""

    t_out: int
    size_factor: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(int(self.t_out * self.size_factor), name="fc1")(x)
        h = nn.selu(h)
        return nn.Dense(self.t_out, name="fc2")(h)


# ----------------------------------------------------------------- amplitude
class AmpTimeCell(nn.Module):
    t_in: int
    t_out: int
    size_factor: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T_in, C, H, W) -> (B, T_out, C, H, W)."""
        def p(name, shape):
            return self.param(name, nn.initializers.normal(0.02), shape)

        t_mid = self.t_out * self.size_factor
        w1 = p("w1", (2, self.t_in, t_mid))
        b1 = p("b1", (2, 1, 1, 1, t_mid))
        w2 = p("w2", (2, t_mid, self.t_out))
        b2 = p("b2", (2, 1, 1, 1, self.t_out))

        xt = jnp.transpose(x, (0, 2, 3, 4, 1))          # (B, C, H, W, T)
        bias = TimeMLP(self.t_out, self.size_factor, name="tmlp")(xt)
        xf = jnp.fft.rfft2(xt, axes=(2, 3), norm="ortho")

        def cmix(re, im, w, b):
            r = jnp.einsum("bchwt,to->bchwo", re, w[0]) - \
                jnp.einsum("bchwt,to->bchwo", im, w[1]) + b[0]
            i = jnp.einsum("bchwt,to->bchwo", re, w[1]) + \
                jnp.einsum("bchwt,to->bchwo", im, w[0]) + b[1]
            return r, i

        r, i = cmix(xf.real, xf.imag, w1, b1)
        r, i = nn.relu(r), nn.relu(i)
        r, i = cmix(r, i, w2, b2)
        xt = jnp.fft.irfft2(r + 1j * i, s=x.shape[-2:], axes=(2, 3), norm="ortho")
        xt = xt + bias
        return jnp.transpose(xt, (0, 4, 1, 2, 3))


class AmpCell(nn.Module):
    t_in: int
    t_out: int
    dim: int
    size_factor: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xt = jnp.transpose(x, (0, 2, 3, 4, 1))
        residual = jnp.transpose(
            TimeMLP(self.t_out, self.size_factor, name="tmlp")(xt),
            (0, 4, 1, 2, 3))
        x = AmpTimeCell(self.t_in, self.t_out, name="amptime")(x) + residual

        b, t, c, h, w = x.shape
        flat = x.reshape(b, t * c, h, w)
        hconv = jnp.transpose(flat, (0, 2, 3, 1))
        hconv = nn.Conv(t * c, (3, 3), padding=1, name="conv1")(hconv)
        hconv = nn.GroupNorm(num_groups=4, name="norm")(hconv)
        hconv = nn.silu(hconv)
        hconv = nn.Conv(t * c, (3, 3), padding=1, name="conv2")(hconv)
        flat = jnp.transpose(hconv, (0, 3, 1, 2))
        return flat.reshape(b, t, c, h, w) + x


class AmpliNet(nn.Module):
    pre_seq_length: int
    aft_seq_length: int
    dim: int
    hidden_dim: int
    n_layers: int = 3
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t = x.shape[:2]
        frames = x.reshape((b * t,) + x.shape[2:])
        frames = ResnetBlock(self.hidden_dim, name="convin_0")(frames)
        frames = ResnetBlock(self.hidden_dim, name="convin_1")(frames)
        frames = jnp.transpose(
            nn.Conv(self.hidden_dim, (1, 1), name="convin_2")(
                jnp.transpose(frames, (0, 2, 3, 1))), (0, 3, 1, 2))
        x = frames.reshape(b, t, self.hidden_dim, *x.shape[3:])

        xt = jnp.transpose(x, (0, 2, 3, 4, 1))
        xr = TimeMLP(self.aft_seq_length, self.mlp_ratio, name="tmlp")(xt)
        xr = jnp.transpose(xr, (0, 4, 1, 2, 3))  # (B, T_out, hid, H, W)

        for i in range(self.n_layers):
            t_in = self.pre_seq_length if i == 0 else self.aft_seq_length
            x = AmpCell(t_in, self.aft_seq_length, self.hidden_dim,
                        name=f"amp_{i}")(x)
        x = x + xr

        bt = b * self.aft_seq_length
        out = x.reshape((bt, self.hidden_dim) + x.shape[3:])
        out = ResnetBlock(self.hidden_dim, name="convout_0")(out)
        out = ResnetBlock(self.hidden_dim, name="convout_1")(out)
        out = jnp.transpose(
            nn.Conv(self.dim, (1, 1), name="convout_2")(
                jnp.transpose(out, (0, 2, 3, 1))), (0, 3, 1, 2))
        return out.reshape(b, self.aft_seq_length, self.dim, *x.shape[3:])


# ----------------------------------------------------------------- phase
class PhaseNet(nn.Module):
    input_shape: Tuple[int, int]
    pre_seq_length: int
    aft_seq_length: int
    input_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, t, c, h, w = x.shape
        x_fft = jnp.fft.rfft2(x)                      # over (H, W)
        x_amps = jnp.abs(x_fft)
        x_phas = jnp.angle(x_fft) / jnp.pi            # pha_norm
        wf = x_phas.shape[-1]

        u = jnp.fft.fftfreq(h)
        v = jnp.fft.rfftfreq(w)
        uu, vv = jnp.meshgrid(u, v, indexing="ij")
        uv = jnp.stack([uu, vv], axis=0)              # (2, H, W_f)
        uv = jnp.broadcast_to(uv[None], (b, 2, h, wf))

        phas_flat = x_phas.reshape(b, t * c, h, wf)
        x_puv = jnp.concatenate([phas_flat, uv], axis=1)
        out_ch = self.input_dim * self.aft_seq_length

        def conv1x1(name, ch, inp):
            return jnp.transpose(
                nn.Conv(ch, (1, 1), name=name)(jnp.transpose(inp, (0, 2, 3, 1))),
                (0, 3, 1, 2))

        x_phast = conv1x1("pha_conv0", out_ch, x_puv)

        def branch(name, ksize, pad_mode):
            hbr = ResnetBlock(self.hidden_dim, kernel_size=ksize,
                              padding_mode=pad_mode, name=f"{name}_0")(x_puv)
            hbr = ResnetBlock(self.hidden_dim, kernel_size=ksize,
                              padding_mode=pad_mode, name=f"{name}_1")(hbr)
            return conv1x1(f"{name}_2", out_ch, hbr)

        x0 = x_phast + branch("phase_0", 1, "zeros")
        x1 = x_phast * branch("phase_1", 1, "zeros")
        x2 = x_phast * branch("phase_2", 3, "circular")
        cat = jnp.concatenate([x_phast, x0, x1, x2], axis=1)
        pha_t = conv1x1("pha_conv1", out_ch, cat)
        pha_t = pha_t.reshape(b, self.aft_seq_length, self.input_dim, h, wf)
        pha_t = x_phas[:, -1:] + pha_t
        pha_t = pha_t * jnp.pi                         # pha_unnorm
        xt_fft = x_amps[:, -1:] * jnp.exp(1j * pha_t)
        xt = jnp.fft.irfft2(xt_fft, s=(h, w))
        return xt, pha_t, x_amps


# ----------------------------------------------------------------- mixer
def make_spec_mask(h: int, w: int, spec_num: int) -> jnp.ndarray:
    """Low-frequency mask over the rfft2 grid (reference alpha.py:172-175)."""
    mask = np.zeros((h, w // 2 + 1), dtype=np.float32)
    mask[:spec_num, :spec_num] = 1.0
    mask[-spec_num:, :spec_num] = 1.0
    return jnp.asarray(mask)


class AlphaMixer(nn.Module):
    input_shape: Tuple[int, int]
    spec_num: int
    input_dim: int
    hidden_dim: int
    aft_seq_length: int

    @nn.compact
    def __call__(self, xas, xps, phas):
        h, w = self.input_shape
        spec_mask = make_spec_mask(h, w, self.spec_num)
        amps = jnp.abs(jnp.fft.rfft2(xas))
        alpha_fft = amps * spec_mask * jnp.exp(1j * phas)
        alpha = jnp.fft.irfft2(alpha_fft, s=(h, w))
        xap = jnp.concatenate([xas, xps, alpha], axis=2)  # channel axis
        b, t = xap.shape[:2]
        flat = xap.reshape((b * t,) + xap.shape[2:])
        flat = ResnetBlock(self.hidden_dim, name="mix_0")(flat)
        flat = ResnetBlock(self.hidden_dim, name="mix_1")(flat)
        flat = jnp.transpose(
            nn.Conv(self.input_dim, (1, 1), name="mix_2")(
                jnp.transpose(flat, (0, 2, 3, 1))), (0, 3, 1, 2))
        return flat.reshape(b, t, self.input_dim, h, w)


# ----------------------------------------------------------------- full model
class AlphaPre(nn.Module):
    pre_seq_length: int
    aft_seq_length: int
    input_shape: Tuple[int, int]
    input_dim: int
    hidden_dim: int
    n_layers: int = 3
    spec_num: int = 20
    pha_weight: float = 0.01
    anet_weight: float = 0.1
    amp_weight: float = 0.01
    aweight_stop_steps: int = 10000

    def setup(self):
        self.amplinet = AmpliNet(self.pre_seq_length, self.aft_seq_length,
                                 self.input_dim, self.hidden_dim, self.n_layers)
        self.phasenet = PhaseNet(self.input_shape, self.pre_seq_length,
                                 self.aft_seq_length, self.input_dim,
                                 self.hidden_dim)
        self.alphamixer = AlphaMixer(self.input_shape, self.spec_num,
                                     self.input_dim, self.hidden_dim,
                                     self.aft_seq_length)

    def __call__(self, x: jnp.ndarray):
        xas = nn.sigmoid(self.amplinet(x))
        xps, x_phas_t, x_amps = self.phasenet(x)
        xt = self.alphamixer(xas, xps, x_phas_t)
        return xt, xps, xas, x_phas_t, x_amps

    def predict(self, frames_in: jnp.ndarray,
                frames_gt: Optional[jnp.ndarray] = None,
                compute_loss: bool = False,
                step: Optional[jnp.ndarray] = None):
        """Returns (pred, loss_dict | None). The amplitude-loss weight decays
        linearly to 0 over aweight_stop_steps as a pure function of `step`."""
        xt, xps, xas, x_phas_t, x_amps = self(frames_in)
        if not compute_loss:
            return xt, None
        b = frames_in.shape[0]
        h, w = self.input_shape
        spec_mask = make_spec_mask(h, w, self.spec_num)
        step = jnp.zeros(()) if step is None else step
        amp_w = jnp.maximum(
            0.0, self.amp_weight * (1.0 - step / self.aweight_stop_steps))

        mse = jnp.mean((xt - frames_gt) ** 2)
        frames_fft = jnp.fft.rfft2(frames_gt)
        frames_pha = jnp.angle(frames_fft)
        frames_abs = jnp.abs(frames_fft)
        pha_loss = jnp.sum(
            1.0 - jnp.cos(frames_pha * spec_mask - x_phas_t * spec_mask)
        ) / (jnp.sum(spec_mask) * b * self.aft_seq_length * self.input_dim)
        xas_abs = jnp.abs(jnp.fft.rfft2(xas))
        amp_loss = jnp.mean((xas_abs - frames_abs) ** 2)
        anet_loss = jnp.mean((xas - frames_gt) ** 2)
        total = (mse + self.pha_weight * pha_loss + amp_w * amp_loss
                 + self.anet_weight * anet_loss)
        loss = {"total_loss": total,
                "phase_loss": self.pha_weight * pha_loss,
                "ampli_loss": amp_w * amp_loss,
                "anet_loss": self.anet_weight * anet_loss}
        return xt, loss


def get_model(cfg) -> AlphaPre:
    """Config factory (reference alpha.py:297-311)."""
    return AlphaPre(
        pre_seq_length=cfg.T_in, aft_seq_length=cfg.T_out,
        input_shape=tuple(cfg.input_shape), input_dim=cfg.img_channels,
        hidden_dim=cfg.dim, n_layers=cfg.n_layers,
        spec_num=cfg.get("spec_num", 20),
        pha_weight=cfg.get("pha_weight", 0.01),
        anet_weight=cfg.get("anet_weight", 0.1),
        amp_weight=cfg.get("amp_weight", 0.01),
        aweight_stop_steps=cfg.get("aweight_stop_steps", 10000))
