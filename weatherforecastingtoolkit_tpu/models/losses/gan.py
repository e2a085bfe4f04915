"""PatchGAN discriminator and adversarial losses.

Capability parity with the reference GAN stack:
  * NLayerDiscriminator (Pix2Pix PatchGAN) — reference
    autoencoderkl/losses/model.py:100-150 (4x4 stride-2 conv ladder,
    LeakyReLU(0.2), norm after every conv except the first, 1-channel map head)
  * weights_init normal(0, 0.02) — model.py:6-12
  * ActNorm (flow-style data-dependent init) — model.py:15-98, exposed as an
    explicit `init_actnorm` fit step because data-dependent init inside a
    jitted step is a trace-time footgun
  * hinge/vanilla d-losses and the `adopt_weight` warm-start gate —
    losses/contperceptual.py:13-30

Norm policy: BatchNorm (the reference default) is replaced by GroupNorm for
the same DP/jit reasons as the conv AEs (models/common.py docstring); ActNorm
is available as the alternative exactly like the reference's `use_actnorm`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.normal(0.02)  # weights_init analog


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (fit via `init_from`)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (1, 1, 1, c))
        scale = self.param("scale", nn.initializers.ones, (1, 1, 1, c))
        return scale * (x + loc)

    @staticmethod
    def stats_from(x: jnp.ndarray):
        """Compute (loc, scale) from a data batch for manual param surgery."""
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(x, axis=(0, 1, 2), keepdims=True)
        return -mean, 1.0 / (std + 1e-6)


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3   # kept for API parity; NHWC input infers channels
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False

    def _norm(self, name):
        if self.use_actnorm:
            return ActNorm(name=name)
        return nn.GroupNorm(num_groups=None, group_size=1, name=name)
        # group_size=1 == InstanceNorm-like; see class docstring

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_features: bool = False):
        """x: (B, C, H, W) -> patch logits (B, 1, h', w').

        return_features=True additionally returns the post-activation feature
        map of every level, NCHW like every public API here — the taps for
        the weight-free feature-matching perceptual loss
        (`feature_matching_distance`), which plays the role the reference's
        LPIPS plays in its combined loss (contperceptual.py:103-106) without
        needing pretrained VGG weights. (The transpose back is free: XLA
        folds it into the consumer's elementwise reduction.)
        """
        feats = []
        h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC internally
        kw, pad = (4, 4), 1
        h = nn.Conv(self.ndf, kw, strides=2, padding=pad, kernel_init=conv_init,
                    name="conv_0")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf_mult, kw, strides=2, padding=pad,
                        use_bias=self.use_actnorm, kernel_init=conv_init,
                        name=f"conv_{n}")(h)
            h = self._norm(f"norm_{n}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf_mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, kw, strides=1, padding=pad,
                    use_bias=self.use_actnorm, kernel_init=conv_init,
                    name=f"conv_{self.n_layers}")(h)
        h = self._norm(f"norm_{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        h = nn.Conv(1, (1, 1), padding=pad, kernel_init=conv_init,
                    name="conv_out")(h)
        logits = jnp.transpose(h, (0, 3, 1, 2))
        if return_features:
            return logits, [jnp.transpose(f, (0, 3, 1, 2)) for f in feats]
        return logits


def feature_matching_distance(feats_a, feats_b) -> jnp.ndarray:
    """Per-sample mean L1 distance across discriminator feature maps,
    returned as (B, 1, 1, 1) for broadcast onto the elementwise
    reconstruction map — the same slot the reference's LPIPS occupies
    (contperceptual.py:103-106). Weight-free perceptual loss: the PatchGAN's
    own features are the perceptual embedding (pix2pixHD-style feature
    matching), so no pretrained VGG download is needed."""
    d = 0.0
    for a, b in zip(feats_a, feats_b):
        d = d + jnp.mean(jnp.abs(a - b), axis=tuple(range(1, a.ndim)))
    d = d / max(1, len(feats_a))
    return d.reshape(-1, 1, 1, 1)


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (jnp.mean(nn.softplus(-logits_real)) +
                  jnp.mean(nn.softplus(logits_fake)))


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """Zero the weight before `threshold` steps — jit-safe (jnp.where, not
    python if, so it works on traced step counters)."""
    return jnp.where(global_step < threshold, value, weight)


def adaptive_weight(nll_grad_last: jnp.ndarray, g_grad_last: jnp.ndarray,
                    disc_weight: float = 1.0) -> jnp.ndarray:
    """Balance reconstruction vs adversarial gradients on the generator's last
    layer: ||∇rec|| / (||∇adv|| + 1e-4), clamped to [0, 1e4]
    (reference contperceptual.py:58-69). Inputs are the two gradient leaves;
    jax.lax.stop_gradient replaces torch's .detach()."""
    norm_nll = jnp.linalg.norm(nll_grad_last.reshape(-1))
    norm_g = jnp.linalg.norm(g_grad_last.reshape(-1))
    w = norm_nll / (norm_g + 1e-4)
    w = jnp.clip(w, 0.0, 1e4)
    return jax.lax.stop_gradient(w) * disc_weight
