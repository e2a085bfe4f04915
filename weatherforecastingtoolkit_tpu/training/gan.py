"""Two-optimizer adversarial training as a single jitted step.

Capability parity with the reference's GAN loops:
  * manual two-optimizer Lightning loop with toggle_optimizer /
    manual_backward / clip / step (reference experiments/ae_v2_2/train.py:126-159)
  * `Loss` (L1 + LPIPS + adaptive-weight hinge GAN, ae_v2_2/train.py:31-100)
  * `LPIPSWithDiscriminator` (NLL w/ learnable logvar + KL + adaptive-weight
    GAN, reference autoencoderkl/losses/contperceptual.py:33-169)

TPU-first design: ONE compiled program per step does
  backward(rec_loss) -> backward(g_loss) -> combine with the adaptive weight
  -> generator update -> backward(d_loss) -> gated discriminator update.
The adaptive weight needs ∇rec and ∇adv separately anyway, so combining them
linearly afterwards costs nothing extra vs the reference's
2x autograd.grad + full backward.

State layout: the generator (and logvar) live in `state.params` and are the
ONLY thing the trainer's optimizer tracks; the discriminator's params and its
own optimizer state live in `state.extra` (built by Task.init_extra so resume
templates include them). This keeps disc slots out of the generator's AdamW
(no wasted HBM, no weight-decay leak) and makes `--resume` restore both
optimizers.

`adopt_weight` semantics match the reference exactly
(contperceptual.py:13-16,163): before `disc_start` the discriminator's
GRADIENTS are zeroed (so its Adam moments stay at init, as they do when torch
backprops a 0-multiplied loss) and its updates are additionally zeroed (so a
decoupled weight decay can't leak). Everything is jnp.where masking — jit-safe,
no python branch on the traced step.

Loss scale matches the reference: with KL, the NLL is a PER-SAMPLE SUM,
batch-averaged (`torch.sum(nll)/batch`, contperceptual.py:108-112), and the
KL term is the per-sample sum over latent dims, batch-averaged
(contperceptual.py:113-117). The perceptual distance is broadcast-added to
the elementwise reconstruction map BEFORE the reduction
(contperceptual.py:103-106), so it carries the same H*W*C weight as in the
reference.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.losses.gan import (adaptive_weight, adopt_weight,
                                 feature_matching_distance, hinge_d_loss,
                                 vanilla_d_loss)
from .trainer import Task, TrainState


def leaf_by_path(tree, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return node


def pixel_loss_map(kind: str) -> Callable:
    """Elementwise (un-reduced) pixel losses — the reference keeps the
    reconstruction loss as a map until the final NLL reduction."""
    if kind == "l1":
        return lambda a, b: jnp.abs(a - b)
    if kind == "mse":
        return lambda a, b: (a - b) ** 2
    if kind == "huber":
        def huber(a, b, delta=1.0):
            d = a - b
            ad = jnp.abs(d)
            return jnp.where(ad <= delta, 0.5 * d * d, delta * (ad - 0.5 * delta))
        return huber
    raise ValueError(kind)


def make_vae_gan_task(
    *,
    name: str,
    generator_apply: Callable,      # (gen_params, frames, rng) -> (recon, kl or None)
    gen_init: Callable,             # rng -> gen_params
    disc_apply: Callable,           # (disc_params, frames) -> logits
    disc_init: Callable,            # rng -> disc_params
    disc_tx: optax.GradientTransformation,
    last_layer_path: Tuple[str, ...],
    eval_apply: Optional[Callable] = None,  # (gen_params, frames) -> recon
    pixel_loss: str = "l1",
    perceptual_apply: Optional[Callable] = None,  # (a, b) -> (B,1,1,1) dists
    perceptual_weight: float = 1.0,
    # weight-free perceptual term: L1 over the PatchGAN's own intermediate
    # features (already in-graph — zero extra weights, no VGG download).
    # disc_feats_apply: (disc_params, frames) -> (logits, [feats]); pass
    # lambda p, f: disc.apply(p, f, return_features=True)
    disc_feats_apply: Optional[Callable] = None,
    feature_matching_weight: float = 0.0,
    recon_weight: float = 1.0,
    kl_weight: Optional[float] = None,   # None -> no KL / no learnable logvar
    disc_weight: float = 1.0,
    disc_factor: float = 1.0,
    disc_start: int = 0,
    disc_loss: str = "hinge",
    key: str = "vil",
    mixed_precision: bool = False,
) -> Task:
    """Build a Task whose custom_train_step runs the full VAE-GAN update.

    mixed_precision=True runs generator and discriminator networks in bf16
    against fp32 master params (ops/amp.py); the NLL/KL/adaptive-weight math
    stays fp32."""
    d_loss_fn = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
    use_kl = kl_weight is not None

    from ..ops.amp import cast_floats
    from .tasks import dequantize
    px_map = pixel_loss_map(pixel_loss)

    if mixed_precision:
        _gen_apply, _disc_apply = generator_apply, disc_apply

        def generator_apply(p, f, rng):  # noqa: F811 — bf16-compute wrapper
            recon, kl = _gen_apply(cast_floats(p), cast_floats(f), rng)
            return recon.astype(jnp.float32), (
                kl.astype(jnp.float32) if kl is not None else None)

        def disc_apply(p, f):  # noqa: F811
            return _disc_apply(cast_floats(p), cast_floats(f)
                               ).astype(jnp.float32)

        if disc_feats_apply is not None:
            _disc_feats_apply = disc_feats_apply

            def disc_feats_apply(p, f):  # noqa: F811
                logits, feats = _disc_feats_apply(cast_floats(p),
                                                  cast_floats(f))
                return (logits.astype(jnp.float32),
                        [x.astype(jnp.float32) for x in feats])

    def _frames(x):
        b, t = x.shape[:2]
        return x.reshape((b * t,) + x.shape[2:])

    def init_params(rng):
        params = {"gen": gen_init(rng)}
        if use_kl:
            params["logvar"] = jnp.zeros(())
        return params

    def init_extra(rng, params):
        disc_params = disc_init(rng)
        return {"disc_params": disc_params,
                "disc_opt_state": disc_tx.init(disc_params)}

    use_fm = disc_feats_apply is not None and feature_matching_weight > 0

    # ---- losses --------------------------------------------------------------
    def rec_loss_fn(gen_params, logvar, frames, rng, disc_params=None):
        recon, kl = generator_apply(gen_params, frames, rng)
        rec_map = recon_weight * px_map(recon, frames)
        aux = {}
        if perceptual_apply is not None and perceptual_weight > 0:
            a = jnp.repeat(recon, 3, axis=1) if recon.shape[1] == 1 else recon
            b = jnp.repeat(frames, 3, axis=1) if frames.shape[1] == 1 else frames
            # (B,1,1,1) broadcast onto the elementwise map, as the reference
            # does before its sum-reduction (contperceptual.py:103-106)
            p = perceptual_apply(a, b)
            aux["p_loss"] = jnp.mean(p)
            rec_map = rec_map + perceptual_weight * p
        if use_fm and disc_params is not None:
            # weight-free perceptual term: L1 over the discriminator's own
            # intermediate features of recon vs target, occupying the same
            # broadcast slot as the reference's LPIPS. The disc is frozen
            # here (stop_gradient) — it never trains to minimize its own
            # feature distance.
            dp = jax.lax.stop_gradient(disc_params)
            _, f_fake = disc_feats_apply(dp, recon)
            _, f_real = disc_feats_apply(dp, jax.lax.stop_gradient(frames))
            fm = feature_matching_distance(f_fake, f_real)
            aux["fm_loss"] = jnp.mean(fm)
            rec_map = rec_map + feature_matching_weight * fm
        rec = jnp.mean(rec_map)
        aux["rec_loss"] = rec
        if use_kl:
            # torch.sum(nll)/batch — per-sample sum, batch mean
            nll_map = rec_map / jnp.exp(logvar) + logvar
            nll = jnp.sum(nll_map) / frames.shape[0]
            kl_term = jnp.mean(kl) if kl is not None else 0.0
            total = nll + kl_weight * kl_term
            aux.update({"nll_loss": nll, "kl_loss": kl_term, "logvar": logvar})
        else:
            total = rec
        return total, (recon, aux)

    def g_adv_loss_fn(gen_params, frames, disc_params, rng):
        recon, _ = generator_apply(gen_params, frames, rng)
        logits_fake = disc_apply(disc_params, recon)
        return -jnp.mean(logits_fake)

    def d_loss_full(disc_params, frames, recon):
        logits_real = disc_apply(disc_params, jax.lax.stop_gradient(frames))
        logits_fake = disc_apply(disc_params, jax.lax.stop_gradient(recon))
        return d_loss_fn(logits_real, logits_fake), (jnp.mean(logits_real),
                                                     jnp.mean(logits_fake))

    # ---- the single jitted two-optimizer step ----------------------------------
    def custom_train_step(state: TrainState, batch, tx):
        rng, g_rng = jax.random.split(state.rng)
        frames = _frames(dequantize(batch[key]))
        params = state.params
        disc_params = state.extra["disc_params"]
        logvar = params.get("logvar", jnp.zeros(()))

        # backward 1: reconstruction objective (w.r.t. gen [+ logvar])
        (rec_total, (recon, aux)), rec_grads = jax.value_and_grad(
            rec_loss_fn, argnums=(0, 1) if use_kl else 0, has_aux=True)(
                params["gen"], logvar, frames, g_rng, disc_params)
        if use_kl:
            rec_gen_grads, logvar_grad = rec_grads
        else:
            rec_gen_grads, logvar_grad = rec_grads, None

        # backward 2: adversarial objective (same rng -> same recon path)
        g_loss, adv_gen_grads = jax.value_and_grad(g_adv_loss_fn)(
            params["gen"], frames, disc_params, g_rng)

        # adaptive weight from the last decoder layer's two gradient leaves
        d_w = adaptive_weight(leaf_by_path(rec_gen_grads, last_layer_path),
                              leaf_by_path(adv_gen_grads, last_layer_path),
                              disc_weight)
        gate = adopt_weight(disc_factor, state.step, disc_start)
        gen_grads = jax.tree_util.tree_map(
            lambda gr, ga: gr + d_w * gate * ga, rec_gen_grads, adv_gen_grads)

        grads = {"gen": gen_grads}
        if use_kl:
            grads["logvar"] = logvar_grad
        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # backward 3: discriminator on detached recon, gated by disc_start.
        # Gate the GRADIENTS (not just the update) so the disc optimizer's
        # moments stay exactly at init until disc_start — identical to the
        # reference backpropagating disc_factor * d_loss with disc_factor=0.
        d_gate = adopt_weight(1.0, state.step, disc_start)
        (d_loss, (lr_, lf_)), d_grads = jax.value_and_grad(
            d_loss_full, has_aux=True)(disc_params, frames, recon)
        d_grads = jax.tree_util.tree_map(lambda g: g * d_gate, d_grads)
        d_updates, d_opt_state = disc_tx.update(
            d_grads, state.extra["disc_opt_state"], disc_params)
        # also zero the update so a decoupled weight decay can't leak
        d_updates = jax.tree_util.tree_map(lambda u: u * d_gate, d_updates)
        new_disc = optax.apply_updates(disc_params, d_updates)

        aux = dict(aux)
        aux.update({"loss": rec_total + d_w * gate * g_loss, "g_loss": g_loss,
                    "d_weight": d_w, "disc_loss": d_gate * d_loss,
                    "logits_real": lr_, "logits_fake": lf_,
                    "disc_factor": gate,
                    "grad_norm": optax.global_norm(gen_grads)})
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=opt_state,
            rng=rng, extra={"disc_params": new_disc,
                            "disc_opt_state": d_opt_state})
        return new_state, aux

    def eval_fn(params, batch, rng):
        x = dequantize(batch[key])
        b, t = x.shape[:2]
        apply = eval_apply or (lambda p, f: generator_apply(p, f, rng)[0])
        recon = apply(params["gen"], _frames(x))
        return recon.reshape(x.shape), x

    def loss_fn(params, batch, rng, step):
        # validation loss: reconstruction objective only — the FM term needs
        # the live discriminator (in state.extra), which eval-by-params-only
        # callers don't carry; rec/nll/kl are the comparable quantities anyway
        frames = _frames(dequantize(batch[key]))
        logvar = params.get("logvar", jnp.zeros(()))
        total, (_recon, aux) = rec_loss_fn(params["gen"], logvar, frames, rng)
        return total, aux

    return Task(name=name, init_params=init_params, loss_fn=loss_fn,
                eval_fn=eval_fn, custom_train_step=custom_train_step,
                init_extra=init_extra)
