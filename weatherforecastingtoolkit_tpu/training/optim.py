"""Optimizers, LR schedules, and the LR range test (optax).

Capability parity with reference pipeline/helpers.py:
  * `adamw_optimizer` (:63-74)
  * `cosine_warmup_scheduler` (:76-107): linear start_lr->peak_lr warmup, then
    single cosine half-cycle peak_lr->final_lr
  * `one_cycle_scheduler` (:109-140): cosine ramp start->peak over
    rampup_steps, cosine anneal peak->final after
  * `lr_range_test` (:34-61): exponential LR sweep recording loss, saves plot

Schedules are optax schedule functions baked into the optimizer — a jit-safe
pure function of the step counter (no host-side scheduler.step() calls).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def cosine_warmup_schedule(start_lr: float, peak_lr: float, final_lr: float,
                           total_steps: int, warmup_steps: int) -> optax.Schedule:
    warmup_steps = max(1, int(warmup_steps))
    return optax.warmup_cosine_decay_schedule(
        init_value=start_lr, peak_value=peak_lr, warmup_steps=warmup_steps,
        decay_steps=max(int(total_steps), warmup_steps + 1), end_value=final_lr)


def one_cycle_schedule(start_lr: float, peak_lr: float, final_lr: float,
                       total_steps: int, rampup_steps: int) -> optax.Schedule:
    pct_start = max(1, int(rampup_steps)) / max(1, int(total_steps))
    if pct_start < 0.2:
        print(f"[optim] warning: rampup {pct_start:.0%} of total steps; "
              "the reference recommends >= 20%")
    return optax.cosine_onecycle_schedule(
        transition_steps=max(1, int(total_steps)), peak_value=peak_lr,
        pct_start=pct_start, div_factor=peak_lr / start_lr,
        final_div_factor=start_lr / final_lr)


def adamw(learning_rate, weight_decay: float = 0.01, beta1: float = 0.9,
          beta2: float = 0.999, grad_clip: Optional[float] = None,
          accumulate_steps: int = 1) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping and gradient accumulation.

    Accumulation is optax.MultiSteps — the single jitted step absorbs the
    reference's Lightning accumulate_grad_batches loop.
    """
    tx = optax.adamw(learning_rate=learning_rate, b1=beta1, b2=beta2,
                     weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def lr_range_test(loss_at_lr: Callable[[float], float], start_lr: float = 1e-7,
                  end_lr: float = 1.0, num_iter: int = 100,
                  output_dir: Optional[str] = None):
    """Exponential LR sweep. `loss_at_lr(lr)` performs one optimization step at
    that LR and returns the (smoothed) loss. Returns (lrs, losses) and writes
    lr_range_test.png when output_dir is given. Rule of thumb from the
    reference: pick ~1/10 of the explosion point."""
    lrs = np.exp(np.linspace(np.log(start_lr), np.log(end_lr), num_iter))
    losses = []
    best = None
    for lr in lrs:
        loss = float(loss_at_lr(float(lr)))
        losses.append(loss)
        best = loss if best is None else min(best, loss)
        if not np.isfinite(loss) or loss > 4 * best:
            break  # diverged
    lrs = lrs[: len(losses)]
    if output_dir is not None:
        os.makedirs(output_dir, exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.plot(lrs, losses)
        ax.set_xscale("log")
        ax.set_xlabel("learning rate")
        ax.set_ylabel("loss")
        fig.savefig(os.path.join(output_dir, "lr_range_test.png"))
        plt.close(fig)
    return np.asarray(lrs), np.asarray(losses)


def global_norm(tree) -> jax.Array:
    """L2 norm over a pytree of gradients (TrackGradNormCallback analog,
    reference pipeline/helpers.py:245-258) — computed in-graph, not host-side."""
    return optax.global_norm(tree)


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))
