"""Config-driven training harness: one jitted step, epochs, eval, resume.

Replaces the reference's PyTorch-Lightning experiment skeleton
(reference experiments/ae_v2/train.py:264-347): derived total-step math,
fraction-based checkpoint/metric/plot cadences, limit_*_batches, auto-resume
from the newest loadable checkpoint, LR monitoring, grad-norm logging, the
final "done" success marker, and the crash-retry supervision loop that the
reference ran in bash (experiments/ae_v2/run.sh:17-45).

TPU-first structure: a Task object owns the model + loss; the Trainer turns it
into ONE jitted train_step (forward + backward + clip + update + grad-norm +
scalar logging aux in a single XLA program). Data parallelism: pass a Mesh and
the trainer shards each batch over 'dp' and replicates params — XLA inserts
the psum gradients all-reduce automatically (the `strategy="auto"`/
`sync_dist=True` analog).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..utils.config import Config
from .checkpoint import CheckpointManager, find_latest_ckpt, new_run_id, run_dir_for
from .logging import RunLogger
from .optim import adamw, cosine_warmup_schedule, global_norm, one_cycle_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    extra: Any = None  # task-specific (e.g. discriminator params/opt state)


@dataclasses.dataclass
class Task:
    """A trainable objective.

    loss_fn(params, batch, rng, step) -> (loss, aux_scalars)
    eval_fn(params, batch, rng) -> (metrics_pred, metrics_target) in pixel
    space (B, T, C, H, W) [0, 1] — used for calc_metrics + image panels; may
    be None for loss-only validation.
    """

    name: str
    init_params: Callable[[jax.Array], Any]
    loss_fn: Callable[..., Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]
    eval_fn: Optional[Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]] = None
    # optional fully-custom step: (state, batch, tx) -> (state, aux)
    custom_train_step: Optional[Callable] = None
    # optional extra-state builder: (rng, params) -> pytree stored in
    # TrainState.extra (e.g. a GAN's discriminator params + optimizer state).
    # The Trainer builds it at init so resume templates include it.
    init_extra: Optional[Callable] = None


def build_optimizer(cfg: Config, total_steps: int):
    """Returns (optax transformation, schedule fn)."""
    sched_name = cfg.optim.get("schedule", "cosine_warmup")
    if sched_name == "cosine_warmup":
        p = cfg.cosine_warmup
        warmup = int(p.warmup_ratio * total_steps) if "warmup_ratio" in p \
            else int(p.warmup_steps)
        sched = cosine_warmup_schedule(p.start_lr, p.peak_lr, p.final_lr,
                                       total_steps, warmup)
    elif sched_name == "one_cycle":
        p = cfg.one_cycle
        ramp = int(p.get("rampup_ratio", 0.3) * total_steps)
        sched = one_cycle_schedule(p.start_lr, p.peak_lr, p.final_lr,
                                   total_steps, ramp)
    elif sched_name == "constant":
        sched = cfg.optim.lr
    else:
        raise ValueError(f"Unknown schedule {sched_name}")
    return adamw(sched, weight_decay=cfg.optim.get("weight_decay", 0.01),
                 beta1=cfg.optim.get("beta1", 0.9),
                 beta2=cfg.optim.get("beta2", 0.999),
                 grad_clip=cfg.optim.get("grad_clip", None),
                 accumulate_steps=int(cfg.trainer.get("accumulate_grad_batches", 1))), sched


def derive_steps(cfg: Config, n_train_batches: int, n_val_batches: int,
                 n_test_batches: int = 0) -> Config:
    """Total-step derivation incl. limit_*_batches scaling
    (reference experiments/ae_s2/train.py:270-282)."""
    accum = int(cfg.trainer.get("accumulate_grad_batches", 1))
    epochs = int(cfg.trainer.max_epochs)
    cfg = cfg.merge({})  # deep copy
    t = cfg.trainer
    overfit = int(t.get("overfit_batches", 0) or 0)
    if overfit > 0:  # epoch length becomes the overfit batch count
        n_train_batches = min(n_train_batches, overfit)
    t.total_train_steps = int(n_train_batches * epochs / accum)
    t.total_val_steps = int(n_val_batches * epochs / accum)
    t.total_test_steps = int(n_test_batches * epochs / accum)
    for key, tot in (("limit_train_batches", "total_train_steps"),
                     ("limit_val_batches", "total_val_steps"),
                     ("limit_test_batches", "total_test_steps")):
        frac = t.get(key, None)
        if frac is not None:
            t[tot] = int(t[tot] * float(frac))
    return cfg


class Trainer:
    def __init__(self, cfg: Config, task: Task, mesh: Optional[jax.sharding.Mesh] = None,
                 run_id: Optional[str] = None, resume: bool = False):
        self.cfg = cfg
        # trainer.ema_decay=d keeps an exponential moving average of the
        # params as a shadow tree in TrainState.extra — updated inside the
        # same jitted step (ema = d*ema + (1-d)*params), checkpointed and
        # resumed with everything else. Serve/eval the smoothed weights via
        # Trainer.ema_params(state). The decay ticks once per OPTIMIZER
        # UPDATE: under accumulate_grad_batches=k, params change only every
        # k-th micro-step (MultiSteps), and the EMA update is gated on that
        # same boundary, so d is always per-real-update regardless of k.
        self.ema_decay = cfg.trainer.get("ema_decay", None)
        if self.ema_decay is not None:
            if task.custom_train_step is not None or task.init_extra is not None:
                raise ValueError(
                    "trainer.ema_decay needs the default train step (the "
                    "task already owns custom_train_step/extra state)")
            # COPY the leaves: an aliased tree would be the same buffer
            # donated twice when trainer.donate is on
            task = dataclasses.replace(
                task, init_extra=lambda rng, params: {
                    "ema_params": jax.tree_util.tree_map(
                        lambda p: jnp.array(p, copy=True), params)})
        self.task = task
        self.mesh = mesh
        self.total_steps = int(cfg.trainer.total_train_steps)
        self.tx, self.schedule = build_optimizer(cfg, self.total_steps)
        self.resume = resume
        self._resume_state = None
        self.preempted = False  # set by fit()'s SIGTERM handler

        exp_path = cfg.get("experiment_path", ".")
        exp_name = cfg.get("experiment_name", task.name)
        self._resume_sharded = False
        if resume:
            seed_key = jax.random.key(int(cfg.get("seed", 0)))
            fsdp = mesh is not None and bool(cfg.trainer.get("fsdp", False))
            if fsdp:
                # FSDP resume must restore each leaf DIRECTLY into its shard:
                # an abstract template (eval_shape) with fsdp shardings means
                # the full replicated state never materializes on one device
                # — exactly the regime (state > one chip's HBM) FSDP is for.
                from ..parallel.fsdp import fsdp_sharding
                abstract = jax.eval_shape(self._init_state, seed_key)
                template = jax.tree_util.tree_map(
                    lambda a: jax.ShapeDtypeStruct(
                        a.shape, a.dtype, sharding=fsdp_sharding(a, mesh)),
                    abstract)
                self._resume_sharded = True
            else:
                template = self._init_state(seed_key)
            # ema_decay toggled mid-run must not lose the run — and must not
            # fall back to an OLDER checkpoint that happens to match the
            # template when the newest one is convertible. Alternates are
            # tried per-candidate (newest first) inside find_latest_ckpt.
            alternates = []
            if self.ema_decay is not None:
                # older checkpoints may predate ema_decay (no ema_params
                # tree): restore without it, seed the shadow from params
                def _seed_ema(restored):
                    print("[trainer] checkpoint predates ema_decay: seeding "
                          "ema_params from restored params")
                    return restored.replace(extra={
                        "ema_params": jax.tree_util.tree_map(
                            lambda p: jnp.array(p, copy=True),
                            restored.params)})
                alternates.append((template.replace(extra=None), _seed_ema))
            elif self.task.init_extra is None:
                # newer checkpoints may carry an ema_params tree the template
                # lacks (ema_decay turned off): restore with it, then drop it
                def _drop_ema(restored):
                    print("[trainer] checkpoint carries ema_params but "
                          "ema_decay is off: dropping the shadow tree")
                    return restored.replace(extra=None)
                alternates.append((template.replace(extra={
                    "ema_params": template.params}), _drop_ema))
            restored, found_id, step = find_latest_ckpt(
                exp_path, exp_name, template, alternates=tuple(alternates))
            if restored is not None:
                print(f"[trainer] resuming run {found_id} at step {step}")
                self._resume_state = restored
                run_id = found_id
            else:
                print("[trainer] no checkpoint found, starting from scratch")
        self.run_id = run_id or new_run_id()
        self.run_dir = run_dir_for(exp_path, exp_name, self.run_id)
        self.logger = RunLogger(self.run_dir, project=cfg.get("project_name"),
                                name=exp_name, resume_id=self.run_id)
        # async by default: save() blocks only for the device->host snapshot;
        # the disk write overlaps the next training steps (orbax background
        # thread). trainer.async_checkpoint=false restores blocking saves.
        self.ckpt = CheckpointManager(
            self.run_dir,
            async_save=bool(cfg.trainer.get("async_checkpoint", True)))
        Config(cfg).save(f"{self.run_dir}/config.yaml")

        self._train_step = self._build_train_step()
        self._eval_loss = jax.jit(
            lambda params, batch, rng: self.task.loss_fn(params, batch, rng, 0))
        # opt-in per-parameter histogram probe (wandb.watch analog): grads are
        # recomputed by a separate jitted program at the logging cadence only,
        # so the hot train step never pays for returning full gradient trees
        self._grad_fn = jax.jit(
            lambda params, batch, rng, step: jax.grad(
                lambda p: self.task.loss_fn(p, batch, rng, step)[0])(params))

    @staticmethod
    def ema_params(state: TrainState):
        """The EMA shadow weights when trainer.ema_decay is set, else the raw
        params — the tree to SERVE/EVAL with (smoothed weights generalize
        better late in training)."""
        if isinstance(state.extra, dict) and "ema_params" in state.extra:
            return state.extra["ema_params"]
        return state.params

    # -- state ----------------------------------------------------------------
    def _init_state(self, rng: jax.Array) -> TrainState:
        p_rng, e_rng, s_rng = jax.random.split(rng, 3)
        params = self.task.init_params(p_rng)
        extra = (self.task.init_extra(e_rng, params)
                 if self.task.init_extra is not None else None)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params), rng=s_rng,
                          extra=extra)

    def init_state(self) -> TrainState:
        fsdp = self.mesh is not None and bool(self.cfg.trainer.get("fsdp", False))
        if self._resume_state is not None:
            state = self._resume_state
        elif fsdp:
            # initialize DIRECTLY sharded (jit with out_shardings): the full
            # replicated state never exists on one device — the regime FSDP
            # targets is exactly the one where it would not fit
            from ..parallel.fsdp import init_sharded
            state = init_sharded(self._init_state,
                                 jax.random.key(int(self.cfg.get("seed", 0))),
                                 self.mesh, axis="dp")
        else:
            state = self._init_state(jax.random.key(int(self.cfg.get("seed", 0))))
        if self.mesh is not None:
            if fsdp and self._resume_state is not None and not self._resume_sharded:
                # resumed state arrived single-device (e.g. injected by a
                # test): reshard. The resume path itself restores directly
                # into shards via the abstract template (_resume_sharded).
                from ..parallel.fsdp import shard_train_state
                state = shard_train_state(state, self.mesh, axis="dp")
            elif not fsdp:
                # replicate across the mesh (fresh AND resumed states);
                # batches get sharded over 'dp'
                rep = jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec())
                state = jax.device_put(state, rep)
        return state

    def batch_sharding(self) -> Optional[jax.sharding.Sharding]:
        if self.mesh is None:
            return None
        return jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec("dp"))

    # -- steps ------------------------------------------------------------------
    def _build_train_step(self):
        # trainer.donate=true donates the INPUT state's buffers to the step:
        # XLA reuses them for the output state in place, removing the
        # transient second copy of params + optimizer state (the difference
        # between fitting and OOMing for models whose state is a large
        # fraction of HBM). Opt-in because a donated state is consumed — the
        # caller must not touch the pre-step state object afterwards. Safe
        # with async checkpointing: orbax snapshots device->host
        # synchronously inside save(), before the next (donating) step runs.
        donate = (0,) if bool(self.cfg.trainer.get("donate", False)) else ()
        ema_decay = float(self.ema_decay) if self.ema_decay is not None else None
        accum = max(1, int(self.cfg.trainer.get("accumulate_grad_batches", 1)))
        if self.task.custom_train_step is not None:
            custom = self.task.custom_train_step

            @partial(jax.jit, donate_argnums=donate)
            def train_step(state: TrainState, batch):
                return custom(state, batch, self.tx)

            return train_step

        loss_fn = self.task.loss_fn

        @partial(jax.jit, donate_argnums=donate)
        def train_step(state: TrainState, batch):
            rng, step_rng = jax.random.split(state.rng)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, step_rng, state.step)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            aux = dict(aux)
            aux["loss"] = loss
            aux["grad_norm"] = global_norm(grads)
            extra = state.extra
            if ema_decay is not None:
                ema_next = optax.incremental_update(
                    params, state.extra["ema_params"],
                    step_size=1.0 - ema_decay)
                if accum > 1:
                    # MultiSteps applies the real update on every accum-th
                    # micro-step; the EMA ticks on that same boundary, so the
                    # shadow never averages in k-1 stale self-copies per
                    # update (decay stays per-OPTIMIZER-update under any k)
                    applied = (state.step + 1) % accum == 0
                    ema_next = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(applied, new, old),
                        ema_next, state.extra["ema_params"])
                extra = {"ema_params": ema_next}
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=opt_state, rng=rng,
                                      extra=extra)
            return new_state, aux

        return train_step

    # -- loops ------------------------------------------------------------------
    def fit(self, train_loader, val_loader=None, state: Optional[TrainState] = None
            ) -> TrainState:
        from ..data.prefetch import device_prefetch

        cfg = self.cfg
        state = state if state is not None else self.init_state()
        start_step = int(state.step)
        # state.step counts MICRO-steps (one per batch); total_train_steps
        # counts OPTIMIZER UPDATES (derive_steps already divided by accum), so
        # every cadence and the stop condition are scaled by `accum`.
        accum = max(1, int(cfg.trainer.get("accumulate_grad_batches", 1)))
        log_every = accum * max(1, int(cfg.logging.get("log_every_n_steps", 50)))
        save_every = accum * max(1, int(self.total_steps *
                                 float(cfg.trainer.get("save_every_n_steps", 0.1))))
        val_every = accum * max(1, int(self.total_steps *
                                float(cfg.logging.get("val_every_n", 0.25))))
        limit = cfg.trainer.get("limit_train_batches", None)
        epochs = int(cfg.trainer.max_epochs)
        sharding = self.batch_sharding()
        # overfit_batches=N: repeat the SAME first N batches every epoch (the
        # reference's pl.Trainer(overfit_batches=1) smoke mode,
        # ae_gan/train.py:591) — unlike limit_train_batches, augmentation is
        # NOT re-seeded per epoch, so the model must drive those exact batches
        # to ~zero loss
        overfit = int(cfg.trainer.get("overfit_batches", 0) or 0)
        overfit_cache = None
        if overfit > 0:
            # read straight off the loader (no prefetch look-ahead) so exactly
            # `overfit` batches are ever fetched, then pin them on device
            overfit_cache = [
                jax.device_put(b, sharding) if sharding else jax.device_put(b)
                for _, b in zip(range(overfit), iter(train_loader))]
        hist_frac = cfg.logging.get("param_histograms_every_n", None)
        hist_every = (accum * max(1, int(self.total_steps * float(hist_frac)))
                      if hist_frac else None)

        # Preemption-safe training: TPU slices are routinely preempted with a
        # SIGTERM + grace period. Catch it, finish the in-flight step, write a
        # final checkpoint, and return cleanly — run_with_retry / --resume
        # then continues from that exact step on the replacement slice.
        # (Handlers only install in the main thread; elsewhere this is a no-op.)
        self.preempted = False
        prev_handler = None
        handler_installed = False
        if bool(cfg.trainer.get("checkpoint_on_preempt", True)):
            import signal as _signal

            def _on_term(signum, frame):
                self.preempted = True

            try:
                prev_handler = _signal.signal(_signal.SIGTERM, _on_term)
                handler_installed = True
            except ValueError:  # not the main thread
                pass

        step = start_step
        t_last = time.time()
        done = False
        last_saved = None  # step of the most recent periodic save
        try:
            for epoch in range(epochs):
                if done:
                    break
                if overfit_cache is not None:
                    batches = overfit_cache
                    n_batches = len(overfit_cache)
                else:
                    if hasattr(train_loader, "set_epoch"):
                        train_loader.set_epoch(epoch)
                    n_batches = len(train_loader)
                    if limit is not None:
                        n_batches = (int(n_batches * float(limit)) if limit <= 1
                                     else int(limit))
                    batches = device_prefetch(train_loader, sharding=sharding)
                for i, batch in enumerate(batches):
                    if i >= n_batches:
                        break
                    state, aux = self._train_step(state, batch)
                    step = int(state.step)
                    updates = step // accum  # optimizer updates so far
                    if hist_every is not None and step % hist_every == 0:
                        self._log_param_histograms(state, batch, step)
                    if step % log_every == 0:
                        aux = {k: float(v) for k, v in jax.device_get(aux).items()}
                        # the schedule advances once per optimizer update
                        aux["lr"] = float(self.schedule(updates)) \
                            if callable(self.schedule) else float(self.schedule)
                        aux["steps_per_sec"] = log_every / max(1e-9, time.time() - t_last)
                        t_last = time.time()
                        self.logger.log_scalars(aux, step, prefix="train")
                    if step % save_every == 0:
                        # pass device arrays: orbax snapshots them (D2H copy)
                        # at call time and, under async_checkpoint, writes to
                        # disk on its background thread while training runs
                        self.ckpt.save(step, state)
                        last_saved = step
                    if val_loader is not None and step % val_every == 0:
                        # panels on the first val batch each cycle (the
                        # reference logs VIL panels at validation intervals)
                        self.validate(state, val_loader, step, log_images=True)
                    if self.preempted:
                        print(f"[trainer] SIGTERM at step {step}: writing "
                              "preemption checkpoint and stopping")
                        done = True
                        break
                    if updates >= self.total_steps:
                        done = True
                        break
            # save_last semantics. Skip the rewrite when the periodic save
            # just wrote this exact step (same state — no steps in between);
            # either way DRAIN before returning, so the final/preemption
            # checkpoint is durably on disk even if the process exits (or the
            # preemption grace period expires) right after fit().
            if last_saved != max(step, 1):
                self.ckpt.save(max(step, 1), state, force=True)
            self.ckpt.wait_until_finished()
        finally:
            if handler_installed:
                import signal as _signal
                _signal.signal(_signal.SIGTERM,
                               prev_handler if prev_handler is not None
                               else _signal.SIG_DFL)
        return state

    def _log_param_histograms(self, state: TrainState, batch, step: int
                              ) -> None:
        """Per-parameter weight + gradient histograms (opt-in via
        logging.param_histograms_every_n; wandb.watch analog). For
        custom-step tasks (e.g. GAN) only weights are probed — their
        gradients are internal to the custom step."""
        named = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
            named[f"weight/{jax.tree_util.keystr(path)}"] = jax.device_get(leaf)
        if self.task.custom_train_step is None:
            try:
                grads = self._grad_fn(state.params, batch, state.rng, state.step)
                for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
                    named[f"grad/{jax.tree_util.keystr(path)}"] = \
                        jax.device_get(leaf)
            except Exception as e:  # noqa: BLE001 — diagnostics must not kill
                print(f"[trainer] grad histogram probe failed: "
                      f"{type(e).__name__}: {e}")
        self.logger.log_histograms(named, step)

    def validate(self, state: TrainState, val_loader, step: int,
                 tag: str = "val", max_batches: Optional[int] = None,
                 log_images: bool = False) -> Dict[str, float]:
        from ..data.prefetch import device_prefetch

        from ..metrics import calc_metrics

        losses = []
        metric_sums: Dict[str, float] = {}
        n_metric = 0
        sharding = self.batch_sharding()
        limit = max_batches or self.cfg.trainer.get("limit_val_batches", None)
        if limit is not None:
            # fractions (<1.0) scale the loader length; ints are batch counts
            limit = int(limit) if limit >= 1 else max(1, int(limit * len(val_loader)))
        for i, batch in enumerate(device_prefetch(val_loader, sharding=sharding)):
            if limit is not None and i >= limit:
                break
            loss, _aux = self._eval_loss(state.params, batch, state.rng)
            losses.append(float(loss))
            if self.task.eval_fn is not None:
                pred, target = self.task.eval_fn(state.params, batch, state.rng)
                m = calc_metrics(pred, target)
                for k, v in m.items():
                    metric_sums[k] = metric_sums.get(k, 0.0) + v
                n_metric += 1
                if log_images and i == 0:
                    self.logger.log_images(np.asarray(pred), np.asarray(target),
                                           f"{tag}_panels", step)
        out = {"loss": float(np.mean(losses)) if losses else float("nan")}
        if n_metric:
            out.update({k: v / n_metric for k, v in metric_sums.items()})
        self.logger.log_scalars(out, step, prefix=tag)
        return out

    def test(self, state: TrainState, test_loader, step: Optional[int] = None
             ) -> Dict[str, float]:
        return self.validate(state, test_loader, step or int(state.step),
                             tag="test", log_images=True)

    def close(self):
        self.logger.close()
        self.ckpt.close()


def run_with_retry(main_fn: Callable[[], None], max_retries: int = 100,
                   backoff_s: float = 5.0) -> None:
    """Bash-free supervision: rerun `main_fn` until it completes
    (reference experiments/ae_v2/run.sh:17-45 rerun-until-'done' loop)."""
    for attempt in range(max_retries):
        try:
            main_fn()
            print("done")
            return
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — supervision must survive anything
            print(f"[supervisor] attempt {attempt} crashed: {type(e).__name__}: {e}; "
                  f"retrying in {backoff_s}s with resume")
            time.sleep(backoff_s)
    raise RuntimeError("run_with_retry exhausted retries")
