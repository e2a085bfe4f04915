"""Shared experiment scaffolding: CLI, config, data, trainer wiring.

Replicates the reference experiment skeleton (reference
experiments/ae_v2/train.py:264-347): YAML config + validated dotlist
overrides, --resume auto-checkpoint discovery, dataloader smoke prints,
derived total-step math, and the final "done" success marker the retry
supervisor keys on (reference run.sh:17-45 — here `--retry` runs the
supervision in-process).

Every experiment module defines `build_task(cfg, dm) -> Task` (and optionally
`init_state(trainer, task)`) and calls `main(__file__, build_task)`.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Callable, Optional

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# WX_PLATFORM=cpu forces the CPU backend even where a sitecustomize
# force-registers a TPU plugin and overrides JAX_PLATFORMS (this image does).
if os.environ.get("WX_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["WX_PLATFORM"])

from weatherforecastingtoolkit_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule  # noqa: E402
from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir  # noqa: E402
from weatherforecastingtoolkit_tpu.training.trainer import (Trainer, derive_steps,  # noqa: E402
                                                            run_with_retry)
from weatherforecastingtoolkit_tpu.utils.config import Config  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--resume", type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=False)
    p.add_argument("--retry", action="store_true",
                   help="supervise: rerun with resume until 'done'")
    p.add_argument("--config", default=None)
    args, unknown = p.parse_known_args(argv)
    return args, unknown


def load_config(exp_file: str, args, dotlist) -> Config:
    config_path = args.config or os.path.join(os.path.dirname(exp_file),
                                              "config.yaml")
    cfg = Config.load(config_path)
    return cfg.merged_dotlist(list(dotlist))  # validates keys (check_yaml)


def build_datamodule(cfg: Config) -> SEVIRDataModule:
    ds = cfg.dataset
    sevir_dir = ds.get("sevir_dir")
    if not sevir_dir or not os.path.exists(str(sevir_dir)):
        # hermetic fallback: generate a synthetic SEVIR tree (tests/CI/demo)
        sevir_dir = os.path.join(cfg.get("experiment_path", "."),
                                 "synthetic_sevir")
        if not os.path.exists(os.path.join(sevir_dir, "CATALOG.csv")):
            print(f"[data] no SEVIR dataset; generating synthetic at {sevir_dir}")
            make_synthetic_sevir(
                sevir_dir, num_events=ds.get("synthetic_events", 16),
                height=ds.get("img_size", 128), width=ds.get("img_size", 128),
                raw_seq_len=ds.get("raw_seq_len", 25))
    dm = SEVIRDataModule(
        dataset_name=ds.get("name", "sevirlr"), sevir_dir=str(sevir_dir),
        seq_len=ds.seq_len, stride=ds.stride, layout="NTCHW",
        batch_size=ds.batch_size, num_workers=ds.get("num_workers", 4),
        seed=cfg.get("seed", 0), val_ratio=ds.get("val_ratio", 0.1),
        aug_mode=str(ds.get("aug_mode", "0")),
        use_cache=bool(ds.get("use_cache", False)),
        train_test_split_date=tuple(ds.get("train_test_split_date", (2019, 6, 1)))
        if ds.get("train_test_split_date", (2019, 6, 1)) is not None else None,
    )
    dm.prepare_data()
    dm.setup()
    return dm


def main(exp_file: str, build_task: Callable,
         init_state_fn: Optional[Callable] = None, argv=None) -> None:
    args, dotlist = parse_args(argv)

    def run_once(resume: bool):
        cfg = load_config(exp_file, args, dotlist)
        dm = build_datamodule(cfg)
        train_loader = dm.train_loader()
        val_loader = dm.val_loader()
        test_loader = dm.test_loader()
        # dataloader smoke: batch counts + one batch's shape per split
        # (reference ae_v2/train.py:300-304 does exactly this before fit)
        for name, loader in (("train", train_loader), ("val", val_loader),
                             ("test", test_loader)):
            shape = None
            if len(loader):
                first = next(iter(loader))
                shape = {k: tuple(v.shape) for k, v in first.items()}
            print(f"[data] {name}: {len(loader)} batches, first {shape}")
        cfg = derive_steps(cfg, len(train_loader), len(val_loader),
                           len(test_loader))
        # fractional disc_start -> step count (reference ae_s2/train.py:282)
        if "lpips" in cfg and "disc_start" in cfg.lpips:
            if cfg.lpips.disc_start <= 1.0:
                cfg.lpips.disc_start = int(cfg.lpips.disc_start *
                                           cfg.trainer.total_train_steps)

        task = build_task(cfg, dm)
        if cfg.trainer.get("mixed_precision", False) and \
                task.custom_train_step is None:
            # generic bf16-compute wrapper for plain-loss tasks; GAN-style
            # tasks (custom_train_step) handle the flag inside their builder
            # (make_vae_gan_task(mixed_precision=...)). Double-wrapping a
            # task that already casts internally is a harmless no-op.
            from weatherforecastingtoolkit_tpu.ops.amp import mixed_loss
            task.loss_fn = mixed_loss(task.loss_fn)
        trainer = Trainer(cfg, task, resume=resume)
        # pre-fit LR range test (reference pipeline/helpers.py:34-61 saves
        # lr_range_test.png). The sweep steps with the same optimizer family
        # the experiment trains with (AdamW + the config's betas/decay, lr
        # injected per step) so the explosion point transfers to the real run
        # — a plain-SGD sweep's explosion point would not.
        lrt = cfg.get("lr_range_test", None)
        if lrt is not None and lrt.get("enabled", False):
            import jax as _jax
            import optax as _optax

            from weatherforecastingtoolkit_tpu.training.optim import (
                lr_range_test)

            params = task.init_params(_jax.random.key(int(cfg.get("seed", 0))))
            op = cfg.get("optim", {})
            inj = _optax.inject_hyperparams(_optax.adamw)(
                learning_rate=float(lrt.get("start_lr", 1e-7)),
                b1=float(op.get("beta1", 0.9)),
                b2=float(op.get("beta2", 0.999)),
                weight_decay=float(op.get("weight_decay", 0.01)))
            it = iter(train_loader)
            rng_box = {"rng": _jax.random.key(1), "params": params,
                       "opt": inj.init(params)}

            @_jax.jit
            def _sweep_step(params, opt_state, batch, rng, lr):
                loss, grads = _jax.value_and_grad(
                    lambda p: task.loss_fn(p, batch, rng, 0)[0])(params)
                opt_state.hyperparams["learning_rate"] = lr
                updates, opt_state = inj.update(grads, opt_state, params)
                return _optax.apply_updates(params, updates), opt_state, loss

            def loss_at_lr(lr):
                nonlocal it
                try:
                    batch = next(it)
                except StopIteration:
                    it = iter(train_loader)
                    batch = next(it)
                rng_box["rng"], key = _jax.random.split(rng_box["rng"])
                rng_box["params"], rng_box["opt"], loss = _sweep_step(
                    rng_box["params"], rng_box["opt"], batch, key, float(lr))
                return float(loss)

            lrs, losses = lr_range_test(
                loss_at_lr, start_lr=float(lrt.get("start_lr", 1e-7)),
                end_lr=float(lrt.get("max_lr", 1.0)),
                num_iter=int(lrt.get("num_iter", 100)),
                output_dir=trainer.run_dir)
            print(f"[lr_range_test] swept {len(lrs)} LRs, plot saved to "
                  f"{trainer.run_dir}/lr_range_test.png; rule of thumb: "
                  f"~1/10 of the explosion point (last lr "
                  f"{lrs[-1]:.2e})")
        # per-run code artifact (reference uploads train.py to W&B per run,
        # ae_v2/train.py:325-327) — a copy in the run dir serves the same
        # reproducibility purpose without the service dependency
        import shutil
        try:
            shutil.copy2(exp_file, os.path.join(trainer.run_dir, "train.py"))
        except OSError:
            pass
        state = (init_state_fn(trainer, task) if init_state_fn
                 else trainer.init_state())
        state = trainer.fit(train_loader, val_loader, state=state)
        if cfg.trainer.get("run_test", False):
            trainer.test(state, test_loader)
        trainer.close()

    if args.retry:
        attempts = {"n": 0}

        def attempt():
            # first attempt honors --resume; crash-retries always resume
            resume = args.resume if attempts["n"] == 0 else True
            attempts["n"] += 1
            run_once(resume)

        run_with_retry(attempt)
    else:
        run_once(args.resume)
        print("done")
