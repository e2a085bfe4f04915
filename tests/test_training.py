"""Training harness tests: schedules, checkpoint resume + corruption tolerance,
and a tiny end-to-end reconstruction train run on the synthetic fixture."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule
from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir
from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
from weatherforecastingtoolkit_tpu.training.checkpoint import (CheckpointManager,
                                                               find_latest_ckpt,
                                                               run_dir_for)
from weatherforecastingtoolkit_tpu.training.optim import (cosine_warmup_schedule,
                                                          lr_range_test,
                                                          one_cycle_schedule)
from weatherforecastingtoolkit_tpu.training.tasks import reconstruction_task
from weatherforecastingtoolkit_tpu.training.trainer import (Trainer, derive_steps,
                                                            run_with_retry)
from weatherforecastingtoolkit_tpu.utils.config import Config


# ---------------------------------------------------------------- schedules
def test_cosine_warmup_schedule_shape():
    sched = cosine_warmup_schedule(1e-4, 1e-3, 1e-6, total_steps=100, warmup_steps=10)
    assert float(sched(0)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1e-6, abs=1e-7)
    # monotone decreasing after warmup
    vals = [float(sched(s)) for s in range(10, 101, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_one_cycle_schedule_shape():
    sched = one_cycle_schedule(4e-5, 1e-3, 4e-7, total_steps=100, rampup_steps=30)
    assert float(sched(30)) == pytest.approx(1e-3, rel=1e-2)
    assert float(sched(0)) < float(sched(30))
    assert float(sched(99)) < 1e-5


def test_lr_range_test(tmp_path):
    # quadratic bowl: loss decreases then explodes with lr
    def loss_at_lr(lr):
        return (lr - 0.01) ** 2 * 1e4 + 0.1

    lrs, losses = lr_range_test(loss_at_lr, 1e-4, 1.0, num_iter=30,
                                output_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "lr_range_test.png")
    assert len(lrs) == len(losses) and len(lrs) <= 30


# ---------------------------------------------------------------- checkpointing
def test_checkpoint_roundtrip_and_corruption(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.asarray(7, np.int32)}
    run_dir = run_dir_for(str(tmp_path), "exp", "abc")
    mgr = CheckpointManager(run_dir)
    mgr.save(7, state)
    mgr.save(14, {"params": {"w": state["params"]["w"] * 2}, "step": np.asarray(14, np.int32)})
    mgr.close()

    # corrupt the newest checkpoint
    import glob, shutil
    newest = os.path.join(run_dir, "checkpoints", "14")
    for f in glob.glob(os.path.join(newest, "**", "*"), recursive=True):
        if os.path.isfile(f):
            with open(f, "wb") as fh:
                fh.write(b"corrupt")

    restored, run_id, step = find_latest_ckpt(str(tmp_path), "exp", state)
    assert run_id == "abc"
    assert step == 7  # fell back past the corrupted step-14
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])


def test_corruption_not_misclassified_as_template_mismatch(tmp_path, capsys):
    """A truncated checkpoint whose restore raises ValueError AND whose
    metadata is unreadable must be classified corrupt/unreadable — the
    ValueError->structural promotion only applies when the on-disk metadata
    was readable and its tree signature matched the resume template."""
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.asarray(7, np.int32)}
    run_dir = run_dir_for(str(tmp_path), "exp", "abc")
    mgr = CheckpointManager(run_dir)
    mgr.save(7, state)
    mgr.close()

    import glob
    for f in glob.glob(os.path.join(run_dir, "checkpoints", "7", "**", "*"),
                       recursive=True):
        if os.path.isfile(f):
            with open(f, "wb") as fh:
                fh.write(b"corrupt")

    out = find_latest_ckpt(str(tmp_path), "exp", state)
    assert out == (None, None, None)
    printed = capsys.readouterr().out
    assert "corrupt/unreadable" in printed
    assert "TEMPLATE MISMATCH" not in printed
    # no misleading structure-change warning for a genuinely corrupt file
    assert "NONE match the resume template" not in printed


def test_find_latest_no_ckpt(tmp_path):
    out = find_latest_ckpt(str(tmp_path), "nothing", {"a": np.zeros(1)})
    assert out == (None, None, None)


def test_ema_shadow_params(tmp_path):
    """trainer.ema_decay: the shadow tree follows ema = d*ema + (1-d)*params
    exactly (verified against a manual recursion over the same param
    trajectory), persists through checkpoint/resume, and Trainer.ema_params
    selects it."""
    model = PosAwareAE(enc_channels=(8, 8), dec_channels=(8, 8, 8),
                       num_blocks=1, latent_hw=8, latent_channels=2,
                       latent_dim=32)
    d = 0.9
    cfg = Config({
        "experiment_name": "ema", "experiment_path": str(tmp_path), "seed": 0,
        "optim": {"lr": 1e-2, "schedule": "constant"},
        "trainer": {"max_epochs": 1, "total_train_steps": 3,
                    "save_every_n_steps": 1.0, "ema_decay": d},
        "logging": {"log_every_n_steps": 10, "val_every_n": 10.0},
    })
    task = reconstruction_task(model)
    tr = Trainer(cfg, task)
    state = tr.init_state()
    p0 = jax.device_get(state.params)
    x = np.random.default_rng(0).random((4, 2, 1, 32, 32)).astype(np.float32)
    batch = {"vil": jnp.asarray(x)}

    # manual recursion over the actual param trajectory
    manual = p0
    s = state
    for _ in range(3):
        s, _ = tr._train_step(s, batch)
        manual = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * np.asarray(p),
            manual, jax.device_get(s.params))
    for a, b in zip(jax.tree_util.tree_leaves(s.extra["ema_params"]),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-6, atol=1e-7)
    # ema lags params (it is a genuinely different tree after updates)
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(s.extra["ema_params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(s.params)[0]))
    assert Trainer.ema_params(s) is s.extra["ema_params"]

    # checkpoint + resume round-trips the shadow tree
    tr.ckpt.save(int(s.step), s, force=True)
    tr.close()
    tr2 = Trainer(cfg, reconstruction_task(model), resume=True)
    s2 = tr2.init_state()
    for a, b in zip(jax.tree_util.tree_leaves(s.extra["ema_params"]),
                    jax.tree_util.tree_leaves(s2.extra["ema_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tr2.close()

    # a task that already owns extra state must refuse ema_decay
    import pytest as _pytest

    from weatherforecastingtoolkit_tpu.training.trainer import Task
    bad = Task(name="bad", init_params=task.init_params,
               loss_fn=task.loss_fn, init_extra=lambda r, p: {"x": 0})
    with _pytest.raises(ValueError):
        Trainer(cfg, bad)


def test_ema_ticks_on_real_updates_under_accumulation(tmp_path):
    """With accumulate_grad_batches=k the params change only every k-th
    micro-step (optax MultiSteps); the EMA must tick exactly once per REAL
    optimizer update — never averaging in k-1 stale self-copies — pinned
    against a manual recursion that updates only on the k-step boundary."""
    model = PosAwareAE(enc_channels=(8, 8), dec_channels=(8, 8, 8),
                       num_blocks=1, latent_hw=8, latent_channels=2,
                       latent_dim=32)
    d, k, micro_steps = 0.5, 4, 8  # 2 real updates
    cfg = Config({
        "experiment_name": "ema_accum", "experiment_path": str(tmp_path),
        "seed": 0,
        "optim": {"lr": 1e-2, "schedule": "constant"},
        "trainer": {"max_epochs": 1, "total_train_steps": 2,
                    "accumulate_grad_batches": k,
                    "save_every_n_steps": 1.0, "ema_decay": d},
        "logging": {"log_every_n_steps": 10, "val_every_n": 10.0},
    })
    tr = Trainer(cfg, reconstruction_task(model))
    state = tr.init_state()
    manual = jax.device_get(state.params)
    rng = np.random.default_rng(0)
    s = state
    for i in range(micro_steps):
        batch = {"vil": jnp.asarray(
            rng.random((2, 2, 1, 32, 32)).astype(np.float32))}
        prev_params = jax.device_get(s.params)
        s, _ = tr._train_step(s, batch)
        if (i + 1) % k == 0:  # real update boundary
            # params actually changed here ...
            moved = any(not np.allclose(a, np.asarray(b)) for a, b in zip(
                jax.tree_util.tree_leaves(prev_params),
                jax.tree_util.tree_leaves(s.params)))
            assert moved
            manual = jax.tree_util.tree_map(
                lambda e, p: d * e + (1 - d) * np.asarray(p),
                manual, jax.device_get(s.params))
        else:
            # ... and did NOT change on intermediate micro-steps
            for a, b in zip(jax.tree_util.tree_leaves(prev_params),
                            jax.tree_util.tree_leaves(s.params)):
                np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s.extra["ema_params"]),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-6, atol=1e-7)
    tr.close()


def test_ema_toggle_resume_fallback(tmp_path):
    """Turning ema_decay on (or off) mid-run must NOT lose the run: resume
    seeds the shadow from restored params (on) or drops it (off) instead of
    classifying every checkpoint as a template mismatch."""
    model = PosAwareAE(enc_channels=(8, 8), dec_channels=(8, 8, 8),
                       num_blocks=1, latent_hw=8, latent_channels=2,
                       latent_dim=32)

    def cfg_for(ema):
        return Config({
            "experiment_name": "ema_toggle", "experiment_path": str(tmp_path),
            "seed": 0,
            "optim": {"lr": 1e-3, "schedule": "constant"},
            "trainer": {"max_epochs": 1, "total_train_steps": 2,
                        "save_every_n_steps": 1.0, "ema_decay": ema},
            "logging": {"log_every_n_steps": 10, "val_every_n": 10.0},
        })

    x = np.random.default_rng(0).random((2, 2, 1, 32, 32)).astype(np.float32)
    batches = [{"vil": jnp.asarray(x)} for _ in range(2)]

    # run WITHOUT ema, checkpoint
    tr = Trainer(cfg_for(None), reconstruction_task(model))
    s = tr.fit(batches, state=tr.init_state())
    assert s.extra is None
    tr.close()

    # resume WITH ema: shadow seeded from restored params at the saved step
    tr2 = Trainer(cfg_for(0.9), reconstruction_task(model), resume=True)
    s2 = tr2.init_state()
    assert int(s2.step) == int(s.step)
    for a, b in zip(jax.tree_util.tree_leaves(s2.extra["ema_params"]),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s2 = tr2.fit(batches, state=s2)  # trains + saves WITH the shadow
    tr2.close()

    # resume WITHOUT ema again: shadow dropped, step preserved
    tr3 = Trainer(cfg_for(None), reconstruction_task(model), resume=True)
    s3 = tr3.init_state()
    assert int(s3.step) == int(s2.step)
    assert s3.extra is None
    tr3.close()


def test_donated_train_step_matches(tmp_path):
    """trainer.donate=true (buffer-donated state) must produce bit-identical
    training to the non-donating step — donation only changes buffer reuse,
    never values. (On CPU donation is best-effort; on TPU it removes the
    transient second copy of params + optimizer state.)"""
    model = PosAwareAE(enc_channels=(8, 8), dec_channels=(8, 8, 8),
                       num_blocks=1, latent_hw=8, latent_channels=2,
                       latent_dim=32)

    def run(donate):
        cfg = Config({
            "experiment_name": f"donate_{donate}", "experiment_path": str(tmp_path),
            "seed": 0,
            "optim": {"lr": 1e-3, "schedule": "constant"},
            "trainer": {"max_epochs": 1, "total_train_steps": 3,
                        "save_every_n_steps": 1.0, "donate": donate},
            "logging": {"log_every_n_steps": 10, "val_every_n": 10.0},
        })
        tr = Trainer(cfg, reconstruction_task(model))
        x = np.random.default_rng(0).random((4, 2, 1, 32, 32)).astype(np.float32)
        state = tr.fit([{"vil": jnp.asarray(x)} for _ in range(3)],
                       state=tr.init_state())
        tr.close()
        return jax.device_get(state.params)

    a, b = run(False), run(True)
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_async_checkpoint_snapshot_isolation(tmp_path):
    """async_save: save() snapshots state at call time (device->host copy),
    the write overlaps further training, and every saved step restores the
    values that were current WHEN it was saved — including jax.Array input
    and a save issued while the previous write may still be in flight."""
    run_dir = run_dir_for(str(tmp_path), "exp", "async")
    mgr = CheckpointManager(run_dir, async_save=True)
    template = {"params": {"w": np.zeros((64, 64), np.float32)},
                "step": np.asarray(0, np.int32)}
    s1 = {"params": {"w": jnp.full((64, 64), 1.0)},
          "step": jnp.asarray(1, jnp.int32)}
    mgr.save(1, s1)                      # returns before the write finishes
    s2 = {"params": {"w": np.asarray(s1["params"]["w"]) * 2},
          "step": np.asarray(2, np.int32)}
    mgr.save(2, s2)                      # drains save-1 first, stays ordered
    # save_last overwrite of an async-saved step must also be safe
    mgr.save(2, {"params": {"w": np.asarray(s2["params"]["w"]) + 1},
                 "step": np.asarray(2, np.int32)}, force=True)
    r1 = mgr.restore(template, step=1)
    r2 = mgr.restore(template, step=2)
    mgr.close()
    np.testing.assert_array_equal(r1["params"]["w"], 1.0)
    np.testing.assert_array_equal(r2["params"]["w"], 3.0)
    assert int(r1["step"]) == 1 and int(r2["step"]) == 2
    # a fresh manager (new process analog) sees only finalized steps
    mgr2 = CheckpointManager(run_dir)
    assert mgr2.all_steps() == [1, 2]
    mgr2.close()


# ---------------------------------------------------------------- end-to-end
@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("sevir_train")
    make_synthetic_sevir(str(root), num_events=6, height=32, width=32,
                         raw_seq_len=25)
    return Config({
        "project_name": "test", "experiment_name": "tiny_ae",
        "experiment_path": str(tmp_path_factory.mktemp("exp")),
        "seed": 0,
        "sevir_root": str(root),
        "optim": {"lr": 1e-3, "weight_decay": 0.0, "schedule": "cosine_warmup",
                  "grad_clip": 1.0},
        "cosine_warmup": {"start_lr": 1e-4, "peak_lr": 1e-3, "final_lr": 1e-6,
                          "warmup_ratio": 0.2},
        "dataset": {"batch_size": 2, "seq_len": 13, "stride": 12},
        "trainer": {"max_epochs": 2, "accumulate_grad_batches": 1,
                    "save_every_n_steps": 0.5, "limit_train_batches": None,
                    "limit_val_batches": None, "limit_test_batches": None,
                    "total_train_steps": 8},
        "logging": {"log_every_n_steps": 2, "val_every_n": 10.0},
    })


def _tiny_model():
    return PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                      num_blocks=1, latent_hw=8, latent_channels=4,
                      latent_dim=32)


def test_derive_steps():
    cfg = Config({"trainer": {"max_epochs": 4, "accumulate_grad_batches": 2,
                              "limit_train_batches": 0.5,
                              "limit_val_batches": None,
                              "limit_test_batches": None}})
    out = derive_steps(cfg, n_train_batches=100, n_val_batches=10, n_test_batches=10)
    assert out.trainer.total_train_steps == 100  # 100*4/2 * 0.5
    assert out.trainer.total_val_steps == 20


def test_train_loop_end_to_end(tiny_cfg):
    dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir=tiny_cfg.sevir_root,
                         seq_len=13, stride=12, layout="NTCHW", batch_size=2,
                         num_workers=2, train_test_split_date=(2019, 1, 25),
                         val_ratio=0.3)
    dm.prepare_data(); dm.setup()
    task = reconstruction_task(_tiny_model(), loss="l1")
    trainer = Trainer(tiny_cfg, task)
    state = trainer.init_state()
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state = trainer.fit(dm.train_loader(), dm.val_loader())
    assert int(state.step) >= 4  # trained some steps
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))  # params moved
    # checkpoints exist
    assert trainer.ckpt.latest_step() is not None
    # metrics were logged
    from weatherforecastingtoolkit_tpu.training.logging import read_jsonl_metrics
    recs = read_jsonl_metrics(trainer.run_dir)
    assert any("train_loss" in r for r in recs)
    trainer.close()

    # ---- resume path: new trainer picks up the checkpoint
    trainer2 = Trainer(tiny_cfg, task, resume=True)
    state2 = trainer2.init_state()
    assert int(state2.step) == int(state.step)
    trainer2.close()


def test_accumulation_counts_optimizer_updates(tiny_cfg, rng):
    """total_train_steps counts OPTIMIZER UPDATES: with
    accumulate_grad_batches=k, fit() must run k*total micro-steps and the
    inner optimizer must have advanced exactly `total` times (round-1 bug:
    fit stopped at total micro-steps = total/k updates)."""
    import optax

    cfg = Config(tiny_cfg).merge({
        "experiment_name": "tiny_accum",
        "trainer": {"accumulate_grad_batches": 2, "total_train_steps": 3,
                    "max_epochs": 1},
        "logging": {"log_every_n_steps": 1, "val_every_n": 10.0},
    })
    task = reconstruction_task(_tiny_model(), loss="l1")
    trainer = Trainer(cfg, task)
    batches = [{"vil": rng.random((2, 2, 1, 32, 32)).astype(np.float32)}
               for _ in range(10)]
    state = trainer.fit(batches)
    assert int(state.step) == 6  # 3 updates x 2 micro-steps
    # the MultiSteps wrapper records completed optimizer updates
    flat = jax.tree_util.tree_leaves_with_path(jax.device_get(state.opt_state))
    gradient_steps = [v for p, v in flat if "gradient_step" in jax.tree_util.keystr(p)]
    assert gradient_steps and int(gradient_steps[0]) == 3
    trainer.close()


def test_overfit_batches_repeats_one_batch(tiny_cfg, rng):
    """overfit_batches=1 must train on the SAME first batch every epoch (the
    reference pl.Trainer(overfit_batches=1) smoke mode, ae_gan/train.py:591)
    — not merely limit the count like limit_train_batches."""
    class CountingLoader:
        def __init__(self, batches):
            self.batches = batches
            self.fetches = 0
            self.epochs_seen = []

        def __len__(self):
            return len(self.batches)

        def set_epoch(self, e):
            self.epochs_seen.append(e)

        def __iter__(self):
            for b in self.batches:
                self.fetches += 1
                yield b

    cfg = Config(tiny_cfg).merge({
        "experiment_name": "tiny_overfit",
        "trainer": {"overfit_batches": 1, "max_epochs": 3,
                    "total_train_steps": 3},
        "logging": {"log_every_n_steps": 1, "val_every_n": 10.0},
    })
    loader = CountingLoader(
        [{"vil": rng.random((2, 2, 1, 32, 32)).astype(np.float32)}
         for _ in range(5)])
    task = reconstruction_task(_tiny_model(), loss="l1")
    trainer = Trainer(cfg, task)
    state = trainer.fit(loader)
    assert int(state.step) == 3       # 3 epochs x 1 cached batch
    assert loader.fetches == 1        # the loader was only ever read once
    assert loader.epochs_seen == []   # no per-epoch reshuffle/re-aug
    trainer.close()


def test_derive_steps_overfit():
    cfg = Config({"trainer": {"max_epochs": 4, "accumulate_grad_batches": 1,
                              "overfit_batches": 2,
                              "limit_train_batches": None,
                              "limit_val_batches": None,
                              "limit_test_batches": None}})
    out = derive_steps(cfg, n_train_batches=100, n_val_batches=10)
    assert out.trainer.total_train_steps == 8  # 2 batches x 4 epochs


def test_param_histograms_logged(tiny_cfg, rng):
    """Opt-in wandb.watch analog: weight + grad histograms land in
    histograms.jsonl at the configured cadence."""
    import json

    cfg = Config(tiny_cfg).merge({
        "experiment_name": "tiny_hist",
        "trainer": {"max_epochs": 1, "total_train_steps": 2},
        "logging": {"log_every_n_steps": 1, "val_every_n": 10.0,
                    "param_histograms_every_n": 0.5},
    })
    task = reconstruction_task(_tiny_model(), loss="l1")
    trainer = Trainer(cfg, task)
    batches = [{"vil": rng.random((2, 2, 1, 32, 32)).astype(np.float32)}
               for _ in range(2)]
    trainer.fit(batches)
    path = os.path.join(trainer.run_dir, "histograms.jsonl")
    assert os.path.exists(path)
    recs = [json.loads(l) for l in open(path)]
    keys = set().union(*(r.keys() for r in recs))
    assert any(k.startswith("weight/") for k in keys)
    assert any(k.startswith("grad/") for k in keys)
    sample = next(v for r in recs for k, v in r.items()
                  if k.startswith("grad/") and isinstance(v, dict)
                  and "counts" in v)
    assert sum(sample["counts"]) > 0
    trainer.close()


def test_validate_produces_metric_dict(tiny_cfg):
    dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir=tiny_cfg.sevir_root,
                         seq_len=13, stride=12, layout="NTCHW", batch_size=2,
                         num_workers=2, train_test_split_date=(2019, 1, 25),
                         val_ratio=0.3)
    dm.prepare_data(); dm.setup()
    task = reconstruction_task(_tiny_model(), loss="l1")
    trainer = Trainer(tiny_cfg, task)
    state = trainer.init_state()
    out = trainer.validate(state, dm.val_loader(), step=0, max_batches=1)
    assert "loss" in out and "SSIM" in out and "paper_CSI_M_POOL1" in out
    trainer.close()


def test_run_with_retry():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("boom")

    run_with_retry(flaky, backoff_s=0.0)
    assert calls["n"] == 3


# ---------------------------------------------------------------- profiling
def test_step_timer_report():
    import time as _time
    from weatherforecastingtoolkit_tpu.training.profiling import StepTimer

    t = StepTimer()
    with t.phase("data"):
        _time.sleep(0.01)
    with t.phase("step"):
        _time.sleep(0.02)
    with t.phase("step"):
        _time.sleep(0.02)
    rep = t.report()
    assert "step" in rep and "data" in rep and "%" in rep
    t.reset()
    assert t.report().count("\n") == 0  # only header


def test_device_memory_stats_shape():
    from weatherforecastingtoolkit_tpu.training.profiling import device_memory_stats
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_log_images_writes_panels(tmp_path, rng):
    from weatherforecastingtoolkit_tpu.training.logging import RunLogger

    logger = RunLogger(str(tmp_path / "run"))
    pred = rng.random((2, 3, 1, 16, 16)).astype(np.float32)
    tgt = rng.random((2, 3, 1, 16, 16)).astype(np.float32)
    logger.log_images(pred, tgt, "val_panels", step=5, batch_idxs=2)
    logger.close()
    media = list((tmp_path / "run" / "media").glob("*.png"))
    assert len(media) == 2  # one panel per sample
