"""Data-parallel training over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.parallel.mesh import (dp_sharding, make_mesh,
                                                         replicate, shard_batch)


def test_mesh_creation():
    mesh = make_mesh(("dp",))
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(("dp", "mp"), shape=(4, 2))
    assert mesh2.axis_names == ("dp", "mp")
    with pytest.raises(ValueError):
        make_mesh(("dp",), shape=(3,))


def test_batch_sharded_over_dp(rng):
    mesh = make_mesh(("dp",))
    batch = {"vil": rng.random((16, 4, 1, 8, 8)).astype(np.float32)}
    sharded = shard_batch(batch, mesh)
    # each device holds 16/8 = 2 samples
    shards = sharded["vil"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == 2


def test_dp_train_step_matches_single_device(rng):
    """Gradient step on the 8-device mesh must equal the single-device step
    (XLA psum all-reduce == full-batch gradient)."""
    import optax

    w0 = jnp.asarray(rng.random((4, 4)).astype(np.float32))
    x = jnp.asarray(rng.random((16, 4)).astype(np.float32))
    y = jnp.asarray(rng.random((16, 4)).astype(np.float32))
    tx = optax.sgd(0.1)

    def loss_fn(w, xb, yb):
        return jnp.mean((xb @ w - yb) ** 2)

    @jax.jit
    def step(w, opt, xb, yb):
        g = jax.grad(loss_fn)(w, xb, yb)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(w, up), opt

    # single device
    w1, _ = step(w0, tx.init(w0), x, y)

    # 8-device DP
    mesh = make_mesh(("dp",))
    wr = replicate(w0, mesh)
    xr = jax.device_put(x, dp_sharding(mesh))
    yr = jax.device_put(y, dp_sharding(mesh))
    w2, _ = step(wr, tx.init(wr), xr, yr)

    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-6)


def test_trainer_with_mesh(tmp_path, rng):
    """Full Trainer fit over the DP mesh on synthetic data."""
    from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule
    from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir
    from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
    from weatherforecastingtoolkit_tpu.training.tasks import reconstruction_task
    from weatherforecastingtoolkit_tpu.training.trainer import Trainer
    from weatherforecastingtoolkit_tpu.utils.config import Config

    root = tmp_path / "sevir"
    make_synthetic_sevir(str(root), num_events=8, height=32, width=32,
                         raw_seq_len=25)
    dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir=str(root), seq_len=13,
                         stride=12, layout="NTCHW", batch_size=8, num_workers=2,
                         train_test_split_date=(2019, 3, 1), val_ratio=0.2)
    dm.prepare_data(); dm.setup()
    cfg = Config({
        "experiment_name": "dp_test", "experiment_path": str(tmp_path), "seed": 0,
        "optim": {"lr": 1e-3, "schedule": "constant"},
        "trainer": {"max_epochs": 1, "total_train_steps": 2,
                    "save_every_n_steps": 1.0},
        "logging": {"log_every_n_steps": 1, "val_every_n": 10.0},
    })
    model = PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                       num_blocks=1, latent_hw=8, latent_channels=4, latent_dim=32)
    mesh = make_mesh(("dp",))
    trainer = Trainer(cfg, reconstruction_task(model), mesh=mesh)
    state = trainer.fit(dm.train_loader())
    assert int(state.step) >= 1
    trainer.close()
