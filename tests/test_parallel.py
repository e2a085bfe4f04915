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


def _tiny_vae_gan_task():
    """Tiny AutoencoderKL + PatchGAN task (full LPIPSWithDiscriminator
    semantics: NLL + KL + adaptive weight + gated disc)."""
    import optax

    from weatherforecastingtoolkit_tpu.models.losses.gan import NLayerDiscriminator
    from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import AutoencoderKL
    from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task

    hw = 16
    model = AutoencoderKL(in_channels=1, out_channels=1,
                          block_out_channels=(8, 16), layers_per_block=1,
                          latent_channels=4, norm_num_groups=4)
    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=1)

    def generator_apply(params, frames, rng_):
        recon, post = model.apply(params, frames, sample_posterior=True,
                                  rng=rng_, return_posterior=True)
        return recon, post.kl()

    task = make_vae_gan_task(
        name="gan_dp", generator_apply=generator_apply,
        gen_init=lambda r: model.init(r, jnp.zeros((1, 1, hw, hw))),
        disc_apply=lambda p, f: disc.apply(p, f),
        disc_init=lambda r: disc.init(r, jnp.zeros((1, 1, hw, hw))),
        # SGD on both optimizers: updates stay proportional to gradients,
        # so cross-sharding reduction-order noise isn't sign-amplified the
        # way Adam's first-step normalization amplifies near-zero grads
        disc_tx=optax.sgd(1e-3),
        last_layer_path=("params", "decoder", "conv_out", "kernel"),
        kl_weight=1e-6, disc_start=0)
    return task, hw


def test_gan_dp_step_matches_single_device(rng):
    """The two-optimizer GAN custom_train_step on the 8-device DP mesh must
    bit-match the single-device step (VAE sampling, adaptive weight, both
    optimizer updates)."""
    import optax

    from weatherforecastingtoolkit_tpu.training.trainer import TrainState

    task, hw = _tiny_vae_gan_task()
    tx = optax.sgd(1e-3)
    key = jax.random.key(0)
    params = task.init_params(key)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=key,
                       extra=task.init_extra(key, params))
    batch = {"vil": jnp.asarray(
        rng.random((8, 2, 1, hw, hw)).astype(np.float32))}

    step = jax.jit(lambda s, b: task.custom_train_step(s, b, tx))
    s1, aux1 = step(state, batch)

    mesh = make_mesh(("dp",))
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state_r = jax.device_put(state, rep)
    batch_r = {"vil": jax.device_put(batch["vil"], dp_sharding(mesh))}
    s2, aux2 = step(state_r, batch_r)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.extra["disc_params"]),
                    jax.tree_util.tree_leaves(s2.extra["disc_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_gan_fsdp_step_matches_single_device(rng):
    """FSDP over the GAN's FULL state — generator params/opt AND the
    discriminator tree living in TrainState.extra (disc params + its Adam
    moments) — must reproduce the single-device two-optimizer step, with the
    extra tree genuinely sharded."""
    import optax

    from weatherforecastingtoolkit_tpu.parallel.fsdp import (shard_fraction,
                                                             shard_train_state)
    from weatherforecastingtoolkit_tpu.training.trainer import TrainState

    task, hw = _tiny_vae_gan_task()
    tx = optax.sgd(1e-3)
    key = jax.random.key(0)
    params = task.init_params(key)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=key,
                       extra=task.init_extra(key, params))
    batch = {"vil": jnp.asarray(
        rng.random((8, 2, 1, hw, hw)).astype(np.float32))}

    step = jax.jit(lambda s, b: task.custom_train_step(s, b, tx))
    s1, aux1 = step(state, batch)

    mesh = make_mesh(("dp",))
    state_f = shard_train_state(state, mesh, min_shard_elems=1)
    assert shard_fraction(state_f.extra) < 0.75  # disc tree really split
    batch_f = {"vil": jax.device_put(batch["vil"], dp_sharding(mesh))}
    s2, aux2 = step(state_f, batch_f)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.extra["disc_params"]),
                    jax.tree_util.tree_leaves(s2.extra["disc_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_mp_sharded_vae_step_matches_single_device(rng):
    """AutoencoderKL train step with conv/dense kernels tensor-parallel over
    'mp' (output-feature axis) on a dp x mp mesh == the single-device step;
    XLA GSPMD inserts the collectives."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import AutoencoderKL

    hw = 16
    model = AutoencoderKL(in_channels=1, out_channels=1,
                          block_out_channels=(8, 16), layers_per_block=1,
                          latent_channels=4, norm_num_groups=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, hw, hw)))
    tx = optax.sgd(1e-2)
    opt = tx.init(variables)
    x = jnp.asarray(rng.random((8, 1, hw, hw)).astype(np.float32))

    @jax.jit
    def step(v, opt, xb):
        def loss_fn(v_):
            recon = model.apply(v_, xb)
            return jnp.mean((recon - xb) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(v)
        upd, opt = tx.update(grads, opt, v)
        return optax.apply_updates(v, upd), opt, loss

    v1, _, loss1 = step(variables, opt, x)

    mesh = make_mesh(("dp", "mp"), shape=(4, 2))

    def spec_for(leaf):
        # shard the output-feature (last) axis of every weight matrix/kernel
        if leaf.ndim >= 2 and leaf.shape[-1] % 2 == 0:
            return P(*([None] * (leaf.ndim - 1) + ["mp"]))
        return P()

    v_sharded = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, spec_for(leaf))),
        variables)
    opt_sharded = tx.init(v_sharded)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("dp")))
    v2, _, loss2 = step(v_sharded, opt_sharded, x_sharded)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_loaders_feed_dp_ranks(tmp_path, rng):
    """End-to-end 2-rank emulation: two num_shard=2 SEVIRDataset loaders
    (rank 0/1) each feed their own device of a 2-device dp mesh via
    make_array_from_single_device_arrays — multi-host DP semantics — and the
    sharded step equals the single-device step on the concatenated batch."""
    import optax

    from weatherforecastingtoolkit_tpu.data.dataset import SEVIRDataset
    from weatherforecastingtoolkit_tpu.data.prefetch import BatchLoader
    from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir
    from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE

    root = tmp_path / "sevir"
    make_synthetic_sevir(str(root), num_events=8, height=32, width=32,
                         raw_seq_len=25)
    loaders = [
        BatchLoader(
            SEVIRDataset(catalog=f"{root}/CATALOG.csv", data_dir=f"{root}/data",
                         seq_len=4, raw_seq_len=25, stride=21, layout="NTCHW",
                         num_shard=2, rank=r, split_mode="uneven"),
            batch_size=2, shuffle=False, num_workers=0)
        for r in range(2)]
    b0 = next(iter(loaders[0]))["vil"]
    b1 = next(iter(loaders[1]))["vil"]
    assert not np.allclose(b0, b1), "ranks must see distinct shards"

    model = PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                       num_blocks=1, latent_hw=8, latent_channels=4,
                       latent_dim=32)
    tx = optax.adamw(1e-3)
    flat = np.concatenate([b0, b1]).reshape((-1, 1, 32, 32))
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 32, 32)))
    opt = tx.init(params)

    @jax.jit
    def step(p, opt, xb):
        def loss_fn(p_):
            recon, _ = model.apply(p_, xb)
            return jnp.mean(jnp.abs(recon - xb))
        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, upd), opt, loss

    p1, _, loss1 = step(params, opt, jnp.asarray(flat))

    # each "rank" places ONLY its own shard on its own device
    mesh = make_mesh(("dp",), shape=(2,), devices=jax.devices()[:2])
    sharding = dp_sharding(mesh)
    shards = [b0.reshape((-1, 1, 32, 32)), b1.reshape((-1, 1, 32, 32))]
    global_x = jax.make_array_from_single_device_arrays(
        flat.shape, sharding,
        [jax.device_put(s, d) for s, d in zip(shards, mesh.devices.flat)])
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    p2, _, loss2 = step(jax.device_put(params, rep),
                        jax.device_put(opt, rep), global_x)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


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


def test_dp_serving_matches_single_device(rng):
    """make_dp_serving_fn: dp-sharded rollout == single-device rollout,
    including an uneven batch that needs padding."""
    from weatherforecastingtoolkit_tpu.models.forecasters import DLinear
    from weatherforecastingtoolkit_tpu.models.rollout import make_forecast_pipeline
    from weatherforecastingtoolkit_tpu.parallel.serving import make_dp_serving_fn

    t_in, t_out, hw = 5, 3, 8
    fc = DLinear(seq_len=t_in, pred_len=t_out, kernel_size=3)
    d = hw * hw  # identity "VAE": latent == flattened frame
    fc_vars = fc.init(jax.random.key(0), jnp.zeros((1, t_in, d)))

    pipeline = make_forecast_pipeline(
        encode_apply=lambda f: f.reshape(f.shape[0], -1),
        decode_apply=lambda z: z.reshape(z.shape[0], 1, hw, hw),
        forecaster_apply=lambda p, z: fc.apply(p, z),
        input_frames=t_in, pred_frames=t_out)

    frames = rng.random((13, t_in, 1, hw, hw)).astype(np.float32)  # 13 % 8 != 0
    single = np.asarray(jax.jit(pipeline)(fc_vars, jnp.asarray(frames)))

    mesh = make_mesh(("dp",))
    serve = make_dp_serving_fn(pipeline, mesh, params=fc_vars)
    served = serve(frames)
    assert served.shape == single.shape
    np.testing.assert_allclose(served, single, atol=1e-6)


def test_export_pipeline_roundtrip(tmp_path, rng):
    """jax.export artifact: serialize the rollout, load it back WITHOUT the
    model code path, serve any batch size via the symbolic batch dim."""
    from weatherforecastingtoolkit_tpu.models.forecasters import DLinear
    from weatherforecastingtoolkit_tpu.models.rollout import make_forecast_pipeline
    from weatherforecastingtoolkit_tpu.parallel.serving import (export_pipeline,
                                                                load_pipeline)

    t_in, t_out, hw = 5, 3, 8
    fc = DLinear(seq_len=t_in, pred_len=t_out, kernel_size=3)
    fv = fc.init(jax.random.key(0), jnp.zeros((1, t_in, hw * hw)))
    pipe = make_forecast_pipeline(
        encode_apply=lambda f: f.reshape(f.shape[0], -1),
        decode_apply=lambda z: z.reshape(z.shape[0], 1, hw, hw),
        forecaster_apply=lambda p, z: fc.apply(p, z),
        input_frames=t_in, pred_frames=t_out)
    path = str(tmp_path / "rollout.stablehlo")
    frames = jnp.asarray(rng.random((4, t_in, 1, hw, hw)).astype(np.float32))
    export_pipeline(pipe, fv, frames, path)
    call = load_pipeline(path)
    np.testing.assert_allclose(np.asarray(call(fv, frames)),
                               np.asarray(jax.jit(pipe)(fv, frames)), atol=1e-6)
    other = jnp.asarray(rng.random((7, t_in, 1, hw, hw)).astype(np.float32))
    assert call(fv, other).shape == (7, t_out, 1, hw, hw)


def test_fsdp_spec_rules():
    """Shape-based sharding rule: largest divisible dim, last-dim tie-break,
    small/indivisible leaves replicate."""
    from jax.sharding import PartitionSpec as P

    from weatherforecastingtoolkit_tpu.parallel.fsdp import fsdp_spec

    # conv kernel: cout (last, largest divisible) wins
    assert fsdp_spec((3, 3, 64, 128), 8) == P(None, None, None, "dp")
    # square dense kernel: tie broken toward the LAST dim
    assert fsdp_spec((4096, 4096), 8) == P(None, "dp")
    # nothing divisible by 8 -> replicated
    assert fsdp_spec((3, 3, 9, 9), 8, min_shard_elems=1) == P()
    # small leaf -> replicated regardless of divisibility
    assert fsdp_spec((64,), 8) == P()
    # scalar -> replicated
    assert fsdp_spec((), 8) == P()


def test_fsdp_train_step_matches_single_device(rng):
    """Fully-sharded params + optimizer state over the 8-device mesh: the
    train step must match single-device (GSPMD all-gather on use,
    reduce-scatter gradients, sharded adam update), and each device must
    hold ~1/8 of the state bytes."""
    import optax

    from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
    from weatherforecastingtoolkit_tpu.parallel.fsdp import (shard_fraction,
                                                             shard_tree)

    model = PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                       num_blocks=1, latent_hw=8, latent_channels=4,
                       latent_dim=64)
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 32, 32)))
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    x = jnp.asarray(rng.random((16, 1, 32, 32)).astype(np.float32))

    @jax.jit
    def step(p, opt, xb):
        def loss_fn(p_):
            recon, _ = model.apply(p_, xb)
            return jnp.mean(jnp.abs(recon - xb))
        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, upd), opt, loss

    p1, _, loss1 = step(params, opt, x)

    mesh = make_mesh(("dp",))
    # min_shard_elems=1: this test model is tiny, shard everything divisible
    p_sh = shard_tree(params, mesh, min_shard_elems=1)
    opt_sh = shard_tree(opt, mesh, min_shard_elems=1)
    x_sh = jax.device_put(x, dp_sharding(mesh))
    p2, opt2, loss2 = step(p_sh, opt_sh, x_sh)

    # sharded reductions reorder the sums -> small float drift
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # memory evidence: device 0 holds well under the replicated 100%
    assert shard_fraction(p_sh) < 0.35
    assert shard_fraction(opt2) < 0.5  # mu/nu sharded; counts replicated


def test_fsdp_init_sharded_never_materializes_full(rng):
    """init_sharded creates every leaf ALREADY sharded (jit out_shardings):
    values match the plain init bit-for-bit, and big leaves are split."""
    import optax

    from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
    from weatherforecastingtoolkit_tpu.parallel.fsdp import (init_sharded,
                                                             shard_fraction)

    model = PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                       num_blocks=1, latent_hw=8, latent_channels=4,
                       latent_dim=512)
    tx = optax.adamw(1e-3)

    def init_fn(rng_key):
        params = model.init(rng_key, jnp.zeros((1, 1, 32, 32)))
        return {"params": params, "opt": tx.init(params)}

    mesh = make_mesh(("dp",))
    sharded = init_sharded(init_fn, jax.random.key(0), mesh,
                           min_shard_elems=1)
    plain = init_fn(jax.random.key(0))
    for a, b in zip(jax.tree_util.tree_leaves(sharded),
                    jax.tree_util.tree_leaves(plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert shard_fraction(sharded["params"]) < 0.35
    assert shard_fraction(sharded["opt"]) < 0.5


def test_trainer_fsdp_flag(tmp_path, rng):
    """Trainer with trainer.fsdp=true trains on the mesh with sharded state."""
    from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule
    from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir
    from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
    from weatherforecastingtoolkit_tpu.parallel.fsdp import shard_fraction
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
        "experiment_name": "fsdp_test", "experiment_path": str(tmp_path),
        "seed": 0,
        "optim": {"lr": 1e-3, "schedule": "constant"},
        "trainer": {"max_epochs": 1, "total_train_steps": 2,
                    "save_every_n_steps": 1.0, "fsdp": True},
        "logging": {"log_every_n_steps": 1, "val_every_n": 10.0},
    })
    # latent_dim 512 -> the bottleneck dense kernels clear MIN_SHARD_ELEMS
    model = PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                       num_blocks=1, latent_hw=8, latent_channels=4,
                       latent_dim=512)
    mesh = make_mesh(("dp",))
    trainer = Trainer(cfg, reconstruction_task(model), mesh=mesh)
    state = trainer.init_state()
    assert shard_fraction(state.params) < 0.6  # big leaves sharded
    state = trainer.fit(dm.train_loader(), state=state)
    assert int(state.step) >= 1
    trainer.close()

    # FSDP resume restores each leaf DIRECTLY into its shard via the abstract
    # template — the full replicated state never materializes on one device
    # (the regime FSDP exists for). Values must round-trip exactly.
    tr2 = Trainer(cfg, reconstruction_task(model), mesh=mesh, resume=True)
    assert tr2._resume_state is not None and tr2._resume_sharded
    s2 = tr2.init_state()
    assert int(s2.step) == int(state.step)
    assert shard_fraction(s2.params) < 0.6  # restored sharded, not replicated
    from weatherforecastingtoolkit_tpu.parallel.fsdp import fsdp_sharding
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(s2.params)):
        # restored leaves land on the FSDP template sharding (the live step's
        # output sharding may differ — GSPMD is free to re-shard jit outputs)
        assert b.sharding == fsdp_sharding(b, mesh), b.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tr2.close()


def test_member_parallel_ensemble_matches_unsharded(rng):
    """N=8 ensemble members sharded over the 8-device mesh must reproduce the
    unsharded run of the same fanout program (same key tree), with the member
    axis actually distributed."""
    from weatherforecastingtoolkit_tpu.models.forecasters import DLinear
    from weatherforecastingtoolkit_tpu.models.rollout import (
        make_ensemble_pipeline)
    from weatherforecastingtoolkit_tpu.parallel.serving import (
        make_member_parallel_ensemble)

    t_in, t_out, hw = 4, 3, 4
    fc = DLinear(seq_len=t_in, pred_len=t_out, kernel_size=3)
    params = fc.init(jax.random.key(0), jnp.zeros((1, t_in, hw * hw)))
    kw = dict(
        encode_apply=lambda f: f.reshape(f.shape[0], -1),
        decode_apply=lambda z: z.reshape(z.shape[0], 1, hw, hw),
        forecaster_apply=lambda p, z: fc.apply(p, z),
        input_frames=t_in, pred_frames=t_out)
    x = jnp.asarray(rng.random((2, t_in, 1, hw, hw)).astype(np.float32))
    key = jax.random.key(5)

    mesh = make_mesh(("dp",))
    sharded = make_member_parallel_ensemble(mesh=mesh, n_members=8, **kw)
    out = sharded(params, x, key, 0.1)
    assert out.shape == (2, 8, t_out, 1, hw, hw)
    member_shards = {s.index[1] for s in out.addressable_shards}
    assert len(member_shards) == 8  # member axis is distributed

    # unsharded reference: the identical key tree, one device
    local = make_ensemble_pipeline(n_members=1, **kw)
    keys = jax.random.split(key, 8)
    ref = jnp.concatenate(
        [local(params, x, keys[i], 0.1) for i in range(8)], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    with pytest.raises(ValueError):
        make_member_parallel_ensemble(mesh=mesh, n_members=6, **kw)
