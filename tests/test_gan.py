"""GAN stack tests: discriminator shapes/param parity, loss functions,
adaptive weight, and a 3-step end-to-end VAE-GAN training run (incl. the
disc_start gate behavior)."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
from weatherforecastingtoolkit_tpu.models.losses.gan import (NLayerDiscriminator,
                                                             adaptive_weight,
                                                             adopt_weight,
                                                             hinge_d_loss,
                                                             vanilla_d_loss)
from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task
from weatherforecastingtoolkit_tpu.training.trainer import Trainer
from weatherforecastingtoolkit_tpu.utils.config import Config


def test_discriminator_shapes(rng):
    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=3)
    x = jnp.asarray(rng.random((2, 1, 64, 64)).astype(np.float32))
    params = disc.init(jax.random.key(0), x)
    logits = disc.apply(params, x)
    assert logits.shape[0] == 2 and logits.shape[1] == 1
    assert logits.shape[2] < 64  # patch map, downsampled


def test_discriminator_output_matches_torch_geometry(rng):
    """Same patch-map spatial size as the torch reference discriminator."""
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_disc", "/root/reference/pipeline/models/autoencoderkl/losses/model.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    tdisc = ref.NLayerDiscriminator(input_nc=1, ndf=8, n_layers=3).eval()
    with torch.no_grad():
        t_out = tdisc(torch.zeros(1, 1, 64, 64))

    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=3)
    x = jnp.zeros((1, 1, 64, 64))
    logits = disc.apply(disc.init(jax.random.key(0), x), x)
    assert tuple(logits.shape) == tuple(t_out.shape)


def test_hinge_and_vanilla_losses():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    # perfectly separated -> hinge loss 0
    assert float(hinge_d_loss(real, fake)) == pytest.approx(0.0)
    # symmetric logits -> vanilla = softplus(-2)
    expected = float(np.log1p(np.exp(-2.0)))
    assert float(vanilla_d_loss(real, fake)) == pytest.approx(expected, rel=1e-5)


def test_adopt_weight_gate():
    assert float(adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(10), threshold=10)) == 1.0


def test_adaptive_weight_formula(rng):
    g_rec = jnp.asarray(rng.random((4, 4)).astype(np.float32))
    g_adv = jnp.asarray(rng.random((4, 4)).astype(np.float32))
    w = float(adaptive_weight(g_rec, g_adv, disc_weight=2.0))
    expected = 2.0 * np.linalg.norm(np.asarray(g_rec).ravel()) / (
        np.linalg.norm(np.asarray(g_adv).ravel()) + 1e-4)
    assert w == pytest.approx(expected, rel=1e-5)


@pytest.fixture(scope="module")
def gan_setup(tmp_path_factory):
    gen = PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                     num_blocks=1, latent_hw=8, latent_channels=4, latent_dim=32)
    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=2)
    disc_tx = optax.adam(1e-4)

    def generator_apply(params, frames, rng):
        recon, z = gen.apply(params, frames)
        return recon, None

    task = make_vae_gan_task(
        name="gan_test",
        generator_apply=generator_apply,
        gen_init=lambda rng: gen.init(rng, jnp.zeros((1, 1, 32, 32))),
        disc_apply=lambda p, f: disc.apply(p, f),
        disc_init=lambda rng: disc.init(rng, jnp.zeros((1, 1, 32, 32))),
        disc_tx=disc_tx,
        last_layer_path=("params", "dec_out", "kernel"),
        disc_start=2, disc_weight=1.0)

    cfg = Config({
        "experiment_name": "gan_test",
        "experiment_path": str(tmp_path_factory.mktemp("gan_exp")),
        "seed": 0,
        "optim": {"lr": 1e-4, "schedule": "constant"},
        "trainer": {"max_epochs": 1, "total_train_steps": 4,
                    "save_every_n_steps": 10.0},
        "logging": {"log_every_n_steps": 1, "val_every_n": 10.0},
    })
    return cfg, task


def test_gan_step_end_to_end(gan_setup, rng):
    cfg, task = gan_setup
    trainer = Trainer(cfg, task)
    state = trainer.init_state()

    batch = {"vil": rng.random((2, 2, 1, 32, 32)).astype(np.float32)}
    d0 = jax.tree_util.tree_leaves(state.extra["disc_params"])[0].copy()
    g0 = jax.tree_util.tree_leaves(state.params["gen"])[0].copy()
    opt0 = jax.device_get(state.extra["disc_opt_state"])

    # step 0 (< disc_start=2): generator trains, disc frozen, d_weight inert
    state, aux = trainer._train_step(state, batch)
    assert float(aux["disc_factor"]) == 0.0
    d1 = jax.tree_util.tree_leaves(state.extra["disc_params"])[0]
    g1 = jax.tree_util.tree_leaves(state.params["gen"])[0]
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))  # disc gated
    assert not np.allclose(np.asarray(g0), np.asarray(g1))         # gen moved
    # disc optimizer MOMENTS must stay exactly at init before disc_start
    # (the reference backprops disc_factor=0 * d_loss, so torch Adam's
    # exp_avg/exp_avg_sq stay zero — contperceptual.py:163)
    opt1 = jax.device_get(state.extra["disc_opt_state"])
    for a, b in zip(jax.tree_util.tree_leaves(opt0),
                    jax.tree_util.tree_leaves(opt1)):
        if np.asarray(a).dtype.kind == "f":  # counts may advance; moments not
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # advance past disc_start: both train
    state, aux = trainer._train_step(state, batch)
    state, aux = trainer._train_step(state, batch)
    assert float(aux["disc_factor"]) == 1.0
    assert float(aux["d_weight"]) > 0.0
    d2 = jax.tree_util.tree_leaves(state.extra["disc_params"])[0]
    assert not np.allclose(np.asarray(d1), np.asarray(d2))          # disc moved
    assert np.isfinite(float(aux["loss"]))
    assert np.isfinite(float(aux["disc_loss"]))
    trainer.close()


def test_gan_resume_restores_disc_state(gan_setup, rng, tmp_path):
    """--resume on a GAN run must restore the discriminator params AND its
    optimizer state (round-1 bug: the resume template lacked extra, orbax
    raised a tree mismatch, and the run silently restarted from step 0)."""
    cfg, task = gan_setup
    cfg = Config(cfg).merge({"experiment_path": str(tmp_path),
                             "experiment_name": "gan_resume"})
    trainer = Trainer(cfg, task)
    state = trainer.init_state()
    batch = {"vil": rng.random((2, 2, 1, 32, 32)).astype(np.float32)}
    for _ in range(3):  # past disc_start=2 so disc opt state is non-trivial
        state, _aux = trainer._train_step(state, batch)
    trainer.ckpt.save(int(state.step), jax.device_get(state), force=True)
    trainer.close()

    trainer2 = Trainer(cfg, task, resume=True)
    restored = trainer2.init_state()
    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.extra)),
                    jax.tree_util.tree_leaves(jax.device_get(restored.extra))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    trainer2.close()


def test_gan_nll_is_per_sample_sum(gan_setup, rng):
    """With kl_weight set, the NLL must be sum-per-sample/batch (reference
    contperceptual.py:108-112), not a per-element mean."""
    from weatherforecastingtoolkit_tpu.models.losses.gan import NLayerDiscriminator
    from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE

    gen = PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                     num_blocks=1, latent_hw=8, latent_channels=4, latent_dim=32)
    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=2)

    def generator_apply(params, frames, rng_):
        recon, _z = gen.apply(params, frames)
        return recon, jnp.zeros((frames.shape[0],))  # zero KL for the check

    task = make_vae_gan_task(
        name="gan_nll_scale",
        generator_apply=generator_apply,
        gen_init=lambda r: gen.init(r, jnp.zeros((1, 1, 32, 32))),
        disc_apply=lambda p, f: disc.apply(p, f),
        disc_init=lambda r: disc.init(r, jnp.zeros((1, 1, 32, 32))),
        disc_tx=optax.adam(1e-4),
        last_layer_path=("params", "dec_out", "kernel"),
        kl_weight=1e-6, disc_start=10)

    params = task.init_params(jax.random.key(0))
    batch = {"vil": rng.random((2, 2, 1, 32, 32)).astype(np.float32)}
    total, aux = task.loss_fn(params, batch, jax.random.key(1), 0)
    # logvar starts at 0 => nll == sum(|recon-x|)/B == rec_mean * C*H*W*T
    per_elem = float(aux["rec_loss"])
    elems_per_sample = 1 * 32 * 32  # per frame; batch axis is B*T
    assert float(aux["nll_loss"]) == pytest.approx(per_elem * elems_per_sample,
                                                   rel=1e-5)


def test_feature_matching_perceptual_loss(rng):
    """Weight-free perceptual term (PatchGAN feature matching): zero for
    identical inputs, positive otherwise; inside the task it adds gradient
    signal to the GENERATOR while leaving the discriminator's training
    untouched (stop_gradient) — the LPIPS role (contperceptual.py:103-106)
    without pretrained VGG weights."""
    from weatherforecastingtoolkit_tpu.models.losses.gan import (
        feature_matching_distance)

    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=2)
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    y = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    dvars = disc.init(jax.random.key(0), x)
    logits, feats = disc.apply(dvars, x, return_features=True)
    # taps: one per conv level (n_layers + stride-1 head)
    assert len(feats) == 3
    # plain call unchanged
    np.testing.assert_array_equal(np.asarray(disc.apply(dvars, x)),
                                  np.asarray(logits))
    _, feats_y = disc.apply(dvars, y, return_features=True)
    d_same = feature_matching_distance(feats, feats)
    d_diff = feature_matching_distance(feats, feats_y)
    assert d_same.shape == (2, 1, 1, 1)
    np.testing.assert_array_equal(np.asarray(d_same), 0.0)
    assert np.all(np.asarray(d_diff) > 0)

    # end-to-end: the task with feature_matching_weight>0 carries an fm_loss
    # aux, a larger rec objective, and different generator gradients
    gen = PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                     num_blocks=1, latent_hw=8, latent_channels=4,
                     latent_dim=32)

    def build(fm_w):
        return make_vae_gan_task(
            name="gan_fm",
            generator_apply=lambda p, f, r: (gen.apply(p, f)[0], None),
            gen_init=lambda r: gen.init(r, jnp.zeros((1, 1, 32, 32))),
            disc_apply=lambda p, f: disc.apply(p, f),
            disc_init=lambda r: disc.init(r, jnp.zeros((1, 1, 32, 32))),
            disc_tx=optax.adam(1e-4),
            last_layer_path=("params", "dec_out", "kernel"),
            disc_feats_apply=lambda p, f: disc.apply(p, f,
                                                     return_features=True),
            feature_matching_weight=fm_w, disc_start=0)

    from weatherforecastingtoolkit_tpu.training.trainer import TrainState
    tx = optax.adam(1e-4)
    batch = {"vil": rng.random((2, 2, 1, 32, 32)).astype(np.float32)}

    def one_step(fm_w):
        task = build(fm_w)
        params = task.init_params(jax.random.key(0))
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params), rng=jax.random.key(1),
                           extra=task.init_extra(jax.random.key(2), params))
        return task.custom_train_step(state, batch, tx)

    s_fm, aux_fm = one_step(1.0)
    s_no, aux_no = one_step(0.0)
    assert "fm_loss" in aux_fm and float(aux_fm["fm_loss"]) > 0
    assert float(aux_fm["rec_loss"]) > float(aux_no["rec_loss"])
    # generator params took a different step under FM ...
    g_fm = jax.tree_util.tree_leaves(s_fm.params["gen"])[0]
    g_no = jax.tree_util.tree_leaves(s_no.params["gen"])[0]
    assert not np.allclose(np.asarray(g_fm), np.asarray(g_no))
    # ... while the discriminator's update is identical (FM never trains it)
    for a, b in zip(jax.tree_util.tree_leaves(s_fm.extra["disc_params"]),
                    jax.tree_util.tree_leaves(s_no.extra["disc_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
