"""bf16 mixed-precision training (ops/amp.py + task flags)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
from weatherforecastingtoolkit_tpu.ops.amp import cast_floats, to_f32


def test_cast_floats_leaves_non_fp32_alone(rng):
    tree = {"a": jnp.ones((2,), jnp.float32), "b": jnp.ones((2,), jnp.int32),
            "c": jnp.ones((2,), jnp.bfloat16)}
    out = cast_floats(tree)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32
    assert out["c"].dtype == jnp.bfloat16
    back = to_f32(out)
    assert back["a"].dtype == jnp.float32
    assert back["b"].dtype == jnp.int32


def _small_model():
    return PosAwareAE(enc_channels=(8, 16), dec_channels=(16, 8, 8),
                      num_blocks=1, latent_hw=8, latent_channels=4,
                      latent_dim=32)


def test_mixed_reconstruction_step_keeps_fp32_masters(rng):
    """One optimizer step with mixed_precision=True: grads exist, masters
    stay fp32, loss tracks the fp32 task's loss at init."""
    from weatherforecastingtoolkit_tpu.training.tasks import reconstruction_task
    from weatherforecastingtoolkit_tpu.training.trainer import TrainState

    model = _small_model()
    batch = {"vil": jnp.asarray(rng.random((2, 2, 1, 32, 32)).astype(np.float32))}
    key = jax.random.key(0)

    t32 = reconstruction_task(model)
    t16 = reconstruction_task(model, mixed_precision=True)
    params = t32.init_params(key)
    l32, _ = t32.loss_fn(params, batch, key, 0)
    l16, _ = t16.loss_fn(params, batch, key, 0)
    assert l16.dtype == jnp.float32
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)

    tx = optax.adamw(1e-3)
    grads = jax.grad(lambda p: t16.loss_fn(p, batch, key, 0)[0])(params)
    upd, _ = tx.update(grads, tx.init(params), params)
    new_params = optax.apply_updates(params, upd)
    for leaf in jax.tree_util.tree_leaves(new_params):
        assert leaf.dtype == jnp.float32  # masters never leave fp32
    g_leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in g_leaves)


def test_mixed_gan_step_runs_and_keeps_fp32_masters(rng):
    from weatherforecastingtoolkit_tpu.models.losses.gan import (
        NLayerDiscriminator)
    from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task
    from weatherforecastingtoolkit_tpu.training.trainer import TrainState

    model = _small_model()
    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=1)
    task = make_vae_gan_task(
        name="amp_gan",
        generator_apply=lambda p, f, r: (model.apply(p, f)[0], None),
        gen_init=lambda r: model.init(r, jnp.zeros((1, 1, 32, 32))),
        disc_apply=lambda p, f: disc.apply(p, f),
        disc_init=lambda r: disc.init(r, jnp.zeros((1, 1, 32, 32))),
        disc_tx=optax.adam(1e-4), last_layer_path=("params", "dec_out", "kernel"),
        disc_start=0, mixed_precision=True)
    tx = optax.adamw(1e-4)
    key = jax.random.key(0)
    params = task.init_params(key)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=key,
                       extra=task.init_extra(key, params))
    batch = {"vil": jnp.asarray(rng.random((1, 2, 1, 32, 32)).astype(np.float32))}
    new_state, aux = task.custom_train_step(state, batch, tx)
    for k in ("loss", "g_loss", "disc_loss", "d_weight"):
        assert np.isfinite(float(aux[k])), k
    for leaf in jax.tree_util.tree_leaves((new_state.params,
                                           new_state.extra["disc_params"])):
        assert leaf.dtype == jnp.float32
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
