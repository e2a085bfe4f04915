"""Rematerialization (`remat=True`) must be a pure memory/FLOPs trade:
identical param tree, identical forward, identical gradients. Guards the
training-memory knob (jax.checkpoint per enc/dec block) added in round 3;
see RESULTS.md "Training roofline" — the batch is the training-throughput
lever, and remat is what lets the bandwidth-bound GAN step raise it."""

import jax
import jax.numpy as jnp
import numpy as np

from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import AutoencoderKL
from weatherforecastingtoolkit_tpu.models.vae.custom_akl import CustomAutoencoderKL


def _tree_paths(tree, prefix=""):
    out = []
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out += _tree_paths(v, p)
        else:
            out.append((p, v.shape))
    return sorted(out)


def _check_pair(base, rem, x, init_args=(), call_kwargs=None):
    call_kwargs = call_kwargs or {}
    vb = base.init(jax.random.key(0), x, *init_args)
    vr = rem.init(jax.random.key(0), x, *init_args)
    # 1. identical param tree (checkpoints interchange freely)
    assert _tree_paths(vb["params"]) == _tree_paths(vr["params"])

    def loss(variables, model):
        out = model.apply(variables, x, **call_kwargs)
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # 2. identical forward and 3. identical gradients under the SAME params
    lb, gb = jax.value_and_grad(loss)(vb, base)
    lr, gr = jax.value_and_grad(loss)(vb, rem)
    np.testing.assert_allclose(float(lb), float(lr), rtol=1e-6)
    flat_b = jax.tree.leaves(gb)
    flat_r = jax.tree.leaves(gr)
    for a, b in zip(flat_b, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_autoencoder_kl_remat_equivalence():
    kw = dict(in_channels=1, out_channels=1, block_out_channels=(8, 16),
              layers_per_block=1, latent_channels=2, norm_num_groups=4)
    x = jnp.asarray(np.random.default_rng(0).random((2, 1, 16, 16)),
                    jnp.float32)
    _check_pair(AutoencoderKL(**kw), AutoencoderKL(remat=True, **kw), x)


def test_pos_aware_ae_remat_equivalence():
    kw = dict(latent_dim=32, latent_channels=4, enc_channels=(8, 16),
              dec_channels=(16, 8, 8), num_blocks=1, latent_hw=4)
    x = jnp.asarray(np.random.default_rng(1).random((2, 1, 16, 16)),
                    jnp.float32)
    _check_pair(PosAwareAE(**kw), PosAwareAE(remat=True, **kw), x)


def test_custom_akl_remat_equivalence():
    kw = dict(block_out_channels=(8, 16), layers_per_block=1,
              latent_channels=4, norm_num_groups=4, latent_hw=8,
              timeseries_dim=32)
    x = jnp.asarray(np.random.default_rng(2).random((2, 1, 16, 16)),
                    jnp.float32)
    _check_pair(CustomAutoencoderKL(**kw),
                CustomAutoencoderKL(remat=True, **kw), x)
