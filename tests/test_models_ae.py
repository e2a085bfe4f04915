"""Autoencoder zoo tests: shapes, bounded outputs, and parameter-count parity
with the torch reference models (run on CPU torch straight from the read-only
reference tree — parity check, not a port)."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE, PosAwareAETF
from weatherforecastingtoolkit_tpu.models.forecasters import (DLinear,
                                                              LinearForecaster,
                                                              PerPixelLinear,
                                                              TimeMLP,
                                                              moving_avg,
                                                              series_decomp)
from weatherforecastingtoolkit_tpu.models.vit_ae import ViTAE

REF = "/root/reference/pipeline/models"


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _param_count(params) -> int:
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------- conv AE
@pytest.fixture(scope="module")
def small_ae():
    # scaled-down config for fast CPU tests (32x32 input, 8x8 latent grid)
    return PosAwareAE(enc_channels=(16, 32), dec_channels=(32, 16, 8),
                      num_blocks=1, latent_hw=8, latent_channels=8,
                      latent_dim=64)


def test_conv_ae_shapes(small_ae, rng):
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    params = small_ae.init(jax.random.key(0), x)
    recon, z = small_ae.apply(params, x)
    assert recon.shape == (2, 1, 32, 32)
    assert z.shape == (2, 64)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0  # sigmoid head


def test_conv_ae_encode_decode_roundtrip(small_ae, rng):
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    params = small_ae.init(jax.random.key(0), x)
    z = small_ae.apply(params, x, method=small_ae.encode)
    recon = small_ae.apply(params, z, method=small_ae.decode)
    recon2, z2 = small_ae.apply(params, x)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-6)


def test_conv_ae_param_count_matches_reference():
    """GroupNorm and BatchNorm both carry 2*ch affine params, convs/linears are
    identical — total must match the torch reference exactly."""
    torch = pytest.importorskip("torch")
    ref = _load_ref("ref_ae_lin", f"{REF}/ae_64x8x8_lin.py")
    with torch.no_grad():
        ref_model = ref.PosAwareAE_TF()
    ref_n = sum(p.numel() for p in ref_model.parameters())

    model = PosAwareAE()
    shapes = jax.eval_shape(model.init, jax.random.key(0),
                            jnp.zeros((1, 1, 128, 128), jnp.float32))
    ours = _param_count(shapes)
    assert ours == ref_n, f"{ours} vs reference {ref_n}"


def test_conv_ae_tf_param_count_matches_reference():
    """The torch reference registers the template TransformerEncoderLayer as a
    submodule IN ADDITION to the 8 deep copies inside nn.TransformerEncoder
    (ae_64x8x8_tf.py:77-80), so its parameter count includes one unused
    duplicate layer. Our count must equal reference minus that dead layer."""
    torch = pytest.importorskip("torch")
    ref = _load_ref("ref_ae_tf", f"{REF}/ae_64x8x8_tf.py")
    with torch.no_grad():
        ref_model = ref.PosAwareAE_TF()
    ref_n = sum(p.numel() for p in ref_model.parameters())
    dead_layer_n = sum(p.numel() for p in ref_model.tf_encoder.parameters())

    model = PosAwareAETF()
    shapes = jax.eval_shape(model.init, jax.random.key(0),
                            jnp.zeros((1, 1, 128, 128), jnp.float32))
    ours = _param_count(shapes)
    assert ours == ref_n - dead_layer_n, f"{ours} vs reference {ref_n} - {dead_layer_n}"


# ---------------------------------------------------------------- ViT AE
def test_vit_ae_shapes(rng):
    model = ViTAE(img_size=32, patch=8, d_token=64, d_latent=128,
                  depth_enc=2, depth_dec=2, heads=4, dropout=0.0)
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    recon, latent = model.apply(params, x)
    assert recon.shape == (2, 1, 32, 32)
    assert latent.shape == (2, 128)


def test_vit_ae_param_count_close_to_reference():
    """The torch MHA and our fused-qkv layout have identical param totals; the
    cross-attn kv projection differs only in documented ways — require exact
    match here too."""
    torch = pytest.importorskip("torch")
    import io, contextlib
    # reference ae_vit.py instantiates + prints at import; swallow stdout
    with contextlib.redirect_stdout(io.StringIO()):
        ref = _load_ref("ref_ae_vit", f"{REF}/ae_vit.py")
    ref_n = sum(p.numel() for p in ref.AE_ViT_2048().parameters())

    model = ViTAE()
    shapes = jax.eval_shape(model.init, jax.random.key(0),
                            jnp.zeros((1, 1, 128, 128), jnp.float32))
    ours = _param_count(shapes)
    assert ours == ref_n, f"{ours} vs reference {ref_n}"


# ---------------------------------------------------------------- forecasters
def test_moving_avg_matches_manual(rng):
    x = rng.random((2, 10, 3)).astype(np.float32)
    out = np.asarray(moving_avg(jnp.asarray(x), 5))
    # manual replicate-pad + box filter
    pad = 2
    xp = np.concatenate([np.repeat(x[:, :1], pad, 1), x,
                         np.repeat(x[:, -1:], pad, 1)], axis=1)
    manual = np.stack([xp[:, i:i + 5].mean(1) for i in range(10)], axis=1)
    np.testing.assert_allclose(out, manual, atol=1e-5)


def test_series_decomp_sums(rng):
    x = jnp.asarray(rng.random((2, 8, 4)).astype(np.float32))
    res, trend = series_decomp(x, 3)
    np.testing.assert_allclose(np.asarray(res + trend), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("individual", [False, True])
def test_dlinear_shapes(individual, rng):
    model = DLinear(seq_len=13, pred_len=12, kernel_size=25,
                    individual=individual, channels=6)
    x = jnp.asarray(rng.random((2, 13, 6)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 12, 6)


def test_dlinear_init_matches_reference_constant():
    """Both seasonal and trend weights init to 1/seq_len (reference
    ae_s2/train.py:107-116) -> on a constant series the zero-shot prediction
    is the same constant (seasonal output 0 + trend passthrough)."""
    model = DLinear(seq_len=4, pred_len=3, kernel_size=3)
    x = jnp.ones((1, 4, 2)) * 5.0
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), 5.0, atol=1e-5)


def test_per_pixel_linear(rng):
    model = PerPixelLinear(t_in=13, t_out=12)
    x = jnp.asarray(rng.random((2, 13, 4, 8, 8)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 12, 4, 8, 8)
    # per-pixel: same features at two pixels -> same outputs
    x2 = np.asarray(x).copy()
    x2[:, :, :, 1, 1] = x2[:, :, :, 0, 0]
    y2 = model.apply(params, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y2)[:, :, :, 1, 1],
                               np.asarray(y2)[:, :, :, 0, 0], atol=1e-5)


def test_linear_and_mlp_forecasters(rng):
    lin = LinearForecaster(t_in=5, t_out=3)
    x = jnp.asarray(rng.random((2, 5, 7)).astype(np.float32))
    y = lin.apply(lin.init(jax.random.key(0), x), x)
    assert y.shape == (2, 3, 7)

    mlp = TimeMLP(t_in=5, t_out=8, hidden_dim=16)
    xt = jnp.asarray(rng.random((4, 5)).astype(np.float32))
    yt = mlp.apply(mlp.init(jax.random.key(0), xt), xt)
    assert yt.shape == (4, 8)
