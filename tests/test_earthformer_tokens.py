"""Tests: Earthformer cuboid backbone + ViT token-sequence latent path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.models.earthformer import (CuboidBlock,
                                                              Earthformer,
                                                              _window_merge,
                                                              _window_partition)
from weatherforecastingtoolkit_tpu.models.token_forecaster import (
    TokenSequenceForecaster)
from weatherforecastingtoolkit_tpu.models.vit_ae import ViTAE


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 3, 8, 8, 5)).astype(np.float32))
    tokens = _window_partition(x, 4, 4)
    assert tokens.shape == (2 * 2 * 2, 3 * 4 * 4, 5)
    back = _window_merge(tokens, 2, 3, 8, 8, 4, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("shifted", [False, True])
def test_cuboid_block(shifted, rng):
    blk = CuboidBlock(dim=16, num_heads=4, window=(4, 4), shifted=shifted)
    x = jnp.asarray(rng.random((1, 3, 8, 8, 16)).astype(np.float32))
    y = blk.apply(blk.init(jax.random.key(0), x), x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_earthformer_forward(rng):
    model = Earthformer(t_in=5, t_out=4, patch=8, dim=32, depth=2,
                        num_heads=4, window=(2, 2))
    x = jnp.asarray(rng.random((2, 5, 1, 32, 32)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 4, 1, 32, 32)
    assert 0.0 <= float(y.min()) and float(y.max()) <= 1.0


def test_earthformer_residual_out_starts_at_persistence(rng):
    """residual_out zero-inits the head, so the untrained model IS the
    persistence baseline — it only ever learns corrections."""
    model = Earthformer(t_in=5, t_out=4, patch=8, dim=32, depth=2,
                        num_heads=4, window=(2, 2), residual_out=True)
    x = jnp.asarray(rng.random((2, 5, 1, 32, 32)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    persist = jnp.repeat(x[:, -1:], 4, axis=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(persist), atol=1e-6)


def test_earthformer_hierarchical_global(rng):
    """hierarchy=2 + global_tokens: forward shapes, zero-init persistence
    start preserved, and gradients reach the global vectors."""
    m = Earthformer(t_in=4, t_out=3, in_channels=1, patch=8, dim=32, depth=2,
                    num_heads=2, window=(2, 2), residual_out=True,
                    hierarchy=2, global_tokens=4)
    x = jnp.asarray(rng.random((2, 4, 1, 32, 32)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 3, 1, 32, 32)
    # zero-init unpatch head: untrained model IS persistence
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(jnp.repeat(x[:, -1:], 3, axis=1)),
                               atol=1e-6)
    # the global-vector parameters exist and receive gradient
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(getattr(p, "key", p)) for p in path)
             for path, _ in flat]
    assert any("global_init" in n for n in names)
    assert any("g_attn" in n for n in names)
    assert any("coarse_0" in n for n in names) and any("down" in n
                                                       for n in names)
    # grads reach the globals through a NON-zero head (residual_out's
    # zero-init head deliberately blocks upstream grads at init)
    m2 = Earthformer(t_in=4, t_out=3, in_channels=1, patch=8, dim=32, depth=2,
                     num_heads=2, window=(2, 2), residual_out=False,
                     hierarchy=2, global_tokens=4)
    p2 = m2.init(jax.random.key(0), x)
    tgt = jnp.asarray(rng.random((2, 3, 1, 32, 32)).astype(np.float32))
    g = jax.grad(lambda p: jnp.mean((m2.apply(p, x) - tgt) ** 2))(p2)
    g_flat = jax.tree_util.tree_flatten_with_path(g)[0]
    g_global = [leaf for path, leaf in g_flat
                if any("global_init" in str(getattr(p, "key", p))
                       for p in path)]
    assert g_global and float(jnp.sum(jnp.abs(g_global[0]))) > 0


def test_earthformer_gradients(rng):
    model = Earthformer(t_in=3, t_out=2, patch=8, dim=16, depth=2,
                        num_heads=2, window=(2, 2))
    x = jnp.asarray(rng.random((1, 3, 1, 16, 16)).astype(np.float32))
    tgt = jnp.asarray(rng.random((1, 2, 1, 16, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), x)

    def loss(p):
        return jnp.mean((model.apply(p, x) - tgt) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


# ------------------------------------------------------- token-sequence path
def test_vit_token_latent_roundtrip(rng):
    model = ViTAE(img_size=32, patch=8, d_token=32, d_latent=64,
                  depth_enc=1, depth_dec=1, heads=4, dropout=0.0)
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    tokens = model.apply(params, x, method=model.encode_tokens)
    assert tokens.shape == (2, 16, 32)  # (B, n_patches, d_token)
    recon = model.apply(params, tokens, method=model.decode_tokens)
    assert recon.shape == (2, 1, 32, 32)


def test_token_sequence_forecaster(rng):
    fc = TokenSequenceForecaster(t_in=5, t_out=3, d_token=16, num_heads=4,
                                 depth=1)
    x = jnp.asarray(rng.random((2, 5, 8, 16)).astype(np.float32))
    params = fc.init(jax.random.key(0), x)
    y = fc.apply(params, x)
    assert y.shape == (2, 3, 8, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_latent_token_forecaster_flat_interface(rng):
    """LatentTokenForecaster is DLinear-shape-compatible ((B,T,D) in/out) and
    zero-init: untrained output is exactly zero deltas (persistence when the
    caller anchors)."""
    from weatherforecastingtoolkit_tpu.models.token_forecaster import (
        LatentTokenForecaster)

    fc = LatentTokenForecaster(t_in=5, t_out=3, latent_shape=(4, 4, 4),
                               d_model=16, num_heads=4, depth=1)
    z = jnp.asarray(rng.standard_normal((2, 5, 64)).astype(np.float32))
    params = fc.init(jax.random.key(0), z)
    y = fc.apply(params, z)
    assert y.shape == (2, 3, 64)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)
    # gradients flow to the embed layer through the zero-init head
    import jax as _jax
    g = _jax.grad(lambda p: float(0) + jnp.sum(fc.apply(p, z) ** 2))(params)
    # with a zero head the loss gradient w.r.t. earlier layers is zero but
    # the head's own gradient is not (unless the tokens are zero)
    head = g["params"]["unembed"]["kernel"]
    assert float(jnp.sum(jnp.abs(head))) == 0.0  # y==0 -> d(y^2)=0 everywhere
    y2 = fc.apply(params, z + 1.0)
    assert np.allclose(np.asarray(y2), 0.0, atol=1e-6)


def test_token_forecaster_persistence_anchor(rng):
    """With zero-init output projections the readout adds ~nothing and the
    forecast falls back to the last frame's tokens (persistence-like prior)."""
    fc = TokenSequenceForecaster(t_in=4, t_out=2, d_token=8, num_heads=2,
                                 depth=1)
    x = jnp.asarray(rng.random((1, 4, 4, 8)).astype(np.float32))
    params = fc.init(jax.random.key(0), x)
    y = fc.apply(params, x)
    # anchor term present: prediction correlates with last input tokens
    corr = np.corrcoef(np.asarray(y[0, 0]).ravel(),
                       np.asarray(x[0, -1]).ravel())[0, 1]
    assert corr > 0.1
