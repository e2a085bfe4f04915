"""AlphaPre tests: component shapes, loss structure, amp-weight decay,
spec-mask geometry, and finite gradients through the FFT paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.models.alphapre import (AlphaMixer, AlphaPre,
                                                           AmpliNet, AmpTimeCell,
                                                           PhaseNet, get_model,
                                                           make_spec_mask)
from weatherforecastingtoolkit_tpu.utils.config import Config

B, T_IN, T_OUT, C, H, W = 2, 5, 4, 1, 16, 16


def test_spec_mask():
    m = np.asarray(make_spec_mask(16, 16, 3))
    assert m.shape == (16, 9)
    assert m[:3, :3].all() and m[-3:, :3].all()
    assert m[5:11].sum() == 0  # mid frequencies masked out


def test_amp_time_cell_shapes(rng):
    cell = AmpTimeCell(T_IN, T_OUT)
    x = jnp.asarray(rng.random((B, T_IN, 8, H, W)).astype(np.float32))
    y = cell.apply(cell.init(jax.random.key(0), x), x)
    assert y.shape == (B, T_OUT, 8, H, W)
    assert np.isfinite(np.asarray(y)).all()


def test_amplinet_shapes(rng):
    net = AmpliNet(T_IN, T_OUT, dim=C, hidden_dim=8, n_layers=2)
    x = jnp.asarray(rng.random((B, T_IN, C, H, W)).astype(np.float32))
    y = net.apply(net.init(jax.random.key(0), x), x)
    assert y.shape == (B, T_OUT, C, H, W)


def test_phasenet_shapes(rng):
    net = PhaseNet((H, W), T_IN, T_OUT, C, hidden_dim=8)
    x = jnp.asarray(rng.random((B, T_IN, C, H, W)).astype(np.float32))
    xt, pha_t, amps = net.apply(net.init(jax.random.key(0), x), x)
    assert xt.shape == (B, T_OUT, C, H, W)
    assert pha_t.shape == (B, T_OUT, C, H, W // 2 + 1)
    assert amps.shape == (B, T_IN, C, H, W // 2 + 1)


def test_alphapre_predict_and_loss(rng):
    model = AlphaPre(pre_seq_length=T_IN, aft_seq_length=T_OUT,
                     input_shape=(H, W), input_dim=C, hidden_dim=8,
                     n_layers=2, spec_num=3, aweight_stop_steps=100)
    x = jnp.asarray(rng.random((B, T_IN, C, H, W)).astype(np.float32))
    y = jnp.asarray(rng.random((B, T_OUT, C, H, W)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)

    pred, loss = model.apply(variables, x, y, compute_loss=True,
                             step=jnp.asarray(0), method=model.predict)
    assert pred.shape == (B, T_OUT, C, H, W)
    assert set(loss) == {"total_loss", "phase_loss", "ampli_loss", "anet_loss"}
    assert all(np.isfinite(float(v)) for v in loss.values())

    # amp weight decays to zero at/after stop step
    _, loss_end = model.apply(variables, x, y, compute_loss=True,
                              step=jnp.asarray(100), method=model.predict)
    assert float(loss_end["ampli_loss"]) == 0.0
    assert float(loss["ampli_loss"]) > 0.0

    pred_only, none_loss = model.apply(variables, x, method=model.predict)
    assert none_loss is None and pred_only.shape == pred.shape


def test_alphapre_gradients_finite(rng):
    model = AlphaPre(pre_seq_length=T_IN, aft_seq_length=T_OUT,
                     input_shape=(H, W), input_dim=C, hidden_dim=8,
                     n_layers=1, spec_num=3)
    x = jnp.asarray(rng.random((B, T_IN, C, H, W)).astype(np.float32))
    y = jnp.asarray(rng.random((B, T_OUT, C, H, W)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)

    def loss_fn(params):
        _, loss = model.apply({"params": params}, x, y, compute_loss=True,
                              step=jnp.asarray(0), method=model.predict)
        return loss["total_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # FFT paths must carry gradient (AmpTimeCell w1 nonzero grad)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_get_model_factory():
    cfg = Config({"T_in": T_IN, "T_out": T_OUT, "input_shape": [H, W],
                  "img_channels": C, "dim": 8, "n_layers": 2})
    model = get_model(cfg)
    assert model.pre_seq_length == T_IN and model.spec_num == 20
