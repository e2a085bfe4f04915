"""Advection-diffusion stencil tests: XLA reference semantics, Pallas kernel
parity (interpret mode on CPU), and custom-VJP gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.ops.pallas.stencil import (
    advection_diffusion_loss, advection_diffusion_prior,
    advection_diffusion_residual_xla)


def _manual_residual(x, u, v, kappa):
    """Independent numpy implementation."""
    n, t, h, w = x.shape
    rs = []
    for i in range(n):
        for k in range(t - 1):
            x0, x1 = x[i, k], x[i, k + 1]
            dt = (x1 - x0)[1:-1, 1:-1]
            dh = (x0[2:, 1:-1] - x0[:-2, 1:-1]) / 2
            dw = (x0[1:-1, 2:] - x0[1:-1, :-2]) / 2
            lap = (x0[2:, 1:-1] + x0[:-2, 1:-1] + x0[1:-1, 2:] + x0[1:-1, :-2]
                   - 4 * x0[1:-1, 1:-1])
            rs.append(dt + u * dw + v * dh - kappa * lap)
    r = np.stack(rs)
    return float((r ** 2).mean())


def test_xla_residual_matches_numpy(rng):
    x = rng.random((2, 4, 10, 12)).astype(np.float32)
    got = float(advection_diffusion_residual_xla(jnp.asarray(x), 0.3, -0.2, 0.1))
    want = _manual_residual(x, 0.3, -0.2, 0.1)
    assert got == pytest.approx(want, rel=1e-5)


def test_constant_advection_zero_residual():
    """A linear ramp advecting left 1 px/frame with kappa=0 satisfies the
    advection equation with u=-1 exactly (central differences are exact on a
    linear field): dt + u*dw = (+1) + (-1)(1) = 0."""
    h, w, t = 16, 16, 4
    base = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    x = np.stack([np.roll(base, -k, axis=1) for k in range(t)])
    r = float(advection_diffusion_residual_xla(
        jnp.asarray(x[None, :, :, : w - t]), -1.0, 0.0, 0.0))
    assert r == pytest.approx(0.0, abs=1e-8)


def test_pallas_matches_xla_interpret(rng):
    x = rng.random((2, 3, 1, 16, 16)).astype(np.float32)
    xj = jnp.asarray(x)
    want = float(advection_diffusion_loss(xj, 0.5, 0.1, 0.05, use_pallas=False))
    got = float(advection_diffusion_loss(xj, 0.5, 0.1, 0.05, use_pallas=True,
                                         interpret=True))
    assert got == pytest.approx(want, rel=1e-5)


def test_prior_gradients(rng):
    x = jnp.asarray(rng.random((1, 3, 1, 12, 12)).astype(np.float32))

    def f(x_, u_, v_, k_):
        return advection_diffusion_prior(x_, u_, v_, k_, True)

    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
        x, jnp.asarray(0.2), jnp.asarray(0.1), jnp.asarray(0.05))
    assert np.isfinite(float(val))
    gx, gu, gv, gk = grads
    assert gx.shape == x.shape
    assert np.isfinite(np.asarray(gx)).all()
    assert float(jnp.abs(gu)) > 0 and float(jnp.abs(gk)) > 0
    # numerical check on kappa gradient
    eps = 1e-3
    f0 = float(f(x, jnp.asarray(0.2), jnp.asarray(0.1), jnp.asarray(0.05 - eps)))
    f1 = float(f(x, jnp.asarray(0.2), jnp.asarray(0.1), jnp.asarray(0.05 + eps)))
    assert float(gk) == pytest.approx((f1 - f0) / (2 * eps), rel=2e-2)


# ------------------------------------------------------------ fused GroupNorm
def test_fused_groupnorm_matches_flax(rng):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from weatherforecastingtoolkit_tpu.ops.pallas.groupnorm import (
        fused_group_norm_silu)

    x = jnp.asarray(rng.random((2, 8, 8, 16)).astype(np.float32))
    s = jnp.asarray(rng.random(16).astype(np.float32))
    b = jnp.asarray(rng.random(16).astype(np.float32))
    got = fused_group_norm_silu(x, s, b, groups=4, eps=1e-6, silu=False,
                                interpret=True)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-6)
    want = gn.apply({"params": {"scale": s, "bias": b}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # silu fusion
    got2 = fused_group_norm_silu(x, s, b, 4, 1e-6, True, True)
    np.testing.assert_allclose(np.asarray(got2),
                               np.asarray(want * jax.nn.sigmoid(want)),
                               atol=1e-5)


def test_groupnorm_bf16_path_tracks_fp32(rng):
    """bf16 activations run the same fp32 GN chain (cast only at the end);
    the result must track the pure-fp32 result to bf16 resolution."""
    import jax.numpy as jnp
    from weatherforecastingtoolkit_tpu.ops.pallas.groupnorm import (
        _gn_silu_reference)

    x = rng.standard_normal((2, 16, 16, 32)).astype(np.float32) * 3.0 + 1.0
    s = rng.random(32).astype(np.float32) + 0.5
    b = rng.random(32).astype(np.float32)
    want = _gn_silu_reference(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b),
                              groups=8, eps=1e-6, silu=True)
    got = _gn_silu_reference(jnp.asarray(x, jnp.bfloat16), jnp.asarray(s),
                             jnp.asarray(b), groups=8, eps=1e-6, silu=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.05, rtol=0.05)


def test_fused_groupnorm_gradients(rng):
    import jax
    import jax.numpy as jnp
    from weatherforecastingtoolkit_tpu.ops.pallas.groupnorm import (
        fused_group_norm_silu)

    x = jnp.asarray(rng.random((1, 4, 4, 8)).astype(np.float32))
    s = jnp.ones((8,)); b = jnp.zeros((8,))

    def f(x_, s_, b_):
        return jnp.sum(fused_group_norm_silu(x_, s_, b_, 2, 1e-6, True, True) ** 2)

    gx, gs, gb = jax.grad(f, argnums=(0, 1, 2))(x, s, b)
    assert np.isfinite(np.asarray(gx)).all()
    # finite-difference check on scale[0]
    eps = 1e-3
    e = jnp.zeros((8,)).at[0].set(eps)
    fd = (float(f(x, s + e, b)) - float(f(x, s - e, b))) / (2 * eps)
    assert float(gs[0]) == pytest.approx(fd, rel=2e-2)
