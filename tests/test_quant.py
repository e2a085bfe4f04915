"""int8 quantized serving path (ops/quant.py): native parity + int8 accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from weatherforecastingtoolkit_tpu.ops.quant import QConv, int8_conv


def test_qconv_native_matches_nn_conv(rng):
    """mode='native' must be numerically identical to flax nn.Conv with the
    same parameters (drop-in guarantee for existing checkpoints)."""
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 7)).astype(np.float32))
    ref = nn.Conv(5, (3, 3), strides=2, padding=1)
    rv = ref.init(jax.random.key(3), x)
    q = QConv(5, (3, 3), strides=2, padding=1, mode="native")
    got = q.apply(rv, x)          # same param tree consumed directly
    want = ref.apply(rv, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_qconv_init_identical_to_nn_conv(rng):
    x = jnp.zeros((1, 8, 8, 4))
    a = nn.Conv(6, (3, 3), padding=1).init(jax.random.key(0), x)
    b = QConv(6, (3, 3), padding=1).init(jax.random.key(0), x)
    ja, jb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(ja) == len(jb)
    for u, v in zip(ja, jb):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_int8_conv_accuracy(rng):
    """Dynamic W8A8 on well-conditioned inputs: relative error ~1%."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 32, 32)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.01)
    got = int8_conv(x, k, b, (1, 1), "SAME")
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=dn) + b
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 0.03, err


def test_int8_conv_zero_input_safe():
    x = jnp.zeros((1, 4, 4, 8))
    k = jnp.zeros((3, 3, 8, 8))
    out = int8_conv(x, k, None, (1, 1), "SAME")
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_int8_static_calibrated_accuracy(rng):
    """Static per-input-channel activation scales (calibration folded into
    the weights) must at least match dynamic per-tensor accuracy on
    channel-heteroscedastic inputs — the failure mode that sank dynamic int8
    at SSIM 0.76 (RESULTS.md round 2)."""
    from weatherforecastingtoolkit_tpu.ops.quant import int8_conv_static

    # channels with wildly different magnitudes: per-tensor scales waste
    # resolution on the small channels; per-channel scales don't
    chan_scale = np.logspace(-2, 1, 16).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 16)).astype(np.float32)
                    * chan_scale)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 16)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.01)
    absmax = jnp.max(jnp.abs(x), axis=(0, 1, 2))

    got = int8_conv_static(x, k, b, (1, 1), "SAME", absmax)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=dn) + b
    err_static = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    dyn = int8_conv(x, k, b, (1, 1), "SAME")
    err_dyn = float(jnp.linalg.norm(dyn - want) / jnp.linalg.norm(want))
    assert err_static < 0.03, err_static
    assert err_static < err_dyn, (err_static, err_dyn)


def test_vae_calibrate_then_int8_static(rng):
    """calibrate() on the conv_mode='calibrate' VAE yields a qscales
    collection that the int8_static VAE consumes; output tracks native with
    the SAME param tree, and out-of-calibration inputs still clip safely."""
    from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (
        AutoencoderKL)
    from weatherforecastingtoolkit_tpu.ops.quant import calibrate

    kw = dict(in_channels=1, out_channels=1, block_out_channels=(16, 32),
              layers_per_block=1, latent_channels=4, norm_num_groups=8)
    native = AutoencoderKL(**kw)
    calib = AutoencoderKL(conv_mode="calibrate", **kw)
    static = AutoencoderKL(conv_mode="int8_static", **kw)

    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    nv = native.init(jax.random.key(0), x)

    batches = [jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
               for _ in range(3)]
    qscales = calibrate(
        lambda v, b: calib.apply(v, b, mutable=["qstats"]), nv, batches)

    out_native = native.apply(nv, x)
    out_static = static.apply({**nv, "qscales": qscales}, x)
    err = float(jnp.linalg.norm(out_static - out_native)
                / (jnp.linalg.norm(out_native) + 1e-8))
    assert err < 0.15, err
    # 2x-out-of-range input must clip, not blow up
    out_oor = static.apply({**nv, "qscales": qscales}, 2.0 * x)
    assert np.isfinite(np.asarray(out_oor)).all()


def test_autoencoder_int8_same_params_and_close_output(rng):
    """conv_mode='int8' consumes the native param tree unchanged and its
    decode tracks the native output."""
    from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (
        AutoencoderKL)

    kw = dict(in_channels=1, out_channels=1, block_out_channels=(16, 32),
              layers_per_block=1, latent_channels=4, norm_num_groups=8)
    native = AutoencoderKL(**kw)
    quant = AutoencoderKL(conv_mode="int8", **kw)
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    nv = native.init(jax.random.key(0), x)
    qv = quant.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(nv)
            == jax.tree_util.tree_structure(qv))

    z = native.apply(nv, x, method=native.encode).mode()
    dn = native.apply(nv, z, method=native.decode)
    dq = quant.apply(nv, z, method=quant.decode)  # NATIVE params, int8 math
    err = float(jnp.linalg.norm(dq - dn) / (jnp.linalg.norm(dn) + 1e-8))
    assert err < 0.15, err


def test_fake_quant_matches_int8_static_forward(rng):
    """QAT forward (fake_quant_conv) must reproduce the deployed
    int8_static numerics — same scales, rounds, and clips — so what the
    fine-tune optimizes is what serving runs. Only the accumulation dtype
    differs (fp32 vs int32), exact here because the integer products are
    small."""
    from weatherforecastingtoolkit_tpu.ops.quant import (fake_quant_conv,
                                                         int8_conv_static)

    x = jnp.asarray(rng.standard_normal((2, 10, 10, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32) * 0.01)
    absmax = jnp.max(jnp.abs(x), axis=(0, 1, 2))
    got = fake_quant_conv(x, k, b, (1, 1), "SAME", absmax)
    want = int8_conv_static(x, k, b, (1, 1), "SAME", absmax)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_fake_quant_ste_gradients(rng):
    """STE gradients: finite, non-zero, and close to the native conv's
    gradient direction (rounds are identity in the backward; the scale
    plumbing cancels by the folding identity)."""
    from weatherforecastingtoolkit_tpu.ops.quant import fake_quant_conv

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32) * 0.1)
    absmax = jnp.max(jnp.abs(x), axis=(0, 1, 2))
    tgt = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))

    def loss_fq(kk):
        return jnp.mean((fake_quant_conv(x, kk, None, (1, 1), "SAME", absmax)
                         - tgt) ** 2)

    def loss_native(kk):
        dn = jax.lax.conv_dimension_numbers(x.shape, kk.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, kk, (1, 1), "SAME",
                                         dimension_numbers=dn)
        return jnp.mean((y - tgt) ** 2)

    g_fq = jax.grad(loss_fq)(k)
    g_na = jax.grad(loss_native)(k)
    assert np.isfinite(np.asarray(g_fq)).all()
    assert float(jnp.linalg.norm(g_fq)) > 0
    cos = float(jnp.vdot(g_fq, g_na)
                / (jnp.linalg.norm(g_fq) * jnp.linalg.norm(g_na)))
    assert cos > 0.95, cos


def test_qat_reduces_int8_error(rng):
    """The point of QAT: fine-tuning the small VAE under fake_quant against
    the native model's own outputs (self-distillation) must shrink the
    deployed int8_static-vs-native error."""
    import optax

    from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (
        AutoencoderKL)
    from weatherforecastingtoolkit_tpu.ops.quant import calibrate

    kw = dict(in_channels=1, out_channels=1, block_out_channels=(16, 32),
              layers_per_block=1, latent_channels=4, norm_num_groups=8)
    native = AutoencoderKL(**kw)
    calib = AutoencoderKL(conv_mode="calibrate", **kw)
    fq = AutoencoderKL(conv_mode="fake_quant", **kw)
    static = AutoencoderKL(conv_mode="int8_static", **kw)

    x = jnp.asarray(rng.random((4, 1, 32, 32)).astype(np.float32))
    nv = native.init(jax.random.key(0), x)
    qscales = calibrate(
        lambda v, b: calib.apply(v, b, mutable=["qstats"]), nv, [x])

    target = native.apply(nv, x)

    def err_static(params):
        out = static.apply({"params": params, "qscales": qscales}, x)
        return float(jnp.linalg.norm(out - target)
                     / (jnp.linalg.norm(target) + 1e-8))

    before = err_static(nv["params"])

    tx = optax.adam(1e-4)
    params = nv["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            out = fq.apply({"params": p, "qscales": qscales}, x)
            return jnp.mean((out - target) ** 2)
        g = jax.grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for _ in range(30):
        params, opt_state = step(params, opt_state)

    after = err_static(params)
    assert after < before, (before, after)


def test_mixed_conv_mode_spec(rng):
    """A tuple conv_mode is a per-layer spec: (fnmatch pattern, mode) pairs
    resolved against each conv's module path, first match wins, unmatched
    convs run native. The mixed-serving lever: keep quantization-SENSITIVE
    conv families in float while the rest run int8_static
    (experiments/perf/int8_mixed.py sweeps the assignment)."""
    from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (
        AutoencoderKL)
    from weatherforecastingtoolkit_tpu.ops.quant import (mixed_mode_uses,
                                                         resolve_conv_mode)

    spec = (("decoder/conv_out", "native"), ("encoder/conv_in", "native"),
            ("*", "int8_static"))
    assert resolve_conv_mode(spec, ("decoder", "conv_out")) == "native"
    assert resolve_conv_mode(spec, ("decoder", "conv_in")) == "int8_static"
    assert resolve_conv_mode((), ("anything",)) == "native"  # no match
    assert resolve_conv_mode("int8", ("x",)) == "int8"       # global string
    assert mixed_mode_uses(spec, "int8_static") and not mixed_mode_uses(
        spec, "fake_quant")

    kw = dict(in_channels=1, out_channels=1, block_out_channels=(8, 16),
              layers_per_block=1, latent_channels=4, norm_num_groups=4)
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))

    native = AutoencoderKL(**kw)
    nv = native.init(jax.random.key(0), x)
    mixed = AutoencoderKL(**kw, conv_mode=spec)
    mv = mixed.init(jax.random.key(0), x)

    # identical param tree (checkpoints serve mixed as-is); qscales exist
    # ONLY for the convs the spec quantizes
    assert jax.tree_util.tree_structure(nv["params"]) == \
        jax.tree_util.tree_structure(mv["params"])
    qpaths = {"/".join(str(getattr(k, "key", k)) for k in path)
              for path, _ in
              jax.tree_util.tree_flatten_with_path(mv["qscales"])[0]}
    assert "decoder/conv_out/act_absmax" not in qpaths
    assert "encoder/conv_in/act_absmax" not in qpaths
    assert "decoder/conv_in/act_absmax" in qpaths

    # full-int8 vs mixed with the same calibration: mixed (float conv_out)
    # must land CLOSER to the native output, and differ from full-int8
    calib = AutoencoderKL(**kw, conv_mode="calibrate")
    from weatherforecastingtoolkit_tpu.ops.quant import calibrate as _cal
    qscales = _cal(lambda v, b: calib.apply(v, b, mutable=["qstats"]), nv, [x])
    ref = np.asarray(native.apply(nv, x)[0])
    full = AutoencoderKL(**kw, conv_mode="int8_static")
    out_full = np.asarray(full.apply({**nv, "qscales": qscales}, x)[0])
    out_mix = np.asarray(mixed.apply({**nv, "qscales": qscales}, x)[0])
    err_full = np.linalg.norm(out_full - ref) / np.linalg.norm(ref)
    err_mix = np.linalg.norm(out_mix - ref) / np.linalg.norm(ref)
    assert err_mix < err_full, (err_mix, err_full)
