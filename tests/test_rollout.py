"""Rollout engine tests: persistence baseline, direct + autoregressive
pipelines, residual anchoring semantics, uint8 on-device dequantization,
and the graft entry points (incl. the multichip dryrun on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.models.forecasters import DLinear
from weatherforecastingtoolkit_tpu.models.rollout import (calibrate_noise_std,
                                                          evaluate_vs_persistence,
                                                          make_ensemble_eval_fn,
                                                          make_ensemble_pipeline,
                                                          make_eval_fn,
                                                          make_forecast_pipeline,
                                                          make_streaming_forecaster,
                                                          persistence_baseline)


def test_persistence_baseline(rng):
    x = jnp.asarray(rng.random((2, 5, 1, 8, 8)).astype(np.float32))
    p = persistence_baseline(x, 3)
    assert p.shape == (2, 3, 1, 8, 8)
    np.testing.assert_array_equal(np.asarray(p[:, 0]), np.asarray(x[:, -1]))
    np.testing.assert_array_equal(np.asarray(p[:, 2]), np.asarray(x[:, -1]))


def _identity_codec(latent_hw=4):
    """encode = flatten frames to latents (identity), decode = reshape back."""
    def encode(frames):  # (N, 1, h, w) -> (N, h*w)
        return frames.reshape(frames.shape[0], -1)

    def decode(z):
        n = z.shape[0]
        hw = int(np.sqrt(z.shape[-1]))
        return z.reshape(n, 1, hw, hw)

    return encode, decode


@pytest.mark.parametrize("autoregressive", [False, True])
def test_pipeline_shapes(autoregressive, rng):
    t_in, t_out = 5, 4
    encode, decode = _identity_codec()
    fc = DLinear(seq_len=t_in, pred_len=t_out if not autoregressive else 1,
                 kernel_size=3)
    d = 16
    params = fc.init(jax.random.key(0), jnp.zeros((1, t_in, d)))
    pipeline = make_forecast_pipeline(
        encode_apply=encode, decode_apply=decode,
        forecaster_apply=lambda p, z: fc.apply(p, z),
        input_frames=t_in, pred_frames=t_out, autoregressive=autoregressive)
    x = jnp.asarray(rng.random((2, t_in, 1, 4, 4)).astype(np.float32))
    out = jax.jit(pipeline)(params, x)
    assert out.shape == (2, t_out, 1, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_residual_anchor_zero_init_is_persistence(rng):
    """DLinear's 1/seq_len init on anchored residuals: prediction of the
    anchored deltas ~ mean(delta); with anchor added back the pipeline's
    zero-shot output stays near the last frame — i.e. persistence-anchored."""
    t_in, t_out = 4, 3
    encode, decode = _identity_codec()
    fc = DLinear(seq_len=t_in, pred_len=t_out, kernel_size=3)
    d = 16
    params = fc.init(jax.random.key(0), jnp.zeros((1, t_in, d)))
    pipeline = make_forecast_pipeline(
        encode_apply=encode, decode_apply=decode,
        forecaster_apply=lambda p, z: fc.apply(p, z),
        input_frames=t_in, pred_frames=t_out)
    # constant input sequence -> all anchored deltas are 0 -> output == anchor
    x = jnp.ones((1, t_in, 1, 4, 4)) * 0.7
    out = jax.jit(pipeline)(params, x)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)


def test_uint8_dequantization(rng):
    t_in, t_out = 4, 2
    encode, decode = _identity_codec()
    fc = DLinear(seq_len=t_in, pred_len=t_out, kernel_size=3)
    params = fc.init(jax.random.key(0), jnp.zeros((1, t_in, 16)))
    pipeline = make_forecast_pipeline(
        encode_apply=encode, decode_apply=decode,
        forecaster_apply=lambda p, z: fc.apply(p, z),
        input_frames=t_in, pred_frames=t_out)
    xu8 = (rng.random((1, t_in, 1, 4, 4)) * 255).astype(np.uint8)
    out_u8 = jax.jit(pipeline)(params, jnp.asarray(xu8))
    out_f32 = jax.jit(pipeline)(params, jnp.asarray(xu8.astype(np.float32) / 255))
    np.testing.assert_allclose(np.asarray(out_u8), np.asarray(out_f32), atol=1e-6)


def test_eval_vs_persistence(rng):
    t_in, t_out = 4, 2
    encode, decode = _identity_codec()
    fc = DLinear(seq_len=t_in, pred_len=t_out, kernel_size=3)
    params = fc.init(jax.random.key(0), jnp.zeros((1, t_in, 256)))
    pipeline = make_forecast_pipeline(
        encode_apply=encode, decode_apply=decode,
        forecaster_apply=lambda p, z: fc.apply(p, z),
        input_frames=t_in, pred_frames=t_out)
    eval_fn = make_eval_fn(pipeline, t_in, t_out)
    batches = [jnp.asarray(rng.random((2, t_in + t_out, 1, 16, 16)).astype(np.float32))
               for _ in range(2)]
    model_m, persist_m = evaluate_vs_persistence(eval_fn, params, batches)
    assert "SSIM" in model_m and "SSIM" in persist_m
    assert np.isfinite(model_m["CRPS"]) and np.isfinite(persist_m["CRPS"])


# ------------------------------------------------------------------ ensembles
def _tiny_setup(rng, t_in=4, t_out=3, hw=4):
    encode, decode = _identity_codec()
    fc = DLinear(seq_len=t_in, pred_len=t_out, kernel_size=3)
    params = fc.init(jax.random.key(0), jnp.zeros((1, t_in, hw * hw)))
    kw = dict(encode_apply=encode, decode_apply=decode,
              forecaster_apply=lambda p, z: fc.apply(p, z),
              input_frames=t_in, pred_frames=t_out)
    x = jnp.asarray(rng.random((2, t_in, 1, hw, hw)).astype(np.float32))
    return kw, params, x


@pytest.mark.parametrize("autoregressive", [False, True])
def test_ensemble_zero_noise_matches_deterministic(autoregressive, rng):
    """noise_std=0 with a deterministic encoder: every member must equal the
    plain pipeline's output exactly."""
    kw, params, x = _tiny_setup(rng)
    if autoregressive:
        fc1 = DLinear(seq_len=4, pred_len=1, kernel_size=3)
        p1 = fc1.init(jax.random.key(0), jnp.zeros((1, 4, 16)))
        kw = dict(kw, forecaster_apply=lambda p, z: fc1.apply(p, z),
                  autoregressive=True)
        params = p1
    pipeline = make_forecast_pipeline(**kw)
    ens = make_ensemble_pipeline(n_members=3, **kw)
    det = jax.jit(pipeline)(params, x)
    out = jax.jit(ens)(params, x, jax.random.key(1), 0.0)
    assert out.shape == (2, 3) + det.shape[1:]
    for m in range(3):
        np.testing.assert_allclose(np.asarray(out[:, m]), np.asarray(det),
                                   atol=1e-6)


def test_ensemble_spread_and_key_determinism(rng):
    kw, params, x = _tiny_setup(rng)
    ens = jax.jit(make_ensemble_pipeline(n_members=4, **kw))
    a = np.asarray(ens(params, x, jax.random.key(7), 0.1))
    b = np.asarray(ens(params, x, jax.random.key(7), 0.1))
    c = np.asarray(ens(params, x, jax.random.key(8), 0.1))
    np.testing.assert_array_equal(a, b)          # same key -> same draws
    assert np.abs(a - c).max() > 1e-4            # different key -> different
    assert np.abs(a[:, 0] - a[:, 1]).max() > 1e-4  # members differ


def test_ensemble_posterior_sampling_path(rng):
    """encode_sample_apply members differ even at noise_std=0, and the mean
    over many members approaches the deterministic (mode) rollout."""
    kw, params, x = _tiny_setup(rng)

    def encode_sample(key, frames):  # mode + unit-variance posterior noise
        z = frames.reshape(frames.shape[0], -1)
        return z + 0.05 * jax.random.normal(key, z.shape, z.dtype)

    ens = make_ensemble_pipeline(n_members=16, encode_sample_apply=encode_sample,
                                 **kw)
    out = np.asarray(jax.jit(ens)(params, x, jax.random.key(3), 0.0))
    assert np.abs(out[:, 0] - out[:, 1]).max() > 1e-4
    det = np.asarray(jax.jit(make_forecast_pipeline(**kw))(params, x))
    # linear pipeline on gaussian perturbations -> mean ~ deterministic
    np.testing.assert_allclose(out.mean(axis=1), det, atol=0.05)


def test_calibrated_spread_improves_crps(rng):
    """An imperfect forecast with a calibrated latent-noise ensemble must
    score LOWER (better) CRPS than its own deterministic run — the textbook
    property that makes the ensemble worth shipping."""
    t_in, t_out, hw = 4, 3, 8
    kw, params, _ = _tiny_setup(rng, t_in=t_in, t_out=t_out, hw=hw)
    ens = make_ensemble_pipeline(n_members=8, **kw)
    eval_fn = make_ensemble_eval_fn(ens, t_in, t_out)
    batches = [jnp.asarray(rng.random((2, t_in + t_out, 1, hw, hw))
                           .astype(np.float32)) for _ in range(2)]
    best, table = calibrate_noise_std(
        eval_fn, params, batches, stds=(0.0, 0.05, 0.1, 0.2, 0.4),
        key=jax.random.key(0))
    assert best > 0.0
    assert table[best] < table[0.0]


def test_ensemble_feeds_calc_metrics(rng):
    from weatherforecastingtoolkit_tpu.metrics import calc_metrics
    kw, params, x = _tiny_setup(rng)
    ens = jax.jit(make_ensemble_pipeline(n_members=4, **kw))
    pred = ens(params, x, jax.random.key(0), 0.1)      # (B,N,T,C,H,W)
    target = jnp.asarray(rng.random((2, 3, 1, 4, 4)).astype(np.float32))
    m = calc_metrics(pred, target)
    assert np.isfinite(m["CRPS"]) and np.isfinite(m["paper_CSI_M_POOL1"])


# ------------------------------------------------------------------ streaming
@pytest.mark.parametrize("use_uint8", [False, True])
def test_streaming_matches_batch_pipeline(use_uint8, rng):
    """Feeding frames one at a time through the sliding-latent-window step
    must reproduce the batch pipeline run on each full window exactly."""
    t_in, t_out, hw = 4, 3, 4
    encode, decode = _identity_codec()
    fc = DLinear(seq_len=t_in, pred_len=t_out, kernel_size=3)
    params = fc.init(jax.random.key(0), jnp.zeros((1, t_in, hw * hw)))
    kw = dict(encode_apply=encode, decode_apply=decode,
              forecaster_apply=lambda p, z: fc.apply(p, z),
              input_frames=t_in, pred_frames=t_out)
    pipeline = jax.jit(make_forecast_pipeline(**kw))
    init, step = make_streaming_forecaster(latent_shape=(hw * hw,), **kw)
    init, step = jax.jit(init), jax.jit(step)

    n_ticks = 5
    raw = rng.random((2, t_in + n_ticks, 1, hw, hw))
    seq = ((raw * 255).astype(np.uint8) if use_uint8
           else raw.astype(np.float32))
    seq = jnp.asarray(seq)

    state = init(seq[:, :t_in])
    for i in range(n_ticks):
        frame = seq[:, t_in + i]
        state, fcast = step(params, state, frame)
        window = seq[:, i + 1:t_in + i + 1]
        expect = pipeline(params, window)
        np.testing.assert_allclose(np.asarray(fcast), np.asarray(expect),
                                   atol=1e-6)


# ---------------------------------------------------------------- graft entry
def test_graft_entry_compiles():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    # compile-check via eval_shape (full compile is the driver's job; on the
    # CPU test platform a full VAE compile is minutes)
    out = jax.eval_shape(fn, *args)
    import bench
    assert out.shape == (bench.BATCH, bench.T_OUT, 1, bench.HW, bench.HW)


def test_dryrun_multichip_8():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry2", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
