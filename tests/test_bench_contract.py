"""bench.py contract: one JSON line with the driver-tracked keys, at toy size.

Runs the whole bench (rollout fp32+bf16 + SSIM gate + cost analysis + GAN
train step) on the CPU backend with tiny shapes by monkeypatching the module
constants — the real numbers come from the TPU run, but the program structure
and the JSON-line schema are pinned here.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json, sys
sys.path.insert(0, {repo!r})
import bench
bench.BATCH, bench.T_IN, bench.T_OUT = 2, 4, 3
bench.FAST_BATCH = 2
bench.HW, bench.LATENT_C, bench.LATENT_HW = 32, 4, 8
bench.VAE_CHANNELS = (8, 16)
bench.NORM_GROUPS = 4
bench.BASELINE_CACHE = {cache!r}

# shrink the training bench too
import numpy as np, jax, jax.numpy as jnp, optax
from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
from weatherforecastingtoolkit_tpu.models.losses.gan import NLayerDiscriminator
from weatherforecastingtoolkit_tpu.training.gan import make_vae_gan_task
from weatherforecastingtoolkit_tpu.training.trainer import TrainState

def small_train():
    B, T, HW = 1, 2, 32
    model = PosAwareAE(latent_dim=32, enc_channels=(8, 16), num_blocks=1,
                       dec_channels=(16, 8, 8))
    disc = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=1)
    disc_tx = optax.adam(1e-4)
    task = make_vae_gan_task(
        name="t", generator_apply=lambda p, f, r: (model.apply(p, f)[0], None),
        gen_init=lambda r: model.init(r, jnp.zeros((1, 1, HW, HW))),
        disc_apply=lambda p, f: disc.apply(p, f),
        disc_init=lambda r: disc.init(r, jnp.zeros((1, 1, HW, HW))),
        disc_tx=disc_tx, last_layer_path=("params", "dec_out", "kernel"),
        disc_start=0)
    tx = optax.adamw(1e-4)
    rng = jax.random.key(0)
    params = task.init_params(rng)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=rng,
                       extra=task.init_extra(rng, params))
    step = jax.jit(lambda s, b: task.custom_train_step(s, b, tx))
    batch = {{"vil": np.zeros((B, T, 1, HW, HW), np.float32)}}
    state, aux = step(state, batch)
    return 1.0, 2.0, 0.5, 0.6, {{"gan_train_bf16_steps_per_sec_b8": 3.0}}

bench.bench_train = small_train
bench.bench_fast_vae_train = lambda: 4.0
bench.main()
"""


def test_bench_json_contract(tmp_path):
    cache = str(tmp_path / "baseline.json")
    with open(cache, "w") as f:
        json.dump({"torch_cpu_fps": 1.0}, f)
    env = dict(os.environ)
    env["WX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # bench.py has no WX_PLATFORM hook; force CPU via a jax config preamble
    code = ("import jax; jax.config.update('jax_platforms', 'cpu')\n"
            + DRIVER.format(repo=REPO, cache=cache))
    result = subprocess.run([sys.executable, "-c", code], capture_output=True,
                            text=True, timeout=1200, env=env, cwd=REPO)
    assert result.returncode == 0, result.stderr[-3000:]
    line = result.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["metric"] == "sevirlr_12step_rollout_frames_per_sec"
    assert payload["unit"] == "frames/sec"
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 0
    assert "mfu" in payload and "hbm_bw_util" in payload
    assert payload["gan_train_steps_per_sec"] == 1.0
    assert payload["gan_train_bf16_steps_per_sec"] == 2.0
    assert payload["gan_train_mfu_fp32"] == 0.5
    assert payload["gan_train_mfu_bf16"] == 0.6
    assert payload["gan_train_bf16_steps_per_sec_b8"] == 3.0
    assert payload["fast_vae_train_steps_per_sec"] == 4.0
    assert "int8_frames_per_sec" in payload and "int8_ssim_vs_fp32" in payload
    assert "autoregressive_frames_per_sec" in payload
    assert "autoregressive_ssim_vs_oneshot" in payload
    assert "fast_vae_frames_per_sec" in payload
    assert "fast_vae_ssim_vs_own_fp32" in payload
    assert "int8_mixed_frames_per_sec" in payload
    assert "int8_mixed_ssim_vs_fp32" in payload
    assert "latency_ms_b1" in payload
    assert "fast_vae_latency_ms_b1" in payload
    assert "streaming_tick_ms_b1" in payload
    assert "fast_vae_streaming_tick_ms_b1" in payload


def test_wait_for_backend_retries(monkeypatch):
    """Backend-init retry: transient UNAVAILABLE at process start must not
    forfeit the bench run (BENCH_r03 died at jax.devices() before any repo
    code ran). Two failures then success -> returns devices, slept twice,
    cleared the cached backend registry between attempts."""
    import bench
    import jax

    calls = {"n": 0, "sleeps": [], "clears": 0}

    def fake_devices():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("Unable to initialize backend 'axon': "
                               "UNAVAILABLE")
        return ["fake-tpu"]

    from weatherforecastingtoolkit_tpu.utils import backend as _backend

    monkeypatch.setattr(jax, "devices", fake_devices)
    monkeypatch.setattr(_backend.time, "sleep",
                        lambda s: calls["sleeps"].append(s))
    import jax.extend
    monkeypatch.setattr(jax.extend.backend, "clear_backends",
                        lambda: calls.__setitem__("clears",
                                                  calls["clears"] + 1))
    assert bench.wait_for_backend(max_tries=5) == ["fake-tpu"]
    assert calls["n"] == 3 and len(calls["sleeps"]) == 2
    assert calls["clears"] == 2
    assert calls["sleeps"][1] > calls["sleeps"][0]  # backoff grows

    # exhausted retries re-raise the last error
    calls["n"] = -100  # never succeeds within 3 tries
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench.wait_for_backend(max_tries=3)


def test_wait_for_backend_deadline(monkeypatch):
    """deadline_s retries on wall-clock, not attempt count: outlives the
    default max_tries while the clock is inside the deadline, raises once
    elapsed time crosses it (axon outages run minutes-to-hours, so the
    driver's bench waits on time, not tries)."""
    import jax

    from weatherforecastingtoolkit_tpu.utils import backend as _backend

    calls = {"n": 0}
    clock = {"t": 0.0}

    def fake_devices():
        calls["n"] += 1
        if calls["n"] == 12:  # > default max_tries=8
            return ["fake-tpu"]
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(jax, "devices", fake_devices)
    monkeypatch.setattr(_backend.time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(_backend.time, "sleep",
                        lambda s: clock.__setitem__("t", clock["t"] + s))
    import jax.extend
    monkeypatch.setattr(jax.extend.backend, "clear_backends", lambda: None)

    # 11 failures sleep 10+20+40+80+120*7 = 990s < 2700 -> success on 12th
    assert _backend.wait_for_backend(deadline_s=2700.0) == ["fake-tpu"]
    assert calls["n"] == 12

    # a short deadline raises as soon as elapsed >= deadline_s
    calls["n"] = -10 ** 9
    clock["t"] = 0.0
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="UNAVAILABLE"):
        _backend.wait_for_backend(deadline_s=25.0)
    # 10s + 20s sleeps cross the 25s deadline -> third failure raises
    assert calls["n"] == -10 ** 9 + 3


def test_calibrate_once_reuse_equivalence(monkeypatch):
    """A precomputed calibrate_qscales tree passed as build_jax_pipeline(
    qscales=...) must reproduce the in-line calib_frames path bit-for-bit —
    the contract that lets experiments/perf/int8_mixed.py calibrate ONCE per
    sweep instead of once per sweep point."""
    import numpy as np

    import bench
    from weatherforecastingtoolkit_tpu.data.synthetic import (
        synthetic_vil_events)

    monkeypatch.setattr(bench, "BATCH", 2)
    monkeypatch.setattr(bench, "T_IN", 4)
    monkeypatch.setattr(bench, "T_OUT", 3)
    monkeypatch.setattr(bench, "HW", 32)
    monkeypatch.setattr(bench, "LATENT_C", 4)
    monkeypatch.setattr(bench, "LATENT_HW", 8)
    monkeypatch.setattr(bench, "VAE_CHANNELS", (8, 16))
    monkeypatch.setattr(bench, "NORM_GROUPS", 4)

    import jax
    events = synthetic_vil_events(2, 32, 32, 4, seed=0)
    frames = np.transpose(events, (0, 3, 1, 2))[:, :, None]
    frames = jax.device_put(frames.astype(np.float32) / 255.0)

    qs = bench.calibrate_qscales(frames)
    pipe_a, fc_a = bench.build_jax_pipeline("float32", conv_mode="int8_static",
                                            calib_frames=frames)
    pipe_b, fc_b = bench.build_jax_pipeline("float32", conv_mode="int8_static",
                                            qscales=qs)
    out_a = np.asarray(pipe_a(fc_a, frames))
    out_b = np.asarray(pipe_b(fc_b, frames))
    np.testing.assert_array_equal(out_a, out_b)
