"""Preemption-safe training: a real SIGTERM mid-fit must produce a clean
checkpoint at the interrupted step and a graceful exit; a fresh process with
resume=True must continue from exactly that step. (TPU slices are preempted
with SIGTERM + grace period; the reference's Lightning stack has no analog —
this is the run_with_retry story completed for involuntary kills.)"""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = " ".join(
    [f for f in os.environ.get("XLA_FLAGS", "").split()
     if "host_platform_device_count" not in f]) or ""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from weatherforecastingtoolkit_tpu.models.conv_ae import PosAwareAE
from weatherforecastingtoolkit_tpu.training.tasks import reconstruction_task
from weatherforecastingtoolkit_tpu.training.trainer import Trainer
from weatherforecastingtoolkit_tpu.utils.config import Config

resume = len(sys.argv) > 1 and sys.argv[1] == "resume"
model = PosAwareAE(enc_channels=(8, 8), dec_channels=(8, 8, 8), num_blocks=1,
                   latent_hw=8, latent_channels=2, latent_dim=32)
cfg = Config({{
    "experiment_name": "preempt", "experiment_path": {exp!r}, "seed": 0,
    "optim": {{"lr": 1e-3, "schedule": "constant"}},
    "trainer": {{"max_epochs": 1, "total_train_steps": 500,
                "save_every_n_steps": 1.0}},
    "logging": {{"log_every_n_steps": 1000, "val_every_n": 10.0}},
}})
x = np.random.default_rng(0).random((2, 2, 1, 32, 32)).astype(np.float32)


class SlowLoader:
    def __len__(self):
        return 500

    def __iter__(self):
        for _ in range(500):
            time.sleep(0.05)
            yield {{"vil": jnp.asarray(x)}}


tr = Trainer(cfg, reconstruction_task(model), resume=resume)
state = tr.init_state()
if resume:
    print("RESUMED_AT", int(state.step), flush=True)
    sys.exit(0)
print("READY", flush=True)  # compiled-and-running marker for the parent
state = tr.fit(SlowLoader(), state=state)
print("STOPPED_AT", int(state.step), "PREEMPTED", tr.preempted, flush=True)
tr.close()
"""


def test_sigterm_checkpoints_and_resumes(tmp_path):
    code = CHILD.format(repo=REPO, exp=str(tmp_path))
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=REPO)
    # wait for the child to reach the train loop, then let a few steps run
    t0 = time.time()
    line = ""
    while time.time() - t0 < 240:
        line = p.stdout.readline()
        if "READY" in line:
            break
    assert "READY" in line, "child never reached fit()"
    time.sleep(8)  # a handful of 50 ms-batch steps after compile
    p.send_signal(signal.SIGTERM)
    out = p.stdout.read()
    p.wait(timeout=120)
    assert p.returncode == 0, f"child did not exit cleanly:\n{out[-3000:]}"
    assert "SIGTERM at step" in out, out[-3000:]
    assert "PREEMPTED True" in out, out[-3000:]
    stopped = int(out.split("STOPPED_AT")[1].split()[0])
    assert 1 <= stopped < 500  # genuinely mid-run

    # fresh process resumes from exactly the preemption checkpoint
    p2 = subprocess.run([sys.executable, "-c", code, "resume"],
                        capture_output=True, text=True, cwd=REPO, timeout=240)
    assert p2.returncode == 0, p2.stdout + p2.stderr
    assert f"RESUMED_AT {stopped}" in p2.stdout, (
        f"expected resume at {stopped}:\n{p2.stdout}\n{p2.stderr}")
