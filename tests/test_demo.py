"""Smoke tests for experiments/demo_path_b.py — the end-to-end science demo.

The demo is the de-facto integration test of the Path-B science pipeline
(reference README.md:80-92); until now it was the only untested entry point,
so flag interactions (--ema x --eval-ensemble, --forecaster token_vit,
decoder fine-tune stages) were only ever exercised by hand on the TPU.
Each case runs the FULL pipeline with tiny budgets in a subprocess on CPU
(WX_PLATFORM=cpu) and must exit 0 with the final report table printed.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "experiments", "demo_path_b.py")

TINY = [
    "--events", "8", "--img-size", "32", "--window-stride", "8",
    "--batch", "2", "--t-in", "4", "--t-out", "2",
    "--blocks", "8,16", "--latent-ch", "4",
    "--steps-ae", "2", "--steps-fc", "2", "--eval-every", "2",
]

CASES = {
    # flag interaction the VERDICT called out: EMA shadow competing in
    # checkpoint selection WHILE the ensemble evaluator runs, plus the
    # e2e fine-tune stage that owns the keep-best loop
    "ema_x_ensemble_e2e": ["--ema", "0.99", "--eval-ensemble", "2",
                           "--steps-e2e", "2"],
    # transformer forecaster family (the headline demo's model)
    "token_vit": ["--forecaster", "token_vit", "--fc-dim", "16",
                  "--fc-depth", "1"],
    # both decoder fine-tune stages + autoregressive rollout evaluation
    "dec_ft_x_autoregressive": ["--steps-dec-ft", "1", "--steps-dec-ft2", "1",
                                "--eval-autoregressive"],
    # pixel-space Earthformer branch (no VAE, quality_runs recipe); exits
    # before the panel stage, so no panel artifact is expected
    "earthformer": ["--forecaster", "earthformer"],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_demo_path_b_smoke(name, tmp_path):
    env = dict(os.environ, WX_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    panel = str(tmp_path / "panel.png")
    out = subprocess.run(
        [sys.executable, DEMO] + TINY + CASES[name] + ["--save-panel", panel],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    # the final report table and its persistence baseline must be present
    assert "persistence" in out.stdout, out.stdout[-3000:]
    assert "PSNR_ref" in out.stdout, out.stdout[-2000:]
    if name != "earthformer":
        assert os.path.exists(panel)
    if name == "ema_x_ensemble_e2e":
        assert "[ensemble]" in out.stdout
        assert "[ema]" in out.stdout or "ema" in out.stdout.lower()
