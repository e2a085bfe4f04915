"""Control-flow contract of the mixed-precision sweep entry point.

experiments/perf/int8_mixed.py runs unattended on the TPU; these tests drive
its real main() with a stubbed bench module to pin the expensive-path
decisions:

  * stage 4 (greedy mix) must REUSE stage-3 single-family SSIMs — a
    single-family spec must never be recompiled once the greedy stage starts;
  * when no single family passes the gate, the sweep must short-circuit to
    the measured-negative verdict with ZERO greedy compiles;
  * when some families quantize losslessly, the winning spec must contain
    exactly those families plus the native fallback.

No reference counterpart (the reference serves fp32 torch); the sweep itself
answers VERDICT r3 item 4.
"""

from __future__ import annotations

import importlib
import io
import os
import sys
import contextlib

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def sweep_module():
    sys.path.insert(0, os.path.join(REPO, "experiments", "perf"))
    try:
        yield importlib.import_module("int8_mixed")
    finally:
        sys.path.remove(os.path.join(REPO, "experiments", "perf"))


class _StubBench:
    """Stands in for the real bench module inside int8_mixed.main()."""

    HW = 32
    T_IN = 2
    T_OUT = 2
    BATCH = 2
    FAST_BATCH = 2
    VAE_CHANNELS = (4, 8)            # -> families(2): 10 families
    FAST_VAE_KW = {"block_out_channels": (4, 8)}

    def __init__(self, fail_all_singles):
        self.fail_all_singles = fail_all_singles
        self.greedy_compiles = 0      # tuple-spec run() calls after stage 3
        self.stage = "singles"

    def calibrate_qscales(self, frames, vae_kwargs=None):
        return {"stub": True}

    def build_jax_pipeline(self, dtype, conv_mode="native", vae_kwargs=None,
                           qscales=None):
        return (dtype, conv_mode), None

    def _time_pipeline(self, pipe, fc, frames, n_rep=10):
        dtype, mode = pipe
        n = self.BATCH * self.T_OUT * self.HW * self.HW
        base = np.random.RandomState(0).rand(n).astype(np.float32)
        if mode == "native":
            return 0.1, None, base if dtype == "float32" else base + 1e-4
        fams = [p for p, m in mode if m == "int8_static"]
        assert not (len(fams) == 1 and self.stage == "greedy"), \
            f"greedy stage recompiled a single-family spec: {mode!r}"
        if self.stage == "greedy":
            self.greedy_compiles += 1
        lossy = self.fail_all_singles or any(
            "conv_out" not in f for f in fams)
        wreck = 0.4 * np.sin(np.arange(n)) if lossy else 0.0
        return 0.1, None, base + wreck


def _drive(module, monkeypatch, capsys, fail_all_singles):
    stub = _StubBench(fail_all_singles)
    monkeypatch.setattr(module, "bench", stub)
    monkeypatch.setattr(module, "FAST_KW", stub.FAST_VAE_KW)
    monkeypatch.setattr(module, "FAMILIES", module.families(2))
    import weatherforecastingtoolkit_tpu.utils.backend as backend
    monkeypatch.setattr(backend, "wait_for_backend",
                        lambda *a, **k: ["stub-cpu"])
    import weatherforecastingtoolkit_tpu.data.synthetic as synthetic
    monkeypatch.setattr(
        synthetic, "synthetic_vil_events",
        lambda b, h, w, t, seed=0: np.zeros((b, h, w, t), np.float32))
    monkeypatch.setattr(sys, "argv", ["int8_mixed.py"])

    # flip the stub into greedy mode at the first greedy-stage print line
    import builtins
    orig_print = builtins.print

    def tracking_print(*args, **kw):
        txt = args[0] if args else ""
        if isinstance(txt, str) and txt.lstrip().startswith("mix+"):
            stub.stage = "greedy"
        orig_print(*args, **kw)

    monkeypatch.setattr(builtins, "print", tracking_print)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        module.main()
    return stub, buf.getvalue()


def test_measured_negative_short_circuits_greedy(sweep_module, monkeypatch,
                                                 capsys):
    stub, out = _drive(sweep_module, monkeypatch, capsys,
                       fail_all_singles=True)
    assert "no family quantizes under the gate" in out
    assert stub.greedy_compiles == 0
    assert "(stage-3 reuse)" in out


def test_greedy_reuses_singles_and_builds_winning_mix(sweep_module,
                                                      monkeypatch, capsys):
    stub, out = _drive(sweep_module, monkeypatch, capsys,
                       fail_all_singles=False)
    assert "PASS (stage-3 reuse)" in out       # first addition: no recompile
    assert "RESULT: 2/10 families int8" in out  # enc+dec conv_out only
    assert "('*', 'native')" in out             # spec keeps native fallback
    assert "encoder/conv_out*" in out and "decoder/conv_out*" in out
