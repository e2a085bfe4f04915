"""evaluation.py: the promoted demo protocol (wins/score, ceiling fractions,
one-jit evaluate_protocol) — library surface, unit-tested (round-4 verdict:
demo-grown capabilities must live behind library APIs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.evaluation import (HEADLINE, SCORED,
                                                      EvalReport,
                                                      ceiling_fraction,
                                                      evaluate_protocol,
                                                      wins_and_score)


def _metrics(ssim, psnr, crps, csi, hss):
    return {"SSIM": ssim, "PSNR": psnr, "PSNR_ref": psnr + 1.0, "CRPS": crps,
            "paper_CSI_M_POOL1": csi, "paper_HSS_POOL1": hss}


def test_wins_and_score_counts_and_direction():
    model = _metrics(0.9, 30.0, 0.01, 0.6, 0.7)
    persist = _metrics(0.8, 25.0, 0.02, 0.5, 0.6)
    wins, score = wins_and_score(model, persist)
    assert wins == 5 and score > 0
    # CRPS is lower-better: a HIGHER model CRPS must lose that metric
    worse_crps = dict(model, CRPS=0.05)
    wins2, score2 = wins_and_score(worse_crps, persist)
    assert wins2 == 4 and score2 < score
    # PSNR_ref is display-only: changing it must not move wins or score
    wins3, score3 = wins_and_score(dict(model, PSNR_ref=0.0), persist)
    assert (wins3, score3) == (wins, score)


def test_ceiling_fraction():
    model = _metrics(0.9, 30.0, 0.01, 0.6, 0.7)
    ceil = _metrics(0.95, 40.0, 0.003, 0.9, 0.9)
    assert ceiling_fraction(model, ceil) == pytest.approx(0.6 / 0.9)
    with pytest.raises(ValueError):
        ceiling_fraction(model, ceil, key="CRPS")  # lower-better: undefined


def test_report_table_and_fractions():
    model = _metrics(0.9, 30.0, 0.01, 0.6, 0.7)
    persist = _metrics(0.8, 25.0, 0.02, 0.5, 0.6)
    ceil = _metrics(0.95, 40.0, 0.003, 0.9, 0.9)
    r = EvalReport(model=model, persistence=persist, ceiling=ceil,
                   wins=5, score=0.2)
    table = r.format_table("t")
    assert "vae-ceiling" in table and "wins 5/5" in table
    for k in HEADLINE:
        assert k in table
    fr = r.ceiling_fractions()
    assert set(fr) == {k for k in SCORED if k != "CRPS"}
    # pixel-space models have no ceiling: table must degrade gracefully
    r2 = EvalReport(model=model, persistence=persist, ceiling=None,
                    wins=5, score=0.2)
    assert "vae-ceiling" not in r2.format_table()
    assert r2.ceiling_fractions() == {}


def test_evaluate_protocol_perfect_forecaster(rng):
    """A perfect model (pred == target) must win 5/5 with ceiling fractions
    of exactly 1.0 when the roundtrip is the identity."""
    t_in, t_out = 3, 2
    seqs = [jnp.asarray(rng.random((2, t_in + t_out, 1, 16, 16),
                                   np.float32)) for _ in range(2)]

    def eval_fn(params, seq):
        frames_in = seq[:, :t_in]
        target = seq[:, t_in:t_in + t_out]
        persist = jnp.repeat(frames_in[:, -1:], t_out, axis=1)
        return target * params, target, persist          # params=1.0: perfect

    report = evaluate_protocol(eval_fn, jnp.float32(1.0), seqs,
                               roundtrip_fn=lambda p, t: t)
    assert report.wins == len(SCORED)
    assert report.model["SSIM"] == pytest.approx(1.0)
    assert report.model["CRPS"] == pytest.approx(0.0, abs=1e-6)
    for v in report.ceiling_fractions().values():
        assert v == pytest.approx(1.0)
    # without a roundtrip there is no ceiling
    r2 = evaluate_protocol(eval_fn, jnp.float32(1.0), seqs)
    assert r2.ceiling is None
