"""Standalone forecast evaluation: model vs persistence, full metric dict.

The `trainer.test` analog plus the reference's persistence comparison
(reference README.md:80-92 — "beats the persistence baseline" is the headline
result this reproduces). Evaluates the latent_dlinear-style rollout from a
checkpoint (or fresh init) on the test split and prints both metric dicts.

    python experiments/evaluate.py --config experiments/latent_dlinear/config.yaml \
        [--run-dir outputs_root/.../run-*/ ] [dotlist overrides...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from experiments.common import build_datamodule  # noqa: E402
from experiments.latent_common import build_frozen_vae  # noqa: E402
from weatherforecastingtoolkit_tpu.models.forecasters import DLinear  # noqa: E402
from weatherforecastingtoolkit_tpu.models.rollout import (evaluate_vs_persistence,  # noqa: E402
                                                          make_eval_fn,
                                                          make_forecast_pipeline)
from weatherforecastingtoolkit_tpu.utils.config import Config  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--run-dir", default=None,
                   help="run dir with checkpoints to load the forecaster from")
    p.add_argument("--max-batches", type=int, default=16)
    p.add_argument("--ensemble", type=int, default=0, metavar="N",
                   help="N>0: also evaluate an N-member latent-noise "
                        "ensemble — calibrate noise_std on the first half "
                        "of the eval batches, report CRPS vs deterministic "
                        "on the second half")
    p.add_argument("--ensemble-stds", default="0,0.01,0.02,0.05,0.1,0.2,0.5,1",
                   help="comma-separated noise_std calibration grid")
    args, dotlist = p.parse_known_args(argv)

    import jax
    import jax.numpy as jnp

    cfg = Config.load(args.config).merged_dotlist(list(dotlist))
    dm = build_datamodule(cfg)
    encode_apply, encode_mode, decode_apply, latent_shape = build_frozen_vae(cfg)
    d = int(np.prod(latent_shape))
    t_in, t_out = cfg.dataset.input_frames, cfg.dataset.pred_frames
    forecaster = DLinear(seq_len=t_in, pred_len=t_out,
                         kernel_size=cfg.dlinear.kernel_size,
                         individual=cfg.dlinear.get("individual", False),
                         channels=d)

    if args.run_dir:
        from weatherforecastingtoolkit_tpu.training.checkpoint import CheckpointManager
        template = forecaster.init(jax.random.key(0), jnp.zeros((1, t_in, d)))
        mgr = CheckpointManager(args.run_dir)
        from weatherforecastingtoolkit_tpu.training.trainer import TrainState
        state_t = TrainState(step=jnp.zeros((), jnp.int32), params=template,
                             opt_state=None, rng=jax.random.key(0))
        try:
            restored = mgr.restore(jax.device_get(state_t))
            fc_params = restored.params
            print(f"[eval] loaded forecaster from {args.run_dir}")
        except Exception as e:  # noqa: BLE001
            print(f"[eval] checkpoint load failed ({e}); using fresh init")
            fc_params = template
    else:
        fc_params = forecaster.init(jax.random.key(0), jnp.zeros((1, t_in, d)))

    pipeline = make_forecast_pipeline(
        encode_apply=lambda f: encode_mode(f),  # deterministic for eval
        decode_apply=decode_apply,
        forecaster_apply=lambda p_, z: forecaster.apply(p_, z),
        input_frames=t_in, pred_frames=t_out)
    eval_fn = make_eval_fn(pipeline, t_in, t_out)

    batches = []
    for i, batch in enumerate(dm.test_loader()):
        if i >= args.max_batches:
            break
        batches.append(jnp.asarray(batch["vil"]))
    if not batches:
        raise SystemExit("no test batches")

    model_m, persist_m = evaluate_vs_persistence(eval_fn, fc_params, batches)
    headline = ["SSIM", "PSNR", "PSNR_ref", "CRPS", "paper_CSI_M_POOL1",
                "paper_HSS_POOL1"]
    print(f"{'metric':<22}{'model':>12}{'persistence':>14}")
    for k in headline:
        print(f"{k:<22}{model_m[k]:>12.4f}{persist_m[k]:>14.4f}")

    ens_report = {}
    if args.ensemble > 0:
        from weatherforecastingtoolkit_tpu.metrics import crps as _crps
        from weatherforecastingtoolkit_tpu.models.rollout import (
            calibrate_noise_std, make_ensemble_eval_fn, make_ensemble_pipeline)

        ens = make_ensemble_pipeline(
            encode_apply=lambda f: encode_mode(f),
            decode_apply=decode_apply,
            forecaster_apply=lambda p_, z: forecaster.apply(p_, z),
            input_frames=t_in, pred_frames=t_out, n_members=args.ensemble)
        ens_eval = make_ensemble_eval_fn(ens, t_in, t_out)
        cal = batches[: max(1, len(batches) // 2)]
        rep = batches[max(1, len(batches) // 2):] or cal
        best, table = calibrate_noise_std(
            ens_eval, fc_params, cal,
            stds=tuple(float(s) for s in args.ensemble_stds.split(",")),
            key=jax.random.key(42))
        jitted = jax.jit(ens_eval)
        ens_report = {"noise_std": best, "calibration": table}
        for tag, s in (("crps_deterministic", 0.0), ("crps_ensemble", best)):
            tot = 0.0
            for i, seq in enumerate(rep):
                pred, tgt, _ = jitted(fc_params, seq,
                                      jax.random.fold_in(jax.random.key(7), i),
                                      s)
                tot += _crps(pred, tgt)
            ens_report[tag] = tot / len(rep)
        print(f"[ensemble] N={args.ensemble} noise_std={best:g}: CRPS "
              f"{ens_report['crps_deterministic']:.5f} -> "
              f"{ens_report['crps_ensemble']:.5f}")

    print(json.dumps({"model": model_m, "persistence": persist_m,
                      **({"ensemble": ens_report} if ens_report else {})}))


if __name__ == "__main__":
    main()
