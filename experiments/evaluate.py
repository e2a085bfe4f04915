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
    headline = ["SSIM", "PSNR", "CRPS", "paper_CSI_M_POOL1", "paper_HSS_POOL1"]
    print(f"{'metric':<22}{'model':>12}{'persistence':>14}")
    for k in headline:
        print(f"{k:<22}{model_m[k]:>12.4f}{persist_m[k]:>14.4f}")
    print(json.dumps({"model": model_m, "persistence": persist_m}))


if __name__ == "__main__":
    main()
