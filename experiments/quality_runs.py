"""Convergence evidence for the beyond-reference models: Earthformer and the
token-sequence ViT forecaster actually LEARN (>=1k optimization steps on
synthetic advecting-blob VIL, scored vs the persistence baseline on
date-held-out events).

The reference names both directions without shipping them (Earthformer stubs
are 0-byte, reference pipeline/models/earthformer/*; the [64, 512] token
latent is proposed in README.md:96-109). This script is the quality gate for
our implementations — smoke tests prove the programs run; this proves the
models work:

  earthformer: direct pixel nowcasting (B,T_in,1,H,W) -> (B,T_out,1,H,W),
               MSE + advection-diffusion physics prior
  token_vit:   stage 1 trains a ViT AE (token latents) to reconstruct,
               stage 2 freezes it and trains the factorized time/space
               attention forecaster on token sequences

    python experiments/quality_runs.py [--model all] [--steps 1500]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("WX_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["WX_PLATFORM"])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
import pandas as pd  # noqa: E402

from weatherforecastingtoolkit_tpu.data.datamodule import SEVIRDataModule  # noqa: E402
from weatherforecastingtoolkit_tpu.data.prefetch import (BatchLoader,  # noqa: E402
                                                         device_prefetch)
from weatherforecastingtoolkit_tpu.data.synthetic import make_synthetic_sevir  # noqa: E402
from weatherforecastingtoolkit_tpu.metrics import calc_metrics  # noqa: E402
from weatherforecastingtoolkit_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

HEADLINE = ["SSIM", "PSNR", "CRPS", "paper_CSI_M_POOL1", "paper_HSS_POOL1"]
HIGHER = {"SSIM", "PSNR", "paper_CSI_M_POOL1", "paper_HSS_POOL1"}


def make_data(events, img_size, t_in, t_out, batch, stride=4):
    root = tempfile.mkdtemp(prefix="wx_quality_")
    make_synthetic_sevir(root, num_events=events, height=img_size,
                         width=img_size, raw_seq_len=25)
    dates = pd.date_range("2019-01-01", periods=events, freq="7D")
    val_boundary = dates[int(round(events * 0.8)) - 1]
    dm = SEVIRDataModule(dataset_name="sevirlr", sevir_dir=root,
                         seq_len=t_in + t_out, stride=stride, layout="NTCHW",
                         batch_size=batch, num_workers=4,
                         val_split_date=(val_boundary.year, val_boundary.month,
                                         val_boundary.day),
                         train_test_split_date=None)
    dm.prepare_data()
    dm.setup(stage="fit")
    eval_batches = [jnp.asarray(b["vil"]) for b in
                    BatchLoader(dm.sevir_val, batch, num_workers=2)]
    print(f"[data] {dm.num_train_samples} train windows, "
          f"{len(eval_batches)} held-out eval batches (event-level split)")
    return dm, eval_batches


def loop(loader):
    while True:
        for b in device_prefetch(loader):
            yield b


def train_steps(tag, step_fn, state, it, steps, log_every=100):
    t0 = time.time()
    loss = None
    for step in range(steps):
        state, loss = step_fn(state, next(it))
        if step % log_every == 0:
            print(f"[{tag}] step {step} loss {float(loss):.5f}", flush=True)
    print(f"[{tag}] {steps} steps in {time.time()-t0:.0f}s, "
          f"final loss {float(loss):.5f}")
    return state


def report(tag, predict_fn, eval_batches, t_in, t_out):
    """predict_fn(frames_in) -> (B, t_out, C, H, W); prints model vs
    persistence on the held-out events; returns #wins."""
    sums_m, sums_p = {}, {}
    for seq in eval_batches:
        frames_in = seq[:, :t_in]
        target = seq[:, t_in:t_in + t_out]
        pred = predict_fn(frames_in)
        persist = jnp.repeat(frames_in[:, -1:], t_out, axis=1)
        for store, out in ((sums_m, pred), (sums_p, persist)):
            for k, v in calc_metrics(out, target).items():
                store[k] = store.get(k, 0.0) + float(v)
    n = len(eval_batches)
    model_m = {k: v / n for k, v in sums_m.items()}
    persist_m = {k: v / n for k, v in sums_p.items()}
    wins = 0
    print(f"\n[{tag}] {'metric':<22}{'model':>10}{'persistence':>13}{'better?':>9}")
    for k in HEADLINE:
        better = ((model_m[k] > persist_m[k]) if k in HIGHER
                  else (model_m[k] < persist_m[k]))
        wins += int(better)
        print(f"[{tag}] {k:<22}{model_m[k]:>10.4f}{persist_m[k]:>13.4f}"
              f"{str(better):>9}")
    print(f"[{tag}] beats persistence on {wins}/{len(HEADLINE)} headline "
          f"metrics", flush=True)
    return wins


def run_earthformer(args):
    from weatherforecastingtoolkit_tpu.models.earthformer import Earthformer
    from weatherforecastingtoolkit_tpu.ops.pallas.stencil import (
        advection_diffusion_prior)

    t_in, t_out = args.t_in, args.t_out
    dm, eval_batches = make_data(args.events, args.img_size, t_in, t_out,
                                 args.batch)
    model = Earthformer(t_in=t_in, t_out=t_out, in_channels=1, patch=8,
                        dim=128, depth=4, num_heads=4, window=(4, 4),
                        residual_out=True, hierarchy=args.ef_hierarchy,
                        global_tokens=args.ef_global_tokens)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, t_in, 1, args.img_size, args.img_size)))
    n_par = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
    print(f"[earthformer] {n_par/1e6:.2f}M params")
    warm = max(1, args.steps // 10)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(
        optax.warmup_cosine_decay_schedule(1e-5, 5e-4, warm,
                                           args.steps + warm + 1, 1e-6),
        weight_decay=0.01))
    opt = tx.init(params)

    @jax.jit
    def step_fn(state, batch):
        params, opt = state
        x = batch["vil"]
        frames_in, frames_gt = x[:, :t_in], x[:, t_in:t_in + t_out]

        def loss_fn(p):
            from weatherforecastingtoolkit_tpu.ops.ssim import ssim as _dssim
            pred = model.apply(p, frames_in)
            mse = jnp.mean((pred - frames_gt) ** 2)
            # differentiable SSIM term: the one headline metric MSE alone
            # loses to persistence on (structural similarity rewards keeping
            # texture that MSE prefers to blur away)
            flat = lambda a: a.reshape((-1,) + a.shape[2:])  # noqa: E731
            s = _dssim(flat(pred), flat(frames_gt))
            prior = advection_diffusion_prior(
                pred, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.05))
            return mse + 0.02 * (1.0 - s) + 1e-3 * prior
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt), loss

    state = train_steps("earthformer", step_fn, (params, opt),
                        loop(dm.train_loader()), args.steps)
    params = state[0]
    predict = jax.jit(lambda fi: model.apply(params, fi))
    return report("earthformer", predict, eval_batches, t_in, t_out)


def run_alphapre(args):
    from weatherforecastingtoolkit_tpu.models.alphapre import AlphaPre

    t_in, t_out = args.t_in, args.t_out
    dm, eval_batches = make_data(args.events, args.img_size, t_in, t_out,
                                 args.batch)
    model = AlphaPre(pre_seq_length=t_in, aft_seq_length=t_out,
                     input_shape=(args.img_size, args.img_size), input_dim=1,
                     hidden_dim=32, n_layers=2, spec_num=10,
                     aweight_stop_steps=args.steps)
    # jit the init: eager (per-primitive) dispatch of the spectral ops hits
    # an UNIMPLEMENTED on the axon TPU backend; compiled XLA supports them
    params = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, t_in, 1, args.img_size, args.img_size)))
    n_par = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
    print(f"[alphapre] {n_par/1e6:.2f}M params")
    warm = max(1, args.steps // 10)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(
        optax.warmup_cosine_decay_schedule(1e-5, 5e-4, warm,
                                           args.steps + warm + 1, 1e-6),
        weight_decay=0.01))

    @jax.jit
    def step_fn(state, batch):
        params, opt, step = state
        x = batch["vil"]
        frames_in, frames_gt = x[:, :t_in], x[:, t_in:t_in + t_out]

        def loss_fn(p):
            from weatherforecastingtoolkit_tpu.ops.ssim import ssim as _dssim
            pred, loss = model.apply(p, frames_in, frames_gt,
                                     compute_loss=True, step=step,
                                     method=model.predict)
            # + the same differentiable-SSIM term as the earthformer run:
            # the 4-term spectral loss alone blurs (loses SSIM only)
            flat = lambda a: a.reshape((-1,) + a.shape[2:])  # noqa: E731
            s = _dssim(flat(pred), flat(frames_gt))
            return loss["total_loss"] + 0.06 * (1.0 - s)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt, step + 1), loss

    state = train_steps("alphapre", step_fn,
                        (params, tx.init(params), jnp.zeros(())),
                        loop(dm.train_loader()), args.steps)
    params = state[0]
    predict = jax.jit(
        lambda fi: model.apply(params, fi, method=model.predict)[0])
    return report("alphapre", predict, eval_batches, t_in, t_out)


def run_token_vit(args):
    from weatherforecastingtoolkit_tpu.models.token_forecaster import (
        TokenSequenceForecaster)
    from weatherforecastingtoolkit_tpu.models.vit_ae import ViTAE

    t_in, t_out = args.t_in, args.t_out
    dm, eval_batches = make_data(args.events, args.img_size, t_in, t_out,
                                 args.batch)
    vit = ViTAE(img_size=args.img_size, patch=8, d_token=256, d_latent=1024,
                depth_enc=4, depth_dec=4, heads=8, dropout=0.0)
    n_tok = vit.n_patches
    hw = args.img_size
    vit_vars = vit.init(jax.random.key(0), jnp.zeros((1, 1, hw, hw)))

    # ---- stage 1: train the TOKEN roundtrip (encode_tokens -> decode_tokens).
    # The forecaster operates on the [n_tok, d] token-sequence latent
    # (reference README.md:96-109), so that is the pathway that must
    # reconstruct — NOT the collapsed 2048-d vector bottleneck (training only
    # encode->decode leaves decode_tokens consuming a token distribution the
    # decoder has never seen, which produced garbage forecasts).
    warm = max(1, args.steps_ae // 10)
    ae_tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        1e-5, 3e-4, warm, args.steps_ae + warm + 1, 1e-6), weight_decay=1e-4)
    ae_opt = ae_tx.init(vit_vars)

    @jax.jit
    def ae_step(state, batch):
        vv, opt = state
        x = batch["vil"]
        frames = x.reshape((-1,) + x.shape[2:])

        def loss_fn(v):
            tokens = vit.apply(v, frames, method=vit.encode_tokens)
            recon = vit.apply(v, tokens, method=vit.decode_tokens)
            return jnp.mean(jnp.abs(recon - frames))
        loss, grads = jax.value_and_grad(loss_fn)(vv)
        upd, opt = ae_tx.update(grads, opt, vv)
        return (optax.apply_updates(vv, upd), opt), loss

    it = loop(dm.train_loader())
    vit_vars, _ = train_steps("vit_ae", ae_step, (vit_vars, ae_opt), it,
                              args.steps_ae)

    # ---- stage 2: freeze it; train the token-sequence forecaster
    fc = TokenSequenceForecaster(t_in=t_in, t_out=t_out, d_token=256,
                                 num_heads=8, depth=2)
    fc_vars = fc.init(jax.random.key(1),
                      jnp.zeros((1, t_in, n_tok, 256)))

    def encode_seq(x):
        b, t = x.shape[:2]
        tokens = vit.apply(vit_vars, x.reshape((b * t,) + x.shape[2:]),
                           method=vit.encode_tokens)
        return tokens.reshape(b, t, n_tok, 256)

    warm2 = max(1, args.steps // 10)
    fc_tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        1e-5, 5e-4, warm2, args.steps + warm2 + 1, 1e-6), weight_decay=0.0)
    fc_opt = fc_tx.init(fc_vars)

    @jax.jit
    def fc_step(state, batch):
        fv, opt = state
        z = jax.lax.stop_gradient(encode_seq(batch["vil"]))

        def loss_fn(fv_):
            pred = fc.apply(fv_, z[:, :t_in])
            return jnp.mean((pred - z[:, t_in:]) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(fv)
        upd, opt = fc_tx.update(grads, opt, fv)
        return (optax.apply_updates(fv, upd), opt), loss

    fc_vars, _ = train_steps("token_fc", fc_step, (fc_vars, fc_opt), it,
                             args.steps)

    @jax.jit
    def predict(frames_in):
        b = frames_in.shape[0]
        z = encode_seq(frames_in)
        pred_tok = fc.apply(fc_vars, z)
        flat = pred_tok.reshape((b * t_out, n_tok, 256))
        frames = vit.apply(vit_vars, flat, method=vit.decode_tokens)
        return frames.reshape((b, t_out) + frames.shape[1:])

    @jax.jit
    def roundtrip(frames_in):
        """Token-path ceiling: decode_tokens(encode_tokens(target))."""
        b, t = frames_in.shape[:2]
        flat = frames_in.reshape((b * t,) + frames_in.shape[2:])
        tok = vit.apply(vit_vars, flat, method=vit.encode_tokens)
        rec = vit.apply(vit_vars, tok, method=vit.decode_tokens)
        return rec.reshape((b, t) + rec.shape[1:])

    # diagnostics: the AE roundtrip ceiling on the held-out targets
    s_sum = 0.0
    from weatherforecastingtoolkit_tpu.ops.ssim import ssim as _ssim
    for seq in eval_batches:
        target = seq[:, t_in:t_in + t_out]
        rt = roundtrip(target)
        s_sum += float(_ssim(np.asarray(rt).reshape(-1, 1, hw, hw),
                             np.asarray(target).reshape(-1, 1, hw, hw)))
    print(f"[token_vit] token-roundtrip ceiling SSIM on held-out targets: "
          f"{s_sum / len(eval_batches):.4f}")

    return report("token_vit", predict, eval_batches, t_in, t_out)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="all",
                   choices=["all", "earthformer", "token_vit", "alphapre"])
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--steps-ae", type=int, default=4000,
                   help="token_vit stage-1 ViT AE steps")
    p.add_argument("--events", type=int, default=64)
    p.add_argument("--img-size", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--t-in", type=int, default=8)
    p.add_argument("--t-out", type=int, default=5)
    p.add_argument("--ef-hierarchy", type=int, default=2,
                   help="earthformer: 2 = hierarchical encoder-decoder "
                        "(patch-merge coarse stage), 1 = flat (round-2 config)")
    p.add_argument("--ef-global-tokens", type=int, default=8,
                   help="earthformer: G global vectors threading every "
                        "cuboid block (0 = off, round-2 config)")
    args = p.parse_args(argv)

    wins = {}
    if args.model in ("all", "earthformer"):
        wins["earthformer"] = run_earthformer(args)
    if args.model in ("all", "token_vit"):
        wins["token_vit"] = run_token_vit(args)
    if args.model in ("all", "alphapre"):
        wins["alphapre"] = run_alphapre(args)
    print(f"\nsummary: {wins}")
    return wins


if __name__ == "__main__":
    main()
