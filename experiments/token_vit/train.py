"""Token-sequence Path-B: frozen ViT AE token latents + transformer forecaster.

The [64, 512] structured-token-latent forecasting variant the reference
README proposed (README.md:96-109; BASELINE.json config #3): encode frames to
token sequences with a frozen ViT AE, forecast the token sequence with
factorized time/space attention, decode for pixel metrics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from experiments.common import main  # noqa: E402
from weatherforecastingtoolkit_tpu.models.token_forecaster import (  # noqa: E402
    TokenSequenceForecaster)
from weatherforecastingtoolkit_tpu.models.vit_ae import ViTAE  # noqa: E402
from weatherforecastingtoolkit_tpu.training.tasks import Task, dequantize  # noqa: E402


def build_task(cfg, dm):
    v = cfg.vit_ae
    t_in, t_out = cfg.dataset.input_frames, cfg.dataset.pred_frames
    vit = ViTAE(img_size=v.img_size, patch=v.patch, d_token=v.d_token,
                d_latent=v.d_latent, depth_enc=v.depth_enc,
                depth_dec=v.depth_dec, heads=v.heads, dropout=0.0)
    n_tok = vit.n_patches

    if v.get("ckpt_run_dir"):
        from weatherforecastingtoolkit_tpu.training.checkpoint import (
            CheckpointManager)
        from weatherforecastingtoolkit_tpu.training.trainer import TrainState
        template = vit.init(jax.random.key(0),
                            jnp.zeros((1, 1, v.img_size, v.img_size)))
        mgr = CheckpointManager(str(v.ckpt_run_dir))
        state_t = TrainState(step=jnp.zeros((), jnp.int32), params=template,
                             opt_state=None, rng=jax.random.key(0))
        vit_vars = mgr.restore(jax.device_get(state_t)).params
        print(f"[token_vit] loaded frozen ViT AE from {v.ckpt_run_dir}")
    else:
        vit_vars = vit.init(jax.random.key(v.get("init_seed", 7)),
                            jnp.zeros((1, 1, v.img_size, v.img_size)))
        print("[token_vit] random frozen ViT AE (hermetic mode)")
    vit_vars = jax.lax.stop_gradient(vit_vars)

    fc = TokenSequenceForecaster(t_in=t_in, t_out=t_out, d_token=v.d_token,
                                 num_heads=cfg.forecaster.num_heads,
                                 depth=cfg.forecaster.depth)

    def encode_seq(x):
        b, t = x.shape[:2]
        frames = x.reshape((b * t,) + x.shape[2:])
        tokens = vit.apply(vit_vars, frames, method=vit.encode_tokens)
        return tokens.reshape(b, t, n_tok, v.d_token)

    def decode_seq(tokens):
        b, t = tokens.shape[:2]
        flat = tokens.reshape((b * t, n_tok, v.d_token))
        frames = vit.apply(vit_vars, flat, method=vit.decode_tokens)
        return frames.reshape((b, t) + frames.shape[1:])

    def init_params(rng):
        return fc.init(rng, jnp.zeros((1, t_in, n_tok, v.d_token)))

    def split(batch):
        x = dequantize(batch["vil"])
        return x[:, :t_in], x[:, t_in:t_in + t_out]

    def loss_fn(params, batch, rng, step):
        frames_in, frames_gt = split(batch)
        z = encode_seq(jnp.concatenate([frames_in, frames_gt], axis=1))
        pred = fc.apply(params, z[:, :t_in], deterministic=False,
                        rngs={"dropout": rng})
        return jnp.mean((pred - z[:, t_in:]) ** 2), {}

    def eval_fn(params, batch, rng):
        frames_in, frames_gt = split(batch)
        z_in = encode_seq(frames_in)
        pred_tokens = fc.apply(params, z_in)
        pred = jnp.clip(decode_seq(pred_tokens), 0.0, 1.0)
        return pred, frames_gt

    return Task(name=cfg.experiment_name, init_params=init_params,
                loss_fn=loss_fn, eval_fn=eval_fn)


if __name__ == "__main__":
    main(__file__, build_task)
