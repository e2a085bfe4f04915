"""Experiment-layer smoke tests: every experiment trains 2 steps end-to-end on
the synthetic fallback dataset via its own train.py main()."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPERIMENTS = [
    "ae_recon", "ae_gan", "vae_gan_kl", "vae_sevir384", "latent_dlinear",
    "latent_linear", "latent_convae", "latent_convattn", "mlp_intensity",
    "alphapre", "earthformer", "token_vit",
]

# tiny overrides so each smoke run compiles small programs and finishes fast
COMMON = [
    "dataset.batch_size=2", "dataset.num_workers=2",
    "dataset.synthetic_events=6", "dataset.img_size=32",
    "trainer.max_epochs=1", "trainer.limit_train_batches=2",
    "trainer.limit_val_batches=1", "trainer.run_test=false",
    "logging.log_every_n_steps=1", "logging.val_every_n=10.0",
    "trainer.save_every_n_steps=10.0",
]

SPECIFIC = {
    "ae_recon": ["model.latent_dim=32", "model.latent_channels=4",
                 "dataset.seq_len=4",
                 "model.enc_channels=[8,16]", "model.dec_channels=[16,8,8]",
                 "model.num_blocks=1"],
    "ae_gan": ["model.latent_dim=32", "model.latent_channels=4",
               "dataset.seq_len=4",
               "model.enc_channels=[8,16]", "model.dec_channels=[16,8,8]",
               "model.num_blocks=1", "lpips.disc_num_layers=1",
               "lpips.disc_ndf=8", "lpips.disc_start=0"],
    "vae_gan_kl": ["model.block_out_channels=[8,16]",
                   "model.latent_channels=4", "model.norm_num_groups=4",
                   "dataset.seq_len=4",
                   "lpips.disc_num_layers=1", "lpips.disc_ndf=8",
                   "lpips.disc_start=0"],
    "latent_dlinear": ["ae_kl.block_out_channels=[8,16]",
                       "ae_kl.latent_channels=4", "ae_kl.norm_num_groups=4",
                       "dataset.seq_len=8", "dataset.input_frames=5",
                       "dataset.pred_frames=3", "dataset.stride=12",
                       "dlinear.kernel_size=5"],
    "latent_linear": ["ae_kl.block_out_channels=[8,16]",
                      "ae_kl.latent_channels=4", "ae_kl.norm_num_groups=4",
                      "dataset.seq_len=8", "dataset.input_frames=5",
                      "dataset.pred_frames=3"],
    "latent_convae": ["ae_kl.block_out_channels=[8,16]",
                      "ae_kl.latent_channels=4", "ae_kl.norm_num_groups=4",
                      "dataset.seq_len=4", "model.latent_dim=32"],
    "latent_convattn": ["ae_kl.block_out_channels=[8,16]",
                        "ae_kl.latent_channels=4", "ae_kl.norm_num_groups=4",
                        "dataset.seq_len=4", "model.embed_dim=16",
                        "model.nhead=2", "model.num_tf_layers=1",
                        "model.latent_dim=16"],
    "mlp_intensity": ["dataset.seq_len=13", "dataset.input_frames=5",
                      "dataset.pred_frames=8", "model.hidden_dim=16"],
    "alphapre": ["model.input_shape=[32,32]", "model.dim=8",
                 "model.n_layers=1", "model.spec_num=3", "dataset.seq_len=8",
                 "model.T_in=5", "model.T_out=3"],
    "token_vit": ["vit_ae.img_size=32", "vit_ae.patch=8", "vit_ae.d_token=32",
                  "vit_ae.d_latent=64", "vit_ae.depth_enc=1",
                  "vit_ae.depth_dec=1", "vit_ae.heads=4",
                  "forecaster.depth=1", "forecaster.num_heads=4",
                  "dataset.seq_len=8", "dataset.input_frames=5",
                  "dataset.pred_frames=3"],
    "earthformer": ["model.t_in=5", "model.t_out=3", "model.patch=8",
                    "model.dim=16", "model.depth=2", "model.num_heads=2",
                    "model.window=[2,2]", "dataset.seq_len=8",
                    "physics_prior.enabled=true"],
    # full-res preset: keep the REAL sevir geometry (raw_seq_len 49; COMMON's
    # img_size=32 shrinks only the synthetic frames — the 4-block /8 chain is
    # resolution-independent and pinned at 384^2 in test_vae.py)
    "vae_sevir384": ["model.block_out_channels=[4,4,8,8]",
                     "model.norm_num_groups=4", "dataset.raw_seq_len=49",
                     "dataset.seq_len=4", "dataset.stride=45",
                     "dataset.batch_size=1", "lpips.disc_num_layers=1",
                     "lpips.disc_ndf=8", "lpips.disc_start=0"],
}


@pytest.mark.parametrize("exp", EXPERIMENTS)
def test_experiment_smoke(exp, tmp_path):
    script = os.path.join(REPO, "experiments", exp, "train.py")
    overrides = COMMON + SPECIFIC[exp] + [
        f"experiment_path={tmp_path}/{exp}"]
    env = dict(os.environ)
    env["WX_PLATFORM"] = "cpu"  # sitecustomize overrides JAX_PLATFORMS
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, script, *overrides],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}")
    assert "done" in result.stdout.splitlines()[-1]


def test_experiment_with_packed_cache(tmp_path):
    """dataset.use_cache=true: the packed mmap cache feeds a real training run
    (the reference proved its HDF5 path I/O-bound, sevir/test.py:42-72)."""
    script = os.path.join(REPO, "experiments", "ae_recon", "train.py")
    overrides = COMMON + SPECIFIC["ae_recon"] + [
        "dataset.use_cache=true", f"experiment_path={tmp_path}/ae_recon_cache"]
    env = dict(os.environ)
    env["WX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run([sys.executable, script, *overrides],
                            capture_output=True, text=True, timeout=900,
                            env=env, cwd=REPO)
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}")
    assert "done" in result.stdout.splitlines()[-1]
    assert "[cache] building packed cache" in result.stdout


def test_latent_dlinear_indc_indp_variant(tmp_path):
    """channel_fold + individual = the reference's _indc_indp DLinear
    (channels folded into the sequence axis, one linear per spatial position,
    reference pretrained_ae_dlinear_indc_indp/train.py:73-89,161)."""
    script = os.path.join(REPO, "experiments", "latent_dlinear", "train.py")
    overrides = COMMON + SPECIFIC["latent_dlinear"] + [
        "dlinear.channel_fold=true", "dlinear.individual=true",
        "dlinear.kernel_size=9",
        f"experiment_path={tmp_path}/latent_dlinear_indc"]
    env = dict(os.environ)
    env["WX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run([sys.executable, script, *overrides],
                            capture_output=True, text=True, timeout=900,
                            env=env, cwd=REPO)
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}")
    assert "done" in result.stdout.splitlines()[-1]


def test_experiment_lr_range_test_artifact(tmp_path):
    """lr_range_test.enabled=true sweeps LRs before fit and saves the plot
    artifact (reference pipeline/helpers.py:34-61)."""
    import glob
    script = os.path.join(REPO, "experiments", "ae_recon", "train.py")
    overrides = COMMON + SPECIFIC["ae_recon"] + [
        "lr_range_test.enabled=true", "lr_range_test.num_iter=5",
        f"experiment_path={tmp_path}/ae_recon_lrt"]
    env = dict(os.environ)
    env["WX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run([sys.executable, script, *overrides],
                            capture_output=True, text=True, timeout=900,
                            env=env, cwd=REPO)
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}")
    assert "[lr_range_test] swept" in result.stdout
    pngs = glob.glob(f"{tmp_path}/ae_recon_lrt/**/lr_range_test.png",
                     recursive=True)
    assert pngs, "lr_range_test.png artifact not written"


def test_latent_convae_gan_variant(tmp_path):
    """The latent-space PatchGAN path (reference pretrained_ae_conv_disc)."""
    script = os.path.join(REPO, "experiments", "latent_convae", "train.py")
    overrides = COMMON + SPECIFIC["latent_convae"] + [
        "lpips.enabled=true", "lpips.disc_num_layers=1", "lpips.disc_ndf=8",
        "lpips.disc_start=0", f"experiment_path={tmp_path}/latent_convae_gan"]
    env = dict(os.environ)
    env["WX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run([sys.executable, script, *overrides],
                            capture_output=True, text=True, timeout=900,
                            env=env, cwd=REPO)
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}")
    assert "done" in result.stdout.splitlines()[-1]


@pytest.mark.parametrize("exp", ["ae_gan", "latent_dlinear"])
def test_experiment_mixed_precision(exp, tmp_path):
    """trainer.mixed_precision=true end-to-end: ae_gan exercises the GAN
    task's internal bf16 handling; latent_dlinear exercises the generic
    amp.mixed_loss wrapper in experiments/common.py AND the bf16 frozen
    encoder in latent_common.build_frozen_vae."""
    script = os.path.join(REPO, "experiments", exp, "train.py")
    overrides = COMMON + SPECIFIC[exp] + [
        "trainer.mixed_precision=true",
        f"experiment_path={tmp_path}/{exp}_amp"]
    env = dict(os.environ)
    env["WX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run([sys.executable, script, *overrides],
                            capture_output=True, text=True, timeout=900,
                            env=env, cwd=REPO)
    assert result.returncode == 0, (
        f"STDOUT:\n{result.stdout[-3000:]}\nSTDERR:\n{result.stderr[-3000:]}")
    assert "done" in result.stdout.splitlines()[-1]
