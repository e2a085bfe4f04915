"""VAE-KL family tests: distribution math, shapes, and — the critical one —
fp32 numerical parity with the torch reference given identical weights
(gates the frozen-pretrained-VAE workflow, reference ae_s2/train.py:19-27)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import (
    AutoencoderKL, from_torch_state_dict)
from weatherforecastingtoolkit_tpu.models.vae.distributions import (
    DiagonalGaussianDistribution, normal_kl)

sys.path.insert(0, "/root/reference")


# ------------------------------------------------------------ distributions
def test_gaussian_mode_and_sample(rng):
    params = np.zeros((2, 8, 4, 4), dtype=np.float32)
    params[:, :4] = rng.standard_normal((2, 4, 4, 4))
    dist = DiagonalGaussianDistribution(jnp.asarray(params))
    np.testing.assert_allclose(np.asarray(dist.mode()), params[:, :4])
    s = dist.sample(jax.random.key(0))
    assert s.shape == (2, 4, 4, 4)
    # logvar=0 -> std=1; sample differs from mean
    assert not np.allclose(np.asarray(s), params[:, :4])


def test_gaussian_kl_standard_normal():
    # mean 0, logvar 0 -> KL(N(0,1) || N(0,1)) = 0
    params = np.zeros((2, 8, 4, 4), dtype=np.float32)
    dist = DiagonalGaussianDistribution(jnp.asarray(params))
    np.testing.assert_allclose(np.asarray(dist.kl()), 0.0, atol=1e-6)
    # known value: mean=1, var=1 -> 0.5 * sum(1) per element
    params[:, :4] = 1.0
    dist = DiagonalGaussianDistribution(jnp.asarray(params))
    np.testing.assert_allclose(np.asarray(dist.kl()), 0.5 * 4 * 4 * 4, atol=1e-4)


def test_gaussian_nll_matches_formula(rng):
    params = rng.standard_normal((1, 2, 2, 2)).astype(np.float32)
    dist = DiagonalGaussianDistribution(jnp.asarray(params))
    x = rng.standard_normal((1, 1, 2, 2)).astype(np.float32)
    nll = float(dist.nll(jnp.asarray(x))[0])
    mean, logvar = params[:, :1], np.clip(params[:, 1:], -30, 20)
    expected = 0.5 * np.sum(np.log(2 * np.pi) + logvar +
                            (x - mean) ** 2 / np.exp(logvar))
    assert nll == pytest.approx(expected, rel=1e-4)


def test_normal_kl_zero():
    z = jnp.zeros((3,))
    np.testing.assert_allclose(np.asarray(normal_kl(z, z, z, z)), 0.0)


# ------------------------------------------------------------ shapes
SMALL = dict(in_channels=1, out_channels=1, block_out_channels=(32, 64),
             layers_per_block=1, latent_channels=4, norm_num_groups=32)


def test_autoencoder_kl_shapes(rng):
    model = AutoencoderKL(**SMALL)
    x = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    posterior = model.apply(variables, x, method=model.encode)
    assert posterior.mean.shape == (2, 4, 16, 16)  # one downsample (2 blocks)
    recon = model.apply(variables, posterior.mode(), method=model.decode)
    assert recon.shape == (2, 1, 32, 32)
    out, post = model.apply(variables, x, return_posterior=True)
    assert out.shape == (2, 1, 32, 32)


def test_autoencoder_kl_384_to_48_shape_chain(rng):
    """The reference's MAIN VAE geometry: full-res SEVIR 384^2 frames ->
    4x48x48 latents (reference autoencoder_kl.py:80-113 + full-res preset
    sevir/sevir.py:1111-1130). 4 blocks = 3 downsamples = /8 spatially; the
    experiments/vae_sevir384 config must produce exactly this chain (tiny
    widths here — the chain depends on block COUNT, not width)."""
    model = AutoencoderKL(in_channels=1, out_channels=1,
                          block_out_channels=(8, 8, 8, 8),
                          layers_per_block=1, latent_channels=4,
                          norm_num_groups=4, remat=True)
    x = jnp.asarray(rng.random((1, 1, 384, 384)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    posterior = model.apply(variables, x, method=model.encode)
    assert posterior.mean.shape == (1, 4, 48, 48)
    recon = model.apply(variables, posterior.mode(), method=model.decode)
    assert recon.shape == (1, 1, 384, 384)


# ------------------------------------------------------------ torch parity
@pytest.mark.parametrize("seed", [0])
def test_fp32_parity_with_torch_reference(seed, rng):
    """Same weights, same input -> same moments and reconstruction (fp32).

    This is THE gate for loading reference-pretrained VAEs: conv layout
    transposes, GroupNorm eps, attention scaling, asymmetric downsample
    padding all must line up.
    """
    torch = pytest.importorskip("torch")
    from pipeline.models.autoencoderkl.autoencoder_kl import (
        AutoencoderKL as TorchAKL)

    torch.manual_seed(seed)
    tmodel = TorchAKL(in_channels=1, out_channels=1,
                      down_block_types=("DownEncoderBlock2D",) * 2,
                      up_block_types=("UpDecoderBlock2D",) * 2,
                      block_out_channels=(32, 64), layers_per_block=1,
                      latent_channels=4, norm_num_groups=32).eval()

    model = AutoencoderKL(**SMALL)
    state_dict = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = from_torch_state_dict(model, state_dict,
                                      example_shape=(1, 1, 32, 32))

    x = rng.random((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_post = tmodel.encode(torch.from_numpy(x))
        t_moments = t_post.parameters.numpy()
        t_recon = tmodel.decode(t_post.mode()).numpy()

    j_post = model.apply(variables, jnp.asarray(x), method=model.encode)
    j_moments = np.asarray(j_post.parameters)
    np.testing.assert_allclose(j_moments, t_moments, atol=2e-4, rtol=1e-3)

    j_recon = np.asarray(model.apply(variables, j_post.mode(),
                                     method=model.decode))
    np.testing.assert_allclose(j_recon, t_recon, atol=5e-4, rtol=1e-3)


def test_from_torch_rejects_missing_keys(rng):
    torch = pytest.importorskip("torch")
    from pipeline.models.autoencoderkl.autoencoder_kl import (
        AutoencoderKL as TorchAKL)
    tmodel = TorchAKL(in_channels=1, out_channels=1,
                      down_block_types=("DownEncoderBlock2D",) * 2,
                      up_block_types=("UpDecoderBlock2D",) * 2,
                      block_out_channels=(32, 64), layers_per_block=1,
                      latent_channels=4, norm_num_groups=32)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    sd.pop("quant_conv.weight")
    with pytest.raises(KeyError):
        from_torch_state_dict(AutoencoderKL(**SMALL), sd, (1, 1, 32, 32))


# ------------------------------------------------------------ FIR resampling
def test_fir_resampling(rng):
    import jax.numpy as jnp
    from weatherforecastingtoolkit_tpu.models.vae.blocks import (
        fir_downsample_2d, fir_upsample_2d)

    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    assert fir_upsample_2d(x).shape == (1, 16, 16, 3)
    assert fir_downsample_2d(x).shape == (1, 4, 4, 3)
    # normalized kernels preserve constant fields (away from borders)
    c = jnp.ones((1, 8, 8, 2))
    up = np.asarray(fir_upsample_2d(c))[0, 2:-2, 2:-2]
    dn = np.asarray(fir_downsample_2d(c))[0, 1:-1, 1:-1]
    np.testing.assert_allclose(up, 1.0, atol=1e-6)
    np.testing.assert_allclose(dn, 1.0, atol=1e-6)
