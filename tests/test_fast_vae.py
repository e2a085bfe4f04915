"""pixel_unshuffle serving-VAE geometry: the lossless space-to-depth stem
(models/common.py) must keep encode/decode an exact shape roundtrip, train
(gradients flow to every param), and compose with `scales`. Motivated by the
round-3 s2d measurement (experiments/perf/space_to_depth.py): no conv should
run at full resolution on the serving path."""

import jax
import jax.numpy as jnp
import numpy as np

from weatherforecastingtoolkit_tpu.models.common import (depth_to_space,
                                                         space_to_depth)
from weatherforecastingtoolkit_tpu.models.vae.autoencoder_kl import AutoencoderKL


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 3)),
                    jnp.float32)
    for f in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x, f), f)),
            np.asarray(x))
    # channel order contract: subpixel (u, v) of pixel block -> channel
    # (u*f + v)*C + c (matches experiments/perf/space_to_depth.py)
    f = 2
    packed = space_to_depth(x, f)
    np.testing.assert_array_equal(np.asarray(packed[:, :, :, 3:6]),
                                  np.asarray(x[:, ::2, 1::2, :]))


def test_pixel_unshuffle_vae_shapes_and_grads():
    # f=4 stem + one conv downsample: 32 -> 8 latent, no full-res convs
    vae = AutoencoderKL(in_channels=1, out_channels=1, pixel_unshuffle=4,
                        block_out_channels=(8, 16), layers_per_block=1,
                        latent_channels=2, norm_num_groups=4)
    x = jnp.asarray(np.random.default_rng(1).random((2, 1, 32, 32)),
                    jnp.float32)
    variables = vae.init(jax.random.key(0), x)
    post = vae.apply(variables, x, method=vae.encode)
    z = post.mode()
    assert z.shape == (2, 2, 4, 4)  # 32 / (4 stem * 2 conv down)
    recon = vae.apply(variables, z, method=vae.decode)
    assert recon.shape == x.shape
    # conv_in contracts the packed 16 input channels, not 1
    assert variables["params"]["encoder"]["conv_in"]["kernel"].shape[2] == 16

    def loss(v):
        return jnp.mean((vae.apply(v, x) - x) ** 2)

    grads = jax.grad(loss)(variables)
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) >= len(norms) - 2  # all-but-bias flow


def test_pixel_unshuffle_composes_with_scales():
    # f=2 stem + a stride-4 stacked resampler: 64 -> 32 -> 8
    vae = AutoencoderKL(in_channels=1, out_channels=1, pixel_unshuffle=2,
                        block_out_channels=(8, 16), layers_per_block=1,
                        latent_channels=2, norm_num_groups=4, scales=(4, 2))
    x = jnp.asarray(np.random.default_rng(2).random((1, 1, 64, 64)),
                    jnp.float32)
    variables = vae.init(jax.random.key(0), x)
    z = vae.apply(variables, x, method=vae.encode).mode()
    assert z.shape == (1, 2, 8, 8)
    assert vae.apply(variables, z, method=vae.decode).shape == x.shape
