"""Feature-tower backbones for LPIPS (VGG16 / AlexNet), pure-function JAX.

Reproduces the torchvision slicing of
``attack_models/lpips_pytorch/models/pretrained_networks.py``:

* vgg16 taps after features[3, 8, 15, 22, 29] -> relu1_2, relu2_2, relu3_3,
  relu4_3, relu5_3 with channels (64, 128, 256, 512, 512)
  (``pretrained_networks.py:96-134``; channel list
  ``networks_basic.py:91``);
* alexnet taps after features[1, 4, 7, 9, 11] with channels
  (64, 192, 384, 256, 256) (``pretrained_networks.py:56-94``).

Parameters are a plain list of ``{"kernel": HWIO, "bias": (O,)}`` dicts —
loaded from a converted torchvision checkpoint or seeded randomly
(no-network environments).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# (out_ch, kernel, stride, pad) per conv; 'M'/'M32' = max-pool 2x2 / 3x3-s2.
# tap indices refer to positions in the conv list after which features are
# collected (post-ReLU).
VGG16_CONVS = [
    (64, 3, 1, 1), (64, 3, 1, 1), "M",
    (128, 3, 1, 1), (128, 3, 1, 1), "M",
    (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), "M",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "M",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1),
]
VGG16_TAPS = (1, 3, 6, 9, 12)      # conv-list indices (relu after these)
VGG16_CHNS = (64, 128, 256, 512, 512)

ALEXNET_CONVS = [
    (64, 11, 4, 2), "M3",
    (192, 5, 1, 2), "M3",
    (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1),
]
ALEXNET_TAPS = (0, 1, 2, 3, 4)
ALEXNET_CHNS = (64, 192, 384, 256, 256)


def _spec(net: str):
    if net in ("vgg", "vgg16"):
        return VGG16_CONVS, VGG16_TAPS, VGG16_CHNS
    if net == "alex":
        return ALEXNET_CONVS, ALEXNET_TAPS, ALEXNET_CHNS
    raise ValueError(f"unknown LPIPS backbone {net!r}")


def backbone_channels(net: str) -> tuple[int, ...]:
    return _spec(net)[2]


def init_backbone_params(key: Array, net: str,
                         in_ch: int = 3) -> list[dict]:
    """Deterministic (seeded) surrogate weights with torch's default conv
    init scale — used when pretrained torchvision weights are unavailable
    (zero-egress environments). Functionally the full LPIPS pipeline; swap
    in converted real weights via ``tools/convert_lpips_weights.py`` for
    perceptual fidelity."""
    convs, _, _ = _spec(net)
    params = []
    c = in_ch
    for layer in convs:
        if isinstance(layer, str):
            continue
        out, k, _s, _p = layer
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / (c * k * k) ** 0.5
        params.append({
            "kernel": jax.random.uniform(k1, (k, k, c, out),
                                         jnp.float32, -bound, bound),
            "bias": jax.random.uniform(k2, (out,), jnp.float32,
                                       -bound, bound),
        })
        c = out
    return params


def backbone_features(params: list[dict], x: Array,
                      net: str) -> list[Array]:
    """Forward through the tower, returning the 5 post-ReLU taps.

    x: NHWC, already shift/scale-normalized (see ``lpips.py``).
    """
    convs, taps, _ = _spec(net)
    feats = []
    ci = 0
    for layer in convs:
        if layer == "M":
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            continue
        if layer == "M3":
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            continue
        out, k, s, p = layer
        w = params[ci]["kernel"]
        b = params[ci]["bias"]
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(s, s),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + b.astype(x.dtype)
        x = nn.relu(x)
        if ci in taps:
            feats.append(x)
        ci += 1
    return feats
