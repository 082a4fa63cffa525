"""Feature-tower backbones for LPIPS (VGG16 / AlexNet / SqueezeNet1.1 /
ResNet18), pure-function JAX.

Reproduces the torchvision slicing of
``attack_models/lpips_pytorch/models/pretrained_networks.py``:

* vgg16 taps after features[3, 8, 15, 22, 29] -> relu1_2, relu2_2, relu3_3,
  relu4_3, relu5_3 with channels (64, 128, 256, 512, 512)
  (``pretrained_networks.py:96-134``; channel list
  ``networks_basic.py:91``);
* alexnet taps after features[1, 4, 7, 9, 11] with channels
  (64, 192, 384, 256, 256) (``pretrained_networks.py:56-94``);
* squeezenet1_1 sliced into SEVEN taps after features[1, 4, 7, 9, 10, 11,
  12] with channels (64, 128, 256, 384, 384, 512, 512)
  (``pretrained_networks.py:5-53``; ``networks_basic.py:95-96,110-113``);
* resnet18 tapped at (post-relu conv1, layer1..layer4) with channels
  (64, 64, 128, 256, 512) (``pretrained_networks.py:138-180``) — used by
  the uncalibrated 'net' (cosine) DistModel branch. BatchNorms run in eval
  mode and are FOLDED into the preceding conv at conversion/init time
  (inference-only tower), so parameters stay a flat conv list.

Parameters are a plain list of ``{"kernel": HWIO, "bias": (O,)}`` dicts —
loaded from a converted torchvision checkpoint
(``tools/convert_lpips.py``) or seeded randomly (no-network environments).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# Legacy linear specs: (out_ch, kernel, stride, pad) per conv; 'M'/'M3' =
# max-pool 2x2 / 3x3-s2. Tap indices refer to positions in the conv list
# after which features are collected (post-ReLU).
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

# Structured element specs for the non-linear towers. Elements:
#   ("conv", out, k, s, p)      conv + bias + relu
#   ("fire", sq, e1, e3)        squeeze 1x1 -> relu -> concat(expand1x1,
#                               expand3x3 pad1) each + relu (3 convs)
#   ("resblock", out, s, down)  BasicBlock: conv3x3(s)-relu-conv3x3 + skip
#                               (1x1 downsample conv when ``down``), relu
#   ("maxpool", k, s, mode)     mode 'ceil' (torch ceil_mode=True) or
#                               'pad1' (torch padding=1); -inf padding
#   ("tap",)                    collect the current activation
SQUEEZE_ELEMS = [
    ("conv", 64, 3, 2, 0), ("tap",),
    ("maxpool", 3, 2, "ceil"),
    ("fire", 16, 64, 64),
    ("fire", 16, 64, 64), ("tap",),
    ("maxpool", 3, 2, "ceil"),
    ("fire", 32, 128, 128),
    ("fire", 32, 128, 128), ("tap",),
    ("maxpool", 3, 2, "ceil"),
    ("fire", 48, 192, 192), ("tap",),
    ("fire", 48, 192, 192), ("tap",),
    ("fire", 64, 256, 256), ("tap",),
    ("fire", 64, 256, 256), ("tap",),
]
SQUEEZE_CHNS = (64, 128, 256, 384, 384, 512, 512)

RESNET18_ELEMS = [
    ("conv", 64, 7, 2, 3), ("tap",),
    ("maxpool", 3, 2, "pad1"),
    ("resblock", 64, 1, False), ("resblock", 64, 1, False), ("tap",),
    ("resblock", 128, 2, True), ("resblock", 128, 1, False), ("tap",),
    ("resblock", 256, 2, True), ("resblock", 256, 1, False), ("tap",),
    ("resblock", 512, 2, True), ("resblock", 512, 1, False), ("tap",),
]
RESNET18_CHNS = (64, 64, 128, 256, 512)


def _legacy_elems(convs, taps):
    elems = []
    ci = 0
    for layer in convs:
        if layer == "M":
            elems.append(("maxpool", 2, 2, "none"))
            continue
        if layer == "M3":
            elems.append(("maxpool", 3, 2, "none"))
            continue
        elems.append(("conv",) + tuple(layer))
        if ci in taps:
            elems.append(("tap",))
        ci += 1
    return elems


def _elems(net: str):
    if net in ("vgg", "vgg16"):
        return _legacy_elems(VGG16_CONVS, VGG16_TAPS), VGG16_CHNS
    if net == "alex":
        return _legacy_elems(ALEXNET_CONVS, ALEXNET_TAPS), ALEXNET_CHNS
    if net == "squeeze":
        return SQUEEZE_ELEMS, SQUEEZE_CHNS
    if net in ("resnet", "resnet18"):
        return RESNET18_ELEMS, RESNET18_CHNS
    raise ValueError(f"unknown LPIPS backbone {net!r}")


def backbone_channels(net: str) -> tuple[int, ...]:
    return _elems(net)[1]


def _conv_shapes(net: str, in_ch: int = 3):
    """(k, k, in, out) kernel shapes, flat, in forward traversal order."""
    elems, _ = _elems(net)
    shapes = []
    c = in_ch
    for el in elems:
        kind = el[0]
        if kind == "conv":
            out, k = el[1], el[2]
            shapes.append((k, k, c, out))
            c = out
        elif kind == "fire":
            sq, e1, e3 = el[1], el[2], el[3]
            shapes.append((1, 1, c, sq))
            shapes.append((1, 1, sq, e1))
            shapes.append((3, 3, sq, e3))
            c = e1 + e3
        elif kind == "resblock":
            out, _s, down = el[1], el[2], el[3]
            shapes.append((3, 3, c, out))
            shapes.append((3, 3, out, out))
            if down:
                shapes.append((1, 1, c, out))
            c = out
    return shapes


def init_backbone_params(key: Array, net: str,
                         in_ch: int = 3) -> list[dict]:
    """Deterministic (seeded) surrogate weights with torch's default conv
    init scale — used when pretrained torchvision weights are unavailable
    (zero-egress environments). Functionally the full LPIPS pipeline; swap
    in converted real weights via ``tools/convert_lpips.py`` for
    perceptual fidelity."""
    params = []
    for (k, _k, c, out) in _conv_shapes(net, in_ch):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / (c * k * k) ** 0.5
        params.append({
            "kernel": jax.random.uniform(k1, (k, k, c, out),
                                         jnp.float32, -bound, bound),
            "bias": jax.random.uniform(k2, (out,), jnp.float32,
                                       -bound, bound),
        })
    return params


def _conv(x: Array, p: dict, s: int, pad: int) -> Array:
    x = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=(s, s),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + p["bias"].astype(x.dtype)


def _maxpool(x: Array, k: int, s: int, mode: str) -> Array:
    if mode == "ceil":
        # torch ceil_mode=True: pad right/bottom with -inf so the last
        # (partial) window is kept
        h, w = x.shape[1], x.shape[2]
        pr = max(0, (-(h - k) % s) if (h - k) % s else 0)
        pc = max(0, (-(w - k) % s) if (w - k) % s else 0)
        if pr or pc:
            x = jnp.pad(x, ((0, 0), (0, pr), (0, pc), (0, 0)),
                        constant_values=-jnp.inf)
    elif mode == "pad1":
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s))


def backbone_features(params: list[dict], x: Array,
                      net: str) -> list[Array]:
    """Forward through the tower, returning the post-ReLU taps.

    x: NHWC, already shift/scale-normalized (see ``lpips.py``).
    """
    elems, _ = _elems(net)
    feats = []
    pi = 0
    for el in elems:
        kind = el[0]
        if kind == "tap":
            feats.append(x)
        elif kind == "maxpool":
            x = _maxpool(x, el[1], el[2], el[3])
        elif kind == "conv":
            x = nn.relu(_conv(x, params[pi], el[3], el[4]))
            pi += 1
        elif kind == "fire":
            sq = nn.relu(_conv(x, params[pi], 1, 0))
            e1 = nn.relu(_conv(sq, params[pi + 1], 1, 0))
            e3 = nn.relu(_conv(sq, params[pi + 2], 1, 1))
            x = jnp.concatenate([e1, e3], axis=-1)
            pi += 3
        elif kind == "resblock":
            _out, s, down = el[1], el[2], el[3]
            y = nn.relu(_conv(x, params[pi], s, 1))
            y = _conv(y, params[pi + 1], 1, 1)
            pi += 2
            identity = x
            if down:
                identity = _conv(x, params[pi], s, 0)
                pi += 1
            x = nn.relu(y + identity)
    return feats
