"""SqueezeNet1.1 / ResNet18 LPIPS towers vs hand-built torch oracles.

Completes the reference's DistModel backbone surface
(``pretrained_networks.py:5-53`` squeezenet slicing into SEVEN taps,
``:138-180`` resnet18 tap points). The oracles re-implement the
torchvision forward from functional ops with shared random weights; the
resnet test also exercises the converter's eval-mode BatchNorm folding.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from ganleaks_tpu.ops.lpips import init_lpips_params, lpips_pair, pnet_pair
from ganleaks_tpu.ops.lpips.backbones import (
    SQUEEZE_CHNS,
    RESNET18_CHNS,
    backbone_channels,
    backbone_features,
)
from ganleaks_tpu.tools.convert_lpips import convert_backbone_state_dict


def _t(rng, *shape):
    return torch.from_numpy(
        (rng.standard_normal(shape) * 0.1).astype(np.float32))


# ---------------------------------------------------------------------------
# squeezenet1_1
# ---------------------------------------------------------------------------

def _squeeze_state_dict(rng):
    sd = {"features.0.weight": _t(rng, 64, 3, 3, 3),
          "features.0.bias": _t(rng, 64)}
    fire_specs = {3: (64, 16, 64, 64), 4: (128, 16, 64, 64),
                  6: (128, 32, 128, 128), 7: (256, 32, 128, 128),
                  9: (256, 48, 192, 192), 10: (384, 48, 192, 192),
                  11: (384, 64, 256, 256), 12: (512, 64, 256, 256)}
    for i, (cin, sq, e1, e3) in fire_specs.items():
        sd[f"features.{i}.squeeze.weight"] = _t(rng, sq, cin, 1, 1)
        sd[f"features.{i}.squeeze.bias"] = _t(rng, sq)
        sd[f"features.{i}.expand1x1.weight"] = _t(rng, e1, sq, 1, 1)
        sd[f"features.{i}.expand1x1.bias"] = _t(rng, e1)
        sd[f"features.{i}.expand3x3.weight"] = _t(rng, e3, sq, 3, 3)
        sd[f"features.{i}.expand3x3.bias"] = _t(rng, e3)
    return sd


def _torch_squeeze_taps(sd, x):
    def fire(h, i):
        s = F.relu(F.conv2d(h, sd[f"features.{i}.squeeze.weight"],
                            sd[f"features.{i}.squeeze.bias"]))
        e1 = F.relu(F.conv2d(s, sd[f"features.{i}.expand1x1.weight"],
                             sd[f"features.{i}.expand1x1.bias"]))
        e3 = F.relu(F.conv2d(s, sd[f"features.{i}.expand3x3.weight"],
                             sd[f"features.{i}.expand3x3.bias"], padding=1))
        return torch.cat([e1, e3], dim=1)

    taps = []
    h = F.relu(F.conv2d(x, sd["features.0.weight"], sd["features.0.bias"],
                        stride=2))
    taps.append(h)                                   # slice1
    h = F.max_pool2d(h, 3, 2, ceil_mode=True)
    h = fire(fire(h, 3), 4)
    taps.append(h)                                   # slice2
    h = F.max_pool2d(h, 3, 2, ceil_mode=True)
    h = fire(fire(h, 6), 7)
    taps.append(h)                                   # slice3
    h = F.max_pool2d(h, 3, 2, ceil_mode=True)
    h = fire(h, 9)
    taps.append(h)                                   # slice4
    h = fire(h, 10)
    taps.append(h)                                   # slice5
    h = fire(h, 11)
    taps.append(h)                                   # slice6
    h = fire(h, 12)
    taps.append(h)                                   # slice7
    return taps


def test_squeeze_tower_matches_torch(rng):
    sd = _squeeze_state_dict(rng)
    convs = convert_backbone_state_dict(sd, "squeeze")
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = _torch_squeeze_taps(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = backbone_features(convs, jnp.asarray(x), "squeeze")
    assert backbone_channels("squeeze") == SQUEEZE_CHNS
    assert len(out) == len(ref) == 7
    for o, r, c in zip(out, ref, SQUEEZE_CHNS):
        assert o.shape[-1] == c
        np.testing.assert_allclose(np.asarray(o),
                                   r.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)


def test_squeeze_lpips_pair_runs_with_seven_lins(rng):
    params = init_lpips_params(0, "squeeze")
    assert len(params["lins"]) == 7
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d = np.asarray(lpips_pair(params, x, y))
    assert d.shape == (2,) and (d >= 0).all()
    assert np.asarray(lpips_pair(params, x, x)).max() < 1e-10


# ---------------------------------------------------------------------------
# resnet18 (+ BatchNorm folding)
# ---------------------------------------------------------------------------

def _resnet_state_dict(rng):
    sd = {"conv1.weight": _t(rng, 64, 3, 7, 7)}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = _t(rng, c).abs() + 0.5
        sd[f"{prefix}.bias"] = _t(rng, c)
        sd[f"{prefix}.running_mean"] = _t(rng, c)
        sd[f"{prefix}.running_var"] = _t(rng, c).abs() + 0.5

    bn("bn1", 64)
    cin = 64
    for layer, cout in (("layer1", 64), ("layer2", 128),
                        ("layer3", 256), ("layer4", 512)):
        for b in range(2):
            pre = f"{layer}.{b}"
            c_from = cin if b == 0 else cout
            sd[f"{pre}.conv1.weight"] = _t(rng, cout, c_from, 3, 3)
            bn(f"{pre}.bn1", cout)
            sd[f"{pre}.conv2.weight"] = _t(rng, cout, cout, 3, 3)
            bn(f"{pre}.bn2", cout)
            if b == 0 and c_from != cout:
                sd[f"{pre}.downsample.0.weight"] = _t(rng, cout, c_from,
                                                      1, 1)
                bn(f"{pre}.downsample.1", cout)
        cin = cout
    return sd


def _torch_resnet_taps(sd, x):
    def bn(h, prefix):
        return F.batch_norm(h, sd[f"{prefix}.running_mean"],
                            sd[f"{prefix}.running_var"],
                            sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
                            training=False, eps=1e-5)

    def block(h, pre, stride):
        y = F.relu(bn(F.conv2d(h, sd[f"{pre}.conv1.weight"], stride=stride,
                               padding=1), f"{pre}.bn1"))
        y = bn(F.conv2d(y, sd[f"{pre}.conv2.weight"], padding=1),
               f"{pre}.bn2")
        if f"{pre}.downsample.0.weight" in sd:
            h = bn(F.conv2d(h, sd[f"{pre}.downsample.0.weight"],
                            stride=stride), f"{pre}.downsample.1")
        return F.relu(y + h)

    taps = []
    h = F.relu(bn(F.conv2d(x, sd["conv1.weight"], stride=2, padding=3),
                  "bn1"))
    taps.append(h)
    h = F.max_pool2d(h, 3, 2, padding=1)
    for layer, first_stride in (("layer1", 1), ("layer2", 2),
                                ("layer3", 2), ("layer4", 2)):
        h = block(h, f"{layer}.0", first_stride)
        h = block(h, f"{layer}.1", 1)
        taps.append(h)
    return taps


def test_resnet18_tower_matches_torch_with_bn_folding(rng):
    sd = _resnet_state_dict(rng)
    convs = convert_backbone_state_dict(sd, "resnet18")
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = _torch_resnet_taps(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = backbone_features(convs, jnp.asarray(x), "resnet18")
    assert backbone_channels("resnet18") == RESNET18_CHNS
    assert len(out) == len(ref) == 5
    for o, r, c in zip(out, ref, RESNET18_CHNS):
        assert o.shape[-1] == c
        rn = r.numpy().transpose(0, 2, 3, 1)
        # folding reorders the BN affine math; unnormalized random-weight
        # activations grow to O(100s), so tolerate f32 noise relative to
        # the layer's scale (real towers renormalize per tap anyway)
        np.testing.assert_allclose(np.asarray(o), rn, rtol=1e-3,
                                   atol=1e-4 * max(1.0, np.abs(rn).max()))


def test_resnet18_pnet_cosine_distance(rng):
    """The resnet backbone feeds the uncalibrated 'net' (cosine) DistModel
    branch (``networks_basic.PNet``, ``pretrained_networks.py:138-180``)."""
    params = init_lpips_params(0, "resnet18")
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d = np.asarray(pnet_pair(params, x, y))
    assert d.shape == (2,) and (d > 0).all()
    assert abs(float(np.asarray(pnet_pair(params, x, x))[0])) < 1e-5
