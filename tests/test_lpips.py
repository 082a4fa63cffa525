"""LPIPS parity vs a hand-built torch oracle, and the embedding
factorization identity that powers the matmul attack.

The oracle re-implements the reference's inference path
(``networks_basic.py:134-181`` + ``pretrained_networks.py:96-134``) from
torch functional ops with shared random weights — torchvision's pretrained
download is unavailable offline, and weight values don't change the math.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from ganleaks_tpu.ops.distance import make_embed_fn
from ganleaks_tpu.ops.lpips import (
    default_lpips_params,
    init_lpips_params,
    lpips_embed,
    lpips_embed_fn,
    lpips_pair,
    reference_lin_weights,
)
from ganleaks_tpu.ops.lpips.backbones import (
    ALEXNET_CONVS,
    VGG16_CONVS,
    backbone_channels,
)

SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def make_shared_params(rng, net):
    """Random conv weights in both layouts + positive lin heads."""
    convs_spec = VGG16_CONVS if net == "vgg" else ALEXNET_CONVS
    torch_convs, jax_convs = [], []
    c = 3
    for layer in convs_spec:
        if isinstance(layer, str):
            continue
        out, k, s, p = layer
        w = (rng.standard_normal((out, c, k, k)) * 0.1).astype(np.float32)
        b = (rng.standard_normal(out) * 0.1).astype(np.float32)
        torch_convs.append((torch.from_numpy(w), torch.from_numpy(b), s, p))
        jax_convs.append({"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                          "bias": jnp.asarray(b)})
        c = out
    lins = [rng.random(ch).astype(np.float32)
            for ch in backbone_channels(net)]
    params = {"net": net, "convs": jax_convs,
              "lins": [jnp.asarray(l) for l in lins]}
    return params, torch_convs, lins


def torch_lpips_oracle(torch_convs, lins, net, x, y):
    """networks_basic.PNetLin.forward, faithfully."""
    def tower(t):
        feats = []
        if net == "vgg":
            pool_after = {1, 3, 6, 9}     # pool after these conv indices
            taps = {1, 3, 6, 9, 12}
            pool_k = 2
        else:
            pool_after = {0, 1}
            taps = {0, 1, 2, 3, 4}
            pool_k = 3
        h = t
        for i, (w, b, s, p) in enumerate(torch_convs):
            h = F.relu(F.conv2d(h, w, b, stride=s, padding=p))
            if i in taps:
                feats.append(h)
            if i in pool_after:
                h = F.max_pool2d(h, pool_k, 2)
        return feats

    x_sc = (x - SHIFT) / SCALE
    y_sc = (y - SHIFT) / SCALE
    fx, fy = tower(x_sc), tower(y_sc)
    val = 0.0
    for fl_x, fl_y, w in zip(fx, fy, lins):
        def normalize(f):
            n = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True))
            return f / (n + 1e-10)
        diff = (normalize(fl_x) - normalize(fl_y)) ** 2
        lin = F.conv2d(diff, torch.from_numpy(w).view(1, -1, 1, 1))
        val = val + torch.mean(torch.mean(lin, dim=3), dim=2)
    return val.view(-1)


@pytest.mark.parametrize("net", ["vgg", "alex"])
def test_lpips_pair_matches_torch_oracle(rng, net):
    params, torch_convs, lins = make_shared_params(rng, net)
    x = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)

    ref = torch_lpips_oracle(
        torch_convs, lins, net,
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(lpips_pair(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_embedding_factorization_identity(rng):
    """||phi(x) - phi(y)||^2 == LPIPS(x, y) exactly (the attack's core
    algebraic identity)."""
    params, _, _ = make_shared_params(rng, "vgg")
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    pair = np.asarray(lpips_pair(params, jnp.asarray(x), jnp.asarray(y)))
    px = np.asarray(lpips_embed(params, jnp.asarray(x)))
    py = np.asarray(lpips_embed(params, jnp.asarray(y)))
    emb = np.sum((px - py) ** 2, axis=1)
    np.testing.assert_allclose(emb, pair, rtol=1e-5, atol=1e-7)


def test_l2_lpips_combined_distance(rng):
    """'l2-lpips' embedding distance == mean-square-pixel + 0.2*LPIPS
    (``attack_models/utils.py:171-177``)."""
    params, _, _ = make_shared_params(rng, "vgg")
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    expected = (np.mean((y - x) ** 2, axis=(1, 2, 3))
                + 0.2 * np.asarray(lpips_pair(params, xj, yj)))
    embed = make_embed_fn("l2-lpips", lpips_embed_fn(params, weight=0.2))
    d = np.sum((np.asarray(embed(xj)) - np.asarray(embed(yj))) ** 2, axis=1)
    np.testing.assert_allclose(d, expected, rtol=1e-5, atol=1e-6)


def test_pnet_cosine_matches_torch_oracle(rng):
    """Uncalibrated 'net' distance: sum_l (1 - mean cos_sim)
    (``networks_basic.py:51-73``)."""
    from ganleaks_tpu.ops.lpips import pnet_pair

    params, torch_convs, _lins = make_shared_params(rng, "vgg")
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(y.transpose(0, 3, 1, 2))

    def tower(t):
        feats = []
        pool_after = {1, 3, 6, 9}
        taps = {1, 3, 6, 9, 12}
        h = (t - SHIFT) / SCALE
        for i, (w, b, s, p) in enumerate(torch_convs):
            h = F.relu(F.conv2d(h, w, b, stride=s, padding=p))
            if i in taps:
                feats.append(h)
            if i in pool_after:
                h = F.max_pool2d(h, 2, 2)
        return feats

    def normalize(f):
        return f / (torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True))
                    + 1e-10)

    val = 0.0
    for a, b in zip(tower(xt), tower(yt)):
        cos = torch.sum(normalize(a) * normalize(b), dim=1)
        val = val + (1.0 - cos.mean(dim=(1, 2)))
    out = np.asarray(pnet_pair(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(out, val.numpy(), rtol=1e-4, atol=1e-5)


def test_convert_lpips_state_dict_roundtrip(rng, tmp_path):
    """tools/convert_lpips: a torchvision-style vgg16 state dict + lin .pth
    must produce params whose lpips_pair matches the torch oracle."""
    import torch

    from ganleaks_tpu.ops.lpips.lpips import load_lpips_params, save_lpips_params
    from ganleaks_tpu.tools.convert_lpips import (
        VGG16_FEATURE_IDX,
        convert_backbone_state_dict,
        convert_lin_state_dict,
    )

    params, torch_convs, lins = make_shared_params(rng, "vgg")

    # fabricate the torchvision state dict from the same weights
    sd = {}
    for idx, (w, b, _s, _p) in zip(VGG16_FEATURE_IDX, torch_convs):
        sd[f"features.{idx}.weight"] = w
        sd[f"features.{idx}.bias"] = b
    lin_sd = {f"lin{i}.model.1.weight":
              torch.from_numpy(l).view(1, -1, 1, 1)
              for i, l in enumerate(lins)}

    conv_params = convert_backbone_state_dict(sd, "vgg")
    lin_params = convert_lin_state_dict(lin_sd)
    converted = {"net": "vgg", "convs": conv_params,
                 "lins": [jnp.asarray(l) for l in lin_params]}

    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(lpips_pair(params, jnp.asarray(x), jnp.asarray(y)))
    out = np.asarray(lpips_pair(converted, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)

    # npz round trip
    path = str(tmp_path / "lp.npz")
    save_lpips_params(path, converted)
    reloaded = load_lpips_params(path)
    out2 = np.asarray(lpips_pair(reloaded, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(out2, ref, rtol=1e-6, atol=1e-7)


def test_bundled_reference_lin_weights_load():
    lins = reference_lin_weights("vgg")
    assert [l.shape[0] for l in lins] == [64, 128, 256, 512, 512]
    assert all((l > 0).all() for l in lins)
    params = default_lpips_params("vgg")
    assert params["lins"][0].shape == (64,)
    # usable end to end
    x = jnp.zeros((1, 64, 64, 3))
    assert lpips_pair(params, x, x).shape == (1,)
