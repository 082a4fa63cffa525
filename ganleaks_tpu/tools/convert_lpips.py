"""One-shot converter: torch LPIPS weights -> JAX npz.

The reference builds LPIPS from two weight sources
(``lpips_pytorch/models/dist_model.py:63-75``):

1. the torchvision backbone download (vgg16/alexnet ``features.*`` state
   dict) — requires network access the first time;
2. the 7 KB linear-head file shipped in-tree
   (``pretrained_models/v0.1/vgg.pth``: five ``lin{i}.model.1.weight``
   tensors of shape (1, C, 1, 1)).

This tool converts either/both into the npz schema of
``ops/lpips/save_lpips_params``. It reads raw state-dict files with torch
(CPU) and never imports torchvision, so it runs in zero-egress images too
(bring your own ``vgg16-*.pth``).

Usage:
    python -m ganleaks_tpu.tools.convert_lpips \
        --net vgg --backbone vgg16.pth --lin vgg_lin.pth --out lpips_vgg.npz
    # surrogate backbone (no pretrained file), real lin heads:
    python -m ganleaks_tpu.tools.convert_lpips \
        --net vgg --lin vgg_lin.pth --out lpips_vgg_surrogate.npz --seed 0
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.ops.lpips.backbones import VGG16_CONVS, ALEXNET_CONVS
from ganleaks_tpu.ops.lpips.lpips import init_lpips_params, save_lpips_params

# torchvision features.* conv indices per net
VGG16_FEATURE_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
ALEXNET_FEATURE_IDX = [0, 3, 6, 8, 10]


SQUEEZE_FIRE_IDX = [3, 4, 6, 7, 9, 10, 11, 12]  # squeezenet1_1 features


def _hwio(w: np.ndarray) -> "jnp.ndarray":
    return jnp.asarray(w.transpose(2, 3, 1, 0))


def _conv_entry(sd: dict, prefix: str) -> dict:
    return {"kernel": _hwio(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _bn_folded(sd: dict, conv_key: str, bn_key: str, eps: float = 1e-5
               ) -> dict:
    """Fold an eval-mode BatchNorm into the preceding (bias-free) conv:
    kernel' = w * gamma/sqrt(var+eps) per out channel,
    bias'   = beta - mean * gamma/sqrt(var+eps)."""
    w = _np(sd[f"{conv_key}.weight"])
    g = _np(sd[f"{bn_key}.weight"])
    b = _np(sd[f"{bn_key}.bias"])
    mu = _np(sd[f"{bn_key}.running_mean"])
    var = _np(sd[f"{bn_key}.running_var"])
    a = g / np.sqrt(var + eps)
    return {"kernel": _hwio(w * a[:, None, None, None]),
            "bias": jnp.asarray(b - mu * a)}


def convert_backbone_state_dict(sd: dict, net: str) -> list[dict]:
    """torchvision state dict -> flat HWIO conv list in forward traversal
    order (the layout of ``backbones.backbone_features``). vgg/alex read
    ``features.{i}``; squeeze reads the Fire modules' three convs each;
    resnet18 folds every BatchNorm into its conv (eval-mode inference)."""
    if net == "squeeze":
        convs = [_conv_entry(sd, "features.0")]
        for i in SQUEEZE_FIRE_IDX:
            for part in ("squeeze", "expand1x1", "expand3x3"):
                convs.append(_conv_entry(sd, f"features.{i}.{part}"))
        return convs
    if net in ("resnet", "resnet18"):
        convs = [_bn_folded(sd, "conv1", "bn1")]
        for layer, n_blocks in (("layer1", 2), ("layer2", 2),
                                ("layer3", 2), ("layer4", 2)):
            for b in range(n_blocks):
                pre = f"{layer}.{b}"
                convs.append(_bn_folded(sd, f"{pre}.conv1", f"{pre}.bn1"))
                convs.append(_bn_folded(sd, f"{pre}.conv2", f"{pre}.bn2"))
                if f"{pre}.downsample.0.weight" in sd:
                    convs.append(_bn_folded(sd, f"{pre}.downsample.0",
                                            f"{pre}.downsample.1"))
        return convs
    idxs = VGG16_FEATURE_IDX if net in ("vgg", "vgg16") else ALEXNET_FEATURE_IDX
    n_convs = len([c for c in
                   (VGG16_CONVS if net in ("vgg", "vgg16") else ALEXNET_CONVS)
                   if not isinstance(c, str)])
    assert len(idxs) == n_convs
    return [_conv_entry(sd, f"features.{i}") for i in idxs]


def convert_lin_state_dict(sd: dict) -> list[np.ndarray]:
    """``lin{i}.model.1.weight`` (1, C, 1, 1) -> (C,) vectors; warns if any
    weight is negative (would break the embedding factorization — the
    shipped v0.1 heads are all positive)."""
    lins = []
    i = 0
    while f"lin{i}.model.1.weight" in sd:
        w = _np(sd[f"lin{i}.model.1.weight"]).reshape(-1)
        if (w < 0).any():
            print(f"WARNING: lin{i} has {(w < 0).sum()} negative weights; "
                  "they will be clamped to 0 in the embedding path")
        lins.append(w)
        i += 1
    if not lins:
        raise ValueError("no lin{i}.model.1.weight keys found")
    return lins


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="vgg",
                choices=["vgg", "alex", "squeeze", "resnet18"])
    ap.add_argument("--backbone", default=None,
                    help="torchvision state-dict .pth (omit for surrogate)")
    ap.add_argument("--lin", default=None,
                    help="LPIPS lin-head .pth (e.g. the reference's vgg.pth)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0,
                    help="surrogate backbone seed when --backbone omitted")
    args = ap.parse_args()

    import torch  # local import: torch used only as a .pth reader

    lins = None
    if args.lin:
        lins = convert_lin_state_dict(
            torch.load(args.lin, map_location="cpu"))
    params = init_lpips_params(args.seed, args.net, lin_weights=lins)
    if args.backbone:
        sd = torch.load(args.backbone, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params["convs"] = convert_backbone_state_dict(sd, args.net)
    save_lpips_params(args.out, params)
    print(f"wrote {args.out} (net={args.net}, "
          f"backbone={'converted' if args.backbone else 'surrogate'})")


if __name__ == "__main__":
    main()
