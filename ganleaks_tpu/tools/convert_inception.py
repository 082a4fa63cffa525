"""Converter: torchvision ``inception_v3`` state dict -> Flax param npz.

Gives standard-FID numbers when the user supplies the torchvision weights
file (zero-egress images can't download it; the surrogate-weights FID is
still a valid relative metric within one backbone).

Usage:
    python -m ganleaks_tpu.tools.convert_inception \
        --state_dict inception_v3_google.pth --out inception_pool3.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def convert_state_dict(sd: dict) -> dict:
    """Map ``<block>.<branch>.conv.weight`` (OIHW) / ``.bn.*`` onto the
    Flax tree of ``ops/inception.py`` (same module names)."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, val in sd.items():
        parts = key.split(".")
        # fc / AuxLogits are not part of the pool_3 tower
        if parts[0] in ("fc", "AuxLogits"):
            continue
        v = val.detach().cpu().numpy() if hasattr(val, "detach") \
            else np.asarray(val)
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-2] + ["conv"], v.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            name = parts[-1]
            if name == "weight":
                put(params, parts[:-2] + ["bn", "scale"], v)
            elif name == "bias":
                put(params, parts[:-2] + ["bn", "bias"], v)
            elif name == "running_mean":
                put(stats, parts[:-2] + ["bn", "mean"], v)
            elif name == "running_var":
                put(stats, parts[:-2] + ["bn", "var"], v)
    return {"params": params, "batch_stats": stats}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state_dict", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    from ganleaks_tpu.utils.checkpoint import save_params_npz

    sd = torch.load(args.state_dict, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    variables = convert_state_dict(sd)
    save_params_npz(args.out, variables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
