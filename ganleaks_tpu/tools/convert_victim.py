"""One-shot converter: reference-trained victim checkpoints (.pth state
dicts) -> this framework's param trees.

Lets a victim trained by the reference (``generator.pth`` from
``gan_models/dcgan/train_torch.py:135`` or ``gan_models/wgangp/train.py:135``)
be sampled and attacked here for cross-validation (SURVEY §5 checkpoint
plan). The DCGAN/WGAN-GP generators share one topology
(``dcgan/model_torch.py:75-96``): a Sequential of 4 ConvT+BN+ReLU blocks and
a final ConvT, whose state-dict keys are

    gen.{i}.0.weight                    (ConvTranspose2d, IOHW)   i=0..3
    gen.{i}.1.{weight,bias,running_mean,running_var}  (BatchNorm2d)
    gen.4.{weight,bias}                 (final ConvTranspose2d)

Discriminators (``model_torch.py:25-47``):

    disc.0.{weight,bias}                (Conv2d, OIHW)
    disc.{2,3,4}.0.weight               (Conv2d, no bias)
    disc.{2,3,4}.1.{...}                (BatchNorm2d)  [InstanceNorm for
                                         wgangp: weight/bias only]
    disc.5.{weight,bias}                (head Conv2d)

Usage:
    python -m ganleaks_tpu.tools.convert_victim \
        --model dcgan --part generator --pth generator.pth --out gen.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_dcgan_generator(sd: dict) -> dict:
    """-> {'params': ..., 'batch_stats': ...} for ``models.dcgan.Generator``
    (also WGAN-GP's generator — same net, ``wgangp/model.py:37-58``)."""
    params: dict = {}
    stats: dict = {}
    for i in range(4):
        w = _np(sd[f"gen.{i}.0.weight"])  # IOHW
        params[f"block{i}_conv"] = {"kernel": w.transpose(2, 3, 0, 1)}
        params[f"block{i}"] = {"bn": {
            "scale": _np(sd[f"gen.{i}.1.weight"]),
            "bias": _np(sd[f"gen.{i}.1.bias"])}}
        stats[f"block{i}"] = {"bn": {
            "mean": _np(sd[f"gen.{i}.1.running_mean"]),
            "var": _np(sd[f"gen.{i}.1.running_var"])}}
    params["to_img"] = {"kernel": _np(sd["gen.4.weight"]).transpose(2, 3, 0, 1),
                        "bias": _np(sd["gen.4.bias"])}
    return {"params": params, "batch_stats": stats}


def convert_dcgan_discriminator(sd: dict) -> dict:
    """-> variables for ``models.dcgan.Discriminator`` (BN trunk)."""
    params: dict = {}
    stats: dict = {}
    params["from_img"] = {
        "kernel": _np(sd["disc.0.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd["disc.0.bias"])}
    for j, i in enumerate((2, 3, 4)):  # Sequential indices of the blocks
        params[f"block{j}_conv"] = {
            "kernel": _np(sd[f"disc.{i}.0.weight"]).transpose(2, 3, 1, 0)}
        params[f"block{j}"] = {"bn": {
            "scale": _np(sd[f"disc.{i}.1.weight"]),
            "bias": _np(sd[f"disc.{i}.1.bias"])}}
        stats[f"block{j}"] = {"bn": {
            "mean": _np(sd[f"disc.{i}.1.running_mean"]),
            "var": _np(sd[f"disc.{i}.1.running_var"])}}
    params["head"] = {
        "kernel": _np(sd["disc.5.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd["disc.5.bias"])}
    return {"params": params, "batch_stats": stats}


def convert_wgangp_critic(sd: dict) -> dict:
    """-> variables for ``models.wgangp.Critic`` (InstanceNorm trunk —
    affine params only, no running stats)."""
    params: dict = {}
    params["from_img"] = {
        "kernel": _np(sd["disc.0.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd["disc.0.bias"])}
    for j, i in enumerate((2, 3, 4)):
        params[f"block{j}_conv"] = {
            "kernel": _np(sd[f"disc.{i}.0.weight"]).transpose(2, 3, 1, 0)}
        params[f"block{j}_in"] = {
            "scale": _np(sd[f"disc.{i}.1.weight"]),
            "bias": _np(sd[f"disc.{i}.1.bias"])}
    params["head"] = {
        "kernel": _np(sd["disc.5.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd["disc.5.bias"])}
    return {"params": params}


def convert_medgan(sd_gen: dict | None = None, sd_ae: dict | None = None,
                   sd_disc: dict | None = None) -> dict:
    """medGAN parts (``medgan/model.py``): Linear weights are (out, in) ->
    our (in, out); BN1d as above."""
    out: dict = {}
    if sd_gen is not None:
        params = {
            "block1_fc": _lin(sd_gen, "gen_block1.0"),
            "block1": {"bn": {"scale": _np(sd_gen["gen_block1.1.weight"]),
                              "bias": _np(sd_gen["gen_block1.1.bias"])}},
            "block2_fc": _lin(sd_gen, "gen_block2.0"),
            "block2": {"bn": {"scale": _np(sd_gen["gen_block2.1.weight"]),
                              "bias": _np(sd_gen["gen_block2.1.bias"])}},
        }
        stats = {
            "block1": {"bn": {
                "mean": _np(sd_gen["gen_block1.1.running_mean"]),
                "var": _np(sd_gen["gen_block1.1.running_var"])}},
            "block2": {"bn": {
                "mean": _np(sd_gen["gen_block2.1.running_mean"]),
                "var": _np(sd_gen["gen_block2.1.running_var"])}},
        }
        out["gen"] = {"params": params, "batch_stats": stats}
    if sd_ae is not None:
        out["ae"] = {"params": {
            "enc": _lin(sd_ae, "encoder.0"),
            "dec": _lin(sd_ae, "decoder.0")}}
    if sd_disc is not None:
        out["disc"] = {"params": {
            "fc1": _lin(sd_disc, "disc.0"),
            "fc2": _lin(sd_disc, "disc.2"),
            "fc3": _lin(sd_disc, "disc.4")}}
    return out


def _lin(sd: dict, prefix: str) -> dict:
    d = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        d["bias"] = _np(sd[f"{prefix}.bias"])
    return d


CONVERTERS = {
    ("dcgan", "generator"): convert_dcgan_generator,
    ("dcgan", "discriminator"): convert_dcgan_discriminator,
    ("wgangp", "generator"): convert_dcgan_generator,
    ("wgangp", "critic"): convert_wgangp_critic,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["dcgan", "wgangp", "medgan"])
    ap.add_argument("--part", required=True)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    from ganleaks_tpu.utils.checkpoint import save_params_npz

    sd = torch.load(args.pth, map_location="cpu")
    if args.model == "medgan":
        variables = convert_medgan(**{f"sd_{args.part}": sd})[args.part]
    else:
        variables = CONVERTERS[(args.model, args.part)](sd)
    save_params_npz(args.out, variables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
