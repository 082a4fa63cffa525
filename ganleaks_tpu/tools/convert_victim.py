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


# --- PGGAN (gen.state_dict() / critic.state_dict(), pggan/train.py:201-206) --

def _wsconv(sd: dict, prefix: str) -> dict:
    """``WSConv2d`` (``pggan/model_torch.py:8-22``): the scaled conv's
    weight lives at ``.conv.weight`` (OIHW, bias removed) and the raw bias
    is re-registered on the wrapper as ``.bias``."""
    return {"conv": {"kernel":
                     _np(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0)},
            "bias": _np(sd[f"{prefix}.bias"])}


def _convblock(sd: dict, prefix: str) -> dict:
    return {"conv1": _wsconv(sd, f"{prefix}.conv1"),
            "conv2": _wsconv(sd, f"{prefix}.conv2")}


def _n_rgb(sd: dict) -> int:
    return len({k.split(".")[1] for k in sd if k.startswith("rgb_layers.")})


def convert_pggan_generator(sd: dict) -> dict:
    """-> variables for ``models.pggan.Generator``. torch layout
    (``pggan/model_torch.py:49-72``): ``initial`` Sequential holds the
    ConvTranspose at index 1 (IOHW) and a WSConv at index 3;
    ``rgb_layers.{i}`` / ``prog_blocks.{i}`` map 1:1 onto our
    ``rgb{i}`` / ``prog{i}`` module names."""
    params: dict = {
        "initial_convt": {
            "kernel": _np(sd["initial.1.weight"]).transpose(2, 3, 0, 1),
            "bias": _np(sd["initial.1.bias"])},
        "initial_conv": _wsconv(sd, "initial.3"),
    }
    n = _n_rgb(sd)
    for i in range(n):
        params[f"rgb{i}"] = _wsconv(sd, f"rgb_layers.{i}")
    for i in range(n - 1):
        params[f"prog{i}"] = _convblock(sd, f"prog_blocks.{i}")
    return {"params": params}


def convert_pggan_discriminator(sd: dict) -> dict:
    """-> variables for ``models.pggan.Discriminator`` (also the privPGGAN
    ``PrivateDiscriminator`` — same trunk, wider head). torch layout
    (``pggan/model_torch.py:91-115``): ``rgb_layers``/``prog_blocks`` are
    ordered high-res -> low-res, which our module names mirror; the 4x4
    head is ``final_block.{0,2,4}``."""
    params: dict = {}
    n = _n_rgb(sd)
    for i in range(n):
        params[f"rgb{i}"] = _wsconv(sd, f"rgb_layers.{i}")
    for i in range(n - 1):
        params[f"prog{i}"] = _convblock(sd, f"prog_blocks.{i}")
    for j, i in ((1, 0), (2, 2), (3, 4)):
        params[f"final_conv{j}"] = _wsconv(sd, f"final_block.{i}")
    return {"params": params}


# --- VAE-GAN (netG / netE, vaegan/train.py:401-414) --------------------------

def _bn(sd: dict, prefix: str) -> tuple[dict, dict]:
    return ({"bn": {"scale": _np(sd[f"{prefix}.weight"]),
                    "bias": _np(sd[f"{prefix}.bias"])}},
            {"bn": {"mean": _np(sd[f"{prefix}.running_mean"]),
                    "var": _np(sd[f"{prefix}.running_var"])}})


def _sn_deconv(sd: dict, prefix: str) -> tuple[dict, dict]:
    """``SpectralNorm(ConvTranspose2d)`` (``vaegan/ops.py:23-75``): the raw
    weight is re-registered as ``weight_bar`` (IOHW) with power-iteration
    vectors ``weight_u`` (I) / ``weight_v`` (O*kh*kw)."""
    p = {"kernel": _np(sd[f"{prefix}.module.weight_bar"])
         .transpose(2, 3, 0, 1),
         "bias": _np(sd[f"{prefix}.module.bias"])}
    s = {"u": _np(sd[f"{prefix}.module.weight_u"]),
         "v": _np(sd[f"{prefix}.module.weight_v"])}
    return p, s


def _self_attention(sd: dict, prefix: str) -> dict:
    out = {}
    for conv in ("query_conv", "key_conv", "value_conv"):
        out[conv] = {"kernel":
                     _np(sd[f"{prefix}.{conv}.weight"]).transpose(2, 3, 1, 0),
                     "bias": _np(sd[f"{prefix}.{conv}.bias"])}
    out["gamma"] = _np(sd[f"{prefix}.gamma"]).reshape(1)
    return out


def convert_vaegan_generator(sd: dict) -> dict:
    """-> variables for ``models.vaegan.Generator`` (params + batch_stats +
    the 'spectral' u/v collection). torch layout: ``vaegan/train.py:110-124``."""
    params: dict = {}
    stats: dict = {}
    spectral: dict = {}
    for i in (1, 2, 3, 4):
        params[f"deconv{i}"], spectral[f"deconv{i}"] = \
            _sn_deconv(sd, f"deconv{i}")
        params[f"deconv{i}_bn"], stats[f"deconv{i}_bn"] = \
            _bn(sd, f"deconv{i}_bn")
    params["deconv5"] = {
        "kernel": _np(sd["deconv5.weight"]).transpose(2, 3, 0, 1),
        "bias": _np(sd["deconv5.bias"])}
    params["sa1"] = _self_attention(sd, "sa1")
    return {"params": params, "batch_stats": stats, "spectral": spectral}


def convert_vaegan_encoder(sd: dict) -> dict:
    """-> variables for ``models.vaegan.Encoder``
    (``vaegan/train.py:61-106``; ChannelsToLinear subclasses nn.Linear, its
    input is the NCHW-major flatten our module reproduces)."""
    params: dict = {}
    stats: dict = {}
    for i in (1, 2, 3, 4):
        params[f"cv{i}"] = {
            "kernel": _np(sd[f"cv{i}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"cv{i}.bias"])}
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"bn{i}")
    for fc in ("fc1", "fc2"):
        params[fc] = {"linear": _lin(sd, fc)}
    for fc in ("fc1_1", "fc2_1"):
        params[fc] = _lin(sd, fc)
    for bn in ("bn6", "bn7"):
        params[bn], stats[bn] = _bn(sd, bn)
    return {"params": params, "batch_stats": stats}


def _maybe_state_dict(obj):
    """The reference saves VAE-GAN nets both as state dicts inside the
    periodic checkpoint (``vaegan/train.py:401-410``) and as whole pickled
    modules ``netG.pt``/``netE.pt`` (``:412-414``)."""
    return obj.state_dict() if hasattr(obj, "state_dict") else obj


CONVERTERS = {
    ("dcgan", "generator"): convert_dcgan_generator,
    ("dcgan", "discriminator"): convert_dcgan_discriminator,
    ("wgangp", "generator"): convert_dcgan_generator,
    ("wgangp", "critic"): convert_wgangp_critic,
    ("pggan", "generator"): convert_pggan_generator,
    ("pggan", "critic"): convert_pggan_discriminator,
    ("pggan", "discriminator"): convert_pggan_discriminator,
    ("vaegan", "generator"): convert_vaegan_generator,
    ("vaegan", "encoder"): convert_vaegan_encoder,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["dcgan", "wgangp", "medgan", "pggan",
                             "vaegan"])
    ap.add_argument("--part", required=True)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    from ganleaks_tpu.utils.checkpoint import save_params_npz

    # weights_only=False: VAE-GAN's netG.pt/netE.pt are whole pickled
    # modules (vaegan/train.py:412-414), not plain state dicts
    try:
        sd = torch.load(args.pth, map_location="cpu")
    except Exception:
        sd = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = _maybe_state_dict(sd)
    if args.model == "medgan":
        variables = convert_medgan(**{f"sd_{args.part}": sd})[args.part]
    else:
        variables = CONVERTERS[(args.model, args.part)](sd)
    save_params_npz(args.out, variables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
