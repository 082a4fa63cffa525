"""A/B adjudication of the VAE-GAN training divergence (VERDICT r4 #4).

The port's VAE-GAN goes non-finite at ~epoch 15 (78 steps/epoch, batch
64) on the round-4 fixture manifold; BASELINE.md calls that "faithful
VAE-GAN hinge instability" — but until the reference's OWN torch code is
run on the SAME data, that is an untested hypothesis which could be
hiding a port bug (spectral-norm state, ``std = exp(logvar)``
(``gan_models/vaegan/train.py:99``), hinge signs, Adam eps).

This harness drives the reference's own modules (Encoder / Generator /
DiscriminatorL / Discriminator / criterionG imported from
``/root/reference/gan_models/vaegan/train.py``) through its exact
3-phase loop semantics (``train.py:296-385``: 1 Dl step on a fresh
batch, 2 D hinge steps each on a fresh batch, 1 joint G&E step on a
fresh batch; optimizers ``train.py:279-282``) on the identical fixture
(``tools/round4_measure.make_manifold(2000, 64, seed=30)``, [-1, 1] —
the reference's ToTensor does NOT rescale float inputs, so its pixel
range is also [-1, 1], ``vaegan/utils.py:69-71``).

Per-step losses stream to a JSONL; the run stops at the first
non-finite loss or at --max_steps. Outcome feeds DIVERGENCES.md:
torch NaNs too -> divergence adjudicated as inherent instability;
torch stays finite -> the port has a bug to find.

    python tools/vaegan_ab_reference.py --max_steps 1600 \
        --out /tmp/vaegan_ab/torch_losses.jsonl
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_DIR = "/root/reference/gan_models/vaegan"


def _stub_torchvision() -> None:
    """torchvision is not in this image; the reference imports it at
    module level but this harness only needs the model classes /
    criterionG (``ToTensor``/``save_image`` are used solely inside its
    CelebaDataseat and main(), neither of which we call)."""
    import types
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.ToTensor = lambda: (lambda x: x)
    tvu = types.ModuleType("torchvision.utils")
    tvu.save_image = lambda *a, **k: None
    tv.transforms, tv.utils = tvt, tvu
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.utils"] = tvu


def load_reference_train_module():
    """Import the reference's train.py as a module (its main() only runs
    under __main__; module level is imports only). Its ``from ops/utils
    import *`` resolve against the vaegan dir."""
    _stub_torchvision()
    sys.path.insert(0, REF_DIR)
    spec = importlib.util.spec_from_file_location(
        "ref_vaegan_train", os.path.join(REF_DIR, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_steps", type=int, default=1600,
                    help="~20.5 epochs at 78 steps/epoch — past the "
                         "port's observed divergence at ~epoch 15")
    ap.add_argument("--n_images", type=int, default=2000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--z_dim", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/vaegan_ab/torch_losses.jsonl")
    args = ap.parse_args()

    import torch

    from tools.round4_measure import make_manifold

    ref = load_reference_train_module()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    device = torch.device("cpu")

    # the identical fixture the port diverged on (round4_measure
    # run_vaegan: members = make_manifold(n_m, 64, seed=30))
    members = make_manifold(args.n_images, 64, seed=30)  # NHWC [-1,1]
    data = torch.from_numpy(
        np.ascontiguousarray(members.transpose(0, 3, 1, 2)))  # NCHW

    bs, z_dim = args.batch_size, args.z_dim
    g = torch.Generator().manual_seed(args.seed)

    def batches():
        """shuffle=True, drop_last=True epoch stream (train.py:260-261)."""
        while True:
            perm = torch.randperm(len(data), generator=g)
            for i in range(len(data) // bs):
                yield data[perm[i * bs:(i + 1) * bs]]
    batch_iter = batches()

    netE = ref.Encoder(z_dim=z_dim).to(device)
    netE.apply(ref.weights_init)      # train.py:267
    netG = ref.Generator(z_dim=z_dim).to(device)
    netDl = ref.DiscriminatorL(z_dim=z_dim, ngpu=1).to(device)
    netD = ref.Discriminator().to(device)
    criterion = torch.nn.BCELoss()

    # train.py:279-282 (beta1 = 0.0, train.py:247)
    optD = torch.optim.Adam(netD.parameters(), lr=4e-4, betas=(0.0, 0.9))
    optDl = torch.optim.Adam(netDl.parameters(), lr=2e-4, betas=(0.0, 0.9))
    optG = torch.optim.Adam(netG.parameters(), lr=1e-4, betas=(0.0, 0.9))
    optE = torch.optim.Adam(netE.parameters(), lr=1e-4, betas=(0.0, 0.9))

    steps_per_epoch = 5000 // bs      # train.py:297
    t0 = time.time()
    out_f = open(args.out, "a")
    verdict = "finite"
    for step in range(args.max_steps):
        # ----- (1) Dl: encoder outputs fake(0), prior noise real(1) -----
        netDl.zero_grad()
        real_ = next(batch_iter).to(device)
        label0 = torch.full((bs,), 0.0, device=device)
        label1 = torch.full((bs,), 1.0, device=device)
        err_dl = criterion(netDl(netE(real_)), label0)
        err_dl.backward()
        err_dl2 = criterion(netDl(torch.randn(bs, z_dim, device=device)),
                            label1)
        err_dl2.backward()
        optDl.step()
        loss_dl = float(err_dl) + float(err_dl2)

        # ----- (2) D x2: hinge relu(0.5 + D(real)) + relu(0.5 - D(fake))
        loss_d = 0.0
        for _ in range(2):
            netD.zero_grad()
            real_ = next(batch_iter).to(device)
            out_real = netD(real_)
            fake = netG(torch.randn(bs, z_dim, 1, 1, device=device))
            out_fake = netD(fake.detach())
            err_real = torch.relu(0.5 + out_real).mean()
            err_real.backward()
            err_fake = torch.relu(0.5 - out_fake).mean()
            err_fake.backward()
            optD.step()
            loss_d = float(err_real) + float(err_fake)

        # ----- (3) G & E joint step (train.py:359-385) -----
        netG.zero_grad()
        netE.zero_grad()
        real_ = next(batch_iter).to(device)
        encoded = netE(real_)
        rec_fake = netG(encoded.view(bs, z_dim, 1, 1))
        err_g = ref.criterionG(netD(rec_fake), label1, real_, rec_fake,
                               netDl(encoded), bs)
        err_g.backward()
        optG.step()
        optE.step()
        loss_g = float(err_g)

        row = {"step": step, "epoch": step // steps_per_epoch,
               "loss_dl": loss_dl, "loss_d": loss_d, "loss_g": loss_g,
               "t": round(time.time() - t0, 1)}
        out_f.write(json.dumps(row) + "\n")
        out_f.flush()
        if step % 10 == 0:
            print(json.dumps(row), flush=True)
        if not all(np.isfinite([loss_dl, loss_d, loss_g])):
            verdict = f"nonfinite_at_step_{step}"
            print(f"NON-FINITE at step {step} (epoch "
                  f"{step // steps_per_epoch}): {row}", flush=True)
            break
    out_f.write(json.dumps({"verdict": verdict,
                            "steps_run": step + 1,
                            "wall_s": round(time.time() - t0, 1)}) + "\n")
    out_f.close()
    print(f"VERDICT: {verdict} after {step + 1} steps "
          f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
