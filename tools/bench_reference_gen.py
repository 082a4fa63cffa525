#!/usr/bin/env python
"""Measure the reference's CPU generation throughput (images/sec).

Mirrors the sampling path of ``gan_models/dcgan/train_torch.py:138-174``:
a DCGAN generator (5 ConvTranspose blocks, BN+ReLU, Tanh; ``model_torch.py:
75-96``) forwarding N(0,1) noise batches on the torch CPU backend, single
thread — the same methodology as the kNN attack baseline in BASELINE.md
(random weights: identical FLOPs to a trained checkpoint).

The measured rate is hardcoded as ``REFERENCE_CPU_GEN_IMAGES_PER_SEC`` in
``bench.py`` so ``bench.py --metric gen`` reports a real ``vs_baseline``.

Usage: python tools/bench_reference_gen.py [--num 512] [--batch 128]
"""

from __future__ import annotations

import argparse
import time

import torch
import torch.nn as nn


def build_generator(nz: int = 100, ngf: int = 64, nc: int = 3) -> nn.Module:
    """DCGAN generator with the reference's topology
    (``model_torch.py:75-96``): 4 ConvTranspose(k4,s2,p1) upsampling
    stages from a (nz,1,1) seed via a k4,s1,p0 stem, BN+ReLU between,
    Tanh output."""
    def block(cin, cout, k, s, p):
        return [nn.ConvTranspose2d(cin, cout, k, s, p, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(True)]

    layers = (block(nz, ngf * 8, 4, 1, 0)
              + block(ngf * 8, ngf * 4, 4, 2, 1)
              + block(ngf * 4, ngf * 2, 4, 2, 1)
              + block(ngf * 2, ngf, 4, 2, 1)
              + [nn.ConvTranspose2d(ngf, nc, 4, 2, 1, bias=False),
                 nn.Tanh()])
    return nn.Sequential(*layers)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--threads", type=int, default=1)
    args = ap.parse_args()

    torch.set_num_threads(args.threads)
    torch.manual_seed(0)
    gen = build_generator().eval()

    with torch.no_grad():
        gen(torch.randn(2, 100, 1, 1))  # warm up
        t0 = time.perf_counter()
        done = 0
        while done < args.num:
            b = min(args.batch, args.num - done)
            img = gen(torch.randn(b, 100, 1, 1))
            # denormalize like train_torch.py:154 ((x+1)/2) + host copy
            ((img + 1.0) / 2.0).numpy()
            done += b
        dt = time.perf_counter() - t0

    print(f"torch-CPU DCGAN 64x64 generation ({args.threads} thread(s)): "
          f"{args.num / dt:.1f} images/sec ({dt:.2f}s for {args.num})")


if __name__ == "__main__":
    main()
