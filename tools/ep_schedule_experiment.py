#!/usr/bin/env python
"""Measure the privGAN scheduling divergence on the attack metric.

The reference trains the shared private classifier SEQUENTIALLY: per
epoch, per split, per batch (``privDCGAN.py:218-313``) — the classifier
sees one split's fakes for a whole sub-epoch before the next split's.
Our TPU design (``train/priv.py``) updates all splits SIMULTANEOUSLY per
step (vmapped stacks; the classifier sees every split each update). The
per-split G/D updates are mathematically identical (disjoint params);
only the classifier's data order differs.

This experiment bounds the effect of that reordering on the quantity the
framework exists to measure — the fbb membership-inference AUROC — by
training tiny privDCGANs on memorizable synthetic data under both
schedules and attacking each, with seed-to-seed variance of the
simultaneous schedule as the yardstick. Results are recorded in
DIVERGENCES.md.

Usage: python tools/ep_schedule_experiment.py [--epochs 20] [--seeds 3]
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# tiny models + python-loop scheduling: CPU is the right backend (the
# sitecustomize preloads jax on the axon/TPU platform, so override both
# the env var and the already-initialized config)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.config import DCGANConfig, PrivGANConfig
from ganleaks_tpu.models import dcgan as dcgan_m
from ganleaks_tpu.ops.distance import make_embed_fn
from ganleaks_tpu.ops.knn import knn_argmin_streamed
from ganleaks_tpu.ops.roc import auroc
from ganleaks_tpu.train.gan import bce_with_logits
from ganleaks_tpu.train.priv import (
    PrivGANState,
    build_privdcgan_state,
    priv_pretrain_step,
    softmax_cross_entropy_on_probs,
    split_dataset,
    train_privdcgan,
)
from ganleaks_tpu.train.state import ModelState


def make_data(rng: np.random.Generator, n: int) -> np.ndarray:
    """Memorizable images: a fixed random linear decoder of 16-d latents,
    tanh-squashed — low-dimensional enough for a tiny DCGAN to overfit,
    so the membership signal (and any schedule effect on it) is visible."""
    w = np.random.default_rng(1234).standard_normal((16, 64 * 64 * 3))
    z = rng.standard_normal((n, 16))
    img = np.tanh((z @ w) / 4.0).reshape(n, 64, 64, 3)
    return img.astype(np.float32)


@partial(jax.jit, static_argnames=("n_splits", "split_id", "dp_on"),
         donate_argnums=(0, 1, 2))
def seq_split_step(g: ModelState, d: ModelState, priv: ModelState,
                   real, rng, privacy_ratio: float, n_splits: int,
                   split_id: int, dp_on: bool):
    """One reference-schedule step for ONE split: D update, gated private
    classifier update on this split's fakes only, G update — the same
    per-split math as ``privdcgan_train_step``, sequenced like
    ``privDCGAN.py:243-289``."""
    batch = real.shape[0]
    nz = g.params["block0_conv"]["kernel"].shape[2]
    rng, k_noise, k_lab = jax.random.split(rng, 3)
    noise = jax.random.normal(k_noise, (batch, nz), real.dtype)

    fake, gmut = g.apply_fn({"params": g.params,
                             "batch_stats": g.batch_stats}, noise,
                            train=True, mutable=["batch_stats"])
    g = g.replace(batch_stats=gmut["batch_stats"])
    fake_sg = jax.lax.stop_gradient(fake)

    def d_loss_fn(dp):
        v = {"params": dp, "batch_stats": d.batch_stats}
        out_r, m1 = d.apply_fn(v, real, train=True,
                               mutable=["batch_stats"])
        v = {"params": dp, "batch_stats": m1["batch_stats"]}
        out_f, m2 = d.apply_fn(v, fake_sg, train=True,
                               mutable=["batch_stats"])
        loss = (bce_with_logits(out_r, 1.0)
                + bce_with_logits(out_f, 0.0)) / 2.0
        return loss, m2["batch_stats"]

    (_, d_stats), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(d.params)
    d = d.apply_gradients(d_grads).replace(batch_stats=d_stats)

    if dp_on:
        labels = jnp.full((batch,), split_id, jnp.int32)

        def p_loss_fn(p):
            v = {"params": p, "batch_stats": priv.batch_stats}
            logits, m = priv.apply_fn(v, fake_sg, train=True,
                                      mutable=["batch_stats"])
            return softmax_cross_entropy_on_probs(logits, labels), \
                m["batch_stats"]

        (_, p_stats), p_grads = jax.value_and_grad(
            p_loss_fn, has_aux=True)(priv.params)
        priv = priv.apply_gradients(p_grads).replace(batch_stats=p_stats)

    r = jax.random.randint(k_lab, (batch,), 0, n_splits - 1)
    gen_y = r + (r >= split_id)

    def g_loss_fn(gp):
        fake2, _ = g.apply_fn({"params": gp,
                               "batch_stats": g.batch_stats}, noise,
                              train=True, mutable=["batch_stats"])
        out, _ = d.apply_fn({"params": d.params,
                             "batch_stats": d.batch_stats}, fake2,
                            train=True, mutable=["batch_stats"])
        plogits, _ = priv.apply_fn({"params": priv.params,
                                    "batch_stats": priv.batch_stats},
                                   fake2, train=True,
                                   mutable=["batch_stats"])
        return (bce_with_logits(out, 1.0)
                + privacy_ratio
                * softmax_cross_entropy_on_probs(plogits, gen_y))

    g_grads = jax.grad(g_loss_fn)(g.params)
    g = g.apply_gradients(g_grads)
    return g, d, priv


def train_sequential(cfg: DCGANConfig, priv_cfg: PrivGANConfig,
                     images: np.ndarray) -> PrivGANState:
    """Reference-schedule privDCGAN: same pretrain + per-split sequencing
    (``privDCGAN.py:218-313``), built from the same modules/state as the
    simultaneous trainer so scheduling is the only difference."""
    splits = split_dataset(images, priv_cfg.N_splits)
    s, t = splits.shape[:2]
    key = jax.random.key(cfg.seed)
    state = build_privdcgan_state(cfg, priv_cfg, key)
    host_rng = np.random.default_rng(cfg.seed)
    splits_j = jnp.asarray(splits)
    flat = splits_j.reshape((-1,) + splits.shape[2:])
    flat_labels = jnp.repeat(jnp.arange(s), t)

    priv = state.priv
    for _ in range(priv_cfg.disc_epochs):
        perm = host_rng.permutation(s * t)
        for i in range(0, s * t, cfg.batch_size):
            idx = jnp.asarray(perm[i:i + cfg.batch_size])
            priv, _ = priv_pretrain_step(priv, flat[idx],
                                         flat_labels[idx])

    # unstack into per-split states (0-d leaves like optax's step count
    # are shared scalars — copied per split, then stepped independently)
    def take(tree, i):
        # 0-d leaves are copied (not aliased): the steps donate their
        # inputs, and a shared buffer would be deleted under every split
        return jax.tree_util.tree_map(
            lambda x: x[i] if getattr(x, "ndim", 0) > 0
            else jnp.array(x, copy=True), tree)

    gs = [state.genS.replace(params=take(state.genS.params, i),
                             batch_stats=take(state.genS.batch_stats, i),
                             opt_state=take(state.genS.opt_state, i))
          for i in range(s)]
    ds = [state.discS.replace(params=take(state.discS.params, i),
                              batch_stats=take(state.discS.batch_stats, i),
                              opt_state=take(state.discS.opt_state, i))
          for i in range(s)]

    step_key = jax.random.fold_in(key, 1)
    batch = min(cfg.batch_size, t)
    for epoch in range(cfg.num_epochs):
        dp_on = epoch > priv_cfg.dp_delay
        for split_id in range(s):
            perm = host_rng.permutation(t)
            for i in range(0, t - batch + 1, batch):
                real = splits_j[split_id][jnp.asarray(perm[i:i + batch])]
                step_key = jax.random.fold_in(step_key, 1)
                gs[split_id], ds[split_id], priv = seq_split_step(
                    gs[split_id], ds[split_id], priv, real, step_key,
                    priv_cfg.privacy_ratio, s, split_id, dp_on)

    # re-stack params/stats for the shared attack path (opt_state is not
    # used after training; left at its init value)
    stack = lambda trees: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *trees)
    genS = state.genS.replace(
        params=stack([g.params for g in gs]),
        batch_stats=stack([g.batch_stats for g in gs]))
    discS = state.discS.replace(
        params=stack([d.params for d in ds]),
        batch_stats=stack([d.batch_stats for d in ds]))
    return state.replace(genS=genS, discS=discS, priv=priv)


def attack_auroc(cfg: DCGANConfig, state: PrivGANState,
                 members: np.ndarray, nonmembers: np.ndarray,
                 n_gen: int = 512) -> float:
    """fbb pixel-L2 attack against split-0 samples (the reference attacks
    split-0 generations, ``privDCGAN.py:187-215``)."""
    gen = dcgan_m.Generator(nz=cfg.nz, nc=cfg.nc, ngf=cfg.ngf)
    variables = jax.tree_util.tree_map(
        lambda x: x[0], {"params": state.genS.params,
                         "batch_stats": state.genS.batch_stats})
    z = jax.random.normal(jax.random.key(99), (n_gen, cfg.nz))
    syn = gen.apply(variables, z, train=False)
    embed = make_embed_fn("l2")
    d_pos, _ = knn_argmin_streamed(embed, jnp.asarray(members), syn)
    d_neg, _ = knn_argmin_streamed(embed, jnp.asarray(nonmembers), syn)
    return float(auroc(-np.asarray(d_pos), -np.asarray(d_neg)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--n_train", type=int, default=128)
    args = ap.parse_args()

    priv_cfg = PrivGANConfig(N_splits=2, privacy_ratio=1.0, dp_delay=2,
                             disc_epochs=2)
    data_rng = np.random.default_rng(7)
    members = make_data(data_rng, args.n_train)
    nonmembers = make_data(data_rng, args.n_train)

    results: dict[str, list[float]] = {"simultaneous": [], "sequential": []}
    for seed in range(args.seeds):
        cfg = DCGANConfig(batch_size=16, num_epochs=args.epochs, ngf=16,
                          ndf=16, nz=32, seed=seed, save_model=False,
                          sample_grid_dir=None)
        st_par = train_privdcgan(cfg, priv_cfg, images=members)
        a_par = attack_auroc(cfg, st_par, members, nonmembers)
        st_seq = train_sequential(cfg, priv_cfg, members)
        a_seq = attack_auroc(cfg, st_seq, members, nonmembers)
        results["simultaneous"].append(a_par)
        results["sequential"].append(a_seq)
        print(f"seed {seed}: AUROC simultaneous={a_par:.4f} "
              f"sequential={a_seq:.4f} delta={a_par - a_seq:+.4f}")

    par = np.array(results["simultaneous"])
    seq = np.array(results["sequential"])
    print(f"\nmean AUROC: simultaneous={par.mean():.4f} "
          f"(std {par.std():.4f}), sequential={seq.mean():.4f} "
          f"(std {seq.std():.4f})")
    print(f"schedule delta={par.mean() - seq.mean():+.4f} vs "
          f"seed-to-seed std {np.concatenate([par, seq]).std():.4f}")


if __name__ == "__main__":
    main()
