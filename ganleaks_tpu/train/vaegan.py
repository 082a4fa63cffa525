"""VAE-GAN trainer (reference: ``gan_models/vaegan/train.py:237-418``).

Three phases per iteration, each on a FRESH data batch (4 batches per
iteration total):

1. latent discriminator Dl: encoder outputs labeled fake(0), prior noise
   labeled real(1), BCE (``train.py:299-327``);
2. image discriminator D (x2): hinge terms ``relu(0.5 + D(real))`` and
   ``relu(0.5 - D(G(z)))`` (``:332-354``, signs as in the reference);
3. G & E jointly: ``errG = mean(D(G(E(x)))) + BCE(Dl(E(x)), 1)
   + 0.005 * mean_batch(sum_pixels |x - G(E(x))|)`` (``criterionG``,
   ``:190-217``).

Spectral-norm u/v vectors advance once per wrapped-layer forward (the torch
wrapper updates in-place, ``ops.py:73-75``) — threaded through the step via
the mutable 'spectral' collection. VAE-GAN is the only reference model with
periodic checkpoints + resume (``train.py:284-294,401-414``); replicated
via msgpack snapshots.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import numpy as np
from flax import struct
from flax.core import FrozenDict

from ganleaks_tpu.config import VAEGANConfig
from ganleaks_tpu.io.artifacts import check_folder, dump_params
from ganleaks_tpu.io.data import DeviceDataset
from ganleaks_tpu.parallel.mesh import data_parallel_mesh, shard_batch
from ganleaks_tpu.io.images import get_filepaths_from_dir, read_image, save_png
from ganleaks_tpu.models.vaegan import (
    Discriminator,
    DiscriminatorL,
    Encoder,
    Generator,
)
from ganleaks_tpu.train.sample import sample_to_host
from ganleaks_tpu.train.state import ModelState, adam_torch
from ganleaks_tpu.utils.checkpoint import load_state, save_state
from ganleaks_tpu.utils.logging import MetricsLogger

Array = jax.Array


class VAEGANState(struct.PyTreeNode):
    step: Array
    epoch: Array
    enc: ModelState
    gen: ModelState
    disc: ModelState   # image discriminator
    disc_l: ModelState  # latent discriminator


def _apply_mut(ms: ModelState, *args, **kwargs):
    """Apply with batch_stats+spectral mutable; returns (out, new ModelState)."""
    out, mut = ms.apply_fn(ms.variables(), *args,
                           mutable=["batch_stats", "spectral"], **kwargs)
    new = ms.replace(
        batch_stats=mut.get("batch_stats", ms.batch_stats),
        # FrozenDict, matching ModelState.create — a plain dict here is a
        # different pytree node type and silently RETRACES the whole jitted
        # step on its second call (measured: a hidden 5.8 s recompile)
        extra=FrozenDict(
            {**dict(ms.extra),
             **({"spectral": mut["spectral"]} if "spectral" in mut else {})}))
    return out, new


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def bce(probs: Array, target: float) -> Array:
    """torch BCELoss on probabilities — BOTH halves of its semantics.

    Forward: log clamped at -100 (torch's value clamp). Backward:
    ``(p - t) / max(p*(1-p), 1e-12) / N`` — torch clamps the DENOMINATOR
    at 1e-12 (``binary_cross_entropy_backward``), so a fully saturated
    sigmoid (p == 0.0 exactly, reachable in f32 at logits < -104) yields
    a large-but-FINITE ~1e12/N gradient. Without that clamp the naive
    autodiff grad is -1/p = inf and one saturated Dl output poisons
    every upstream parameter: that was THIS port's VAE-GAN "divergence"
    — the reference's own torch run on the identical fixture trains
    finitely through the same saturation (tools/vaegan_ab_reference.py;
    DIVERGENCES.md "VAE-GAN stability A/B")."""
    p = jnp.clip(probs, 1e-44, 1.0)
    q = jnp.clip(1.0 - probs, 1e-44, 1.0)
    t = jnp.full_like(probs, target)
    return -jnp.mean(t * jnp.maximum(jnp.log(p), -100.0)
                     + (1 - t) * jnp.maximum(jnp.log(q), -100.0))


def _bce_fwd(probs: Array, target: float):
    return bce(probs, target), probs


def _bce_bwd(target: float, probs: Array, g: Array):
    # torch binary_cross_entropy_backward: (p - t) / max(p(1-p), 1e-12),
    # scaled by 1/N for the mean reduction
    denom = jnp.maximum(probs * (1.0 - probs), 1e-12)
    return (g * (probs - target) / denom / probs.size,)


bce.defvjp(_bce_fwd, _bce_bwd)


@partial(jax.jit, donate_argnums=0)
def vaegan_train_step(state: VAEGANState, real_dl: Array, real_d1: Array,
                      real_d2: Array, real_g: Array, rng: Array):
    enc, gen, disc, disc_l = state.enc, state.gen, state.disc, state.disc_l
    batch = real_dl.shape[0]
    z_dim = disc_l.params["fc1"]["kernel"].shape[0]
    rng, k_enc, k_noise, kd1, kd2, k_genc = jax.random.split(rng, 6)

    # ---------- (1) Dl step (train.py:299-327) ----------
    encoded, enc = _apply_mut(enc, real_dl, k_enc, train=True)
    encoded = jax.lax.stop_gradient(encoded)
    noise = jax.random.normal(k_noise, (batch, z_dim))

    def dl_loss_fn(p):
        v = {"params": p}
        out_enc = disc_l.apply_fn(v, encoded)
        out_noise = disc_l.apply_fn(v, noise)
        return bce(out_enc, 0.0) + bce(out_noise, 1.0)

    loss_dl, dl_grads = jax.value_and_grad(dl_loss_fn)(disc_l.params)
    disc_l = disc_l.apply_gradients(dl_grads)

    # ---------- (2) D step x2 (train.py:332-354) ----------
    loss_d = jnp.zeros(())
    for real_d, kd in ((real_d1, kd1), (real_d2, kd2)):
        z = jax.random.normal(kd, (batch, z_dim))
        fake, gen = _apply_mut(gen, z, train=True)
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(p):
            v = {"params": p, **dict(disc.extra)}
            out_real, m1 = disc.apply_fn(v, real_d, mutable=["spectral"])
            v = {"params": p, "spectral": m1["spectral"]}
            out_fake, m2 = disc.apply_fn(v, fake, mutable=["spectral"])
            loss = (jnp.mean(nn_relu(0.5 + out_real))
                    + jnp.mean(nn_relu(0.5 - out_fake)))
            return loss, m2["spectral"]

        (loss_d, spec), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(disc.params)
        disc = disc.apply_gradients(d_grads).replace(
            extra=FrozenDict({**dict(disc.extra), "spectral": spec}))

    # ---------- (3) G & E step (train.py:359-385) ----------
    def ge_loss_fn(g_params, e_params):
        ev = {"params": e_params, "batch_stats": enc.batch_stats}
        encoded2, emut = enc.apply_fn(ev, real_g, k_genc, train=True,
                                      mutable=["batch_stats"])
        gv = {"params": g_params, "batch_stats": gen.batch_stats,
              **dict(gen.extra)}
        rec_fake, gmut = gen.apply_fn(gv, encoded2, train=True,
                                      mutable=["batch_stats", "spectral"])
        dv = {"params": disc.params, **dict(disc.extra)}
        output, dmut = disc.apply_fn(dv, rec_fake, mutable=["spectral"])
        dlv = {"params": disc_l.params}
        output_n = disc_l.apply_fn(dlv, encoded2)
        # criterionG (train.py:190-217)
        rec = jnp.mean(jnp.sum(jnp.abs(
            real_g.reshape(batch, -1) - rec_fake.reshape(batch, -1)),
            axis=1))
        loss = jnp.mean(output) + bce(output_n, 1.0) + 0.005 * rec
        # the torch reference advances netE's BN running stats and
        # netD's spectral-norm u on EVERY train-mode forward
        # (train.py:359-385) — thread both, not just the generator's
        return loss, (gmut, emut["batch_stats"], dmut["spectral"])

    (loss_g, (gmut, enc_stats, d_spec)), (g_grads, e_grads) = \
        jax.value_and_grad(ge_loss_fn, has_aux=True,
                           argnums=(0, 1))(gen.params, enc.params)
    gen = gen.apply_gradients(g_grads).replace(
        batch_stats=gmut["batch_stats"],
        extra=FrozenDict({**dict(gen.extra),
                          "spectral": gmut["spectral"]}))
    enc = enc.apply_gradients(e_grads).replace(batch_stats=enc_stats)
    disc = disc.replace(
        extra=FrozenDict({**dict(disc.extra), "spectral": d_spec}))

    new = state.replace(step=state.step + 1, enc=enc, gen=gen, disc=disc,
                        disc_l=disc_l)
    return new, {"loss_dl": loss_dl, "loss_d": loss_d, "loss_g": loss_g}


def nn_relu(x: Array) -> Array:
    return jnp.maximum(x, 0.0)


# --- driver --------------------------------------------------------------------

def build_state(cfg: VAEGANConfig, key: jax.Array) -> VAEGANState:
    enc = Encoder(z_dim=cfg.z_dim, d=cfg.d)
    gen = Generator(z_dim=cfg.z_dim, d=cfg.d)
    disc = Discriminator(d=cfg.d)
    disc_l = DiscriminatorL()
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    ev = enc.init(k1, img, k5, train=True)
    gv = gen.init(k2, jnp.zeros((2, cfg.z_dim)), train=True)
    dv = disc.init(k3, img)
    dlv = disc_l.init(k4, jnp.zeros((2, cfg.z_dim)))
    # lrs/betas: train.py:279-282
    return VAEGANState(
        step=jnp.zeros((), jnp.int32), epoch=jnp.zeros((), jnp.int32),
        enc=ModelState.create(enc, ev, adam_torch(1e-4, 0.0, 0.9)),
        gen=ModelState.create(gen, gv, adam_torch(1e-4, 0.0, 0.9)),
        disc=ModelState.create(disc, dv, adam_torch(4e-4, 0.0, 0.9)),
        disc_l=ModelState.create(disc_l, dlv, adam_torch(2e-4, 0.0, 0.9)))


class VaeganImageDataset(DeviceDataset):
    """CelebaDataseat equivalent (``train.py:221-233``): resize-variant
    reader, NOT the center-crop one, despite living in vaegan/."""

    @classmethod
    def from_dir(cls, data_dir: str, resolution: int = 64, seed: int = 0):
        paths = get_filepaths_from_dir(data_dir, "png")
        imgs = np.asarray([read_image(p, resolution) for p in paths],
                          np.float32)
        return cls(imgs, seed=seed)


def train(cfg: VAEGANConfig, images: np.ndarray | None = None,
          logger: MetricsLogger | None = None,
          resume: bool = True) -> VAEGANState:
    save_dir = check_folder(os.path.join("results", cfg.exp_name))
    dump_params(save_dir, cfg)
    logger = logger or MetricsLogger(os.path.join(save_dir,
                                                  "metrics.jsonl"))
    key = jax.random.key(cfg.seed)
    state = build_state(cfg, key)

    ckpt_path = os.path.join(save_dir, "checkpoint.msgpack")
    if resume and os.path.exists(ckpt_path):  # train.py:284-294
        state = load_state(ckpt_path, state)
        print(f" [*] resumed from epoch {int(state.epoch)}")

    if images is None:
        ds = VaeganImageDataset.from_dir(cfg.data_dir
                                         if hasattr(cfg, "data_dir")
                                         else cfg.data_path,
                                         cfg.image_size, cfg.seed)
    else:
        ds = DeviceDataset(images, seed=cfg.seed)

    mesh = data_parallel_mesh(cfg.mesh_shape)
    if mesh is not None:  # DP: params replicated, batches sharded
        state = jax.device_put(state, NamedSharding(mesh, P()))

    metrics = {}
    batch_iter = _forever_batches(ds, cfg.batch_size)
    # resume discipline: a resumed run must CONTINUE the RNG and shuffle
    # streams, not restart them — replaying the already-consumed keys and
    # batch order would correlate post-resume noise with the checkpointed
    # updates. Keys are counter-based (global step index) and the batch
    # stream fast-forwards past the consumed prefix, so an interrupted +
    # resumed run consumes exactly the uninterrupted run's streams.
    start_epoch = int(state.epoch)
    global_step = start_epoch * cfg.steps_per_epoch
    for _ in range(4 * global_step):
        next(batch_iter)
    for epoch in range(start_epoch, cfg.nepoch):
        for _ in range(cfg.steps_per_epoch):
            b1, b2, b3, b4 = (next(batch_iter) for _ in range(4))
            if mesh is not None:
                b1, b2, b3, b4 = (shard_batch(b, mesh)
                                  for b in (b1, b2, b3, b4))
            global_step += 1
            step_key = jax.random.fold_in(key, global_step)
            state, metrics = vaegan_train_step(state, b1, b2, b3, b4,
                                               step_key)
        state = state.replace(epoch=jnp.asarray(epoch + 1, jnp.int32))
        logger.log({"epoch": epoch, **jax.device_get(metrics)},
                   step=int(state.step))
        if epoch % cfg.checkpoint_every == 0:  # train.py:401-414
            save_state(ckpt_path, state)
            save_state(os.path.join(save_dir, "netG.msgpack"),
                       {"params": state.gen.params,
                        "batch_stats": state.gen.batch_stats,
                        "spectral": dict(state.gen.extra).get("spectral",
                                                              {})})
            # the reference also pickles the encoder (train.py:414) — the
            # reconstruction attack consumes it
            save_state(os.path.join(save_dir, "netE.msgpack"),
                       {"params": state.enc.params,
                        "batch_stats": state.enc.batch_stats})
    save_state(ckpt_path, state)
    return state


def _forever_batches(ds: DeviceDataset, batch_size: int):
    """drop_last dataloader cycled forever (``train.py:260-262,305-309``)."""
    while True:
        yield from ds.epoch(batch_size, drop_last=True)


def sample(cfg: VAEGANConfig, state: VAEGANState,
           out_dir: str) -> dict[str, str]:
    """``sample.py``: seed 1000, batches of 100, ``generated.npz`` with
    noise (N, z) and img_r01 (N, H, W, C) in [0,1] + a 10x10 grid."""
    check_folder(out_dir)
    variables = {"params": state.gen.params,
                 "batch_stats": state.gen.batch_stats,
                 **dict(state.gen.extra)}
    sample_fn = _vaegan_sample_fn(cfg.z_dim, cfg.d)
    key = jax.random.key(1000)
    noise, img01 = sample_to_host(sample_fn, variables, cfg.num_samples,
                                  cfg.z_dim, 100, key)
    np.savez_compressed(os.path.join(out_dir, "generated.npz"),
                        noise=noise, img_r01=img01)
    _save_grid(img01[:100], os.path.join(out_dir, "samples.png"), (10, 10))
    return {"out_dir": out_dir}


import functools


@functools.lru_cache(maxsize=16)
def _vaegan_sample_fn(z_dim: int, d: int):
    gen = Generator(z_dim=z_dim, d=d)
    return lambda v, z: gen.apply(v, z, train=False)


def _save_grid(imgs01: np.ndarray, path: str, grid: tuple[int, int]) -> None:
    gw, gh = grid
    n, h, w, c = imgs01.shape
    canvas = np.zeros((gh * h, gw * w, c), np.float32)
    for idx in range(min(n, gw * gh)):
        y, x = (idx // gw) * h, (idx % gw) * w
        canvas[y:y + h, x:x + w] = imgs01[idx]
    save_png(canvas, path, drange=(0, 1), rounding="rint")
