"""privGAN trainers — privDCGAN and privPGGAN (reference:
``gan_models/dcgan/privDCGAN.py``, ``gan_models/pggan/privPGGAN.py``).

privGAN trains N (generator, discriminator) pairs on N disjoint dataset
splits plus one shared "private" classifier that predicts which split an
image came from; each generator is additionally rewarded for fooling the
classifier into predicting a *different* split (``privDCGAN.py:272-289``).

TPU-native redesign: the reference loops over splits sequentially with
``nn.ModuleList`` stacks (``dcgan/model_torch.py:99-119``); here the stacks
are a leading split axis on the parameter pytree driven by ``jax.vmap`` —
all splits train simultaneously (disjoint parameters make the vmapped
update mathematically identical per split; the shared private classifier
sees all splits per step instead of sequentially — recorded in
DIVERGENCES.md). On a mesh the split axis maps naturally onto devices
(expert-parallel-shaped).

Replicated reference quirks:
* the private heads end in Softmax and are *still* fed to
  ``CrossEntropyLoss`` (``privDCGAN.py:146-147``) — reproduced by
  :func:`softmax_cross_entropy_on_probs`;
* the G-loss privacy term is active from step one; ``dp_delay`` only gates
  private-classifier *updates* (epoch-gated for DCGAN,
  ``privDCGAN.py:259``; resolution-gated ``4*2**step >= dp_delay`` for
  PGGAN, ``privPGGAN.py:187``).
"""

from __future__ import annotations

import os
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ganleaks_tpu.config import DCGANConfig, PGGANConfig, PrivGANConfig
from ganleaks_tpu.io.artifacts import write_synthetic_artifacts
from ganleaks_tpu.models import dcgan as dcgan_m
from ganleaks_tpu.models import pggan as pggan_m
from ganleaks_tpu.train.gan import bce_with_logits
from ganleaks_tpu.train.pggan import gradient_penalty_fn
from ganleaks_tpu.train.sample import sample_to_host
from ganleaks_tpu.train.state import ModelState, adam_torch
from ganleaks_tpu.utils.logging import MetricsLogger

Array = jax.Array


def softmax_cross_entropy_on_probs(logits: Array, labels: Array) -> Array:
    """CrossEntropyLoss applied to softmax outputs (reference quirk): the
    probabilities are treated as logits, i.e. loss =
    -mean(log_softmax(softmax(logits))[label])."""
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        probs, labels))


class PrivGANState(struct.PyTreeNode):
    step: Array
    genS: ModelState    # stacked: leading split axis on every leaf
    discS: ModelState
    priv: ModelState    # shared private classifier


def stack_init(module, key: Array, n: int, *example) -> dict:
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: module.init(k, *example))(keys)


def split_dataset(images: np.ndarray, n_splits: int) -> np.ndarray:
    """Contiguous equal splits with split-index labels
    (``privDCGAN.py:102-114``)."""
    assert len(images) % n_splits == 0, \
        "Dataset size must be divisible by N_splits"
    t = len(images) // n_splits
    return images.reshape(n_splits, t, *images.shape[1:])


# ---------------------------------------------------------------------------
# privDCGAN
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=0)
def priv_pretrain_step(priv: ModelState, imgs: Array, labels: Array):
    """Private classifier pretraining on real images
    (``privDCGAN.py:139-153``)."""
    def loss_fn(p):
        v = {"params": p, "batch_stats": priv.batch_stats}
        logits, m = priv.apply_fn(v, imgs, train=True,
                                  mutable=["batch_stats"])
        return softmax_cross_entropy_on_probs(logits, labels), \
            m["batch_stats"]

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        priv.params)
    return priv.apply_gradients(grads).replace(batch_stats=stats), loss


@partial(jax.jit, static_argnames=("dp_on",), donate_argnums=0)
def privdcgan_train_step(state: PrivGANState, real: Array, rng: Array,
                         privacy_ratio: float, dp_on: bool):
    """All-splits step: BCE D updates, gated private-classifier update,
    G updates with the privacy CE term (``privDCGAN.py:218-289``).

    real: (S, B, H, W, C)."""
    genS, discS, priv = state.genS, state.discS, state.priv
    n_splits, batch = real.shape[:2]
    nz = genS.params["block0_conv"]["kernel"].shape[3]  # (S, kh, kw, I, O)
    rng, k_noise, k_lab = jax.random.split(rng, 3)
    noise = jax.random.normal(k_noise, (n_splits, batch, nz), real.dtype)

    # fakes for all splits (one G forward each; stats advance once)
    def gen_fwd(params, stats, z):
        return genS.apply_fn({"params": params, "batch_stats": stats}, z,
                             train=True, mutable=["batch_stats"])

    fake, gmut = jax.vmap(gen_fwd)(genS.params, genS.batch_stats, noise)
    genS = genS.replace(batch_stats=gmut["batch_stats"])
    fake_sg = jax.lax.stop_gradient(fake)

    # --- D step per split (privDCGAN.py:243-253) ---
    def d_loss_fn(d_params):
        def per_split(dp, dstats, real_s, fake_s):
            v = {"params": dp, "batch_stats": dstats}
            out_r, m1 = discS.apply_fn(v, real_s, train=True,
                                       mutable=["batch_stats"])
            v = {"params": dp, "batch_stats": m1["batch_stats"]}
            out_f, m2 = discS.apply_fn(v, fake_s, train=True,
                                       mutable=["batch_stats"])
            loss = (bce_with_logits(out_r, 1.0)
                    + bce_with_logits(out_f, 0.0)) / 2.0
            return loss, m2["batch_stats"]

        losses, stats = jax.vmap(per_split)(d_params, discS.batch_stats,
                                            real, fake_sg)
        return jnp.sum(losses), (stats, jnp.mean(losses))

    (_, (d_stats, loss_d)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(discS.params)
    discS = discS.apply_gradients(d_grads).replace(batch_stats=d_stats)

    # --- private classifier step, epoch-gated (privDCGAN.py:257-269) ---
    flat_fake = fake_sg.reshape((-1,) + fake_sg.shape[2:])
    split_labels = jnp.repeat(jnp.arange(n_splits), batch)
    loss_dp = jnp.zeros(())
    if dp_on:
        def p_loss_fn(p):
            v = {"params": p, "batch_stats": priv.batch_stats}
            logits, m = priv.apply_fn(v, flat_fake, train=True,
                                      mutable=["batch_stats"])
            return softmax_cross_entropy_on_probs(logits, split_labels), \
                m["batch_stats"]

        (loss_dp, p_stats), p_grads = jax.value_and_grad(
            p_loss_fn, has_aux=True)(priv.params)
        priv = priv.apply_gradients(p_grads).replace(batch_stats=p_stats)

    # --- G step: fool own D + fool the private classifier toward a random
    #     OTHER split (privDCGAN.py:272-289) ---
    r = jax.random.randint(k_lab, (n_splits, batch), 0, n_splits - 1)
    splits = jnp.arange(n_splits)[:, None]
    gen_y = r + (r >= splits)  # uniform over the other splits

    def g_loss_fn(g_params):
        def per_split(gp, gstats, dp, dstats, z, y):
            gv = {"params": gp, "batch_stats": gstats}
            fake2, gm = genS.apply_fn(gv, z, train=True,
                                      mutable=["batch_stats"])
            dv = {"params": dp, "batch_stats": dstats}
            out, dm = discS.apply_fn(dv, fake2, train=True,
                                     mutable=["batch_stats"])
            # priv's G-step forward also runs train-mode in torch, but
            # it is SHARED across splits and torch advances its running
            # stats sequentially per split — un-reproducible under vmap,
            # so its G-step stats update is a conscious drop (running
            # stats only; gradients are unaffected)
            pv = {"params": priv.params, "batch_stats": priv.batch_stats}
            plogits, _ = priv.apply_fn(pv, fake2, train=True,
                                       mutable=["batch_stats"])
            loss = (bce_with_logits(out, 1.0)
                    + privacy_ratio
                    * softmax_cross_entropy_on_probs(plogits, y))
            return loss, (gm["batch_stats"], dm["batch_stats"])

        losses, (g_stats, d_stats2) = jax.vmap(per_split)(
            g_params, genS.batch_stats, discS.params, discS.batch_stats,
            noise, gen_y)
        return jnp.sum(losses), (jnp.mean(losses), g_stats, d_stats2)

    (_, (loss_g, g_stats, d_stats2)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True)(genS.params)
    # torch keeps every module in train mode: the G step's gen/disc
    # forwards advance their per-split BN running stats too (the same
    # discipline gan.py's dcgan_train_step follows with d_stats2)
    genS = genS.apply_gradients(g_grads).replace(batch_stats=g_stats)
    discS = discS.replace(batch_stats=d_stats2)

    new = state.replace(step=state.step + 1, genS=genS, discS=discS,
                        priv=priv)
    return new, {"loss_d": loss_d, "loss_dp": loss_dp, "loss_g": loss_g}


def build_privdcgan_state(cfg: DCGANConfig, priv_cfg: PrivGANConfig,
                          key: Array) -> PrivGANState:
    gen = dcgan_m.Generator(nz=cfg.nz, nc=cfg.nc, ngf=cfg.ngf,
                            image_size=cfg.image_size)
    disc = dcgan_m.Discriminator(ndf=cfg.ndf, image_size=cfg.image_size)
    priv = dcgan_m.PrivateDiscriminator(ndf=cfg.ndf,
                                        n_splits=priv_cfg.N_splits,
                                        image_size=cfg.image_size)
    kg, kd, kp = jax.random.split(key, 3)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.nc))
    gv = stack_init(gen, kg, priv_cfg.N_splits, jnp.zeros((1, cfg.nz)))
    dv = stack_init(disc, kd, priv_cfg.N_splits, img)
    pv = priv.init(kp, img, train=True)
    tx = adam_torch(cfg.lr, cfg.beta1, cfg.beta2)
    return PrivGANState(step=jnp.zeros((), jnp.int32),
                        genS=ModelState.create(gen, gv, tx),
                        discS=ModelState.create(disc, dv, tx),
                        priv=ModelState.create(priv, pv, tx))


def train_privdcgan(cfg: DCGANConfig, priv_cfg: PrivGANConfig,
                    images: np.ndarray | None = None,
                    logger: MetricsLogger | None = None) -> PrivGANState:
    """Pretrain private classifier, then the split-parallel GAN loop
    (``privDCGAN.py:133-165,218-313``)."""
    from ganleaks_tpu.io.data import load_train_images

    logger = logger or MetricsLogger()
    if images is None:
        images = load_train_images(cfg.data_path, cfg.image_size)
    splits = split_dataset(images, priv_cfg.N_splits)  # (S, T, H, W, C)
    s, t = splits.shape[:2]
    key = jax.random.key(cfg.seed)
    state = build_privdcgan_state(cfg, priv_cfg, key)
    host_rng = np.random.default_rng(cfg.seed)
    splits_j = jnp.asarray(splits)
    flat = splits_j.reshape((-1,) + splits.shape[2:])
    flat_labels = jnp.repeat(jnp.arange(s), t)

    # pretrain (privDCGAN.py:139-153)
    priv = state.priv
    for _ in range(priv_cfg.disc_epochs):
        perm = host_rng.permutation(s * t)
        for i in range(0, s * t, cfg.batch_size):
            idx = jnp.asarray(perm[i:i + cfg.batch_size])
            priv, loss_p = priv_pretrain_step(priv, flat[idx],
                                              flat_labels[idx])
    state = state.replace(priv=priv)

    step_key = jax.random.fold_in(key, 1)
    batch = min(cfg.batch_size, t)
    metrics = {}
    for epoch in range(cfg.num_epochs):
        perms = np.stack([host_rng.permutation(t) for _ in range(s)])
        for i in range(0, t - batch + 1, batch):
            idx = jnp.asarray(perms[:, i:i + batch])
            real = jnp.take_along_axis(
                splits_j, idx[..., None, None, None], axis=1)
            step_key = jax.random.fold_in(step_key, 1)
            state, metrics = privdcgan_train_step(
                state, real, step_key, priv_cfg.privacy_ratio,
                dp_on=epoch > priv_cfg.dp_delay)
        logger.log({"epoch": epoch, **jax.device_get(metrics)},
                   step=int(state.step))
    return state


def generate_privdcgan(cfg: DCGANConfig, priv_cfg: PrivGANConfig,
                       state: PrivGANState, run_dir: str | None = None,
                       split: int = 0) -> dict[str, str]:
    """Generation from split 0 (``privDCGAN.py:187-215``)."""
    from ganleaks_tpu.train.dcgan import _sample_fn

    variables = jax.tree_util.tree_map(
        lambda x: x[split], {"params": state.genS.params,
                             "batch_stats": state.genS.batch_stats})
    sample_fn = _sample_fn(cfg.nz, cfg.nc, cfg.ngf)
    key = jax.random.fold_in(jax.random.key(cfg.seed), 2)
    b = min(cfg.num_generated, 512)
    noise, imgs01 = sample_to_host(sample_fn, variables, cfg.num_generated,
                                   cfg.nz, b, key)
    root = os.path.join(cfg.PATH_syn_data, "privDCGAN")
    return write_synthetic_artifacts(root, "dcgan", imgs01, noise, run_dir)


# ---------------------------------------------------------------------------
# privPGGAN
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("steps", "dp_on"), donate_argnums=0)
def privpggan_train_step(state: PrivGANState, real: Array, alpha,
                         rng: Array, steps: int, privacy_ratio: float,
                         dp_on: bool, lambda_gp: float = 10.0,
                         drift: float = 0.001):
    """All-splits WGAN-GP step with privacy CE
    (``privPGGAN.py:141-234``). real: (S, B, H, W, C)."""
    genS, criticS, priv = state.genS, state.discS, state.priv
    n_splits, batch = real.shape[:2]
    # STACKED kernel (S, kh, kw, I, O): axis 3 is the input-channel
    # count == nz (the unstacked HWIO form used by parallel/ep.py reads
    # axis 2 — do not "fix" one to match the other)
    nz = genS.params["initial_convt"]["kernel"].shape[3]
    rng, k_noise, k_eps, k_lab = jax.random.split(rng, 4)
    noise = jax.random.normal(k_noise, (n_splits, batch, nz), real.dtype)
    eps = jax.random.uniform(k_eps, (n_splits, batch, 1, 1, 1), real.dtype)

    fake = jax.vmap(lambda p, z: genS.apply_fn({"params": p}, z, steps,
                                               alpha))(genS.params, noise)
    fake_sg = jax.lax.stop_gradient(fake)

    # --- critic step per split (privPGGAN.py:161-183) ---
    def c_loss_fn(c_params):
        def per_split(cp, real_s, fake_s, eps_s):
            c_real = criticS.apply_fn({"params": cp}, real_s, steps, alpha)
            c_fake = criticS.apply_fn({"params": cp}, fake_s, steps, alpha)
            gp = gradient_penalty_fn(criticS.apply_fn, cp, real_s, fake_s,
                                     eps_s, steps, alpha)
            return (-(jnp.mean(c_real) - jnp.mean(c_fake))
                    + lambda_gp * gp + drift * jnp.mean(jnp.square(c_real)))

        losses = jax.vmap(per_split)(c_params, real, fake_sg, eps)
        return jnp.sum(losses), jnp.mean(losses)

    (_, loss_c), c_grads = jax.value_and_grad(
        c_loss_fn, has_aux=True)(criticS.params)
    criticS = criticS.apply_gradients(c_grads)

    # --- private critic, resolution-gated (privPGGAN.py:187-198) ---
    flat_fake = fake_sg.reshape((-1,) + fake_sg.shape[2:])
    split_labels = jnp.repeat(jnp.arange(n_splits), batch)
    loss_dp = jnp.zeros(())
    if dp_on:
        def p_loss_fn(p):
            logits = priv.apply_fn({"params": p}, flat_fake, steps, alpha)
            return softmax_cross_entropy_on_probs(logits, split_labels)

        loss_dp, p_grads = jax.value_and_grad(p_loss_fn)(priv.params)
        priv = priv.apply_gradients(p_grads)

    # --- G step (privPGGAN.py:202-221) ---
    r = jax.random.randint(k_lab, (n_splits, batch), 0, n_splits - 1)
    gen_y = r + (r >= jnp.arange(n_splits)[:, None])

    def g_loss_fn(g_params):
        def per_split(gp, cp, z, y):
            fake2 = genS.apply_fn({"params": gp}, z, steps, alpha)
            out1 = criticS.apply_fn({"params": cp}, fake2, steps, alpha)
            out2 = priv.apply_fn({"params": priv.params}, fake2, steps,
                                 alpha)
            return (-jnp.mean(out1) + privacy_ratio
                    * softmax_cross_entropy_on_probs(out2, y))

        losses = jax.vmap(per_split)(g_params, criticS.params, noise, gen_y)
        return jnp.sum(losses), jnp.mean(losses)

    (_, loss_g), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True)(genS.params)
    genS = genS.apply_gradients(g_grads)

    new = state.replace(step=state.step + 1, genS=genS, discS=criticS,
                        priv=priv)
    return new, {"loss_critic": loss_c, "loss_dp": loss_dp,
                 "loss_gen": loss_g}


def build_privpggan_state(cfg: PGGANConfig, priv_cfg: PrivGANConfig,
                          key: Array, max_steps: int) -> PrivGANState:
    gen = pggan_m.Generator(nz=cfg.nz, in_channels=cfg.in_channels,
                            nc=cfg.nc)
    critic = pggan_m.Discriminator(in_channels=cfg.in_channels, nc=cfg.nc)
    priv = pggan_m.Discriminator(in_channels=cfg.in_channels, nc=cfg.nc,
                                 n_outputs=priv_cfg.N_splits)
    kg, kd, kp = jax.random.split(key, 3)
    keys_g = jax.random.split(kg, priv_cfg.N_splits)
    keys_d = jax.random.split(kd, priv_cfg.N_splits)
    gv = jax.vmap(lambda k: pggan_m.init_progressive(
        gen, k, jnp.zeros((1, cfg.nz)), max_steps))(keys_g)
    dv = jax.vmap(lambda k: pggan_m.init_progressive(
        critic, k, jnp.zeros((1, 4, 4, cfg.nc)), max_steps))(keys_d)
    pv = pggan_m.init_progressive(priv, kp, jnp.zeros((1, 4, 4, cfg.nc)),
                                  max_steps)
    tx = adam_torch(cfg.lr, 0.0, 0.99)
    return PrivGANState(step=jnp.zeros((), jnp.int32),
                        genS=ModelState.create(gen, gv, tx),
                        discS=ModelState.create(critic, dv, tx),
                        priv=ModelState.create(priv, pv, tx))


def train_privpggan(cfg: PGGANConfig, priv_cfg: PrivGANConfig,
                    images: np.ndarray | None = None,
                    logger: MetricsLogger | None = None) -> PrivGANState:
    """Pretrain across resolutions, then the progressive split loop
    (``privPGGAN.py:285-360``)."""
    from math import log2

    from ganleaks_tpu.io.data import load_train_images

    logger = logger or MetricsLogger()
    if images is None:
        images = load_train_images(cfg.data_path, cfg.image_size)
    splits = split_dataset(images, priv_cfg.N_splits)
    s, t = splits.shape[:2]
    key = jax.random.key(cfg.seed)
    max_steps = int(log2(cfg.image_size / 4))
    state = build_privpggan_state(cfg, priv_cfg, key, max_steps)
    host_rng = np.random.default_rng(cfg.seed)

    def at_res(x, steps):
        # PIL-NEAREST-exact downscale; the reference's privPGGAN loader
        # uses transforms.Resize's DEFAULT (bilinear) filter here
        # (privPGGAN.py:88-91) — recorded in DIVERGENCES.md, we keep the
        # NEAREST family used by the main PGGAN trainer (train.py:82).
        from ganleaks_tpu.io.images import nearest_resize
        return nearest_resize(x, 4 * 2 ** steps)

    # pretrain private critic across resolutions (privPGGAN.py:285-308)
    priv = state.priv
    flat = images.reshape((-1,) + images.shape[1:])
    flat_labels = jnp.repeat(jnp.arange(s), t)
    for steps in range(max_steps + 1):
        imgs_r = jnp.asarray(at_res(flat, steps))
        batch = cfg.batch_sizes[min(steps, len(cfg.batch_sizes) - 1)]
        alpha = 1e-5
        for _ in range(priv_cfg.disc_epochs):
            perm = host_rng.permutation(len(flat))
            for i in range(0, len(flat), batch):
                idx = jnp.asarray(perm[i:i + batch])
                priv, _ = _privpggan_pretrain_step(
                    priv, imgs_r[idx], flat_labels[idx],
                    jnp.float32(alpha), steps)
                alpha = min(alpha + len(idx)
                            / (priv_cfg.disc_epochs * 0.5 * len(flat)), 1.0)
    state = state.replace(priv=priv)

    # progressive split-parallel training (privPGGAN.py:315-360)
    step_key = jax.random.fold_in(key, 1)
    splits_j = jnp.asarray(splits)
    metrics = {}
    start_step = int(log2(cfg.start_img_size / 4))
    for steps in range(start_step, max_steps + 1):
        res_splits = at_res(splits_j, steps)
        batch = min(cfg.batch_sizes[min(steps, len(cfg.batch_sizes) - 1)], t)
        alpha = 1e-5
        dp_on = 4 * 2 ** steps >= priv_cfg.dp_delay
        for epoch in range(cfg.num_epochs):
            perms = np.stack([host_rng.permutation(t) for _ in range(s)])
            for i in range(0, t - batch + 1, batch):
                idx = jnp.asarray(perms[:, i:i + batch])
                real = jnp.take_along_axis(
                    res_splits, idx[..., None, None, None], axis=1)
                step_key = jax.random.fold_in(step_key, 1)
                if cfg.hflip:  # RandomHorizontalFlip(p=0.5), privPGGAN.py:91
                    from ganleaks_tpu.io.data import random_hflip
                    real = random_hflip(
                        real, jax.random.fold_in(step_key, 2))
                state, metrics = privpggan_train_step(
                    state, real, jnp.float32(alpha), step_key, steps,
                    priv_cfg.privacy_ratio, dp_on, cfg.lambda_gp, cfg.drift)
                alpha = min(alpha + batch / (cfg.num_epochs * 0.5 * t), 1.0)
        logger.log({"resolution": 4 * 2 ** steps,
                    **jax.device_get(metrics)}, step=int(state.step))
    return state


@partial(jax.jit, static_argnames=("steps",), donate_argnums=0)
def _privpggan_pretrain_step(priv: ModelState, imgs: Array, labels: Array,
                             alpha, steps: int):
    def loss_fn(p):
        logits = priv.apply_fn({"params": p}, imgs, steps, alpha)
        return softmax_cross_entropy_on_probs(logits, labels)

    loss, grads = jax.value_and_grad(loss_fn)(priv.params)
    return priv.apply_gradients(grads), loss


def generate_privpggan(cfg: PGGANConfig, priv_cfg: PrivGANConfig,
                       state: PrivGANState, run_dir: str | None = None,
                       split: int = 0,
                       steps: int | None = None) -> dict[str, str]:
    """Generation from split 0 at the final resolution
    (``privPGGAN.py:372-435``)."""
    from math import log2

    from ganleaks_tpu.train.pggan import _sample_fn as _pggan_sample_fn

    steps = steps if steps is not None else int(log2(cfg.image_size / 4))
    variables = jax.tree_util.tree_map(lambda x: x[split],
                                       {"params": state.genS.params})
    sample_fn = _pggan_sample_fn(cfg.nz, cfg.in_channels, cfg.nc, steps)
    key = jax.random.fold_in(jax.random.key(cfg.seed), 2)
    b = min(cfg.num_generated, 128)
    noise, imgs01 = sample_to_host(sample_fn, variables, cfg.num_generated,
                                   cfg.nz, b, key)
    root = os.path.join(cfg.PATH_syn_data, "privPGGAN")
    return write_synthetic_artifacts(root, "pggan", imgs01, noise, run_dir)
