"""Progressive GAN trainer (reference: ``gan_models/pggan/train.py``).

Per-resolution loop (PROGRESSIVE_EPOCHS, ``train.py:78,169-199``) with the
alpha fade-in ramped per batch (``:134-135``); per batch: one critic update
with WGAN-GP + 0.001*E[critic(real)^2] drift (``:104-122``), then one
generator update against the *pre-update* critic output on the same fake
(the reference computes ``critic(fake)`` for the G loss before
``opt_critic.step()`` has run? No — it runs after, on the updated critic;
``:125-132``), matching semantics below.

Mixed precision: the reference uses CUDA fp16 autocast + GradScaler
(``:107,162-163``); on TPU the compute dtype is bfloat16 — same dynamic
range as fp32, so no loss scaling is needed (the GradScaler machinery is
intentionally absent; recorded in DIVERGENCES.md).

``steps`` is static per resolution: one compile per resolution, reused for
every batch/epoch at that resolution.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import numpy as np

from ganleaks_tpu.config import PGGANConfig
from ganleaks_tpu.io.artifacts import check_folder, timestamp_dir, write_synthetic_artifacts
from ganleaks_tpu.io.data import DeviceDataset, load_train_images, random_hflip
from ganleaks_tpu.io.images import nearest_resize
from ganleaks_tpu.parallel.mesh import data_parallel_mesh, shard_batch
from ganleaks_tpu.models.pggan import Discriminator, Generator, init_progressive
from ganleaks_tpu.train.dcgan import _log_sample_grid, resolve_grid_dir
from ganleaks_tpu.train.gan import GANState
from ganleaks_tpu.train.sample import sample_to_host
from ganleaks_tpu.train.state import ModelState, adam_torch
from ganleaks_tpu.utils.checkpoint import save_state
from ganleaks_tpu.utils.logging import MetricsLogger, Throughput

Array = jax.Array


def gradient_penalty_fn(critic_apply, c_params, real: Array, fake: Array,
                        eps: Array, steps: int, alpha) -> Array:
    """PGGAN gradient penalty (``pggan/utils.py:72-96``): note the
    reference interpolates as ``real*eps + fake.detach()*(1-eps)`` and
    passes (steps, alpha) through the critic."""
    interp = real * eps + jax.lax.stop_gradient(fake) * (1.0 - eps)

    def score_sum(x):
        return jnp.sum(critic_apply({"params": c_params}, x, steps,
                                    alpha).reshape(-1))

    grads = jax.grad(score_sum)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(
        grads.reshape(grads.shape[0], -1)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def _cast_floats(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


@partial(jax.jit, static_argnames=("steps", "compute_dtype"),
         donate_argnums=0)
def pggan_train_step(state: GANState, real: Array, alpha, rng: Array,
                     steps: int, lambda_gp: float = 10.0,
                     drift: float = 0.001,
                     compute_dtype: str = "float32"):
    """One critic + generator update at a fixed resolution
    (``train.py:96-132``).

    Mixed precision: with ``compute_dtype='bfloat16'`` the forward/backward
    networks run in bf16 (params cast inside the loss — the cast is linear
    so gradients come back in the f32 master params' dtype); losses and the
    optimizer stay f32. This replaces the reference's CUDA fp16
    autocast+GradScaler (``train.py:107,162-163``): bf16 shares fp32's
    exponent range, so no loss scaling is needed.
    """
    cdt = jnp.dtype(compute_dtype)
    gen, critic = state.gen, state.disc
    batch = real.shape[0]
    nz = gen.params["initial_convt"]["kernel"].shape[2]
    rng, k_noise, k_eps = jax.random.split(rng, 3)
    real_c = real.astype(cdt)
    noise = jax.random.normal(k_noise, (batch, nz), cdt)
    alpha_c = jnp.asarray(alpha, cdt)

    fake = gen.apply_fn(_cast_floats(gen.variables(), cdt), noise, steps,
                        alpha_c)
    eps = jax.random.uniform(k_eps, (batch, 1, 1, 1), cdt)

    def c_loss_fn(c_params):
        cp = _cast_floats(c_params, cdt)
        c_real = critic.apply_fn({"params": cp}, real_c, steps, alpha_c)
        c_fake = critic.apply_fn({"params": cp},
                                 jax.lax.stop_gradient(fake), steps,
                                 alpha_c)
        gp = gradient_penalty_fn(critic.apply_fn, cp, real_c, fake, eps,
                                 steps, alpha_c)
        c_real = c_real.astype(jnp.float32)
        c_fake = c_fake.astype(jnp.float32)
        return (-(jnp.mean(c_real) - jnp.mean(c_fake))
                + lambda_gp * gp.astype(jnp.float32)
                + drift * jnp.mean(jnp.square(c_real)))

    loss_c, c_grads = jax.value_and_grad(c_loss_fn)(critic.params)
    critic = critic.apply_gradients(c_grads)

    def g_loss_fn(g_params):
        fake2 = gen.apply_fn({"params": _cast_floats(g_params, cdt)},
                             noise, steps, alpha_c)
        out = critic.apply_fn(
            {"params": _cast_floats(critic.params, cdt)}, fake2, steps,
            alpha_c)
        return -jnp.mean(out.astype(jnp.float32))

    loss_g, g_grads = jax.value_and_grad(g_loss_fn)(gen.params)
    gen = gen.apply_gradients(g_grads)

    return (state.replace(step=state.step + 1, gen=gen, disc=critic),
            {"loss_critic": loss_c, "loss_gen": loss_g})


def build_state(cfg: PGGANConfig, key: jax.Array,
                max_steps: int | None = None) -> GANState:
    from math import log2

    max_steps = max_steps if max_steps is not None else int(
        log2(cfg.image_size / 4))
    gen = Generator(nz=cfg.nz, in_channels=cfg.in_channels, nc=cfg.nc)
    critic = Discriminator(in_channels=cfg.in_channels, nc=cfg.nc)
    kg, kd = jax.random.split(key)
    gv = init_progressive(gen, kg, jnp.zeros((1, cfg.nz)), max_steps)
    dv = init_progressive(critic, kd, jnp.zeros((1, 4, 4, cfg.nc)),
                          max_steps)
    tx = adam_torch(cfg.lr, 0.0, 0.99)  # betas (0.0, 0.99), train.py:160-161
    return GANState(step=jnp.zeros((), jnp.int32),
                    gen=ModelState.create(gen, gv, tx),
                    disc=ModelState.create(critic, dv, tx))


def train(cfg: PGGANConfig, images: np.ndarray | None = None,
          logger: MetricsLogger | None = None) -> GANState:
    """Progressive loop (``train.py:145-199``): for each resolution
    4*2^step, ``num_epochs`` epochs with alpha ramping from ~0 to 1 over
    the first half of the epochs."""
    from math import log2

    logger = logger or MetricsLogger(wandb_project=cfg.wandb,
                                     image_dir=resolve_grid_dir(cfg))
    key = jax.random.key(cfg.seed)
    max_steps = int(log2(cfg.image_size / 4))
    state = build_state(cfg, key, max_steps)
    mesh = data_parallel_mesh(cfg.mesh_shape)
    if mesh is not None:  # DP: params replicated, batch sharded, psum'd
        state = jax.device_put(state, NamedSharding(mesh, P()))

    if images is None:
        images = load_train_images(cfg.data_path, cfg.image_size)

    meter = Throughput()
    step_key = jax.random.fold_in(key, 1)
    metrics = {}
    start_step = int(log2(cfg.start_img_size / 4))
    for steps in range(start_step, max_steps + 1):
        res = 4 * 2 ** steps
        batch_size = cfg.batch_sizes[min(steps, len(cfg.batch_sizes) - 1)]
        # PIL-NEAREST-exact downscale to this resolution (the reference
        # reloads with Resize(NEAREST), train.py:82-92)
        res_images = nearest_resize(images, res)
        ds = DeviceDataset(res_images, seed=cfg.seed + steps)
        alpha = 1e-5
        n_ds = len(ds)
        for epoch in range(cfg.num_epochs):
            for batch in ds.epoch(batch_size):
                step_key = jax.random.fold_in(step_key, 1)
                if cfg.hflip:  # RandomHorizontalFlip(p=0.5), train.py:83
                    batch = random_hflip(
                        batch, jax.random.fold_in(step_key, 2))
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                state, metrics = pggan_train_step(
                    state, batch, jnp.float32(alpha), step_key, steps,
                    cfg.lambda_gp, cfg.drift,
                    compute_dtype=cfg.compute_dtype)
                # per-batch alpha ramp (train.py:134-135)
                alpha = min(
                    alpha + batch.shape[0] / (cfg.num_epochs * 0.5 * n_ds),
                    1.0)
                meter.add(batch.shape[0])
            # per-epoch sample grid (pggan/train.py:190-197)
            _log_sample_grid(
                logger, _sample_fn(cfg.nz, cfg.in_channels, cfg.nc, steps),
                {"params": state.gen.params},
                jax.random.normal(jax.random.fold_in(key, 3), (64, cfg.nz)),
                int(state.step), jnp.float32(alpha))
        logger.log({"resolution": res, **jax.device_get(metrics),
                    "alpha": alpha, "images_per_sec": meter.rate()},
                   step=int(state.step))

    if cfg.save_model:
        dirname = check_folder(timestamp_dir(os.path.join(cfg.PATH,
                                                          "pggan")))
        save_state(os.path.join(dirname, "generator.msgpack"),
                   {"params": state.gen.params})
        save_state(os.path.join(dirname, "critic.msgpack"),
                   {"params": state.disc.params})
    return state


import functools


@functools.lru_cache(maxsize=16)
def _sample_fn(nz: int, in_channels: int, nc: int, steps: int):
    gen = Generator(nz=nz, in_channels=in_channels, nc=nc)
    # alpha is a traced arg so mid-fade-in sample grids show the network
    # actually being trained (reference logs fakes at the CURRENT alpha,
    # pggan/train.py:196-197); generation-time callers use the 1.0 default
    return lambda v, z, alpha=1.0: gen.apply(v, z, steps, alpha)


def generate(cfg: PGGANConfig, state: GANState, run_dir: str | None = None,
             steps: int | None = None) -> dict[str, str]:
    """Batched generation at the final resolution (``train.py:208-257``;
    the reference hardcodes steps=4/64x64 at ``:238``)."""
    from math import log2

    steps = steps if steps is not None else int(log2(cfg.image_size / 4))
    variables = {"params": state.gen.params}
    sample_fn = _sample_fn(cfg.nz, cfg.in_channels, cfg.nc, steps)
    key = jax.random.fold_in(jax.random.key(cfg.seed), 2)
    batch = min(cfg.num_generated, 128)
    noise, imgs01 = sample_to_host(sample_fn, variables, cfg.num_generated,
                                   cfg.nz, batch, key)
    root = os.path.join(cfg.PATH_syn_data, "pggan")
    return write_synthetic_artifacts(root, "pggan", imgs01, noise, run_dir)
