"""WGAN-GP trainer (reference: ``gan_models/wgangp/train.py``).

Per outer batch: ``critic_iter`` critic updates (fresh noise each,
``train.py:98-108``), then one generator update on the LAST fake batch
against the updated critic (``:111-115``). The gradient penalty
(``utils.py:4-24``) is ``jax.grad`` of the critic score w.r.t. the
eps-interpolated images — grad-of-grad under jit replaces
``torch.autograd.grad(create_graph=True)``.

Divergence from the reference recorded in DIVERGENCES.md: its ``train.py:68``
overwrites the image dataset with a MIMIC matrix (a leftover bug, the loop
still indexes ``data[0]`` as if batched images); we train on the configured
image directory as the surrounding code intends.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import numpy as np

from ganleaks_tpu.config import WGANGPConfig
from ganleaks_tpu.io.artifacts import check_folder, timestamp_dir, write_synthetic_artifacts
from ganleaks_tpu.io.data import DeviceDataset, load_train_images
from ganleaks_tpu.parallel.mesh import data_parallel_mesh, shard_batch
from ganleaks_tpu.models.wgangp import Critic, Generator
from ganleaks_tpu.train.gan import GANState
from ganleaks_tpu.train.sample import sample_to_host
from ganleaks_tpu.train.state import ModelState, adam_torch
from ganleaks_tpu.utils.checkpoint import save_state
from ganleaks_tpu.utils.logging import MetricsLogger, Throughput

Array = jax.Array


def gradient_penalty_fn(critic_apply, c_params, real: Array, fake: Array,
                        eps: Array) -> Array:
    """((||grad_x critic(eps*real + (1-eps)*fake)||_2 - 1)^2).mean()
    (``wgangp/utils.py:4-24``)."""
    interp = real * eps + fake * (1.0 - eps)

    def score_sum(x):
        return jnp.sum(critic_apply({"params": c_params}, x).reshape(-1))

    grads = jax.grad(score_sum)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(
        grads.reshape(grads.shape[0], -1)), axis=1))
    return jnp.mean(jnp.square(norms - 1.0))


@partial(jax.jit, static_argnames=("critic_iter",), donate_argnums=0)
def wgangp_train_step(state: GANState, real: Array, rng: Array,
                      critic_iter: int = 5, lambda_gp: float = 10.0):
    gen, critic = state.gen, state.disc
    batch = real.shape[0]
    nz = gen.params["block0_conv"]["kernel"].shape[2]

    loss_c = jnp.zeros(())
    noise = None
    for t in range(critic_iter):
        rng, k_noise, k_eps = jax.random.split(rng, 3)
        noise = jax.random.normal(k_noise, (batch, nz), real.dtype)
        fake, gvars = gen.apply_fn(gen.variables(), noise, train=True,
                                   mutable=["batch_stats"])
        gen = gen.replace(batch_stats=gvars["batch_stats"])
        fake = jax.lax.stop_gradient(fake)
        eps = jax.random.uniform(k_eps, (batch, 1, 1, 1), real.dtype)

        def c_loss_fn(c_params):
            gp = gradient_penalty_fn(critic.apply_fn, c_params, real, fake,
                                     eps)
            c_fake = critic.apply_fn({"params": c_params}, fake)
            c_real = critic.apply_fn({"params": c_params}, real)
            return (jnp.mean(c_fake) - jnp.mean(c_real)
                    + lambda_gp * gp)

        loss_c, c_grads = jax.value_and_grad(c_loss_fn)(critic.params)
        critic = critic.apply_gradients(c_grads)

    # generator step on the last noise, updated critic (train.py:111-115)
    def g_loss_fn(g_params):
        gv = {"params": g_params, "batch_stats": gen.batch_stats}
        fake2, _ = gen.apply_fn(gv, noise, train=True,
                                mutable=["batch_stats"])
        out = critic.apply_fn({"params": critic.params}, fake2)
        return -jnp.mean(out)

    loss_g, g_grads = jax.value_and_grad(g_loss_fn)(gen.params)
    gen = gen.apply_gradients(g_grads)

    return (state.replace(step=state.step + 1, gen=gen, disc=critic),
            {"loss_critic": loss_c, "loss_gen": loss_g})


def build_state(cfg: WGANGPConfig, key: jax.Array) -> GANState:
    gen = Generator(nz=cfg.nz, nc=cfg.nc, ngf=cfg.ngf)
    critic = Critic(ndf=cfg.ndf)
    kg, kd = jax.random.split(key)
    gv = gen.init(kg, jnp.zeros((1, cfg.nz)), train=True)
    dv = critic.init(kd, jnp.zeros((1, cfg.image_size, cfg.image_size,
                                    cfg.nc)))
    tx = adam_torch(cfg.lr, cfg.beta1, cfg.beta2)
    return GANState(step=jnp.zeros((), jnp.int32),
                    gen=ModelState.create(gen, gv, tx),
                    disc=ModelState.create(critic, dv, tx))


def train(cfg: WGANGPConfig, images: np.ndarray | None = None,
          logger: MetricsLogger | None = None) -> GANState:
    logger = logger or MetricsLogger()
    key = jax.random.key(cfg.seed)
    if images is None:
        images = load_train_images(cfg.data_path, cfg.image_size)
    ds = DeviceDataset(images, seed=cfg.seed)
    state = build_state(cfg, key)
    mesh = data_parallel_mesh(cfg.mesh_shape)
    if mesh is not None:  # DP: params replicated, batch sharded, psum'd
        state = jax.device_put(state, NamedSharding(mesh, P()))

    meter = Throughput()
    step_key = jax.random.fold_in(key, 1)
    metrics = {}
    for epoch in range(cfg.num_epochs):
        for batch in ds.epoch(cfg.batch_size):
            step_key = jax.random.fold_in(step_key, 1)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = wgangp_train_step(
                state, batch, step_key, critic_iter=cfg.critic_iter,
                lambda_gp=cfg.lambda_gp)
            meter.add(batch.shape[0])
        logger.log({"epoch": epoch, **jax.device_get(metrics),
                    "images_per_sec": meter.rate()}, step=int(state.step))

    if cfg.save_model:
        dirname = check_folder(timestamp_dir(os.path.join(cfg.PATH,
                                                          "wgangp")))
        save_state(os.path.join(dirname, "generator.msgpack"),
                   {"params": state.gen.params,
                    "batch_stats": state.gen.batch_stats})
        save_state(os.path.join(dirname, "critic.msgpack"),
                   {"params": state.disc.params})
    return state


def generate(cfg: WGANGPConfig, state: GANState,
             run_dir: str | None = None) -> dict[str, str]:
    """Reference artifact triplet (``wgangp/train.py:153-174``)."""
    from ganleaks_tpu.train.dcgan import _sample_fn

    variables = {"params": state.gen.params,
                 "batch_stats": state.gen.batch_stats}
    sample_fn = _sample_fn(cfg.nz, cfg.nc, cfg.ngf)  # same net as DCGAN
    key = jax.random.fold_in(jax.random.key(cfg.seed), 2)
    batch = min(cfg.num_generated, 512)
    noise, imgs01 = sample_to_host(sample_fn, variables, cfg.num_generated,
                                   cfg.nz, batch, key)
    root = os.path.join(cfg.PATH_syn_data, "wgangp")
    return write_synthetic_artifacts(root, "wgangp", imgs01, noise, run_dir)
