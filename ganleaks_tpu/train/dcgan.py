"""DCGAN trainer driver (reference: ``gan_models/dcgan/train_torch.py``).

Wires config -> device dataset -> jitted train step -> checkpoint ->
batched sampling -> reference-format artifacts. Under a >1 device mesh the
step is data-parallel: batch sharded over the mesh, parameters replicated,
gradient psum inserted by pjit.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.config import DCGANConfig
from ganleaks_tpu.io.artifacts import check_folder, timestamp_dir, write_synthetic_artifacts
from ganleaks_tpu.io.data import DeviceDataset, load_train_images
from ganleaks_tpu.models.dcgan import Discriminator, Generator
from ganleaks_tpu.parallel.mesh import data_parallel_mesh, shard_batch
from ganleaks_tpu.train.gan import GANState, dcgan_train_step
from ganleaks_tpu.train.sample import sample_to_host
from ganleaks_tpu.train.state import ModelState, adam_torch
from ganleaks_tpu.utils.checkpoint import save_state
from ganleaks_tpu.utils.logging import MetricsLogger, Throughput


def resolve_grid_dir(cfg) -> str | None:
    """Sample-grid sink: "auto" puts grids under the run's model dir."""
    if cfg.sample_grid_dir == "auto":
        return os.path.join(cfg.PATH, "sample_grids")
    return cfg.sample_grid_dir or None


def build_state(cfg: DCGANConfig, key: jax.Array) -> GANState:
    gen = Generator(nz=cfg.nz, nc=cfg.nc, ngf=cfg.ngf,
                    image_size=cfg.image_size)
    disc = Discriminator(ndf=cfg.ndf, image_size=cfg.image_size)
    kg, kd = jax.random.split(key)
    gv = gen.init(kg, jnp.zeros((1, cfg.nz)), train=True)
    dv = disc.init(kd, jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.nc)),
                   train=True)
    tx = adam_torch(cfg.lr, cfg.beta1, cfg.beta2)
    return GANState(step=jnp.zeros((), jnp.int32),
                    gen=ModelState.create(gen, gv, tx),
                    disc=ModelState.create(disc, dv, tx))


def train(cfg: DCGANConfig, images: np.ndarray | None = None,
          logger: MetricsLogger | None = None) -> GANState:
    """Train loop (``train_torch.py:88-127``)."""
    logger = logger or MetricsLogger(wandb_project=cfg.wandb,
                                     image_dir=resolve_grid_dir(cfg))
    key = jax.random.key(cfg.seed)
    mesh = data_parallel_mesh(cfg.mesh_shape)

    if images is None:
        images = load_train_images(cfg.data_path, cfg.image_size)
    ds = DeviceDataset(images, seed=cfg.seed)
    state = build_state(cfg, key)
    if mesh is not None:
        # replicate the state explicitly (like every sibling trainer):
        # an uncommitted pytree rides on jit auto-resharding, which
        # breaks the moment any leaf arrives committed (e.g. a loaded
        # checkpoint on device 0)
        from jax.sharding import NamedSharding, PartitionSpec as P
        state = jax.device_put(state, NamedSharding(mesh, P()))

    meter = Throughput()
    step_key = jax.random.fold_in(key, 1)
    # fixed noise for the per-epoch sample grid (train_torch.py:125-127)
    grid_z = jax.random.normal(jax.random.fold_in(key, 3), (64, cfg.nz))
    sample_fn = _sample_fn(cfg.nz, cfg.nc, cfg.ngf, cfg.image_size)
    for epoch in range(cfg.num_epochs):
        for batch in ds.epoch(cfg.batch_size):
            step_key = jax.random.fold_in(step_key, 1)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = dcgan_train_step(state, batch, step_key)
            meter.add(batch.shape[0])
        metrics = jax.device_get(metrics)
        logger.log({"epoch": epoch, **metrics,
                    "images_per_sec": meter.rate()}, step=int(state.step))
        _log_sample_grid(logger, sample_fn,
                         {"params": state.gen.params,
                          "batch_stats": state.gen.batch_stats},
                         grid_z, int(state.step))

    if cfg.save_model:
        dirname = check_folder(timestamp_dir(os.path.join(cfg.PATH, "dcgan")))
        save_state(os.path.join(dirname, "generator.msgpack"),
                   {"params": state.gen.params,
                    "batch_stats": state.gen.batch_stats})
        save_state(os.path.join(dirname, "discriminator.msgpack"),
                   {"params": state.disc.params,
                    "batch_stats": state.disc.batch_stats})
    return state


def load_generator_variables(cfg: DCGANConfig, model_dir: str) -> dict:
    """Reload a saved generator for generation-only mode
    (``train_torch.py:146-148``)."""
    from ganleaks_tpu.utils.checkpoint import load_state

    gen = Generator(nz=cfg.nz, nc=cfg.nc, ngf=cfg.ngf,
                    image_size=cfg.image_size)
    template = gen.init(jax.random.key(0), jnp.zeros((1, cfg.nz)),
                        train=True)
    return load_state(os.path.join(model_dir, "generator.msgpack"),
                      {"params": template["params"],
                       "batch_stats": template["batch_stats"]})


import functools


@functools.lru_cache(maxsize=32)
def _jitted(fn):
    return jax.jit(fn)


def _log_sample_grid(logger: MetricsLogger, sample_fn, variables,
                     z: jax.Array, step: int, *extra) -> None:
    """Per-epoch generated-sample grid (observability parity with the
    reference's wandb image logging, ``train_torch.py:125-127``). No-op
    unless the logger has an image sink configured. ``extra`` forwards
    traced sampler args (e.g. PGGAN's current fade-in alpha) without
    defeating the per-architecture jit cache."""
    if logger.image_dir is None and logger._wandb is None:
        return
    img = _jitted(sample_fn)(variables, z, *extra)
    logger.log_image_grid(
        "samples", np.clip((np.asarray(img) + 1.0) / 2.0, 0.0, 1.0),
        step=step)


@functools.lru_cache(maxsize=16)
def _sample_fn(nz: int, nc: int, ngf: int, image_size: int = 64):
    """Stable per-architecture sampler so _build_sampler's compile cache
    hits across generate() calls (a fresh lambda would defeat it)."""
    gen = Generator(nz=nz, nc=nc, ngf=ngf, image_size=image_size)
    return lambda v, z: gen.apply(v, z, train=False)


def generate(cfg: DCGANConfig, state: GANState | None = None,
             run_dir: str | None = None,
             variables: dict | None = None) -> dict[str, str]:
    """Sample ``num_generated`` images and write the reference artifact
    triplet (``train_torch.py:152-174``)."""
    gen = Generator(nz=cfg.nz, nc=cfg.nc, ngf=cfg.ngf,
                    image_size=cfg.image_size)
    if variables is None:
        if state is None:
            assert cfg.saved_model_name, "need a trained state or saved model"
            variables = load_generator_variables(cfg, cfg.saved_model_name)
        else:
            variables = {"params": state.gen.params,
                         "batch_stats": state.gen.batch_stats}
    sample_fn = _sample_fn(cfg.nz, cfg.nc, cfg.ngf, cfg.image_size)
    key = jax.random.fold_in(jax.random.key(cfg.seed), 2)
    batch = min(cfg.num_generated, 512)
    noise, imgs01 = sample_to_host(sample_fn, variables, cfg.num_generated,
                                   cfg.nz, batch, key)
    root = os.path.join(cfg.PATH_syn_data, "dcgan")
    return write_synthetic_artifacts(root, "dcgan", imgs01, noise, run_dir)
