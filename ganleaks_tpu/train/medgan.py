"""medGAN trainer (reference: ``gan_models/medgan/train.py`` +
``gan_models/medgan/utils.py``).

Phase 1: pretrain the autoencoder with the per-feature-sum BCE
(``utils.py:18-32``, ``train.py:125-148``). Phase 2: GAN loop — D sees
real vs decoded-G(z) (detached), G minimizes -log D(dec(G(z))) with the
autoencoder co-optimized at lr 1e-4 (``train.py:112-114,150-199``).

Replicated quirks: the reference feeds the discriminator's *sigmoid output*
to BCE-with-logits (``utils.py:36-42`` applied to a Sigmoid-ended model) and
samples training batches WITH replacement (RandomSampler(replacement=True),
``train.py:68``). Generation thresholds decoded samples at 0.5 into a binary
matrix saved as ``synthetic.npy`` (``train.py:306-318``).
"""

from __future__ import annotations

import os
from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import numpy as np
import optax
from flax import struct

from ganleaks_tpu.config import MedGANConfig
from ganleaks_tpu.io.artifacts import check_folder, timestamp_dir
from ganleaks_tpu.models.medgan import Autoencoder, Discriminator, Generator
from ganleaks_tpu.train.state import ModelState, adam_torch
from ganleaks_tpu.parallel.mesh import data_parallel_mesh, shard_batch
from ganleaks_tpu.utils.checkpoint import save_state
from ganleaks_tpu.utils.logging import MetricsLogger

Array = jax.Array
EPS = 1e-12


class MedGANState(struct.PyTreeNode):
    step: Array
    gen: ModelState
    disc: ModelState
    ae: ModelState
    ae_in_g: ModelState  # autoencoder under the G optimizer (lr 1e-4)


# --- reference losses (medgan/utils.py) -------------------------------------

def generator_loss(y_fake: Array) -> Array:
    """-mean(log(y_fake + eps)) (``utils.py:7-15``)."""
    return -jnp.mean(jnp.log(y_fake + EPS))


def autoencoder_loss(x_out: Array, y_target: Array, binary: bool) -> Array:
    """Sum over features, mean over batch (``utils.py:18-32``)."""
    if binary:
        term = (y_target * jnp.log(x_out + EPS)
                + (1.0 - y_target) * jnp.log(1.0 - x_out + EPS))
        return jnp.mean(-jnp.sum(term, axis=1))
    return jnp.mean(jnp.sum(jnp.square(x_out - y_target), axis=1))


def discriminator_loss(out_real: Array, out_fake: Array) -> Array:
    """BCE-with-logits applied to sigmoid outputs — reference quirk
    (``utils.py:36-42``): softplus formulation on probabilities."""
    real = optax.sigmoid_binary_cross_entropy(out_real,
                                              jnp.ones_like(out_real))
    fake = optax.sigmoid_binary_cross_entropy(out_fake,
                                              jnp.zeros_like(out_fake))
    return jnp.mean(real) + jnp.mean(fake)


def discriminator_accuracy(pred: Array, y_true: bool) -> Array:
    """(``utils.py:46-56``)."""
    p = pred > 0.5
    return jnp.mean((p == y_true).astype(jnp.float32))


# --- data --------------------------------------------------------------------

def load_csv_dataset(path: str, train: bool = True) -> np.ndarray:
    """CSV -> median-fill -> 90/10 split, sklearn random_state=42
    (``model.py:107-130``)."""
    import pandas as pd
    from sklearn.model_selection import train_test_split

    data = pd.read_csv(os.path.expanduser(path), header=0)
    data = data.fillna(data.median())
    train_data, test_data = train_test_split(data, test_size=0.1,
                                             random_state=42)
    chosen = train_data if train else test_data
    return chosen.reset_index(drop=True).values.astype(np.float32)


# --- steps ---------------------------------------------------------------------

@partial(jax.jit, static_argnames=("binary",), donate_argnums=0)
def ae_pretrain_step(ae: ModelState, real: Array, binary: bool = True):
    def loss_fn(params):
        recon = ae.apply_fn({"params": params}, real)
        return autoencoder_loss(recon, real, binary)

    loss, grads = jax.value_and_grad(loss_fn)(ae.params)
    return ae.apply_gradients(grads), {"a_loss": loss}


@partial(jax.jit, donate_argnums=0)
def medgan_train_step(state: MedGANState, real: Array, rng: Array):
    gen, disc, ae = state.gen, state.disc, state.ae_in_g
    latent = gen.params["block1_fc"]["kernel"].shape[0]
    z = jax.random.normal(rng, (real.shape[0], latent), real.dtype)

    # --- D step (train.py:160-180): fake = dec(G(z)).detach() ---
    fake_g, gvars = gen.apply_fn(gen.variables(), z, train=True,
                                 mutable=["batch_stats"])
    gen = gen.replace(batch_stats=gvars["batch_stats"])
    fake = jax.lax.stop_gradient(
        ae.apply_fn({"params": ae.params}, fake_g, method="decode"))

    def d_loss_fn(d_params):
        out_real = disc.apply_fn({"params": d_params}, real)
        out_fake = disc.apply_fn({"params": d_params}, fake)
        return discriminator_loss(out_real, out_fake)

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc.params)
    disc = disc.apply_gradients(d_grads)

    # --- G step (train.py:182-199): G and AE.decode co-optimized ---
    def g_loss_fn(g_params, ae_params):
        gv = {"params": g_params, "batch_stats": gen.batch_stats}
        fake2, _ = gen.apply_fn(gv, z, train=True, mutable=["batch_stats"])
        dec = ae.apply_fn({"params": ae_params}, fake2,
                          method="decode")
        out = disc.apply_fn({"params": disc.params}, dec)
        return generator_loss(out)

    g_loss, (g_grads, ae_grads) = jax.value_and_grad(
        g_loss_fn, argnums=(0, 1))(gen.params, ae.params)
    gen = gen.apply_gradients(g_grads)
    ae = ae.apply_gradients(ae_grads)

    new = state.replace(step=state.step + 1, gen=gen, disc=disc,
                        ae_in_g=ae, ae=state.ae.replace(params=ae.params))
    return new, {"d_loss": d_loss, "g_loss": g_loss}


# --- driver --------------------------------------------------------------------

def build_state(cfg: MedGANConfig, input_size: int,
                key: jax.Array) -> MedGANState:
    gen = Generator(z_dim=cfg.latent_dim, hidden_size=cfg.hidden_gen)
    disc = Discriminator(hidden1=cfg.hidden_disc1, hidden2=cfg.hidden_disc2,
                         minibatch_average=cfg.minibatch_averaging)
    ae = Autoencoder(input_size=input_size, hidden_size=cfg.hidden_gen,
                     binary=cfg.binary)
    kg, kd, ka = jax.random.split(key, 3)
    gv = gen.init(kg, jnp.zeros((2, cfg.latent_dim)), train=True)
    dv = disc.init(kd, jnp.zeros((2, input_size)))
    av = ae.init(ka, jnp.zeros((2, input_size)))
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2, weight_decay=cfg.weight_decay)
    tx_ae_g = adam_torch(1e-4, cfg.b1, cfg.b2,
                         weight_decay=cfg.weight_decay)
    return MedGANState(
        step=jnp.zeros((), jnp.int32),
        gen=ModelState.create(gen, gv, tx),
        disc=ModelState.create(disc, dv, tx),
        ae=ModelState.create(ae, av, tx),
        ae_in_g=ModelState.create(ae, av, tx_ae_g))


def train(cfg: MedGANConfig, data: np.ndarray | None = None,
          test_data: np.ndarray | None = None,
          logger: MetricsLogger | None = None) -> MedGANState:
    logger = logger or MetricsLogger()
    if data is None:
        data = load_csv_dataset(cfg.DATASETPATH, train=True)
        test_data = load_csv_dataset(cfg.DATASETPATH, train=False)
    data_j = jnp.asarray(data)
    key = jax.random.key(cfg.seed)
    state = build_state(cfg, data.shape[1], key)
    host_rng = np.random.default_rng(cfg.seed)
    n = len(data)
    batches_per_epoch = max(1, n // cfg.batch_size)

    mesh = data_parallel_mesh(cfg.mesh_shape)
    if mesh is not None:  # DP: params replicated, batch sharded
        state = jax.device_put(state, NamedSharding(mesh, P()))

    def sample_batch():  # with replacement, like the reference sampler
        idx = host_rng.integers(0, n, size=min(cfg.batch_size, n))
        b = data_j[jnp.asarray(idx)]
        return shard_batch(b, mesh) if mesh is not None else b

    # phase 1: AE pretrain (train.py:125-148)
    ae = state.ae
    a_loss = None
    for _ in range(cfg.n_epochs_pretrain):
        for _ in range(batches_per_epoch):
            ae, m = ae_pretrain_step(ae, sample_batch(), binary=cfg.binary)
            a_loss = m["a_loss"]
    state = state.replace(ae=ae, ae_in_g=state.ae_in_g.replace(
        params=ae.params))
    if a_loss is not None:
        logger.log({"pretrain_a_loss": float(a_loss)})

    # phase 2: GAN loop
    step_key = jax.random.fold_in(key, 1)
    metrics = {}
    for epoch in range(cfg.n_epochs):
        for _ in range(batches_per_epoch):
            step_key = jax.random.fold_in(step_key, 1)
            state, metrics = medgan_train_step(state, sample_batch(),
                                               step_key)
        if (epoch + 1) % 10 == 0 or epoch == cfg.n_epochs - 1:
            rec = dict(jax.device_get(metrics))
            if test_data is not None:
                rec.update(evaluate(cfg, state, test_data,
                                    jax.random.fold_in(key, 2 + epoch)))
            logger.log({"epoch": epoch + 1, **rec}, step=int(state.step))

    if cfg.save_model:
        dirname = check_folder(timestamp_dir(os.path.join(cfg.PATH,
                                                          "medgan")))
        save_state(os.path.join(dirname, "medgan.msgpack"),
                   {"gen": {"params": state.gen.params,
                            "batch_stats": state.gen.batch_stats},
                    "ae": {"params": state.ae.params},
                    "disc": {"params": state.disc.params}})
    return state


def evaluate(cfg: MedGANConfig, state: MedGANState, test_data: np.ndarray,
             rng: jax.Array) -> dict:
    """Per-epoch test metrics (``train.py:201-231``)."""
    test = jnp.asarray(test_data[:cfg.batch_size])
    z = jax.random.normal(rng, (test.shape[0], cfg.latent_dim))
    fake_g = state.gen.apply_fn(state.gen.variables(), z, train=False)
    dec = state.ae.apply_fn({"params": state.ae.params}, fake_g,
                            method="decode")
    out_fake = state.disc.apply_fn({"params": state.disc.params}, dec)
    out_real = state.disc.apply_fn({"params": state.disc.params}, test)
    recon = state.ae.apply_fn({"params": state.ae.params}, test)
    return {
        "d_loss_test": float(discriminator_loss(out_real, out_fake)),
        "g_loss_test": float(generator_loss(out_fake)),
        "a_loss_test": float(autoencoder_loss(recon, test, cfg.binary)),
        "accuracy_real": float(discriminator_accuracy(out_real, True)),
        "accuracy_fake": float(discriminator_accuracy(out_fake, False)),
    }


def generate(cfg: MedGANConfig, state: MedGANState,
             out_dir: str | None = None) -> np.ndarray:
    """Binary synthetic matrix -> ``synthetic.npy``
    (``train.py:247-318``; np.random seed 1234 noted, jax keys used)."""
    key = jax.random.key(1234)
    z = jax.random.normal(key, (cfg.generate_N, cfg.latent_dim))
    fake_g = state.gen.apply_fn(state.gen.variables(), z, train=False)
    dec = state.ae.apply_fn({"params": state.ae.params}, fake_g,
                            method="decode")
    samples = np.asarray(dec, np.float32)
    samples = (samples >= 0.5).astype(np.float32)
    out_dir = out_dir or cfg.PATH
    check_folder(out_dir)
    np.save(os.path.join(out_dir, "synthetic.npy"), samples,
            allow_pickle=False)
    return samples


def dimension_wise_probability(real: np.ndarray,
                               syn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-feature Bernoulli means for the eval scatter
    (``train.py:320-340``)."""
    n = min(len(real), len(syn))
    return real[:n].mean(axis=0), syn[:n].mean(axis=0)
