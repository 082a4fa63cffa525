"""jit-compiled GAN training steps (BCE/DCGAN family).

Replaces the per-batch eager loop of ``gan_models/dcgan/train_torch.py:88-127``
with one pure step: D update then G update, same ordering and gradient
semantics as the reference —

* ``fake`` is generated once per iteration from fresh noise
  (``train_torch.py:95-96``);
* the D step sees ``fake`` detached (``:101``), loss is
  ``(BCE(D(real),1) + BCE(D(fake),0)) / 2`` (``:100-103``);
* the G step runs against the *updated* discriminator (``:109-113``) on the
  same fake batch.

BCE is computed from logits with ``optax.sigmoid_binary_cross_entropy``
(mathematically equal to the reference's Sigmoid+BCELoss, numerically
stable — the reference clamps log at -100 instead).

BatchNorm: in train mode torch BN normalizes by current-batch statistics, so
re-applying G inside the G-step loss with the same noise reproduces the same
activations the reference's retained graph holds; running stats are recorded
once per network per forward, exactly as the torch calls do.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ganleaks_tpu.train.state import ModelState

Array = jax.Array


class GANState(struct.PyTreeNode):
    step: Array
    gen: ModelState
    disc: ModelState


def bce_with_logits(logits: Array, target: float) -> Array:
    labels = jnp.full_like(logits, target)
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


@partial(jax.jit, donate_argnums=0)
def dcgan_train_step(state: GANState, real: Array, rng: Array):
    """One D+G update (``train_torch.py:93-113``)."""
    batch = real.shape[0]
    gen, disc = state.gen, state.disc
    nz = _latent_dim(gen)
    noise = jax.random.normal(rng, (batch, nz), real.dtype)

    # fake once per iteration; G batch_stats advance once (train_torch.py:96)
    fake, gvars = gen.apply_fn(gen.variables(), noise, train=True,
                               mutable=["batch_stats"])
    gen = gen.replace(batch_stats=gvars["batch_stats"])

    # --- discriminator step (train_torch.py:99-106) ---
    def d_loss_fn(d_params):
        v = {"params": d_params, "batch_stats": disc.batch_stats}
        out_real, m1 = disc.apply_fn(v, real, train=True,
                                     mutable=["batch_stats"])
        v = {"params": d_params, "batch_stats": m1["batch_stats"]}
        out_fake, m2 = disc.apply_fn(v, jax.lax.stop_gradient(fake),
                                     train=True, mutable=["batch_stats"])
        loss_real = bce_with_logits(out_real, 1.0)
        loss_fake = bce_with_logits(out_fake, 0.0)
        return (loss_real + loss_fake) / 2.0, m2["batch_stats"]

    (loss_d, d_stats), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(disc.params)
    disc = disc.apply_gradients(d_grads).replace(batch_stats=d_stats)

    # --- generator step against the updated D (train_torch.py:109-113) ---
    def g_loss_fn(g_params):
        gv = {"params": g_params, "batch_stats": gen.batch_stats}
        # train-mode BN normalizes by batch statistics; the stats update is
        # discarded (the reference's single G forward already recorded it)
        fake2, _ = gen.apply_fn(gv, noise, train=True,
                                mutable=["batch_stats"])
        dv = {"params": disc.params, "batch_stats": disc.batch_stats}
        out, m = disc.apply_fn(dv, fake2, train=True, mutable=["batch_stats"])
        return bce_with_logits(out, 1.0), m["batch_stats"]

    (loss_g, d_stats2), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True)(gen.params)
    gen = gen.apply_gradients(g_grads)
    disc = disc.replace(batch_stats=d_stats2)

    new_state = state.replace(step=state.step + 1, gen=gen, disc=disc)
    return new_state, {"loss_disc": loss_d, "loss_gen": loss_g}


def _latent_dim(gen: ModelState) -> int:
    """Latent width from the first generator kernel (HWIO input channels)."""
    leaf = gen.params
    for name in ("block0_conv", "initial_conv", "deconv1", "gen_block1"):
        if name in leaf:
            k = leaf[name]["kernel"]
            return int(k.shape[2]) if k.ndim == 4 else int(k.shape[0])
    raise ValueError("cannot infer latent dim from generator params")
