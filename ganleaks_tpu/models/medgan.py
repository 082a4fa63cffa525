"""medGAN — tabular/EHR generator (reference: ``gan_models/medgan/model.py``).

Autoencoder with one hidden layer (Tanh/Sigmoid when binary, else ReLU,
``model.py:13-41``), residual two-block Generator with BatchNorm1d
(eps=0.001, momentum=0.01; ``model.py:44-73``), MLP Discriminator with
minibatch averaging (``model.py:76-103``).

Replicated reference quirk: with minibatch averaging the concatenated
[x, mean(x)] input is divided by the batch size (``model.py:99-101``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganleaks_tpu.ops.nn import BatchNormTorch, DenseTorch

Array = jax.Array


class Autoencoder(nn.Module):
    input_size: int
    hidden_size: int = 128
    binary: bool = True

    def setup(self):
        self.enc = DenseTorch(self.hidden_size)
        self.dec = DenseTorch(self.input_size)

    def __call__(self, x: Array) -> Array:
        return self.decode(self.encode(x))

    def encode(self, x: Array) -> Array:
        h = self.enc(x)
        return jnp.tanh(h) if self.binary else nn.relu(h)

    def decode(self, h: Array) -> Array:
        y = self.dec(h)
        return jax.nn.sigmoid(y) if self.binary else nn.relu(y)


class Generator(nn.Module):
    """Residual generator: out = z + block(z), twice (``model.py:44-73``).
    ``hidden_size`` and ``genDim`` must equal ``z_dim`` for the residual
    adds, as in the reference defaults (128)."""

    z_dim: int = 128
    hidden_size: int = 128
    gen_dim: int | None = None  # reference hardcodes 128 == z_dim
                                # (model.py:49); residual adds force equality

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        gen_dim = self.gen_dim if self.gen_dim is not None else self.z_dim
        h = DenseTorch(self.hidden_size, name="block1_fc")(z)
        h = BatchNormTorch(eps=0.001, momentum=0.01, name="block1")(
            h, use_running_average=not train)
        out1 = z + nn.relu(h)
        h = DenseTorch(gen_dim, name="block2_fc")(out1)
        h = BatchNormTorch(eps=0.001, momentum=0.01, name="block2")(
            h, use_running_average=not train)
        return out1 + jnp.tanh(h)


class Discriminator(nn.Module):
    """MLP with minibatch averaging (``model.py:76-103``); returns sigmoid
    probabilities like the reference (its losses then apply
    BCE-*with-logits* to these probabilities — a reference quirk kept in
    ``train/medgan.py``)."""

    hidden1: int = 128
    hidden2: int = 256
    minibatch_average: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.minibatch_average:
            mean = jnp.broadcast_to(jnp.mean(x, axis=0, keepdims=True),
                                    x.shape)
            x = jnp.concatenate([x, mean], axis=1)
            x = x / x.shape[0]  # reference quirk (model.py:101)
        h = nn.relu(DenseTorch(self.hidden1, name="fc1")(x))
        h = nn.relu(DenseTorch(self.hidden2, name="fc2")(h))
        return jax.nn.sigmoid(DenseTorch(1, name="fc3")(h)).reshape(-1)
