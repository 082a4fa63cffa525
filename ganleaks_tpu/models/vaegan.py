"""VAE-GAN (reference: ``gan_models/vaegan/train.py`` models +
``gan_models/vaegan/ops.py``).

Encoder (4 conv+BN blocks -> two fc heads -> reparametrize,
``train.py:61-106``), spectral-norm deconv Generator with SelfAttention at
the 16x16/128-ch stage (``:109-135``), latent MLP discriminator Dl
(``:138-160``), spectral-norm image Discriminator with SelfAttention and a
final 4->1 linear (``:163-186``).

Replicated reference quirks (documented in DIVERGENCES.md):
* ``std = exp(logvar)`` — no 1/2 factor (``train.py:99``);
* the image D's hinge terms are ``relu(0.5 + out_real)`` /
  ``relu(0.5 - out_fake)`` (``train.py:348-350``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganleaks_tpu.ops.nn import (
    BatchNormTorch,
    ChannelsToLinear,
    Conv2dTorch,
    ConvTranspose2dTorch,
    DenseTorch,
    SelfAttention,
    SNConv2d,
    SNConvTranspose2d,
    SNDense,
    leaky_relu,
)

Array = jax.Array


class Encoder(nn.Module):
    """``Encoder(z_dim, d=64)`` (``train.py:61-106``). The encoder is the
    only VAE-GAN module the reference applies ``weights_init`` to
    (``train.py:267`` + ``ops.py:10-16``): conv N(0, 0.02), BatchNorm
    N(1, 0.02)."""

    z_dim: int = 100
    d: int = 64

    @nn.compact
    def encode(self, x: Array, train: bool) -> tuple[Array, Array]:
        from ganleaks_tpu.ops.nn import normal_init, normal_mean_init

        h = x
        for i, mult in enumerate((1, 2, 4, 8)):
            h = Conv2dTorch(self.d * mult, 4, 2, 1,
                            kernel_init=normal_init(0.02),
                            name=f"cv{i + 1}")(h)
            h = BatchNormTorch(scale_init=normal_mean_init(1.0, 0.02),
                               name=f"bn{i + 1}")(
                h, use_running_average=not train)
            h = nn.relu(h)
        mu_h = ChannelsToLinear(4 * self.z_dim, name="fc1")(h)
        # netE.apply(weights_init) recurses into EVERY submodule
        # (train.py:267): the 1-d BatchNorms get the N(1, 0.02) scale
        # draw too, not just the conv BNs (ops.py:14-16)
        mu_h = BatchNormTorch(scale_init=normal_mean_init(1.0, 0.02),
                              name="bn6")(mu_h,
                                          use_running_average=not train)
        z_mu = DenseTorch(self.z_dim, name="fc1_1")(nn.relu(mu_h))
        var_h = ChannelsToLinear(4 * self.z_dim, name="fc2")(h)
        var_h = BatchNormTorch(scale_init=normal_mean_init(1.0, 0.02),
                               name="bn7")(var_h,
                                           use_running_average=not train)
        z_var = DenseTorch(self.z_dim, name="fc2_1")(nn.relu(var_h))
        return z_mu, z_var

    @nn.compact
    def __call__(self, x: Array, rng: Array, train: bool = False) -> Array:
        mu, logvar = self.encode(x, train)
        std = jnp.exp(logvar)  # reference quirk: no 0.5 (train.py:99)
        eps = jax.random.normal(rng, std.shape, std.dtype)
        return eps * std + mu


class Generator(nn.Module):
    """``Generator(z_dim, d=64)`` (``train.py:109-135``)."""

    z_dim: int = 100
    d: int = 64

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = SNConvTranspose2d(features=self.d * 8, kernel_size=4, stride=1,
                              padding=0, name="deconv1")(x)
        x = nn.relu(BatchNormTorch(name="deconv1_bn")(
            x, use_running_average=not train))
        x = SNConvTranspose2d(features=self.d * 4, kernel_size=4, stride=2,
                              padding=1, name="deconv2")(x)
        x = nn.relu(BatchNormTorch(name="deconv2_bn")(
            x, use_running_average=not train))
        x = SNConvTranspose2d(features=self.d * 2, kernel_size=4, stride=2,
                              padding=1, name="deconv3")(x)
        x = nn.relu(BatchNormTorch(name="deconv3_bn")(
            x, use_running_average=not train))
        x = SelfAttention(name="sa1")(x)
        x = SNConvTranspose2d(features=self.d, kernel_size=4, stride=2,
                              padding=1, name="deconv4")(x)
        x = nn.relu(BatchNormTorch(name="deconv4_bn")(
            x, use_running_average=not train))
        x = ConvTranspose2dTorch(3, 4, 2, 1, name="deconv5")(x)
        return jnp.tanh(x)


class DiscriminatorL(nn.Module):
    """Latent discriminator: z -> 750 -> 750 -> 1, sigmoid
    (``train.py:138-160``)."""

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h = leaky_relu(DenseTorch(750, name="fc1")(z), 0.01)
        h = leaky_relu(DenseTorch(750, name="fc2")(h), 0.01)
        return jax.nn.sigmoid(DenseTorch(1, name="fc3")(h)).reshape(-1)


class Discriminator(nn.Module):
    """Image discriminator with spectral norm + self-attention
    (``train.py:163-186``)."""

    d: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = leaky_relu(SNConv2d(features=self.d, kernel_size=4, stride=2,
                                padding=1, name="conv1")(x), 0.02)
        h = leaky_relu(SNConv2d(features=self.d * 2, kernel_size=4, stride=2,
                                padding=1, name="conv2")(h), 0.02)
        h = leaky_relu(SNConv2d(features=self.d * 4, kernel_size=4, stride=2,
                                padding=1, name="conv3")(h), 0.02)
        h = SelfAttention(name="sa1")(h)
        h = leaky_relu(SNConv2d(features=self.d * 8, kernel_size=4, stride=2,
                                padding=1, name="conv4")(h), 0.02)
        h = SNConv2d(features=1, kernel_size=4, stride=2, padding=1,
                     name="conv5")(h)                     # (N, 2, 2, 1)
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(-1, 4)  # torch view(-1,4)
        return SNDense(features=1, name="fc")(h).reshape(-1)
