"""DCGAN generator / discriminator (reference: ``gan_models/dcgan/model_torch.py``).

64x64 DCGAN: the generator is five ConvTranspose blocks with BatchNorm+ReLU
and a final Tanh (``model_torch.py:75-96``); the discriminator is four strided
convs with BatchNorm+LeakyReLU(0.2) and a final 4x4 conv to one logit
(``model_torch.py:25-47``); ``PrivateDiscriminator`` swaps the head for an
``N_splits``-way softmax (``model_torch.py:50-72``). ``initialize_weights``
draws every conv *and* BatchNorm weight from N(0, 0.02)
(``model_torch.py:124-127``) — replicated faithfully, including the unusual
BatchNorm-scale draw.

TPU-first notes: NHWC layout, flat (N, nz) latents reshaped internally, and
the discriminator returns raw logits by default — training uses the
numerically stable ``sigmoid_binary_cross_entropy``; ``sigmoid=True``
reproduces the reference's probability output (``model_torch.py:36``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganleaks_tpu.ops.nn import (
    BatchNormTorch,
    Conv2dTorch,
    ConvTranspose2dTorch,
    leaky_relu,
    normal_init,
)

Array = jax.Array
W02 = normal_init(0.02)


def _n_mid_blocks(image_size: int) -> int:
    """Stride-2 stages between the 4x4 base and the final doubling layer.

    The reference is hardwired to 64x64 (3 mid blocks); other powers of two
    >= 8 follow the same doubling/halving schedule — used by the tiny dryrun
    variants, default unchanged."""
    n = (image_size // 8).bit_length() - 1
    if image_size < 8 or image_size != 8 * 2 ** n:
        raise ValueError(f"image_size must be a power of 2 >= 8, "
                         f"got {image_size}")
    return n


class Generator(nn.Module):
    """``Generator(z_dim, channels_img, features_g)`` (``model_torch.py:75-96``)."""

    nz: int = 100
    nc: int = 3
    ngf: int = 64
    image_size: int = 64

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        x = z.reshape(z.shape[0], 1, 1, self.nz)
        n_mid = _n_mid_blocks(self.image_size)
        # (features, stride, padding) — model_torch.py:78-86: 4x4 base at
        # ngf*16, then halving feature counts while doubling resolution
        specs = [(self.ngf * 2 ** (n_mid + 1), 1, 0)]
        specs += [(self.ngf * 2 ** (n_mid - k), 2, 1) for k in range(n_mid)]
        for i, (feat, stride, pad) in enumerate(specs):
            x = ConvTranspose2dTorch(feat, 4, stride, pad, use_bias=False,
                                     kernel_init=W02, name=f"block{i}_conv")(x)
            x = BatchNormTorch(scale_init=W02,
                               name=f"block{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        x = ConvTranspose2dTorch(self.nc, 4, 2, 1, kernel_init=W02,
                                 name="to_img")(x)  # image_size
        return jnp.tanh(x)


class Discriminator(nn.Module):
    """``Discriminator(channel_img, feature_d)`` (``model_torch.py:25-47``)."""

    ndf: int = 64
    image_size: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 sigmoid: bool = False) -> Array:
        x = Conv2dTorch(self.ndf, 4, 2, 1, kernel_init=W02,
                        name="from_img")(x)  # image_size/2
        x = leaky_relu(x, 0.2)
        mults = tuple(2 ** k for k in
                      range(1, _n_mid_blocks(self.image_size) + 1))
        for i, mult in enumerate(mults):
            x = Conv2dTorch(self.ndf * mult, 4, 2, 1, use_bias=False,
                            kernel_init=W02, name=f"block{i}_conv")(x)
            x = BatchNormTorch(scale_init=W02,
                               name=f"block{i}")(x, use_running_average=not train)
            x = leaky_relu(x, 0.2)
        x = Conv2dTorch(1, 4, 2, 0, kernel_init=W02, name="head")(x)  # 1x1
        logits = x.reshape(x.shape[0])
        return jax.nn.sigmoid(logits) if sigmoid else logits


class PrivateDiscriminator(nn.Module):
    """privGAN split classifier (``model_torch.py:50-72``): same trunk, head
    outputs ``n_splits`` channels. The reference applies ``nn.Softmax`` and
    then feeds the *probabilities* to ``CrossEntropyLoss`` (``privDCGAN.py:
    146-147``, a live quirk); we return logits and let the loss reproduce
    that composition explicitly."""

    ndf: int = 64
    n_splits: int = 2
    image_size: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv2dTorch(self.ndf, 4, 2, 1, kernel_init=W02,
                        name="from_img")(x)
        x = leaky_relu(x, 0.2)
        mults = tuple(2 ** k for k in
                      range(1, _n_mid_blocks(self.image_size) + 1))
        for i, mult in enumerate(mults):
            x = Conv2dTorch(self.ndf * mult, 4, 2, 1, use_bias=False,
                            kernel_init=W02, name=f"block{i}_conv")(x)
            x = BatchNormTorch(scale_init=W02,
                               name=f"block{i}")(x, use_running_average=not train)
            x = leaky_relu(x, 0.2)
        x = Conv2dTorch(self.n_splits, 4, 2, 0, kernel_init=W02,
                        name="head")(x)
        return x.reshape(x.shape[0], self.n_splits)
