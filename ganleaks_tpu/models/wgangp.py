"""WGAN-GP generator / critic (reference: ``gan_models/wgangp/model.py``).

Same 64x64 topology as DCGAN; the critic swaps BatchNorm for affine
InstanceNorm and drops the sigmoid (``model.py:12-33``), the generator is
identical to DCGAN's (``model.py:37-58``). Weight init N(0, 0.02) for convs
and BN (``model.py:61-64``).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from ganleaks_tpu.models.dcgan import Generator  # noqa: F401  (same net)
from ganleaks_tpu.ops.nn import (
    Conv2dTorch,
    InstanceNorm2d,
    leaky_relu,
    normal_init,
)

Array = jax.Array
W02 = normal_init(0.02)


class Critic(nn.Module):
    """``Discriminator(img_channels, features_d)`` (``model.py:12-33``):
    strided convs + InstanceNorm(affine) + LeakyReLU(0.2), raw score out."""

    ndf: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv2dTorch(self.ndf, 4, 2, 1, kernel_init=W02,
                        name="from_img")(x)
        x = leaky_relu(x, 0.2)
        for i, mult in enumerate((2, 4, 8)):
            x = Conv2dTorch(self.ndf * mult, 4, 2, 1, use_bias=False,
                            kernel_init=W02, name=f"block{i}_conv")(x)
            x = InstanceNorm2d(name=f"block{i}_in")(x)
            x = leaky_relu(x, 0.2)
        x = Conv2dTorch(1, 4, 2, 0, kernel_init=W02, name="head")(x)
        return x.reshape(x.shape[0])
