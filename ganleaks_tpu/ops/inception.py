"""InceptionV3 pool_3 feature extractor for FID, Flax-native.

The reference computes FID from the 2048-d pool_3 activations of a TF1
frozen InceptionV3 graph it downloads at runtime (``z_fid.py:34-40,268-283``)
— impossible in a zero-egress environment and a TF-runtime dependency we
don't want. This is the standard InceptionV3 architecture (torchvision
layer naming so ``tools/convert_inception.py`` can map a torchvision
``inception_v3`` state dict), producing the same 2048-d pool_3 embedding.

Input convention follows the reference: uint8-range images [0, 255]
(``z_fid.py:72-73``); :func:`preprocess` resizes to 299 and scales to
[-1, 1] (the torchvision-inception convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class BasicConv2d(nn.Module):
    """conv(bias=False) + BatchNorm(eps=0.001) + ReLU."""

    features: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel
        in_ch = x.shape[-1]
        # He-scaled init keeps surrogate (untrained) towers non-degenerate
        # through 20+ ReLU layers, so relative FID stays informative
        w = self.param("conv", nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal"), (kh, kw, in_ch,
                                                 self.features))
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            ((self.padding[0], self.padding[0]),
             (self.padding[1], self.padding[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = nn.BatchNorm(use_running_average=True, epsilon=0.001,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool_3x3_s1(x: Array) -> Array:
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _max_pool_3x3_s2(x: Array) -> Array:
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool_3x3_s1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool_3x3_s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1),
                         name="branch_pool")(_avg_pool_3x3_s1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool_3x3_s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1),
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0),
                        name="branch3x3_2b")(b3)], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1),
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0),
                        name="branch3x3dbl_3b")(bd)], axis=-1)
        bp = BasicConv2d(192, (1, 1),
                         name="branch_pool")(_avg_pool_3x3_s1(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """The pool_3 tower: stem + 11 mixed blocks + global average pool
    -> (N, 2048)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # pool_3: (N, 2048)


def preprocess(images_uint8_range: Array, size: int = 299) -> Array:
    """[0, 255] images (any resolution, NHWC) -> 299x299 in [-1, 1]
    (bilinear, matching torchvision's FID convention)."""
    x = images_uint8_range.astype(jnp.float32) / 255.0
    if x.shape[1] != size or x.shape[2] != size:
        # antialias=False: torch F.interpolate(mode='bilinear') — the
        # pytorch-fid convention — does not antialias; jax's default
        # (True) changes the kernel when DOWNSCALING >299px inputs and
        # would make FID incomparable with a torch pipeline at equal
        # weights (upscaling is identical either way)
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]),
                             method="bilinear", antialias=False)
    return x * 2.0 - 1.0
