"""Progressive GAN (reference: ``gan_models/pggan/model_torch.py``).

Equalized-LR convs (``WSConv2d``, ``model_torch.py:8-22``), PixelNorm
(``:25-31``), per-resolution prog blocks with nearest-neighbor 2x upsampling
and tanh fade-in on the generator (``:49-88``), avg-pool downscale fade-in
and minibatch-std on the discriminator (``:91-144``); channel factor
schedule ``[1,1,1,1,1/2,1/4,1/8,1/16,1/32]`` supports up to 1024x1024
(``:6``). ``steps`` is a static Python int — one XLA compilation per
resolution, matching progressive training's natural structure; ``alpha`` is
a traced scalar so the per-batch fade-in ramp (``train.py:134-135``) does
not recompile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganleaks_tpu.ops.nn import (
    ConvTranspose2dTorch,
    WSConv2d,
    avg_pool_2x,
    leaky_relu,
    minibatch_std,
    pixel_norm,
    upsample_nearest_2x,
)

Array = jax.Array

FACTORS = (1, 1, 1, 1, 1 / 2, 1 / 4, 1 / 8, 1 / 16, 1 / 32)


class ConvBlock(nn.Module):
    """Two 3x3 WSConvs with LeakyReLU(0.2) (+ PixelNorm in G)
    (``model_torch.py:33-47``)."""

    features: int
    use_pixel_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = leaky_relu(WSConv2d(self.features, name="conv1")(x), 0.2)
        x = pixel_norm(x) if self.use_pixel_norm else x
        x = leaky_relu(WSConv2d(self.features, name="conv2")(x), 0.2)
        x = pixel_norm(x) if self.use_pixel_norm else x
        return x


class Generator(nn.Module):
    """``Generator(z_dim, in_channels, img_channels)``
    (``model_torch.py:49-88``)."""

    nz: int = 512
    in_channels: int = 512
    nc: int = 3

    @nn.compact
    def __call__(self, z: Array, steps: int, alpha) -> Array:
        x = z.reshape(z.shape[0], 1, 1, self.nz)
        # initial: PixelNorm -> ConvT 1x1->4x4 -> LReLU -> WSConv -> LReLU -> PN
        x = pixel_norm(x)
        # plain nn.ConvTranspose2d in the reference (model_torch.py:55):
        # torch-default kaiming-uniform init (the module's default), NOT
        # a WSConv — a normal(1.0) override started ~90x too large
        x = ConvTranspose2dTorch(self.in_channels, 4, 1, 0,
                                 name="initial_convt")(x)
        x = leaky_relu(x, 0.2)
        x = WSConv2d(self.in_channels, name="initial_conv")(x)
        x = leaky_relu(x, 0.2)
        out = pixel_norm(x)

        if steps == 0:
            return WSConv2d(self.nc, kernel_size=1, padding=0,
                            name="rgb0")(out)

        upscaled = out
        for step in range(steps):
            upscaled = upsample_nearest_2x(out)
            feat = int(self.in_channels * FACTORS[step + 1])
            out = ConvBlock(feat, name=f"prog{step}")(upscaled)

        final_upscaled = WSConv2d(self.nc, kernel_size=1, padding=0,
                                  name=f"rgb{steps - 1}")(upscaled)
        final_out = WSConv2d(self.nc, kernel_size=1, padding=0,
                             name=f"rgb{steps}")(out)
        # tanh fade-in (model_torch.py:72-73)
        return jnp.tanh(alpha * final_out + (1 - alpha) * final_upscaled)


class Discriminator(nn.Module):
    """``Discriminator(in_channels, img_channels)``
    (``model_torch.py:91-144``). ``n_outputs > 1`` gives the privGAN
    ``PrivateDiscriminator`` head (``:150-204``; its softmax is applied in
    the loss, see models/dcgan.py note)."""

    in_channels: int = 512
    nc: int = 3
    n_outputs: int = 1

    @nn.compact
    def __call__(self, x: Array, steps: int, alpha) -> Array:
        n_blocks = len(FACTORS) - 1
        cur_step = n_blocks - steps

        # fromRGB at the current resolution; torch indexes rgb_layers with
        # cur_step where rgb_layers[i] maps to factor index (n_blocks - i)
        def from_rgb(name_idx: int, feats: int, h: Array) -> Array:
            return WSConv2d(feats, kernel_size=1, padding=0,
                            name=f"rgb{name_idx}")(h)

        feat_at = lambda i: int(self.in_channels * FACTORS[i])

        out = leaky_relu(from_rgb(cur_step, feat_at(steps), x), 0.2)

        if steps > 0:
            downscaled = leaky_relu(
                from_rgb(cur_step + 1, feat_at(steps - 1), avg_pool_2x(x)),
                0.2)
            out = avg_pool_2x(
                ConvBlock(feat_at(steps - 1), use_pixel_norm=False,
                          name=f"prog{cur_step}")(out))
            out = alpha * out + (1 - alpha) * downscaled  # linear fade-in

            for step in range(cur_step + 1, n_blocks):
                factor_idx = n_blocks - step  # mirrors torch's ordering
                out = ConvBlock(feat_at(factor_idx - 1), use_pixel_norm=False,
                                name=f"prog{step}")(out)
                out = avg_pool_2x(out)

        out = minibatch_std(out)
        # final block at 4x4 (model_torch.py:109-115)
        out = leaky_relu(WSConv2d(self.in_channels, name="final_conv1")(out),
                         0.2)
        out = leaky_relu(WSConv2d(self.in_channels, kernel_size=4, padding=0,
                                  name="final_conv2")(out), 0.2)
        out = WSConv2d(self.n_outputs, kernel_size=1, padding=0,
                       name="final_conv3")(out)
        return out.reshape(x.shape[0], -1)


def init_progressive(module: nn.Module, key: Array, example_input: Array,
                     max_steps: int) -> dict:
    """Initialize a progressive module's FULL parameter set.

    torch creates every prog/rgb layer in ``__init__``
    (``model_torch.py:63-69``); linen creates params on first use, and each
    ``steps`` value touches a different subset — so init once per
    resolution and union the trees (names/shapes are consistent across
    steps by construction).
    """
    merged: dict = {}

    def union(dst: dict, src: dict) -> dict:
        for k, v in src.items():
            if isinstance(v, dict):
                dst[k] = union(dst.get(k, {}), v)
            else:
                dst.setdefault(k, v)
        return dst

    for s in range(max_steps + 1):
        if example_input.ndim == 2:  # generator: latent input
            inp = example_input
        else:  # discriminator: image at the step's resolution
            res = 4 * 2 ** s
            inp = jnp.zeros(example_input.shape[:1] + (res, res)
                            + example_input.shape[3:], example_input.dtype)
        v = module.init(key, inp, s, 1.0)
        union(merged, jax.tree_util.tree_map(lambda x: x, v["params"]))
    return {"params": merged}
