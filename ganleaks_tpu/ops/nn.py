"""Flax building blocks with exact PyTorch numerical semantics.

The reference's models are plain torch ``Conv2d``/``ConvTranspose2d``/
``BatchNorm2d`` stacks. For checkpoint conversion (attack reference-trained
victims) and golden parity tests we need bit-faithful equivalents, so these
modules pin down the torch conventions explicitly:

* layout is NHWC (TPU-native); converters permute torch's NCHW/OIHW;
* ``Conv2dTorch`` = cross-correlation with symmetric integer padding
  (torch ``Conv2d(k, s, p)``);
* ``ConvTranspose2dTorch`` = input-dilated convolution with a spatially
  flipped kernel and padding ``k - 1 - p`` (torch ``ConvTranspose2d``'s
  definition), so output size is ``(n-1)*s - 2p + k``;
* norms use torch defaults (eps 1e-5, running-stat momentum 0.1).

Reference model citations: ``gan_models/dcgan/model_torch.py``,
``gan_models/wgangp/model.py``, ``gan_models/pggan/model_torch.py``,
``gan_models/vaegan/{train.py,ops.py}``, ``gan_models/medgan/model.py``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# --- initializers ----------------------------------------------------------

def normal_init(std: float = 0.02):
    """N(0, std) — ``initialize_weights`` (``dcgan/model_torch.py:124-127``)."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def normal_mean_init(mean: float = 1.0, std: float = 0.02):
    """N(mean, std) — VAE-GAN BatchNorm init (``vaegan/ops.py:14-16``)."""
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)
    return init


def torch_conv_default_init(fan_in: int):
    """torch's default Conv/Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


# --- activations (torch names) ----------------------------------------------

def leaky_relu(x: Array, negative_slope: float = 0.2) -> Array:
    return jax.nn.leaky_relu(x, negative_slope)


# --- conv primitives ---------------------------------------------------------

class Conv2dTorch(nn.Module):
    """torch ``nn.Conv2d(in, out, k, s, p)`` on NHWC inputs.

    Kernel param layout is HWIO; the torch OIHW checkpoint maps via
    ``w.transpose(2, 3, 1, 0)``.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = None  # type: ignore[assignment]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        in_ch = x.shape[-1]
        kinit = self.kernel_init or torch_conv_default_init(in_ch * k * k)
        w = self.param("kernel", kinit, (k, k, in_ch, self.features))
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", torch_conv_default_init(in_ch * k * k),
                           (self.features,))
            y = y + b.astype(dtype)
        return y


class ConvTranspose2dTorch(nn.Module):
    """torch ``nn.ConvTranspose2d(in, out, k, s, p)`` on NHWC inputs.

    Implemented as input dilation (lhs_dilation = stride) + padding
    ``k - 1 - p`` + spatially flipped kernel, which is the defining
    relationship of the transposed convolution. Kernel param layout is HWIO
    (I = input channels); the torch IOHW checkpoint maps via
    ``w.transpose(2, 3, 0, 1)``.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = None  # type: ignore[assignment]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        in_ch = x.shape[-1]
        # torch's ConvTranspose default init uses fan_in = out_ch * k * k
        kinit = self.kernel_init or torch_conv_default_init(
            self.features * k * k)
        w = self.param("kernel", kinit, (k, k, in_ch, self.features))
        dtype = self.dtype or x.dtype
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w[::-1, ::-1].astype(dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias",
                           torch_conv_default_init(self.features * k * k),
                           (self.features,))
            y = y + b.astype(dtype)
        return y


class DenseTorch(nn.Module):
    """torch ``nn.Linear``; kernel layout (in, out) = torch weight.T."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_f = x.shape[-1]
        kinit = self.kernel_init or torch_conv_default_init(in_f)
        w = self.param("kernel", kinit, (in_f, self.features))
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", torch_conv_default_init(in_f),
                           (self.features,))
            y = y + b.astype(x.dtype)
        return y


class ChannelsToLinear(nn.Module):
    """Flatten NHWC to torch's NCHW-major flattening then Linear
    (``vaegan/ops.py:78-83``) — the column order matters for converted
    torch Linear weights."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        return DenseTorch(self.features, name="linear")(x)


# --- norms -------------------------------------------------------------------

class BatchNormTorch(nn.Module):
    """torch ``BatchNorm2d/1d`` semantics over the channel (last) axis.

    torch momentum m means ``running = (1-m)*running + m*batch``; flax's
    ``momentum`` is the (1-m) decay, so torch 0.1 -> flax 0.9. medGAN uses
    eps=0.001, momentum=0.01 (``medgan/model.py:52``).
    """

    use_running_average: bool = True
    eps: float = 1e-5
    momentum: float = 0.1
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool | None = None):
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        # own implementation rather than flax nn.BatchNorm: flax updates
        # running_var with the BIASED batch variance while torch stores
        # the UNBIASED n/(n-1) one — a systematic 1/n deficit ((n-1)/n
        # per step: 3% at batch 32) in every eval-mode normalization of
        # a from-scratch-trained victim. Param/variable paths match the
        # previous nn.BatchNorm child ("<name>/bn/{scale,bias,mean,var}")
        # so existing checkpoints and converters load unchanged.
        return _TorchBN(
            use_running_average=ura,
            momentum=self.momentum,
            eps=self.eps,
            scale_init=self.scale_init,
            bias_init=self.bias_init,
            name="bn",
        )(x)


class _TorchBN(nn.Module):
    """torch-exact BatchNorm core: normalizes with the biased batch
    variance (as torch does in train mode) but accumulates the UNBIASED
    variance into the running stats (``torch.nn.BatchNorm2d`` docs);
    stats computed in f32, output cast back to the input dtype."""

    use_running_average: bool
    momentum: float
    eps: float
    scale_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self, x: Array) -> Array:
        feat = x.shape[-1]
        scale = self.param("scale", self.scale_init, (feat,))
        bias = self.param("bias", self.bias_init, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            n = x.size // feat  # elements per channel (static)
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale.astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(x.dtype)


class InstanceNorm2d(nn.Module):
    """torch ``nn.InstanceNorm2d(affine=True)`` — per-sample, per-channel
    normalization over H, W (``wgangp/model.py:28``). torch eps default 1e-5;
    affine params initialised to (1, 0)."""

    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y


def pixel_norm(x: Array, eps: float = 1e-8) -> Array:
    """PGGAN PixelNorm: x / sqrt(mean_c x^2 + eps)
    (``pggan/model_torch.py:25-31``); channel axis is last in NHWC."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1,
                                      keepdims=True) + eps)


def minibatch_std(x: Array) -> Array:
    """PGGAN minibatch-std: per-feature std over the batch (torch unbiased,
    correction=1 — ``torch.std`` default at ``pggan/model_torch.py:122-124``),
    averaged to a scalar, appended as one constant channel."""
    std = jnp.std(x, axis=0, ddof=1)
    stat = jnp.mean(std)
    n, h, w, _ = x.shape
    return jnp.concatenate(
        [x, jnp.full((n, h, w, 1), stat, dtype=x.dtype)], axis=-1)


# --- resampling --------------------------------------------------------------

def upsample_nearest_2x(x: Array) -> Array:
    """F.interpolate(scale_factor=2, mode='nearest')
    (``pggan/model_torch.py:82``)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def avg_pool_2x(x: Array) -> Array:
    """nn.AvgPool2d(kernel_size=2, stride=2) (``pggan/model_torch.py:106``)."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


# --- PGGAN equalized-lr conv ---------------------------------------------------

class WSConv2d(nn.Module):
    """Weight-scaled (equalized learning rate) conv
    (``pggan/model_torch.py:8-22``): kernel ~ N(0,1), input pre-scaled by
    ``sqrt(gain / (in_ch * k^2))``, bias added un-scaled after the conv."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    gain: float = 2.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        scale = (self.gain / (in_ch * self.kernel_size ** 2)) ** 0.5
        y = Conv2dTorch(self.features, self.kernel_size, self.stride,
                        self.padding, use_bias=False,
                        kernel_init=nn.initializers.normal(1.0),
                        name="conv")(x * scale)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + b.astype(y.dtype)


# --- spectral norm ------------------------------------------------------------

def _l2n(v: Array, eps: float = 1e-12) -> Array:
    """l2normalize (``vaegan/ops.py:19-20``)."""
    return v / (jnp.linalg.norm(v) + eps)


class _SpectralBase(nn.Module):
    """Shared power-iteration spectral normalization, matching the VAE-GAN's
    custom wrapper (``vaegan/ops.py:23-75``): the weight is matricized as
    torch's ``w.view(height, -1)`` (``height`` = torch leading weight dim),
    one power iteration per forward, and the layer applies ``w / sigma``.

    u/v vectors live in the ``spectral`` variable collection; pass
    ``mutable=['spectral']`` during training so iterations persist
    (torch mutates them even in eval; we freeze at eval, an intentional
    functional-JAX divergence recorded in the docs).
    """

    power_iterations: int = 1

    def spectral_scale(self, kernel: Array, wm: Array) -> Array:
        h, wdt = wm.shape
        is_init = self.is_initializing()
        u = self.variable(
            "spectral", "u",
            lambda: _l2n(jax.random.normal(
                self.make_rng("params") if is_init else jax.random.key(0),
                (h,))))
        v = self.variable(
            "spectral", "v",
            lambda: _l2n(jax.random.normal(
                jax.random.fold_in(self.make_rng("params"), 1) if is_init
                else jax.random.key(1),
                (wdt,))))
        uu, vv = u.value, v.value
        for _ in range(self.power_iterations):
            vv = _l2n(wm.T @ uu)
            uu = _l2n(wm @ vv)
        if not self.is_initializing() and self.is_mutable_collection("spectral"):
            u.value, v.value = uu, vv
        sigma = uu @ (wm @ vv)
        return kernel / sigma


class SNConv2d(_SpectralBase):
    """SpectralNorm(nn.Conv2d(...)) (``vaegan/train.py:166-172``).
    torch matricization: OIHW -> (O, I*kh*kw)."""

    features: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, in_ch = self.kernel_size, x.shape[-1]
        kinit = torch_conv_default_init(in_ch * k * k)
        w = self.param("kernel", kinit, (k, k, in_ch, self.features))
        wm = jnp.transpose(w, (3, 2, 0, 1)).reshape(self.features, -1)
        w = self.spectral_scale(w, wm)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = self.param("bias", torch_conv_default_init(in_ch * k * k),
                       (self.features,))
        return y + b.astype(y.dtype)


class SNConvTranspose2d(_SpectralBase):
    """SpectralNorm(nn.ConvTranspose2d(...)) (``vaegan/train.py:112-121``).
    torch matricization: IOHW -> (I, O*kh*kw)."""

    features: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, in_ch = self.kernel_size, x.shape[-1]
        kinit = torch_conv_default_init(self.features * k * k)
        w = self.param("kernel", kinit, (k, k, in_ch, self.features))
        wm = jnp.transpose(w, (2, 3, 0, 1)).reshape(in_ch, -1)
        w = self.spectral_scale(w, wm)
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, w[::-1, ::-1].astype(x.dtype), window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = self.param("bias", torch_conv_default_init(self.features * k * k),
                       (self.features,))
        return y + b.astype(y.dtype)


class SNDense(_SpectralBase):
    """SpectralNorm(nn.Linear) (``vaegan/train.py:172``).
    torch matricization: (out, in)."""

    features: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_f = x.shape[-1]
        w = self.param("kernel", torch_conv_default_init(in_f),
                       (in_f, self.features))
        w = self.spectral_scale(w, w.T)
        b = self.param("bias", torch_conv_default_init(in_f),
                       (self.features,))
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


# --- self attention ------------------------------------------------------------

class SelfAttention(nn.Module):
    """SAGAN-style spatial self-attention (``vaegan/ops.py:86-120``):
    1x1 query/key convs to C/8 channels, value conv to C, softmax attention
    over positions, learnable scalar gamma initialized to 0, residual add."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        q = Conv2dTorch(c // 8, 1, name="query_conv")(x).reshape(n, h * w, -1)
        k = Conv2dTorch(c // 8, 1, name="key_conv")(x).reshape(n, h * w, -1)
        v = Conv2dTorch(c, 1, name="value_conv")(x).reshape(n, h * w, c)
        energy = jnp.einsum("nqc,nkc->nqk", q, k)
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x
