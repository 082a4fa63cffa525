"""Whole-network output parity for the PGGAN / VAE-GAN checkpoint
converters (tools/convert_victim.py), against the REFERENCE'S OWN torch
modules.

PGGAN's model file is imported directly (pure torch,
``gan_models/pggan/model_torch.py``); VAE-GAN's SpectralNorm /
SelfAttention / ChannelsToLinear come from ``gan_models/vaegan/ops.py``
with the Encoder/Generator wiring of ``train.py:61-135`` re-declared here
(train.py itself drags in torchvision/wandb and a module named ``utils``).
State dicts are randomized before conversion so BatchNorm stats, WSConv
biases, and spectral u/v all carry signal.
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from ganleaks_tpu.models import pggan as pggan_m
from ganleaks_tpu.models import vaegan as vaegan_m
from ganleaks_tpu.tools.convert_victim import (
    convert_pggan_discriminator,
    convert_pggan_generator,
    convert_vaegan_encoder,
    convert_vaegan_generator,
)


import sys


def load_ref(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod  # registered so torch pickling can resolve it
    spec.loader.exec_module(mod)
    return mod


ref_pggan = load_ref("/root/reference/gan_models/pggan/model_torch.py",
                     "ref_pggan_model")
ref_ops = load_ref("/root/reference/gan_models/vaegan/ops.py",
                   "ref_vaegan_ops")


def randomize_sd(module: tnn.Module, seed: int) -> dict:
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    with torch.no_grad():
        for k, v in sd.items():
            if v.dtype not in (torch.float32, torch.float64):
                continue
            if "running_var" in k:
                v.copy_(torch.rand(v.shape, generator=g) + 0.5)
            else:
                v.copy_(torch.randn(v.shape, generator=g) * 0.3)
    module.load_state_dict(sd)
    return sd


def nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


@pytest.mark.parametrize("steps,alpha", [(0, 1.0), (2, 0.37), (4, 1.0)])
def test_pggan_generator_converted_parity(rng, steps, alpha):
    nz, in_c = 16, 32
    tg = ref_pggan.Generator(z_dim=nz, in_channels=in_c).eval()
    sd = randomize_sd(tg, 1)

    z = rng.standard_normal((3, nz)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(z).view(3, nz, 1, 1), steps,
                 alpha).numpy()

    ours = pggan_m.Generator(nz=nz, in_channels=in_c).apply(
        convert_pggan_generator(sd), jnp.asarray(z), steps,
        jnp.float32(alpha))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("steps,alpha", [(0, 1.0), (2, 0.37), (4, 0.8)])
def test_pggan_discriminator_converted_parity(rng, steps, alpha):
    in_c = 32
    td = ref_pggan.Discriminator(in_c).eval()
    sd = randomize_sd(td, 2)

    res = 4 * 2 ** steps
    x = rng.standard_normal((4, res, res, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = td(nchw(x), steps, alpha).numpy()

    ours = pggan_m.Discriminator(in_channels=in_c).apply(
        convert_pggan_discriminator(sd), jnp.asarray(x), steps,
        jnp.float32(alpha))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


# --- VAE-GAN wiring of train.py:61-135, with the reference's own ops ---------

class TorchVaeganGenerator(tnn.Module):
    """``vaegan/train.py:110-135`` (SpectralNorm deconvs + SelfAttention)."""

    def __init__(self, z_dim, d=64):
        super().__init__()
        SN, SA = ref_ops.SpectralNorm, ref_ops.SelfAttention
        self.deconv1 = SN(tnn.ConvTranspose2d(z_dim, d * 8, 4, 1, 0))
        self.deconv1_bn = tnn.BatchNorm2d(d * 8)
        self.deconv2 = SN(tnn.ConvTranspose2d(d * 8, d * 4, 4, 2, 1))
        self.deconv2_bn = tnn.BatchNorm2d(d * 4)
        self.deconv3 = SN(tnn.ConvTranspose2d(d * 4, d * 2, 4, 2, 1))
        self.deconv3_bn = tnn.BatchNorm2d(d * 2)
        self.deconv4 = SN(tnn.ConvTranspose2d(d * 2, d, 4, 2, 1))
        self.deconv4_bn = tnn.BatchNorm2d(d)
        self.deconv5 = tnn.ConvTranspose2d(d, 3, 4, 2, 1)
        self.sa1 = SA(d * 2, "relu")

    def forward(self, x):
        x = F.relu(self.deconv1_bn(self.deconv1(x)))
        x = F.relu(self.deconv2_bn(self.deconv2(x)))
        x, _ = self.sa1(F.relu(self.deconv3_bn(self.deconv3(x))))
        x = F.relu(self.deconv4_bn(self.deconv4(x)))
        return torch.tanh(self.deconv5(x))


class TorchVaeganEncoder(tnn.Module):
    """``vaegan/train.py:61-96`` (conv trunk -> mu / logvar heads)."""

    def __init__(self, z_dim, d=64):
        super().__init__()
        self.cv1 = tnn.Conv2d(3, d, 4, 2, 1)
        self.bn1 = tnn.BatchNorm2d(d)
        self.cv2 = tnn.Conv2d(d, d * 2, 4, 2, 1)
        self.bn2 = tnn.BatchNorm2d(d * 2)
        self.cv3 = tnn.Conv2d(d * 2, d * 4, 4, 2, 1)
        self.bn3 = tnn.BatchNorm2d(d * 4)
        self.cv4 = tnn.Conv2d(d * 4, d * 8, 4, 2, 1)
        self.bn4 = tnn.BatchNorm2d(d * 8)
        self.fc1 = ref_ops.ChannelsToLinear(d * 8 * 4 * 4, 4 * z_dim)
        self.fc1_1 = tnn.Linear(4 * z_dim, z_dim)
        self.bn6 = tnn.BatchNorm1d(4 * z_dim)
        self.fc2 = ref_ops.ChannelsToLinear(d * 8 * 4 * 4, 4 * z_dim)
        self.fc2_1 = tnn.Linear(4 * z_dim, z_dim)
        self.bn7 = tnn.BatchNorm1d(4 * z_dim)

    def encode(self, x):
        h = F.relu(self.bn1(self.cv1(x)))
        h = F.relu(self.bn2(self.cv2(h)))
        h = F.relu(self.bn3(self.cv3(h)))
        h = F.relu(self.bn4(self.cv4(h)))
        mu = self.fc1_1(F.relu(self.bn6(self.fc1(h))))
        logvar = self.fc2_1(F.relu(self.bn7(self.fc2(h))))
        return mu, logvar


def test_vaegan_generator_converted_parity(rng):
    z_dim, d = 12, 8
    tg = TorchVaeganGenerator(z_dim, d).eval()
    sd = randomize_sd(tg, 3)

    z = (rng.standard_normal((2, z_dim)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(z).view(2, z_dim, 1, 1)).numpy()

    variables = convert_vaegan_generator(sd)
    ours = vaegan_m.Generator(z_dim=z_dim, d=d).apply(
        variables, jnp.asarray(z), train=False)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-5)


def test_vaegan_encoder_converted_parity(rng):
    z_dim, d = 12, 8
    te = TorchVaeganEncoder(z_dim, d).eval()
    sd = randomize_sd(te, 4)

    x = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_mu, ref_logvar = te.encode(nchw(x))

    enc = vaegan_m.Encoder(z_dim=z_dim, d=d)
    mu, logvar = enc.apply(convert_vaegan_encoder(sd), jnp.asarray(x),
                           False, method=vaegan_m.Encoder.encode)
    np.testing.assert_allclose(np.asarray(mu), ref_mu.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar), ref_logvar.numpy(),
                               rtol=2e-4, atol=2e-5)
