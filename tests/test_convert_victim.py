"""Victim checkpoint conversion: a torch DCGAN generator/discriminator
(hand-built from functional ops with the reference topology) must produce
IDENTICAL outputs through our converted Flax modules — the full-network
parity check behind 'attack reference-trained victims'."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ganleaks_tpu.models.dcgan import Discriminator, Generator
from ganleaks_tpu.models.wgangp import Critic
from ganleaks_tpu.tools.convert_victim import (
    convert_dcgan_discriminator,
    convert_dcgan_generator,
    convert_wgangp_critic,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def make_torch_generator_sd(rng, nz=16, nc=3, ngf=8):
    """Random weights in the reference DCGAN generator layout
    (``dcgan/model_torch.py:75-96``)."""
    sd = {}
    chans = [nz, ngf * 16, ngf * 8, ngf * 4, ngf * 2]
    for i in range(4):
        sd[f"gen.{i}.0.weight"] = torch.from_numpy(
            rng.standard_normal((chans[i], chans[i + 1], 4, 4))
            .astype(np.float32) * 0.05)
        c = chans[i + 1]
        sd[f"gen.{i}.1.weight"] = torch.from_numpy(
            rng.standard_normal(c).astype(np.float32))
        sd[f"gen.{i}.1.bias"] = torch.from_numpy(
            rng.standard_normal(c).astype(np.float32) * 0.1)
        sd[f"gen.{i}.1.running_mean"] = torch.from_numpy(
            rng.standard_normal(c).astype(np.float32) * 0.1)
        sd[f"gen.{i}.1.running_var"] = torch.from_numpy(
            (rng.random(c) + 0.5).astype(np.float32))
    sd["gen.4.weight"] = torch.from_numpy(
        rng.standard_normal((ngf * 2, nc, 4, 4)).astype(np.float32) * 0.05)
    sd["gen.4.bias"] = torch.from_numpy(
        rng.standard_normal(nc).astype(np.float32) * 0.1)
    return sd


def torch_generator_forward(sd, z):
    """Eval-mode forward of the reference generator."""
    x = z
    strides = [(1, 0), (2, 1), (2, 1), (2, 1)]
    for i, (s, p) in enumerate(strides):
        x = F.conv_transpose2d(x, sd[f"gen.{i}.0.weight"], None,
                               stride=s, padding=p)
        x = F.batch_norm(x, sd[f"gen.{i}.1.running_mean"],
                         sd[f"gen.{i}.1.running_var"],
                         sd[f"gen.{i}.1.weight"], sd[f"gen.{i}.1.bias"],
                         training=False)
        x = F.relu(x)
    x = F.conv_transpose2d(x, sd["gen.4.weight"], sd["gen.4.bias"],
                           stride=2, padding=1)
    return torch.tanh(x)


def test_converted_generator_matches_torch(rng):
    nz = 16
    sd = make_torch_generator_sd(rng, nz=nz)
    z = rng.standard_normal((3, nz)).astype(np.float32)
    ref = torch_generator_forward(sd, torch.from_numpy(
        z.reshape(3, nz, 1, 1))).numpy().transpose(0, 2, 3, 1)

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_dcgan_generator(sd))
    gen = Generator(nz=nz, nc=3, ngf=8)
    out = gen.apply(variables, jnp.asarray(z), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def make_torch_disc_sd(rng, nc=3, ndf=8, instance_norm=False):
    sd = {}
    sd["disc.0.weight"] = torch.from_numpy(
        rng.standard_normal((ndf, nc, 4, 4)).astype(np.float32) * 0.05)
    sd["disc.0.bias"] = torch.from_numpy(
        rng.standard_normal(ndf).astype(np.float32) * 0.1)
    chans = [ndf, ndf * 2, ndf * 4, ndf * 8]
    for j, i in enumerate((2, 3, 4)):
        sd[f"disc.{i}.0.weight"] = torch.from_numpy(
            rng.standard_normal((chans[j + 1], chans[j], 4, 4))
            .astype(np.float32) * 0.05)
        c = chans[j + 1]
        sd[f"disc.{i}.1.weight"] = torch.from_numpy(
            rng.standard_normal(c).astype(np.float32))
        sd[f"disc.{i}.1.bias"] = torch.from_numpy(
            rng.standard_normal(c).astype(np.float32) * 0.1)
        if not instance_norm:
            sd[f"disc.{i}.1.running_mean"] = torch.from_numpy(
                rng.standard_normal(c).astype(np.float32) * 0.1)
            sd[f"disc.{i}.1.running_var"] = torch.from_numpy(
                (rng.random(c) + 0.5).astype(np.float32))
    sd["disc.5.weight"] = torch.from_numpy(
        rng.standard_normal((1, ndf * 8, 4, 4)).astype(np.float32) * 0.05)
    sd["disc.5.bias"] = torch.from_numpy(
        rng.standard_normal(1).astype(np.float32) * 0.1)
    return sd


def torch_disc_forward(sd, x, instance_norm=False):
    x = F.leaky_relu(F.conv2d(x, sd["disc.0.weight"], sd["disc.0.bias"],
                              stride=2, padding=1), 0.2)
    for i in (2, 3, 4):
        x = F.conv2d(x, sd[f"disc.{i}.0.weight"], None, stride=2, padding=1)
        if instance_norm:
            x = F.instance_norm(x, weight=sd[f"disc.{i}.1.weight"],
                                bias=sd[f"disc.{i}.1.bias"])
        else:
            x = F.batch_norm(x, sd[f"disc.{i}.1.running_mean"],
                             sd[f"disc.{i}.1.running_var"],
                             sd[f"disc.{i}.1.weight"],
                             sd[f"disc.{i}.1.bias"], training=False)
        x = F.leaky_relu(x, 0.2)
    x = F.conv2d(x, sd["disc.5.weight"], sd["disc.5.bias"], stride=2)
    return x.reshape(-1)


def test_converted_discriminator_matches_torch(rng):
    sd = make_torch_disc_sd(rng)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = torch_disc_forward(sd, torch.from_numpy(
        x.transpose(0, 3, 1, 2))).numpy()

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_dcgan_discriminator(sd))
    disc = Discriminator(ndf=8)
    out = disc.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_converted_wgangp_critic_matches_torch(rng):
    sd = make_torch_disc_sd(rng, instance_norm=True)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = torch_disc_forward(sd, torch.from_numpy(
        x.transpose(0, 3, 1, 2)), instance_norm=True).numpy()

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_wgangp_critic(sd))
    critic = Critic(ndf=8)
    out = critic.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)
