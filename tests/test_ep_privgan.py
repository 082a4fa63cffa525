"""Expert-parallel privGAN (one split per device) vs the vmapped
single-device step: identical updates on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ganleaks_tpu.config import DCGANConfig, PrivGANConfig
from ganleaks_tpu.parallel.ep import make_ep_privdcgan_step, shard_split_state
from ganleaks_tpu.train import priv as priv_t


@pytest.fixture
def mesh8():
    return Mesh(np.asarray(jax.devices()), ("split",))


def test_ep_step_matches_vmapped(rng, mesh8):
    n_splits = 8
    cfg = DCGANConfig(ngf=4, ndf=4, nz=8, batch_size=2)
    pcfg = PrivGANConfig(N_splits=n_splits, privacy_ratio=0.5)
    real = jnp.asarray(
        rng.uniform(-1, 1, (n_splits, 2, 64, 64, 3)).astype(np.float32))
    key = jax.random.key(1)

    # single-device vmapped step (dp_on=False: the private-classifier
    # update batches BN over all splits, EP normalizes per device — the
    # documented semantic difference; everything else must match)
    s1 = priv_t.build_privdcgan_state(cfg, pcfg, jax.random.key(0))
    out1, m1 = priv_t.privdcgan_train_step(s1, real, key, 0.5, dp_on=False)
    p1 = jax.device_get({"gen": out1.genS.params, "disc": out1.discS.params})

    # EP step on the mesh
    s2 = priv_t.build_privdcgan_state(cfg, pcfg, jax.random.key(0))
    s2 = shard_split_state(s2, mesh8)
    step = make_ep_privdcgan_step(mesh8, n_splits, 0.5, dp_on=False)
    out2, m2 = step(s2, real, key)
    p2 = jax.device_get({"gen": out2.genS.params, "disc": out2.discS.params})

    np.testing.assert_allclose(float(m1["loss_d"]), float(m2["loss_d"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m1["loss_g"]), float(m2["loss_g"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_ep_step_with_private_update_runs(rng, mesh8):
    n_splits = 8
    cfg = DCGANConfig(ngf=4, ndf=4, nz=8)
    pcfg = PrivGANConfig(N_splits=n_splits)
    real = jnp.asarray(
        rng.uniform(-1, 1, (n_splits, 2, 64, 64, 3)).astype(np.float32))
    state = priv_t.build_privdcgan_state(cfg, pcfg, jax.random.key(0))
    state = shard_split_state(state, mesh8)
    step = make_ep_privdcgan_step(mesh8, n_splits, 5.0, dp_on=True)
    before_priv = jax.device_get(state.priv.params)
    out, metrics = step(state, real, jax.random.key(1))
    assert np.isfinite(float(metrics["loss_dp"]))
    after_priv = jax.device_get(out.priv.params)
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(before_priv),
                   jax.tree_util.tree_leaves(after_priv)))


def test_ep_privpggan_step_matches_vmapped(rng, mesh8):
    """EP privPGGAN (PGGAN modules are BN-free, so dp_on=True matches
    the vmapped step exactly — the private critic has no cross-split
    normalization caveat)."""
    from ganleaks_tpu.config import PGGANConfig
    from ganleaks_tpu.parallel.ep import make_ep_privpggan_step

    n_splits = 8
    cfg = PGGANConfig(in_channels=8, nz=8)
    pcfg = PrivGANConfig(N_splits=n_splits, privacy_ratio=0.5)
    steps = 1  # 8x8 resolution
    real = jnp.asarray(
        rng.uniform(-1, 1, (n_splits, 2, 8, 8, 3)).astype(np.float32))
    key = jax.random.key(1)
    alpha = jnp.float32(0.7)

    s1 = priv_t.build_privpggan_state(cfg, pcfg, jax.random.key(0),
                                      max_steps=1)
    out1, m1 = priv_t.privpggan_train_step(s1, real, alpha, key, steps,
                                           0.5, dp_on=True)
    p1 = jax.device_get({"gen": out1.genS.params,
                         "critic": out1.discS.params,
                         "priv": out1.priv.params})

    s2 = priv_t.build_privpggan_state(cfg, pcfg, jax.random.key(0),
                                      max_steps=1)
    s2 = shard_split_state(s2, mesh8)
    step = make_ep_privpggan_step(mesh8, n_splits, 0.5, dp_on=True,
                                  steps=steps)
    out2, m2 = step(s2, real, alpha, key)
    p2 = jax.device_get({"gen": out2.genS.params,
                         "critic": out2.discS.params,
                         "priv": out2.priv.params})

    # looser than the DCGAN EP bar: the vmapped oracle batches all
    # splits through one conv (different reduction order) and the
    # grad-of-grad gradient penalty amplifies that f32 noise
    for k in ("loss_critic", "loss_dp", "loss_gen"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=2e-3, atol=1e-4)
    # atol 2*lr: adam's first-step update saturates at ~±lr, and tiny
    # grad-noise sign flips move a handful of near-zero-grad params by
    # up to lr in each run (observed 3/4608 elements at <=2e-3 = 2*lr)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2.5e-3)


def test_ep_privpggan_nz_differs_from_in_channels(rng, mesh8):
    """The EP step must read the latent width from the HWIO kernel's
    INPUT-channel axis (regression: it read output channels, which only
    worked when nz == in_channels)."""
    from ganleaks_tpu.config import PGGANConfig
    from ganleaks_tpu.parallel.ep import make_ep_privpggan_step

    n_splits = 8
    cfg = PGGANConfig(in_channels=8, nz=16)  # nz != in_channels
    pcfg = PrivGANConfig(N_splits=n_splits, privacy_ratio=0.5)
    real = jnp.asarray(
        rng.uniform(-1, 1, (n_splits, 2, 8, 8, 3)).astype(np.float32))
    s = priv_t.build_privpggan_state(cfg, pcfg, jax.random.key(0),
                                     max_steps=1)
    s = shard_split_state(s, mesh8)
    step = make_ep_privpggan_step(mesh8, n_splits, 0.5, dp_on=True,
                                  steps=1)
    out, m = step(s, real, jnp.float32(0.7), jax.random.key(1))
    assert all(np.isfinite(float(v)) for v in m.values()), m
