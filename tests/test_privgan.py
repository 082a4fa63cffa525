"""privDCGAN / privPGGAN: stacked-split training steps, dp gating, CE-on-
softmax quirk, and generation from split 0."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ganleaks_tpu.config import DCGANConfig, PGGANConfig, PrivGANConfig
from ganleaks_tpu.train import priv as priv_t


def changed(a, b):
    return any(not np.allclose(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a),
                   jax.tree_util.tree_leaves(b)))


def test_softmax_ce_on_probs_matches_torch(rng):
    """The reference feeds Softmax outputs into CrossEntropyLoss
    (``privDCGAN.py:146-147``); our helper must match that composition."""
    logits = rng.standard_normal((6, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 6)
    probs_t = torch.softmax(torch.from_numpy(logits), dim=1)
    ref = torch.nn.CrossEntropyLoss()(probs_t,
                                      torch.from_numpy(labels)).item()
    out = float(priv_t.softmax_cross_entropy_on_probs(
        jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_split_dataset_shapes(rng):
    imgs = rng.standard_normal((12, 4, 4, 3)).astype(np.float32)
    s = priv_t.split_dataset(imgs, 3)
    assert s.shape == (3, 4, 4, 4, 3)
    np.testing.assert_array_equal(s[1, 0], imgs[4])


def test_privdcgan_step_and_dp_gate(rng):
    cfg = DCGANConfig(ngf=8, ndf=8, nz=16, batch_size=4)
    pcfg = PrivGANConfig(N_splits=2, privacy_ratio=0.5, dp_delay=1)
    state = priv_t.build_privdcgan_state(cfg, pcfg, jax.random.key(0))
    real = jnp.asarray(
        rng.uniform(-1, 1, (2, 4, 64, 64, 3)).astype(np.float32))

    # stacked params have the split axis
    assert state.genS.params["block0_conv"]["kernel"].shape[0] == 2

    before = jax.tree_util.tree_map(np.asarray, state)
    state1, m1 = priv_t.privdcgan_train_step(state, real, jax.random.key(1),
                                             0.5, dp_on=False)
    assert float(m1["loss_dp"]) == 0.0  # gated off
    assert changed(before.genS.params, state1.genS.params)
    assert changed(before.discS.params, state1.discS.params)
    assert not changed(before.priv.params, state1.priv.params)

    before1 = jax.tree_util.tree_map(np.asarray, state1)
    state2, m2 = priv_t.privdcgan_train_step(state1, real,
                                             jax.random.key(2), 0.5,
                                             dp_on=True)
    assert np.isfinite(float(m2["loss_dp"])) and float(m2["loss_dp"]) > 0
    assert changed(before1.priv.params, state2.priv.params)


def test_privdcgan_train_and_generate(tmp_path, rng):
    cfg = DCGANConfig(ngf=8, ndf=8, nz=16, batch_size=4, num_epochs=1,
                      num_generated=6, PATH=str(tmp_path / "m"),
                      PATH_syn_data=str(tmp_path / "s"))
    pcfg = PrivGANConfig(N_splits=2, privacy_ratio=0.5, dp_delay=0,
                         disc_epochs=1)
    images = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    state = priv_t.train_privdcgan(cfg, pcfg, images=images)
    dirs = priv_t.generate_privdcgan(cfg, pcfg, state, run_dir="t")
    z = np.load(os.path.join(dirs["npz_images"],
                             "dcgan_synthetic_data.npz"))
    assert z["fake"].shape == (6, 3, 64, 64)


def test_privpggan_train_and_generate(tmp_path, rng):
    cfg = PGGANConfig(nz=16, in_channels=16, image_size=8, start_img_size=4,
                      num_epochs=1, batch_sizes=(4, 4), num_generated=4,
                      PATH=str(tmp_path / "m"),
                      PATH_syn_data=str(tmp_path / "s"))
    pcfg = PrivGANConfig(N_splits=2, privacy_ratio=5.0, dp_delay=8,
                         disc_epochs=1)
    images = rng.uniform(-1, 1, (8, 8, 8, 3)).astype(np.float32)
    state = priv_t.train_privpggan(cfg, pcfg, images=images)
    dirs = priv_t.generate_privpggan(cfg, pcfg, state, run_dir="t")
    z = np.load(os.path.join(dirs["npz_images"],
                             "pggan_synthetic_data.npz"))
    assert z["fake"].shape == (4, 3, 8, 8)
