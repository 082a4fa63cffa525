"""DCGAN model shapes + training step + sampling artifacts.

The reference's only self-checks are (broken) ``__main__`` shape blocks
(``dcgan/model_torch.py:131-141``); these do that properly plus exercise the
jitted step and the artifact writer.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.config import DCGANConfig
from ganleaks_tpu.models.dcgan import Discriminator, Generator, PrivateDiscriminator
from ganleaks_tpu.train import dcgan as dcgan_train
from ganleaks_tpu.train.gan import dcgan_train_step


def small_cfg(tmp_path, **kw):
    return DCGANConfig(batch_size=8, num_epochs=1, ngf=8, ndf=8, nz=16,
                       num_generated=12, image_size=64,
                       PATH=str(tmp_path / "model"),
                       PATH_syn_data=str(tmp_path / "syn"), **kw)


def test_generator_discriminator_shapes():
    gen = Generator(nz=16, nc=3, ngf=8)
    z = jnp.zeros((2, 16))
    gv = gen.init(jax.random.key(0), z, train=True)
    img = gen.apply(gv, z, train=False)
    assert img.shape == (2, 64, 64, 3)
    assert float(jnp.abs(img).max()) <= 1.0

    disc = Discriminator(ndf=8)
    dv = disc.init(jax.random.key(1), img, train=True)
    logits = disc.apply(dv, img, train=False)
    assert logits.shape == (2,)
    probs = disc.apply(dv, img, train=False, sigmoid=True)
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0

    pdisc = PrivateDiscriminator(ndf=8, n_splits=5)
    pv = pdisc.init(jax.random.key(2), img, train=True)
    assert pdisc.apply(pv, img, train=False).shape == (2, 5)


def test_train_step_updates_everything(tmp_path, rng):
    cfg = small_cfg(tmp_path)
    state = dcgan_train.build_state(cfg, jax.random.key(0))
    real = jnp.asarray(rng.standard_normal(
        (8, 64, 64, 3), dtype=np.float32).clip(-1, 1))

    # the step donates its input state; snapshot to host before running
    before = jax.tree_util.tree_map(np.asarray, state)
    state2, metrics = dcgan_train_step(state, real, jax.random.key(1))
    state = before
    assert np.isfinite(float(metrics["loss_disc"]))
    assert np.isfinite(float(metrics["loss_gen"]))
    assert int(state2.step) == 1

    # params moved and batch stats advanced for both networks
    def changed(a, b):
        return any(
            not np.allclose(x, y) for x, y in
            zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    assert changed(state.gen.params, state2.gen.params)
    assert changed(state.disc.params, state2.disc.params)
    assert changed(state.gen.batch_stats, state2.gen.batch_stats)
    assert changed(state.disc.batch_stats, state2.disc.batch_stats)


def test_train_and_generate_artifacts(tmp_path, rng):
    cfg = small_cfg(tmp_path)
    images = rng.standard_normal((16, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    state = dcgan_train.train(cfg, images=images)
    dirs = dcgan_train.generate(cfg, state, run_dir="t")

    z = np.load(os.path.join(dirs["npz_images"], "dcgan_synthetic_data.npz"))
    assert z["fake"].shape == (12, 3, 64, 64)
    assert z["fake"].min() >= 0.0 and z["fake"].max() <= 1.0
    n = np.load(os.path.join(dirs["npz_noise"], "dcgan_noise.npz"))
    assert n["noise"].shape == (12, 16, 1, 1)
    pngs = sorted(os.listdir(dirs["png_images"]))
    assert len(pngs) == 12 and pngs[0].startswith("image_")
