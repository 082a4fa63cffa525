"""Shape/step smoke tests for WGAN-GP, PGGAN, VAE-GAN, medGAN — the
reference's broken __main__ smoke blocks (SURVEY §4), done properly, plus
one optimizer step each asserting finite losses and moving params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganleaks_tpu.config import MedGANConfig, PGGANConfig, VAEGANConfig, WGANGPConfig
from ganleaks_tpu.models import medgan as medgan_m
from ganleaks_tpu.models import pggan as pggan_m
from ganleaks_tpu.models import vaegan as vaegan_m
from ganleaks_tpu.models import wgangp as wgangp_m
from ganleaks_tpu.train import medgan as medgan_t
from ganleaks_tpu.train import pggan as pggan_t
from ganleaks_tpu.train import vaegan as vaegan_t
from ganleaks_tpu.train import wgangp as wgangp_t


def changed(a, b):
    return any(not np.allclose(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a),
                   jax.tree_util.tree_leaves(b)))


# ---------------- WGAN-GP ----------------

def test_wgangp_step(rng):
    cfg = WGANGPConfig(ngf=8, ndf=8, nz=16, batch_size=4, critic_iter=2)
    state = wgangp_t.build_state(cfg, jax.random.key(0))
    real = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))

    before = jax.tree_util.tree_map(np.asarray, state)
    state2, metrics = wgangp_t.wgangp_train_step(
        state, real, jax.random.key(1), critic_iter=2, lambda_gp=10.0)
    assert np.isfinite(float(metrics["loss_critic"]))
    assert np.isfinite(float(metrics["loss_gen"]))
    assert changed(before.gen.params, state2.gen.params)
    assert changed(before.disc.params, state2.disc.params)


def test_wgangp_gradient_penalty_matches_torch(rng):
    """GP formula vs torch autograd on a linear critic."""
    import torch

    w = rng.standard_normal((1, 4 * 4 * 3)).astype(np.float32)
    real = rng.uniform(-1, 1, (5, 4, 4, 3)).astype(np.float32)
    fake = rng.uniform(-1, 1, (5, 4, 4, 3)).astype(np.float32)
    eps = rng.random((5, 1, 1, 1)).astype(np.float32)

    # torch oracle (wgangp/utils.py:4-24) with critic(x) = x_flat @ w.T
    rt = torch.from_numpy(real).requires_grad_(False)
    ft = torch.from_numpy(fake)
    et = torch.from_numpy(eps)
    interp = (rt * et + ft * (1 - et)).requires_grad_(True)
    scores = interp.reshape(5, -1) @ torch.from_numpy(w).t()
    grads = torch.autograd.grad(scores, interp,
                                torch.ones_like(scores),
                                create_graph=True)[0]
    gp_ref = ((grads.view(5, -1).norm(2, dim=1) - 1) ** 2).mean().item()

    def critic_apply(variables, x):
        return x.reshape(x.shape[0], -1) @ variables["params"]["w"].T

    gp = wgangp_t.gradient_penalty_fn(
        critic_apply, {"w": jnp.asarray(w)}, jnp.asarray(real),
        jnp.asarray(fake), jnp.asarray(eps))
    np.testing.assert_allclose(float(gp), gp_ref, rtol=1e-5, atol=1e-6)


# ---------------- PGGAN ----------------

def test_pggan_shapes_all_steps():
    """The reference smoke block (``pggan/model_torch.py:230-245``), for
    every resolution up to 16x16."""
    gen = pggan_m.Generator(nz=32, in_channels=32, nc=3)
    disc = pggan_m.Discriminator(in_channels=32, nc=3)
    gv = pggan_m.init_progressive(gen, jax.random.key(0),
                                  jnp.zeros((1, 32)), 2)
    dv = pggan_m.init_progressive(disc, jax.random.key(1),
                                  jnp.zeros((1, 4, 4, 3)), 2)
    z = jnp.zeros((2, 32))
    for steps in range(3):
        res = 4 * 2 ** steps
        img = gen.apply(gv, z, steps, 0.5)
        assert img.shape == (2, res, res, 3), steps
        if steps > 0:  # steps==0 output is un-tanh'd (model_torch.py:78-79)
            assert float(jnp.abs(img).max()) <= 1.0
        score = disc.apply(dv, img, steps, 0.5)
        assert score.shape == (2, 1)


def test_pggan_train_step_and_generate(tmp_path, rng):
    cfg = PGGANConfig(nz=32, in_channels=32, image_size=8,
                      start_img_size=4, num_epochs=1,
                      batch_sizes=(4, 4), num_generated=6,
                      PATH=str(tmp_path / "m"),
                      PATH_syn_data=str(tmp_path / "s"))
    images = rng.uniform(-1, 1, (8, 8, 8, 3)).astype(np.float32)
    state = pggan_t.train(cfg, images=images)
    dirs = pggan_t.generate(cfg, state, run_dir="t")
    import os
    z = np.load(os.path.join(dirs["npz_images"],
                             "pggan_synthetic_data.npz"))
    assert z["fake"].shape == (6, 3, 8, 8)


# ---------------- VAE-GAN ----------------

def test_vaegan_modules_shapes(rng):
    enc = vaegan_m.Encoder(z_dim=16, d=8)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    ev = enc.init(jax.random.key(0), img, jax.random.key(9), train=True)
    z = enc.apply(ev, img, jax.random.key(1), train=False)
    assert z.shape == (2, 16)

    gen = vaegan_m.Generator(z_dim=16, d=8)
    gv = gen.init(jax.random.key(2), z, train=True)
    out = gen.apply(gv, z, train=False)
    assert out.shape == (2, 64, 64, 3)

    disc = vaegan_m.Discriminator(d=8)
    dv = disc.init(jax.random.key(3), out)
    assert disc.apply(dv, out).shape == (2,)

    dl = vaegan_m.DiscriminatorL()
    dlv = dl.init(jax.random.key(4), z)
    probs = dl.apply(dlv, z)
    assert probs.shape == (2,)
    assert float(probs.min()) >= 0 and float(probs.max()) <= 1


def test_vaegan_train_step(rng):
    cfg = VAEGANConfig(z_dim=16, d=8, batch_size=4)
    state = vaegan_t.build_state(cfg, jax.random.key(0))
    mk = lambda: jnp.asarray(
        rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    before = jax.tree_util.tree_map(np.asarray, state)
    state2, metrics = vaegan_t.vaegan_train_step(
        state, mk(), mk(), mk(), mk(), jax.random.key(1))
    for k in ("loss_dl", "loss_d", "loss_g"):
        assert np.isfinite(float(metrics[k])), k
    assert changed(before.gen.params, state2.gen.params)
    assert changed(before.enc.params, state2.enc.params)
    assert changed(before.disc.params, state2.disc.params)
    assert changed(before.disc_l.params, state2.disc_l.params)
    # spectral u/v advanced
    assert changed(before.disc.extra, state2.disc.extra)


def test_vaegan_checkpoint_resume(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = VAEGANConfig(z_dim=16, d=8, batch_size=4, nepoch=1,
                       steps_per_epoch=1, checkpoint_every=1,
                       num_samples=5, exp_name="ck")
    images = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    state = vaegan_t.train(cfg, images=images)
    assert int(state.epoch) == 1
    # resume: second call loads the checkpoint and does nothing more
    state2 = vaegan_t.train(cfg, images=images, resume=True)
    assert int(state2.epoch) == 1

    out = vaegan_t.sample(cfg, state, str(tmp_path / "samples"))
    import os
    z = np.load(os.path.join(out["out_dir"], "generated.npz"))
    assert z["noise"].shape == (5, 16)
    assert z["img_r01"].shape == (5, 64, 64, 3)
    assert 0.0 <= z["img_r01"].min() and z["img_r01"].max() <= 1.0


# ---------------- medGAN ----------------

def test_medgan_models_and_step(rng):
    cfg = MedGANConfig(latent_dim=16, hidden_gen=16, hidden_disc1=8,
                       hidden_disc2=8, batch_size=8, binary=True)
    data = (rng.random((32, 20)) > 0.5).astype(np.float32)
    state = medgan_t.build_state(cfg, data.shape[1], jax.random.key(0))

    # AE pretrain reduces loss
    ae = state.ae
    batch = jnp.asarray(data[:8])
    ae1, m1 = medgan_t.ae_pretrain_step(ae, batch, binary=True)
    losses = [float(m1["a_loss"])]
    for _ in range(20):
        ae1, m1 = medgan_t.ae_pretrain_step(ae1, batch, binary=True)
        losses.append(float(m1["a_loss"]))
    assert losses[-1] < losses[0]

    state = state.replace(ae=ae1,
                          ae_in_g=state.ae_in_g.replace(params=ae1.params))
    before = jax.tree_util.tree_map(np.asarray, state)
    state2, metrics = medgan_t.medgan_train_step(state, batch,
                                                 jax.random.key(1))
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert changed(before.gen.params, state2.gen.params)
    assert changed(before.disc.params, state2.disc.params)
    assert changed(before.ae.params, state2.ae.params)  # co-optimized


def test_medgan_losses_match_torch(rng):
    import torch

    y_fake = rng.random(16).astype(np.float32)
    ref_g = -torch.mean(torch.log(torch.from_numpy(y_fake) + 1e-12)).item()
    np.testing.assert_allclose(
        float(medgan_t.generator_loss(jnp.asarray(y_fake))), ref_g,
        rtol=1e-6)

    x = rng.random((8, 10)).astype(np.float32)
    y = (rng.random((8, 10)) > 0.5).astype(np.float32)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    term = yt * torch.log(xt + 1e-12) + (1 - yt) * torch.log(1 - xt + 1e-12)
    ref_ae = torch.mean(-torch.sum(term, 1), 0).item()
    np.testing.assert_allclose(
        float(medgan_t.autoencoder_loss(jnp.asarray(x), jnp.asarray(y),
                                        True)), ref_ae, rtol=1e-5)

    out_r = rng.random(8).astype(np.float32)
    out_f = rng.random(8).astype(np.float32)
    import torch.nn.functional as F
    ref_d = (F.binary_cross_entropy_with_logits(
                 torch.from_numpy(out_r), torch.ones(8))
             + F.binary_cross_entropy_with_logits(
                 torch.from_numpy(out_f), torch.zeros(8))).item()
    np.testing.assert_allclose(
        float(medgan_t.discriminator_loss(jnp.asarray(out_r),
                                          jnp.asarray(out_f))),
        ref_d, rtol=1e-6)


def test_medgan_csv_loader(tmp_path, rng):
    """CSV -> median-fill -> sklearn 90/10 split with random_state=42
    (``medgan/model.py:107-130``) — verified against the same sklearn call."""
    import pandas as pd
    from sklearn.model_selection import train_test_split

    data = rng.random((40, 5))
    data[3, 2] = np.nan  # median-fill path
    df = pd.DataFrame(data, columns=[f"c{i}" for i in range(5)])
    csv = tmp_path / "ehr.csv"
    df.to_csv(csv, index=False)

    train = medgan_t.load_csv_dataset(str(csv), train=True)
    test = medgan_t.load_csv_dataset(str(csv), train=False)
    assert train.shape == (36, 5) and test.shape == (4, 5)
    assert np.isfinite(train).all() and np.isfinite(test).all()

    filled = df.fillna(df.median())
    ref_train, ref_test = train_test_split(filled, test_size=0.1,
                                           random_state=42)
    np.testing.assert_allclose(train, ref_train.values.astype(np.float32))
    np.testing.assert_allclose(test, ref_test.values.astype(np.float32))


def test_medgan_train_and_generate(tmp_path, rng):
    cfg = MedGANConfig(latent_dim=8, hidden_gen=8, hidden_disc1=8,
                       hidden_disc2=8, batch_size=16, n_epochs=2,
                       n_epochs_pretrain=2, generate_N=10,
                       PATH=str(tmp_path))
    data = (rng.random((32, 12)) > 0.7).astype(np.float32)
    test = (rng.random((16, 12)) > 0.7).astype(np.float32)
    state = medgan_t.train(cfg, data=data, test_data=test)
    samples = medgan_t.generate(cfg, state, out_dir=str(tmp_path))
    assert samples.shape == (10, 12)
    assert set(np.unique(samples)).issubset({0.0, 1.0})
    import os
    assert os.path.exists(os.path.join(tmp_path, "synthetic.npy"))
    p_real, p_syn = medgan_t.dimension_wise_probability(data, samples)
    assert p_real.shape == (12,) and p_syn.shape == (12,)


def test_vaegan_resume_continues_rng_and_data_streams(tmp_path, rng,
                                                      monkeypatch):
    """An interrupted + resumed run must equal the uninterrupted run
    bitwise: resume previously restarted step_key and the shuffle
    stream from zero, replaying the consumed keys/batches."""
    monkeypatch.chdir(tmp_path)
    images = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    base = dict(z_dim=16, d=8, batch_size=4, steps_per_epoch=2,
                checkpoint_every=1, num_samples=5)

    full = vaegan_t.train(VAEGANConfig(nepoch=2, exp_name="full", **base),
                          images=images, resume=False)
    part = vaegan_t.train(VAEGANConfig(nepoch=1, exp_name="split", **base),
                          images=images, resume=False)
    assert int(part.epoch) == 1
    resumed = vaegan_t.train(
        VAEGANConfig(nepoch=2, exp_name="split", **base),
        images=images, resume=True)
    for name, a, b in (("gen", full.gen.params, resumed.gen.params),
                    ("enc", full.enc.params, resumed.enc.params)):
        na = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(
            jax.device_get(a))])
        nb = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(
            jax.device_get(b))])
        np.testing.assert_array_equal(na, nb, err_msg=name)
