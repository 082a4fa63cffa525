"""End-to-end reconstruction attack (BASELINE config #3): CLI -> fbb-layout
artifacts -> eval_roc, on a tiny random VAE-GAN."""

import os

import jax
import numpy as np
import PIL.Image

from ganleaks_tpu.cli.reconstruction import main as recon_main
from ganleaks_tpu.config import EvalConfig, VAEGANConfig
from ganleaks_tpu.train.vaegan import build_state
from ganleaks_tpu.utils.checkpoint import save_state


def _write_pngs(dirname, rng, n=6):
    os.makedirs(dirname)
    for i in range(n):
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(os.path.join(dirname, f"{i}.png"))


def test_reconstruction_cli_end_to_end(rng, tmp_path, monkeypatch):
    cfg = VAEGANConfig(z_dim=16, d=8, image_size=64)
    state = build_state(cfg, jax.random.key(0))
    netg = os.path.join(tmp_path, "netG.msgpack")
    nete = os.path.join(tmp_path, "netE.msgpack")
    save_state(netg, {"params": state.gen.params,
                      "batch_stats": state.gen.batch_stats,
                      "spectral": dict(state.gen.extra).get("spectral", {})})
    save_state(nete, {"params": state.enc.params,
                      "batch_stats": state.enc.batch_stats})

    pos_dir = os.path.join(tmp_path, "pos")
    neg_dir = os.path.join(tmp_path, "neg")
    _write_pngs(pos_dir, rng)
    _write_pngs(neg_dir, rng)

    monkeypatch.chdir(tmp_path)
    recon_main([
        f"pos_data_dir={pos_dir}", f"neg_data_dir={neg_dir}",
        f"netE={nete}", f"netG={netg}", "z_dim=16", "d=8",
        "reader=resize", "distance=l2", "exp_name=e2e",
    ])

    save_dir = os.path.join(tmp_path, "recon_attack", "e2e")
    pos_loss = np.load(os.path.join(save_dir, "pos_loss.npy"))
    neg_loss = np.load(os.path.join(save_dir, "neg_loss.npy"))
    assert pos_loss.shape == (6, 1) and pos_loss.dtype == np.float64
    assert (pos_loss > 0).all() and (neg_loss > 0).all()
    # the reference's sequential-counter idx quirk (fbb.py:162,171)
    np.testing.assert_array_equal(
        np.load(os.path.join(save_dir, "pos_idx.npy")).ravel(),
        np.arange(6))
    assert os.path.exists(os.path.join(save_dir, "params.txt"))
    assert os.path.exists(os.path.join(save_dir, "0pos.png"))

    # eval_roc consumes the run unchanged (fbb artifact layout)
    from ganleaks_tpu.attack.eval_roc import evaluate_and_plot

    out = evaluate_and_plot(EvalConfig(result_load_dir=save_dir,
                                       attack_type="fbb"))
    assert 0.0 <= out["auc"] <= 1.0
    assert os.path.exists(os.path.join(save_dir, "roc.png"))


def test_reconstruction_member_signal(rng, tmp_path, monkeypatch):
    """A query equal to its own reconstruction scores ~0 (perfect member
    signal): feed G(E(x)) back as the query and the loss must shrink."""
    import jax.numpy as jnp

    from ganleaks_tpu.attack.reconstruction import reconstruction_scores
    from ganleaks_tpu.models.vaegan import Encoder, Generator

    cfg = VAEGANConfig(z_dim=16, d=8, image_size=64)
    state = build_state(cfg, jax.random.key(0))
    enc = Encoder(z_dim=16, d=8)
    gen = Generator(z_dim=16, d=8)
    vars_e = {"params": state.enc.params,
              "batch_stats": state.enc.batch_stats}
    vars_g = {"params": state.gen.params,
              "batch_stats": state.gen.batch_stats,
              **dict(state.gen.extra)}

    def e_apply(x, rng_):
        return enc.apply(vars_e, x, rng_, train=False)

    def g_apply(z):
        return gen.apply(vars_g, z, train=False)

    x = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    rec = g_apply(e_apply(x, jax.random.key(1)))
    d_raw = reconstruction_scores(e_apply, g_apply, x, jax.random.key(2))
    d_rec = reconstruction_scores(e_apply, g_apply, rec, jax.random.key(2))
    assert d_rec.mean() < d_raw.mean()
