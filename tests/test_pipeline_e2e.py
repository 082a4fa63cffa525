"""Miniature end-to-end pipeline (SURVEY §4 integration test):
train DCGAN -> sample -> fbb attack -> eval_roc, all through the real
drivers and on-disk artifacts, minutes not hours.

Also validates the attack against a torch re-enactment of the reference's
full fbb semantics on the same fixture (identical NN indices, equal AUROC).
"""

import os

import numpy as np
import pytest
import torch
from sklearn import metrics as skm

from ganleaks_tpu.attack.eval_roc import evaluate
from ganleaks_tpu.attack.fbb import run_attack
from ganleaks_tpu.config import AttackConfig, DCGANConfig, EvalConfig
from ganleaks_tpu.io.images import save_png
from ganleaks_tpu.train import dcgan as dcgan_train


@pytest.fixture
def fixture_dirs(tmp_path, rng):
    """Tiny member/non-member/synthetic PNG sets with a planted signal:
    members are closer to some synthetic images."""
    syn_dir = tmp_path / "syn"
    pos_dir = tmp_path / "pos"
    neg_dir = tmp_path / "neg"
    for d in (syn_dir, pos_dir, neg_dir):
        os.makedirs(d)

    base = rng.uniform(-0.8, 0.8, (12, 32, 32, 3)).astype(np.float32)
    syn = base + rng.normal(0, 0.05, base.shape).astype(np.float32)
    pos = base[:6] + rng.normal(0, 0.1, (6, 32, 32, 3)).astype(np.float32)
    neg = rng.uniform(-0.8, 0.8, (6, 32, 32, 3)).astype(np.float32)

    for name, arr, d in [("syn", syn, syn_dir), ("pos", pos, pos_dir),
                         ("neg", neg, neg_dir)]:
        for i, img in enumerate(np.clip(arr, -1, 1)):
            save_png((img + 1) / 2, str(d / f"{name}_{i:03d}.png"))
    return str(syn_dir), str(pos_dir), str(neg_dir)


def reference_fbb_oracle(syn, pos, neg, batch_size):
    """torch re-enactment of fbb.py's pixel-l2 path: custom_knn over
    batches with remainder drop + torch.min (``fbb.py:73-88``)."""
    def knn_all(queries):
        losses, idxs = [], []
        syn_t = torch.from_numpy(syn.reshape(len(syn), -1))
        for q in queries:
            qt = torch.from_numpy(q.reshape(1, -1))
            ds = []
            for i in range(len(syn) // batch_size):
                xb = syn_t[i * batch_size:(i + 1) * batch_size]
                ds.append(torch.mean((qt - xb) ** 2, dim=1))
            d = torch.cat(ds)
            mind, mini = torch.min(d, dim=0)
            losses.append(mind.item())
            idxs.append(mini.item())
        return np.array(losses), np.array(idxs)

    return knn_all(pos), knn_all(neg)


def test_full_pipeline(tmp_path, rng, fixture_dirs, monkeypatch):
    syn_dir, pos_dir, neg_dir = fixture_dirs
    monkeypatch.chdir(tmp_path)

    # 1) train a tiny DCGAN (64x64 — the architecture is resolution-fixed,
    #    like the reference) and dump synthetic artifacts
    cfg = DCGANConfig(batch_size=8, num_epochs=1, ngf=8, ndf=8, nz=16,
                      num_generated=16, image_size=64,
                      PATH=str(tmp_path / "model"),
                      PATH_syn_data=str(tmp_path / "syn_out"))
    train_imgs = rng.uniform(-1, 1, (16, 64, 64, 3)).astype(np.float32)
    state = dcgan_train.train(cfg, images=train_imgs)
    dirs = dcgan_train.generate(cfg, state, run_dir="r")
    assert len(os.listdir(dirs["png_images"])) == 16

    # 2) fbb attack on the fixture sets (pixel-l2, exact engine)
    acfg = AttackConfig(exp_name="e2e", syn_data_path=syn_dir,
                        pos_data_dir=pos_dir, neg_data_dir=neg_dir,
                        resolution=32, distance="l2", engine="exact",
                        BATCH_SIZE=4, drop_remainder=True,
                        query_block=4, syn_block=4, save_plots=True)
    results = run_attack(acfg)
    save_dir = results[0]["save_dir"]

    # artifact schema parity
    pos_loss = np.load(os.path.join(save_dir, "pos_loss.npy"))
    neg_loss = np.load(os.path.join(save_dir, "neg_loss.npy"))
    pos_idx = np.load(os.path.join(save_dir, "pos_idx.npy"))
    assert pos_loss.shape == (6, 1) and neg_loss.shape == (6, 1)
    np.testing.assert_array_equal(pos_idx[:, 0], np.arange(6))
    assert os.path.exists(os.path.join(save_dir, "0pos.png"))
    assert os.path.exists(os.path.join(save_dir, "params.txt"))

    # 3) golden parity vs the torch oracle on the same PNG-roundtripped data
    from ganleaks_tpu.io.images import load_image_dir
    syn = load_image_dir(syn_dir, 32).astype(np.float32)
    pos = load_image_dir(pos_dir, 32).astype(np.float32)
    neg = load_image_dir(neg_dir, 32).astype(np.float32)
    (op_l, op_i), (on_l, on_i) = reference_fbb_oracle(syn, pos, neg, 4)
    np.testing.assert_array_equal(
        np.load(os.path.join(save_dir, "pos_nn_idx.npy"))[:, 0], op_i)
    np.testing.assert_array_equal(
        np.load(os.path.join(save_dir, "neg_nn_idx.npy"))[:, 0], on_i)
    np.testing.assert_allclose(pos_loss[:, 0], op_l, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(neg_loss[:, 0], on_l, rtol=1e-5, atol=1e-7)

    # 4) eval_roc: AUROC matches sklearn on the oracle losses, and the
    #    planted membership signal is detected
    ecfg = EvalConfig(result_load_dir=save_dir)
    out = evaluate(ecfg)
    labels = np.concatenate([np.zeros(6), np.ones(6)])
    scores = np.concatenate([-on_l, -op_l])
    sk_auc = skm.roc_auc_score(labels, scores)
    np.testing.assert_allclose(out["auc"], sk_auc, atol=1e-6)
    assert out["auc"] > 0.9  # members are plainly closer

    # 5) eval CLI plot path
    from ganleaks_tpu.attack.eval_roc import evaluate_and_plot
    evaluate_and_plot(ecfg)
    assert os.path.exists(os.path.join(save_dir, "roc.png"))
    assert os.path.exists(os.path.join(save_dir, "hist.png"))


def test_attack_with_lpips_surrogate(fixture_dirs, tmp_path, monkeypatch):
    """l2-lpips distance end to end (surrogate backbone + real lin heads)."""
    syn_dir, pos_dir, neg_dir = fixture_dirs
    monkeypatch.chdir(tmp_path)
    acfg = AttackConfig(exp_name="e2e_lpips", syn_data_path=syn_dir,
                        pos_data_dir=pos_dir, neg_data_dir=neg_dir,
                        resolution=32, distance="l2-lpips", engine="gemm",
                        query_block=4, syn_block=8, save_plots=False)
    results = run_attack(acfg)
    save_dir = results[0]["save_dir"]
    pos_loss = np.load(os.path.join(save_dir, "pos_loss.npy"))
    assert np.isfinite(pos_loss).all()
    out = evaluate(EvalConfig(result_load_dir=save_dir))
    assert 0.0 <= out["auc"] <= 1.0
