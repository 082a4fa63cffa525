"""Tabular fbb attack (medGAN path, BASELINE config #4): library driver,
CLI, and E2E into eval_roc — the command-line flow the reference never had
for its ``synthetic.npy`` output."""

import os

import numpy as np
import pytest

from ganleaks_tpu.attack.tabular import load_rows, run_tabular_attack
from ganleaks_tpu.config import TabularAttackConfig


def _toy_rows(rng, n_syn=64, n_q=16, d=32):
    syn = (rng.uniform(size=(n_syn, d)) < 0.3).astype(np.float32)
    # members: near-copies of synthetic rows (one bit flipped) ->
    # separable from random non-members
    pos = syn[rng.integers(0, n_syn, n_q)].copy()
    for r in range(n_q):
        pos[r, rng.integers(0, d)] = 1.0 - pos[r, rng.integers(0, d)]
    neg = (rng.uniform(size=(n_q, d)) < 0.5).astype(np.float32)
    return syn, pos, neg


def test_load_rows_formats(tmp_path, rng):
    rows = rng.uniform(size=(5, 3)).astype(np.float32)
    np.save(tmp_path / "a.npy", rows)
    np.savez(tmp_path / "b.npz", rows=rows)
    np.testing.assert_array_equal(load_rows(str(tmp_path / "a.npy")), rows)
    np.testing.assert_array_equal(load_rows(str(tmp_path / "b.npz")), rows)
    import pandas as pd
    pd.DataFrame(rows).to_csv(tmp_path / "c.csv", index=False)
    np.testing.assert_allclose(load_rows(str(tmp_path / "c.csv")), rows,
                               rtol=1e-6)
    np.savez(tmp_path / "two.npz", a=rows, b=rows)
    with pytest.raises(ValueError):
        load_rows(str(tmp_path / "two.npz"))


def test_run_tabular_attack_artifacts(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    syn, pos, neg = _toy_rows(rng)
    np.save(tmp_path / "synthetic.npy", syn)
    np.save(tmp_path / "pos.npy", pos)
    np.save(tmp_path / "neg.npy", neg)
    cfg = TabularAttackConfig(syn_data_path=str(tmp_path / "synthetic.npy"),
                              pos_data_path=str(tmp_path / "pos.npy"),
                              neg_data_path=str(tmp_path / "neg.npy"),
                              exp_name="t1")
    out = run_tabular_attack(cfg)
    sd = out["save_dir"]
    for name in ("pos_loss", "neg_loss", "pos_idx", "neg_idx",
                 "pos_nn_idx", "neg_nn_idx"):
        assert os.path.exists(os.path.join(sd, name + ".npy")), name
    pos_loss = np.load(os.path.join(sd, "pos_loss.npy"))
    neg_loss = np.load(os.path.join(sd, "neg_loss.npy"))
    assert pos_loss.shape == (16, 1) and neg_loss.shape == (16, 1)
    # members are one bit from a synthetic row: mean-square distance 1/d
    assert float(pos_loss.mean()) < float(neg_loss.mean())
    # counter quirk files are sequential (fbb.py:162,171)
    np.testing.assert_array_equal(
        np.load(os.path.join(sd, "pos_idx.npy")).ravel(), np.arange(16))


def test_cli_e2e_into_eval_roc(tmp_path, rng, monkeypatch, capsys):
    from ganleaks_tpu.cli import eval_roc as eval_cli
    from ganleaks_tpu.cli import fbb_tabular as tab_cli

    monkeypatch.chdir(tmp_path)
    syn, pos, neg = _toy_rows(rng)
    np.save(tmp_path / "synthetic.npy", syn)
    np.save(tmp_path / "pos.npy", pos)
    np.save(tmp_path / "neg.npy", neg)
    tab_cli.main([f"syn_data_path={tmp_path}/synthetic.npy",
                  f"pos_data_path={tmp_path}/pos.npy",
                  f"neg_data_path={tmp_path}/neg.npy",
                  "exp_name=e2e"])
    result_dir = os.path.join(str(tmp_path), "fbb_attack", "e2e")
    eval_cli.main([f"result_load_dir={result_dir}"])
    out = capsys.readouterr().out
    assert "AUC ROC" in out
    auc = float([ln for ln in out.splitlines()
                 if "AUC ROC" in ln][0].rsplit(":", 1)[1])
    assert auc > 0.8  # near-copy members must be clearly separable
    assert os.path.exists(os.path.join(result_dir, "roc.png"))


def test_dataset_csv_split_matches_reference_partition(tmp_path, rng,
                                                       monkeypatch):
    """dataset_csv mode must reproduce the medGAN trainer's exact 90/10
    partition (sklearn random_state=42) — members == the rows the victim
    actually trained on."""
    import pandas as pd

    from ganleaks_tpu.train.medgan import load_csv_dataset

    rows = (rng.uniform(size=(50, 8)) < 0.4).astype(np.float32)
    csv = tmp_path / "ehr.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    monkeypatch.chdir(tmp_path)
    np.save(tmp_path / "synthetic.npy", rows[:10])
    cfg = TabularAttackConfig(syn_data_path=str(tmp_path / "synthetic.npy"),
                              dataset_csv=str(csv), exp_name="csv")
    out = run_tabular_attack(cfg)
    n_train = len(load_csv_dataset(str(csv), train=True))
    n_test = len(load_csv_dataset(str(csv), train=False))
    assert len(out["pos_loss"]) == n_train
    assert len(out["neg_loss"]) == n_test
