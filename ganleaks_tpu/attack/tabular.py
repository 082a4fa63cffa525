"""fbb attack driver for tabular/EHR records (the medGAN path).

The reference has no attack entry point for medGAN's ``synthetic.npy``
(``gan_models/medgan/train.py:247-318`` dumps the binary matrix and stops);
BASELINE config #4 requires the tabular rows to flow through the same kNN
engine and eval pipeline as images. This driver loads row sets — ``.npy``
(or single-array ``.npz``) files, or the reference's CSV dataset with its
exact 90/10 member/non-member split (``medgan/model.py:107-130``, sklearn
``random_state=42``) — runs :func:`attack.reconstruction.fbb_tabular`, and
writes the fbb artifact layout (``fbb.py:42-67,162-171``) so
``cli.eval_roc`` consumes the run unchanged.
"""

from __future__ import annotations

import os

import numpy as np

from ganleaks_tpu.attack.reconstruction import fbb_tabular
from ganleaks_tpu.config import TabularAttackConfig
from ganleaks_tpu.io.artifacts import check_folder, dump_params, save_files
from ganleaks_tpu.utils.logging import MetricsLogger


def load_rows(path: str) -> np.ndarray:
    """(N, D) float32 rows from .npy / single-array .npz / .csv."""
    path = os.path.expanduser(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            keys = list(z.keys())
            if len(keys) != 1:
                raise ValueError(f"{path}: expected a single array, "
                                 f"found keys {keys}")
            rows = z[keys[0]]
    elif path.endswith(".csv"):
        import pandas as pd
        # column-median fill, like the reference's dataset loader
        # (medgan/model.py:114) and our own load_csv_dataset — a 0-fill
        # shifted distances wherever a column median is nonzero
        df = pd.read_csv(path, header=0)
        rows = df.fillna(df.median()).values
    else:
        rows = np.load(path)
    rows = np.asarray(rows, np.float32)
    if rows.ndim != 2:
        rows = rows.reshape(rows.shape[0], -1)
    return rows


def _query_rows(cfg: TabularAttackConfig) -> tuple[np.ndarray, np.ndarray]:
    if cfg.dataset_csv:
        # the reference's exact member/non-member partition: the medGAN
        # training split is the member pool, the held-out 10% the
        # non-member pool (medgan/model.py:107-130)
        from ganleaks_tpu.train.medgan import load_csv_dataset
        pos = load_csv_dataset(cfg.dataset_csv, train=True)
        neg = load_csv_dataset(cfg.dataset_csv, train=False)
        return np.asarray(pos, np.float32), np.asarray(neg, np.float32)
    if not (cfg.pos_data_path and cfg.neg_data_path):
        raise ValueError("need either dataset_csv or both pos_data_path "
                         "and neg_data_path")
    return load_rows(cfg.pos_data_path), load_rows(cfg.neg_data_path)


def run_tabular_attack(cfg: TabularAttackConfig) -> dict:
    """Load rows, 1-NN search, fbb-layout artifacts. Returns the losses,
    true NN indices, and the save dir."""
    if not cfg.syn_data_path:
        raise ValueError("syn_data_path (synthetic.npy) is required")
    syn = load_rows(cfg.syn_data_path)
    pos, neg = _query_rows(cfg)
    pos, neg = pos[:cfg.data_num], neg[:cfg.data_num]
    if syn.shape[1] != pos.shape[1]:
        raise ValueError(f"feature dim mismatch: synthetic {syn.shape[1]} "
                         f"vs queries {pos.shape[1]}")

    save_dir = check_folder(os.path.join(os.getcwd(), cfg.save_root,
                                         cfg.exp_name))
    dump_params(save_dir, cfg)
    logger = MetricsLogger(os.path.join(save_dir, "metrics.jsonl"))
    import time
    t0 = time.perf_counter()
    out = fbb_tabular(syn, pos, neg, engine=cfg.engine,
                      s_block=cfg.syn_block)
    dt = time.perf_counter() - t0
    rate = (len(pos) + len(neg)) * len(syn) / max(dt, 1e-9)
    logger.log({"query_pairs_per_sec": rate, "n_syn": len(syn),
                "n_pos": len(pos), "n_neg": len(neg),
                "n_features": int(syn.shape[1])})

    # fbb artifact layout incl. the sequential-counter idx quirk
    # (fbb.py:162,171 — the neg file reuses len(pos_loss)) with the TRUE
    # NN indices alongside, exactly as attack/fbb.run_attack writes them
    seq = np.arange(len(out["pos_loss"])).reshape(-1, 1)
    save_files(save_dir, ["pos_loss", "pos_idx", "pos_nn_idx"],
               [out["pos_loss"].reshape(-1, 1), seq,
                out["pos_nn_idx"].reshape(-1, 1)])
    save_files(save_dir, ["neg_loss", "neg_idx", "neg_nn_idx"],
               [out["neg_loss"].reshape(-1, 1), seq,
                out["neg_nn_idx"].reshape(-1, 1)])
    logger.close()
    out["save_dir"] = save_dir
    out["query_pairs_per_sec"] = rate
    return out
