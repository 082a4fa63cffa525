"""Attack evaluation: ROC / AUC / AP / precision (+ optional calibration).

Reference: ``attack_models/eval_roc.py``. Scores are negated losses
(``eval_roc.py:78``). The reference's calibration branch crashes (it unpacks
5 of ``plot_roc``'s 6 return values, ``eval_roc.py:101``) — fixed here, the
divergence is recorded in DIVERGENCES.md.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.config import EvalConfig
from ganleaks_tpu.ops.roc import RocResult, roc_curve_auc
from ganleaks_tpu.utils.logging import MetricsLogger


def load_losses(result_dir: str, attack_type: str) -> tuple[np.ndarray, np.ndarray]:
    """fbb losses keep their (N, 1) shape; other attack types flatten
    (``eval_roc.py:67-72``)."""
    pos = np.load(os.path.join(result_dir, "pos_loss.npy"))
    neg = np.load(os.path.join(result_dir, "neg_loss.npy"))
    if attack_type != "fbb":
        pos, neg = pos.flatten(), neg.flatten()
    return pos, neg


def evaluate(cfg: EvalConfig, pos_loss: np.ndarray | None = None,
             neg_loss: np.ndarray | None = None) -> dict:
    """Compute metrics; optionally calibrate against a reference model's
    losses (``eval_roc.py:86-103``: calibrated score = -(loss - ref_loss))."""
    if pos_loss is None:
        pos_loss, neg_loss = load_losses(cfg.result_load_dir, cfg.attack_type)
    pos_loss = np.asarray(pos_loss, np.float32).reshape(-1)
    neg_loss = np.asarray(neg_loss, np.float32).reshape(-1)

    # Non-finite losses sort arbitrarily through argsort/cumsum and emerge
    # as a plausible-looking scalar (a diverged VAE-GAN once produced a
    # confident AUROC 0.0 this way). A membership-inference framework must
    # refuse to score garbage: raise unless the caller explicitly opted in,
    # and even then flag the result as degenerate.
    n_bad_pos = int(np.size(pos_loss) - np.isfinite(pos_loss).sum())
    n_bad_neg = int(np.size(neg_loss) - np.isfinite(neg_loss).sum())
    degenerate = bool(n_bad_pos or n_bad_neg)
    if degenerate and not cfg.allow_nonfinite:
        raise ValueError(
            f"non-finite attack losses: {n_bad_pos}/{pos_loss.size} pos, "
            f"{n_bad_neg}/{neg_loss.size} neg — the victim or the attack "
            f"diverged; refusing to compute a meaningless AUROC. Pass "
            f"EvalConfig(allow_nonfinite=True) to score anyway (the result "
            f"will carry degenerate=True).")

    res: RocResult = roc_curve_auc(jnp.asarray(-pos_loss),
                                   jnp.asarray(-neg_loss),
                                   cfg.precision_threshold)
    out = {"auc": float(res.auc), "ap": float(res.ap),
           "precision": float(res.precision),
           "fpr": np.asarray(res.fpr), "tpr": np.asarray(res.tpr)}
    if degenerate:
        out.update({"degenerate": True, "nonfinite_pos": n_bad_pos,
                    "nonfinite_neg": n_bad_neg})

    if cfg.reference_load_dir is not None:
        pos_ref, neg_ref = load_losses(cfg.reference_load_dir,
                                       cfg.attack_type)
        pos_ref = np.asarray(pos_ref, np.float32).reshape(-1)
        neg_ref = np.asarray(neg_ref, np.float32).reshape(-1)
        # calibration pairs by INDEX (loss_i - ref_loss_i must be the
        # same query i, eval_roc.py:86-103): a length mismatch means the
        # runs used different query sets and silent truncation would
        # report a plausible but meaningless calibrated AUC
        if len(pos_ref) != len(pos_loss) or len(neg_ref) != len(neg_loss):
            raise ValueError(
                f"calibration length mismatch: result has "
                f"{len(pos_loss)} pos / {len(neg_loss)} neg losses, "
                f"reference has {len(pos_ref)} / {len(neg_ref)} — the "
                f"runs must score the same query sets in the same order")
        n_bad_ref = int((~np.isfinite(pos_ref)).sum()
                        + (~np.isfinite(neg_ref)).sum())
        if n_bad_ref:
            if not cfg.allow_nonfinite:
                raise ValueError(
                    f"non-finite reference-model losses ({n_bad_ref} "
                    f"values) in {cfg.reference_load_dir} — the "
                    f"calibration baseline is garbage; refusing to "
                    f"compute a calibrated AUROC.")
            # the opt-in contract: garbage is scored but FLAGGED
            out.update({"degenerate": True, "nonfinite_ref": n_bad_ref})
        pos_cal = pos_loss - pos_ref
        neg_cal = neg_loss - neg_ref
        cal = roc_curve_auc(jnp.asarray(-pos_cal), jnp.asarray(-neg_cal),
                            cfg.precision_threshold)
        out.update({"auc_calibrated": float(cal.auc),
                    "ap_calibrated": float(cal.ap)})
    return out


def evaluate_and_plot(cfg: EvalConfig) -> dict:
    """CLI flavor: metrics + roc.png + histogram, wandb-optional
    (``eval_roc.py:105-121``, ``:28-37``)."""
    out = evaluate(cfg)
    logger = MetricsLogger(wandb_project=cfg.wandb)
    logger.log({k: v for k, v in out.items()
                if not isinstance(v, np.ndarray)})
    if cfg.save_dir and cfg.result_load_dir:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.plot(out["fpr"], out["tpr"],
                 label=f"{cfg.attack_type} attack, auc={out['auc']:.3f}, "
                       f"ap={out['ap']:.3f}")
        plt.legend(loc="lower right")
        plt.xlabel("false positive")
        plt.ylabel("true positive")
        plt.title("ROC curve")
        plt.savefig(os.path.join(cfg.result_load_dir, "roc.png"))
        plt.close()

        pos, neg = load_losses(cfg.result_load_dir, cfg.attack_type)
        plt.figure()
        plt.hist(pos.ravel(), bins=100, alpha=0.5,
                 weights=np.full(pos.size, 1.0 / pos.size), label="positive")
        plt.hist(neg.ravel(), bins=100, alpha=0.5,
                 weights=np.full(neg.size, 1.0 / neg.size), label="negative")
        plt.legend(loc="upper right")
        plt.xlabel("distance")
        plt.ylabel("normalized frequency")
        plt.savefig(os.path.join(cfg.result_load_dir, "hist.png"))
        plt.close()
    logger.close()
    return out
