"""Device-side ROC / AUC / AP / precision.

Reimplements the sklearn calls of ``attack_models/eval_roc.py:14-25`` in
pure JAX so attack evaluation never leaves the device:

* scores are NEGATED losses (smaller distance => more likely member,
  ``eval_roc.py:78``);
* ``roc_curve``/``roc_auc_score``: threshold sweep over distinct scores,
  trapezoidal AUC — sklearn semantics, including tie handling (cumulative
  counts taken at the last element of each tied group);
* ``average_precision_score``: sum over recall increments of precision (the
  step-function integral sklearn uses, not the trapezoid);
* ``precision_score`` at the reference's hardcoded ``score > -0.14``
  (``eval_roc.py:21-23``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class RocResult(NamedTuple):
    fpr: Array
    tpr: Array
    thresholds: Array
    auc: Array
    ap: Array
    precision: Array
    mask: Array  # valid entries of fpr/tpr (padded to fixed length)


def _sorted_cums(scores: Array, labels: Array) -> tuple[Array, Array, Array]:
    """Scores sorted descending with cumulative TP/FP counts."""
    order = jnp.argsort(-scores, stable=True)
    s = scores[order]
    l = labels[order].astype(jnp.float32)
    tps = jnp.cumsum(l)
    fps = jnp.cumsum(1.0 - l)
    return s, tps, fps


def roc_curve_auc(pos_scores: Array, neg_scores: Array,
                  precision_threshold: float = -0.14) -> RocResult:
    """Full ROC computation for (positive=member, negative=non-member)
    score vectors, matching ``plot_roc`` (``eval_roc.py:14-25``)."""
    scores = jnp.concatenate([neg_scores, pos_scores]).astype(jnp.float32)
    labels = jnp.concatenate([jnp.zeros(neg_scores.shape[0]),
                              jnp.ones(pos_scores.shape[0])])
    n = scores.shape[0]
    s, tps, fps = _sorted_cums(scores, labels)

    # sklearn keeps the last index of each tied-score run
    is_last = jnp.concatenate([s[1:] != s[:-1], jnp.ones((1,), bool)])
    # AUC via trapezoid over the tie-collapsed curve == trapezoid over the
    # full cumulative curve restricted to run-ends; implement by zeroing
    # increments inside runs.
    P = tps[-1]
    N = fps[-1]

    tpr_full = tps / P
    fpr_full = fps / N
    # prepend (0,0)
    tpr0 = jnp.concatenate([jnp.zeros((1,)), tpr_full])
    fpr0 = jnp.concatenate([jnp.zeros((1,)), fpr_full])
    keep0 = jnp.concatenate([jnp.ones((1,), bool), is_last])

    # trapezoid over kept points only: for dropped points, collapse by
    # carrying forward the previous kept value. Equivalent trick: AUC =
    # sum over kept segments; compute via cummax-style gather of previous
    # kept index. Simpler: integrate over all consecutive pairs but with
    # x/y replaced by their values at the most recent kept point.
    idx = jnp.arange(n + 1)
    kept_idx = jnp.where(keep0, idx, -1)
    last_kept = jax.lax.associative_scan(jnp.maximum, kept_idx)
    fpr_k = fpr0[last_kept]
    tpr_k = tpr0[last_kept]
    auc = jnp.sum((fpr_k[1:] - fpr_k[:-1]) * (tpr_k[1:] + tpr_k[:-1]) / 2.0)

    # average precision: sum (R_i - R_{i-1}) * P_i over ALL ranks (sklearn
    # computes on the tie-collapsed curve, but increments inside a tied run
    # sum to the same total since precision is constant within a run only at
    # its end... sklearn uses run-end values; emulate exactly by weighting
    # each rank's recall increment with the precision at its run END).
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    prec_full = tps / ranks
    run_end_idx = jax.lax.associative_scan(
        jnp.minimum, jnp.where(is_last, idx[:n], n - 1), reverse=True)
    prec_at_end = prec_full[run_end_idx]
    rec_inc = jnp.diff(jnp.concatenate([jnp.zeros((1,)), tps])) / P
    ap = jnp.sum(rec_inc * prec_at_end)

    # precision at the hardcoded threshold (eval_roc.py:21-23):
    # predicted positive iff score > -0.14
    pred = scores > precision_threshold
    tp = jnp.sum(pred * labels)
    denom = jnp.sum(pred)
    precision = jnp.where(denom > 0, tp / denom, 0.0)

    # the returned curve INCLUDES the (0, 0) origin at index 0 (sklearn's
    # prepended threshold-inf point) — dropping it plotted roc.png curves
    # that start at the first real threshold instead of the origin
    thr = jnp.concatenate([jnp.full((1,), jnp.inf, s.dtype), s])
    return RocResult(fpr=fpr_k, tpr=tpr_k, thresholds=thr,
                     auc=auc, ap=ap, precision=precision, mask=is_last)


def auroc(pos_scores: Array, neg_scores: Array) -> Array:
    return roc_curve_auc(pos_scores, neg_scores).auc
