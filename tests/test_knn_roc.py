"""kNN engine vs a torch oracle of the reference's custom_knn, and
ROC/AUC/AP/precision vs sklearn."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
from sklearn import metrics

from ganleaks_tpu.ops.distance import l2_pair, pixel_embedding
from ganleaks_tpu.ops.knn import (
    knn_argmin,
    knn_argmin_reference_batched,
    truncate_to_batches,
)
from ganleaks_tpu.ops.roc import roc_curve_auc


def reference_knn_oracle(syn: np.ndarray, queries: np.ndarray,
                         batch_size: int):
    """torch oracle re-enacting ``fbb.py:73-88`` with the pixel-l2 loss
    (``utils.py:163``): batched distances, remainder dropped, torch.min
    first-index tie-break."""
    syn_t = torch.from_numpy(syn.reshape(syn.shape[0], -1))
    out_d, out_i = [], []
    for q in queries:
        q_t = torch.from_numpy(q.reshape(1, -1))
        dists = []
        for i in range(len(syn_t) // batch_size):
            xb = syn_t[i * batch_size:(i + 1) * batch_size]
            dists.append(torch.mean((q_t - xb) ** 2, dim=1))
        dists = torch.cat(dists)
        mind, mini = torch.min(dists, dim=0)
        out_d.append(mind.item())
        out_i.append(mini.item())
    return np.array(out_d), np.array(out_i)


@pytest.mark.parametrize("engine", ["exact", "gemm"])
def test_knn_matches_reference_oracle(rng, engine):
    syn = rng.standard_normal((70, 8, 8, 3)).astype(np.float32)
    queries = rng.standard_normal((13, 8, 8, 3)).astype(np.float32)
    # make some exact ties to exercise first-index tie-break
    syn[11] = syn[3]
    syn[25] = queries[4]
    syn[60] = queries[4]

    batch = 10
    ref_d, ref_i = reference_knn_oracle(syn, queries, batch)

    n_eff = truncate_to_batches(len(syn), batch)
    emb_s = pixel_embedding(jnp.asarray(syn[:n_eff]))
    emb_q = pixel_embedding(jnp.asarray(queries))
    d, i = knn_argmin(emb_q, emb_s, engine=engine, s_block=16)

    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-5, atol=1e-6)


def test_reference_batched_helper_drops_remainder(rng):
    syn = rng.standard_normal((25, 4, 4, 3)).astype(np.float32)
    queries = rng.standard_normal((3, 4, 4, 3)).astype(np.float32)
    # plant the global NN inside the dropped remainder: index 24
    syn[24] = queries[0]
    ref_d, ref_i = reference_knn_oracle(syn, queries, batch_size=10)

    emb_s = pixel_embedding(jnp.asarray(syn))
    emb_q = pixel_embedding(jnp.asarray(queries))
    d, i = knn_argmin_reference_batched(emb_q, emb_s, batch_size=10)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    assert int(i[0]) != 24  # the remainder really was dropped

    # without the parity flag the true NN is found
    d_full, i_full = knn_argmin(emb_q, emb_s, engine="exact", s_block=8)
    assert int(i_full[0]) == 24


def test_exact_and_gemm_engines_agree(rng):
    syn = rng.standard_normal((100, 48)).astype(np.float32)
    q = rng.standard_normal((17, 48)).astype(np.float32)
    d1, i1 = knn_argmin(jnp.asarray(q), jnp.asarray(syn), engine="exact",
                        s_block=32)
    d2, i2 = knn_argmin(jnp.asarray(q), jnp.asarray(syn), engine="gemm",
                        s_block=32)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-4, atol=1e-5)


def test_l2_pair_matches_torch(rng):
    x = rng.standard_normal((6, 8, 8, 3)).astype(np.float32)
    y = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    ref = torch.mean((torch.from_numpy(y) - torch.from_numpy(x)) ** 2,
                     dim=[1, 2, 3]).numpy()
    out = l2_pair(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("with_ties", [False, True])
def test_roc_matches_sklearn(rng, with_ties):
    pos = rng.standard_normal(400).astype(np.float32) + 0.3
    neg = rng.standard_normal(300).astype(np.float32)
    if with_ties:
        pos = np.round(pos, 1)
        neg = np.round(neg, 1)

    labels = np.concatenate([np.zeros(len(neg)), np.ones(len(pos))])
    scores = np.concatenate([neg, pos])
    sk_auc = metrics.roc_auc_score(labels, scores)
    sk_ap = metrics.average_precision_score(labels, scores)
    pred = np.zeros_like(scores)
    pred[scores > -0.14] = 1
    sk_prec = metrics.precision_score(labels, pred)

    res = roc_curve_auc(jnp.asarray(pos), jnp.asarray(neg))
    np.testing.assert_allclose(float(res.auc), sk_auc, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(res.ap), sk_ap, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(res.precision), sk_prec,
                               rtol=1e-6, atol=1e-6)


def test_streamed_cache_and_recompute_paths_agree(rng):
    """knn_argmin_streamed: the resident-query-cache fast path and the
    per-block recompute path must produce identical results."""
    from ganleaks_tpu.ops.knn import knn_argmin_streamed

    syn = rng.standard_normal((37, 6, 6, 3)).astype(np.float32)
    q = rng.standard_normal((9, 6, 6, 3)).astype(np.float32)
    embed = lambda x: pixel_embedding(x)

    d1, i1 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(syn),
                                 q_block=4, s_block=8,
                                 query_cache_bytes=1 << 30)  # cache on
    d2, i2 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(syn),
                                 q_block=4, s_block=8,
                                 query_cache_bytes=0)        # cache off
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-6, atol=1e-7)
    # numpy (host-streamed) inputs give the same answer
    d3, i3 = knn_argmin_streamed(embed, q, syn, q_block=4, s_block=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))


# (the OOM-backoff contract — halve only the offending dimension, resume
# without recomputing completed blocks — is covered by
# tests/test_knn_oom_resume.py)


def test_knn_permutation_invariance(rng):
    """Property (SURVEY §4): permuting the generated set permutes the
    argmin through the permutation and leaves distances unchanged."""
    syn = rng.standard_normal((40, 24)).astype(np.float32)
    q = rng.standard_normal((7, 24)).astype(np.float32)
    d1, i1 = knn_argmin(jnp.asarray(q), jnp.asarray(syn), engine="gemm",
                        s_block=8)
    perm = rng.permutation(40)
    d2, i2 = knn_argmin(jnp.asarray(q), jnp.asarray(syn[perm]),
                        engine="gemm", s_block=8)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(perm[np.asarray(i2)], np.asarray(i1))


def test_eval_roc_calibration(rng, tmp_path):
    """Calibration subtracts reference-model losses (eval_roc.py:86-103;
    the reference's own calibration path crashes on a 5-vs-6 unpack)."""
    import os

    from ganleaks_tpu.attack.eval_roc import evaluate
    from ganleaks_tpu.config import EvalConfig

    # dyadic values stay exact through the float32 cast in evaluate()
    pos = rng.integers(1, 32, 50).astype(np.float64) / 64.0
    neg = rng.integers(8, 40, 50).astype(np.float64) / 64.0
    # reference-model losses that fully explain the gap -> calibrated ties
    ref_pos = pos - 1.0 / 64.0
    ref_neg = neg - 1.0 / 64.0
    d_main, d_ref = tmp_path / "main", tmp_path / "ref"
    for d, (p, n) in ((d_main, (pos, neg)), (d_ref, (ref_pos, ref_neg))):
        os.makedirs(d)
        np.save(d / "pos_loss.npy", p.reshape(-1, 1))
        np.save(d / "neg_loss.npy", n.reshape(-1, 1))

    out = evaluate(EvalConfig(result_load_dir=str(d_main),
                              reference_load_dir=str(d_ref)))
    assert "auc_calibrated" in out
    # calibrated losses are the constant 1/64 for both classes -> all
    # scores tie -> AUC exactly 0.5
    np.testing.assert_allclose(out["auc_calibrated"], 0.5, atol=1e-6)
    assert out["auc"] > 0.5  # uncalibrated: members have lower losses here


def test_roc_monotone_transform_invariance(rng):
    """AUROC must be invariant under monotone score transforms (SURVEY §4
    property test)."""
    pos = rng.standard_normal(100).astype(np.float32) + 1
    neg = rng.standard_normal(100).astype(np.float32)
    a1 = float(roc_curve_auc(jnp.asarray(pos), jnp.asarray(neg)).auc)
    f = lambda s: np.tanh(s / 3.0) * 5.0
    a2 = float(roc_curve_auc(jnp.asarray(f(pos)), jnp.asarray(f(neg))).auc)
    np.testing.assert_allclose(a1, a2, atol=1e-6)


def test_roc_curve_includes_origin_and_matches_sklearn():
    """fpr/tpr must carry sklearn's prepended (0,0) threshold-inf point
    (regression: the plotted roc.png started at the first real
    threshold instead of the origin)."""
    import sklearn.metrics as skm

    from ganleaks_tpu.ops.roc import roc_curve_auc

    rng = np.random.default_rng(5)
    pos = rng.normal(1.0, 1.0, 40).astype(np.float32)
    neg = rng.normal(0.0, 1.0, 60).astype(np.float32)
    pos[3:7] = neg[10:14]  # ties across classes
    res = roc_curve_auc(jnp.asarray(pos), jnp.asarray(neg))
    y = np.concatenate([np.ones(40), np.zeros(60)])
    s = np.concatenate([pos, neg])
    fpr_sk, tpr_sk, thr_sk = skm.roc_curve(y, s, drop_intermediate=False)
    fpr, tpr = np.asarray(res.fpr), np.asarray(res.tpr)
    assert fpr[0] == 0.0 and tpr[0] == 0.0
    # ours keeps carried-forward duplicates at tie rows; sklearn collapses
    # them — compare the deduplicated point sets
    ours = np.unique(np.stack([fpr, tpr], 1), axis=0)
    theirs = np.unique(np.stack([fpr_sk, tpr_sk], 1), axis=0)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    assert np.isinf(np.asarray(res.thresholds)[0])


def test_eval_roc_calibration_length_mismatch_raises(rng, tmp_path):
    """Calibration pairs losses by index: result/reference runs over
    different query counts must raise, not silently truncate into a
    plausible-looking calibrated AUC."""
    import os

    from ganleaks_tpu.attack.eval_roc import evaluate
    from ganleaks_tpu.config import EvalConfig

    d_main, d_ref = tmp_path / "main", tmp_path / "ref"
    for d, n in ((d_main, 50), (d_ref, 30)):
        os.makedirs(d)
        np.save(d / "pos_loss.npy", rng.random(n).reshape(-1, 1))
        np.save(d / "neg_loss.npy", rng.random(n).reshape(-1, 1))
    with pytest.raises(ValueError, match="length mismatch"):
        evaluate(EvalConfig(result_load_dir=str(d_main),
                            reference_load_dir=str(d_ref)))


def test_eval_refuses_nonfinite_losses(rng, tmp_path):
    """Non-finite losses must raise loudly, not flow through argsort into
    a confident-looking AUROC (VERDICT r4 weak #4: a diverged VAE-GAN
    emitted auroc 0.0 with no flag)."""
    import os

    from ganleaks_tpu.attack.eval_roc import evaluate
    from ganleaks_tpu.config import EvalConfig

    pos = rng.random(40).astype(np.float32)
    neg = rng.random(40).astype(np.float32)
    pos[7] = np.nan
    neg[3] = np.inf
    d = tmp_path / "res"
    os.makedirs(d)
    np.save(d / "pos_loss.npy", pos.reshape(-1, 1))
    np.save(d / "neg_loss.npy", neg.reshape(-1, 1))

    with pytest.raises(ValueError, match="non-finite attack losses"):
        evaluate(EvalConfig(result_load_dir=str(d)))

    # explicit opt-in scores anyway but flags the result as degenerate
    out = evaluate(EvalConfig(result_load_dir=str(d), allow_nonfinite=True))
    assert out["degenerate"] is True
    assert out["nonfinite_pos"] == 1 and out["nonfinite_neg"] == 1


def test_eval_refuses_nonfinite_reference_losses(rng, tmp_path):
    """The calibration baseline is guarded too: NaN reference losses make
    the calibrated AUROC meaningless."""
    import os

    from ganleaks_tpu.attack.eval_roc import evaluate
    from ganleaks_tpu.config import EvalConfig

    d_main, d_ref = tmp_path / "main", tmp_path / "ref"
    for d in (d_main, d_ref):
        os.makedirs(d)
        np.save(d / "pos_loss.npy", rng.random(30).reshape(-1, 1))
        np.save(d / "neg_loss.npy", rng.random(30).reshape(-1, 1))
    ref_pos = np.load(d_ref / "pos_loss.npy")
    ref_pos[5] = np.nan
    np.save(d_ref / "pos_loss.npy", ref_pos)
    with pytest.raises(ValueError, match="reference-model losses"):
        evaluate(EvalConfig(result_load_dir=str(d_main),
                            reference_load_dir=str(d_ref)))


def test_round4_emit_refuses_nonfinite_rows(tmp_path, monkeypatch):
    """The measurement harness must not record degenerate metrics
    (ADVICE r4 #2: auroc_recon 0.0 from a NaN run landed in the jsonl)."""
    import importlib

    r4 = importlib.import_module("tools.round4_measure")
    monkeypatch.setattr(r4, "RESULTS", str(tmp_path / "rows.jsonl"))
    with pytest.raises(ValueError, match="non-finite metric"):
        r4.emit({"config": "x", "nested": {"auc": float("nan")}})
    r4.emit({"config": "x", "auc": 0.5})
    import json
    rows = [json.loads(l) for l in open(tmp_path / "rows.jsonl")]
    assert rows[0]["auc"] == 0.5 and rows[0]["smoke"] is False


def test_allow_nonfinite_flags_bad_reference(rng, tmp_path):
    """Round-5 review: opting in with allow_nonfinite must FLAG a
    NaN-tainted calibration, not return unlabeled garbage."""
    import os

    from ganleaks_tpu.attack.eval_roc import evaluate
    from ganleaks_tpu.config import EvalConfig

    d_main, d_ref = tmp_path / "main", tmp_path / "ref"
    for d in (d_main, d_ref):
        os.makedirs(d)
        np.save(d / "pos_loss.npy", rng.random(30).reshape(-1, 1))
        np.save(d / "neg_loss.npy", rng.random(30).reshape(-1, 1))
    ref_pos = np.load(d_ref / "pos_loss.npy")
    ref_pos[5] = np.nan
    np.save(d_ref / "pos_loss.npy", ref_pos)
    out = evaluate(EvalConfig(result_load_dir=str(d_main),
                              reference_load_dir=str(d_ref),
                              allow_nonfinite=True))
    assert out["degenerate"] is True and out["nonfinite_ref"] == 1
    assert "auc_calibrated" in out
