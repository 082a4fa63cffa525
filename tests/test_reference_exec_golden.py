"""Golden parity against the REFERENCE'S OWN CODE, executed.

``tests/reference_oracle.py`` imports ``/root/reference/attack_models``'s
``fbb.custom_knn`` + ``utils.Loss`` (real ``vgg.pth`` lin heads, shared
surrogate backbone weights) and runs them; these tests assert our attack
produces identical NN indices, matching losses, and matching AUROC. Unlike
the hand-written torch re-enactment in ``test_fbb_lpips_golden.py``, a
divergence in our understanding of ``fbb.py:73-88`` / ``utils.py:153-177``
shows up here as a hard failure.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import sklearn.metrics

from ganleaks_tpu.ops.distance import make_embed_fn
from ganleaks_tpu.ops.knn import knn_argmin_streamed, truncate_to_batches
from ganleaks_tpu.ops.lpips import default_lpips_params, lpips_embed_fn
from ganleaks_tpu.ops.roc import auroc
from tests.reference_oracle import reference_fbb_search

BATCH = 8


@pytest.fixture(scope="module")
def fixture_sets():
    rng = np.random.default_rng(7)
    # 26 synthetic: custom_knn drops the %BATCH_SIZE remainder -> 24 used
    syn = rng.uniform(-1, 1, (26, 32, 32, 3)).astype(np.float32)
    pos = rng.uniform(-1, 1, (5, 32, 32, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (5, 32, 32, 3)).astype(np.float32)
    # members leak: near-duplicates of three pos queries in the syn set
    syn[3] = pos[0] * 0.97 + 0.02
    syn[17] = pos[2] * 0.98 + 0.01
    syn[11] = pos[4] * 0.99 - 0.005
    syn[25] = pos[1] * 0.99  # in the dropped remainder — must NOT be found
    return syn, pos, neg


@pytest.fixture(scope="module")
def reference_run(fixture_sets):
    syn, pos, neg = fixture_sets
    pos_d, pos_i, loss = reference_fbb_search(syn, pos, "l2-lpips", BATCH)
    neg_d, neg_i, _ = reference_fbb_search(syn, neg, "l2-lpips", BATCH,
                                           loss_obj=loss)
    return pos_d, pos_i, neg_d, neg_i


def test_exec_reference_l2_lpips_indices_and_losses(fixture_sets,
                                                    reference_run):
    syn, pos, neg = fixture_sets
    ref_pos_d, ref_pos_i, ref_neg_d, ref_neg_i = reference_run

    n_eff = truncate_to_batches(len(syn), BATCH)
    assert n_eff == 24
    embed = make_embed_fn(
        "l2-lpips", lpips_embed_fn(default_lpips_params("vgg"), weight=0.2))
    syn_j = jnp.asarray(syn[:n_eff])
    pos_d, pos_i = knn_argmin_streamed(embed, jnp.asarray(pos), syn_j,
                                       engine="gemm", q_block=4, s_block=8)
    neg_d, neg_i = knn_argmin_streamed(embed, jnp.asarray(neg), syn_j,
                                       engine="gemm", q_block=4, s_block=8)

    np.testing.assert_array_equal(np.asarray(pos_i), ref_pos_i)
    np.testing.assert_array_equal(np.asarray(neg_i), ref_neg_i)
    np.testing.assert_allclose(np.asarray(pos_d), ref_pos_d,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(neg_d), ref_neg_d,
                               rtol=1e-4, atol=1e-5)
    # the planted near-duplicates are found; the one in the dropped
    # remainder (syn[25]) is not
    assert list(ref_pos_i[[0, 2, 4]]) == [3, 17, 11]
    assert ref_pos_i[1] != 25


def test_exec_reference_auroc_parity(reference_run):
    ref_pos_d, _, ref_neg_d, _ = reference_run
    # eval_roc semantics: scores are NEGATED losses (eval_roc.py:78)
    scores = np.concatenate([-ref_pos_d, -ref_neg_d])
    labels = np.concatenate([np.ones_like(ref_pos_d),
                             np.zeros_like(ref_neg_d)])
    sk_auc = sklearn.metrics.roc_auc_score(labels, scores)
    ours = float(auroc(jnp.asarray(-ref_pos_d), jnp.asarray(-ref_neg_d)))
    assert abs(ours - sk_auc) < 1e-6
    assert sk_auc > 0.5  # members leak through the planted duplicates


def test_exec_reference_l2_distance(fixture_sets):
    """Pure-l2 branch of the real Loss (utils.py:160-163) vs our exact
    engine on raw pixels."""
    syn, pos, _ = fixture_sets
    ref_d, ref_i, _ = reference_fbb_search(syn, pos, "l2", BATCH)

    n_eff = truncate_to_batches(len(syn), BATCH)
    embed = make_embed_fn("l2")
    d, i = knn_argmin_streamed(embed, jnp.asarray(pos),
                               jnp.asarray(syn[:n_eff]), engine="exact",
                               q_block=4, s_block=8)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-5, atol=1e-7)
