"""Fused top-k Pallas kernel (interpret mode on CPU): must agree exactly
with the XLA ``lax.top_k`` fold engine — distances ascending, FIRST global
index among equal distances (torch.min semantics extended to k,
``fbb.py:86-88``) — and drive the two-pass exact-index mode."""

import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.ops.distance import make_embed_fn
from ganleaks_tpu.ops.knn import (
    knn_argmin_streamed,
    knn_argmin_two_pass,
    knn_topk_streamed,
)
from ganleaks_tpu.ops.knn_pallas import knn_argmin_pallas, knn_topk_pallas


def test_topk_pallas_matches_xla_fold(rng):
    q = rng.standard_normal((20, 96)).astype(np.float32)
    s = rng.standard_normal((300, 96)).astype(np.float32)
    s[7] = q[3]     # exact hit
    s[250] = s[7]   # tie: lower index must come first

    ident = lambda x: x
    d_ref, i_ref = knn_topk_streamed(ident, jnp.asarray(q), jnp.asarray(s),
                                     k=4, s_block=64)
    d_pl, i_pl = knn_topk_pallas(jnp.asarray(q), jnp.asarray(s), k=4,
                                 q_block=8, s_block=128, k_block=128,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-3)
    # the tie pair must appear lower-index-first
    row = np.asarray(i_pl[3]).tolist()
    assert row.index(7) < row.index(250)


def test_topk_pallas_top1_equals_argmin_kernel(rng):
    q = rng.standard_normal((11, 64)).astype(np.float32)
    s = rng.standard_normal((150, 64)).astype(np.float32)
    d1, i1 = knn_argmin_pallas(jnp.asarray(q), jnp.asarray(s),
                               q_block=8, s_block=128, k_block=128,
                               interpret=True)
    dk, ik = knn_topk_pallas(jnp.asarray(q), jnp.asarray(s), k=3,
                             q_block=8, s_block=128, k_block=128,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(ik[:, 0]), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(dk[:, 0]), np.asarray(d1),
                               rtol=1e-6)


def test_topk_pallas_fewer_rows_than_k(rng):
    q = rng.standard_normal((5, 32)).astype(np.float32)
    s = rng.standard_normal((2, 32)).astype(np.float32)
    d, i = knn_topk_pallas(jnp.asarray(q), jnp.asarray(s), k=4,
                           q_block=8, s_block=128, k_block=128,
                           interpret=True)
    assert np.all(np.isfinite(np.asarray(d[:, :2])))
    assert np.all(np.isinf(np.asarray(d[:, 2:])))  # padded entries
    assert set(np.asarray(i[:, :2]).ravel()) <= {0, 1}


def test_two_pass_pallas_engine_equals_plain(rng):
    """knn_argmin_two_pass(engine='pallas') must return the same indices
    and exact f32 distances as the plain streamed search (off-TPU the
    streamed pallas branch runs the kernel in interpret mode)."""
    q = rng.standard_normal((16, 4, 4, 3)).astype(np.float32)
    s = rng.standard_normal((120, 4, 4, 3)).astype(np.float32)
    embed = make_embed_fn("l2")
    d_ref, i_ref = knn_argmin_streamed(embed, jnp.asarray(q),
                                       jnp.asarray(s), s_block=32)
    d2, i2 = knn_argmin_two_pass(embed, embed, jnp.asarray(q),
                                 jnp.asarray(s), k=4, s_block=32,
                                 engine="pallas")
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d_ref),
                               rtol=1e-6)


def test_streamed_chunked_query_cache_equals_resident(rng):
    """A query_cache_bytes too small for all queries must chunk the query
    axis (syn re-featurized once per chunk) with identical results."""
    q = rng.standard_normal((40, 4, 4, 3)).astype(np.float32)
    s = rng.standard_normal((100, 4, 4, 3)).astype(np.float32)
    embed = make_embed_fn("l2")
    d_ref, i_ref = knn_argmin_streamed(embed, jnp.asarray(q),
                                       jnp.asarray(s), s_block=32)
    # row = 48 floats = 192 B; 2 kB cache -> ~10-row chunks (4 chunks)
    d, i = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                               s_block=32, q_block=8,
                               query_cache_bytes=2000)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-6)
