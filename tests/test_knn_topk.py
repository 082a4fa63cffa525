"""Top-k streaming fold + two-pass exact-index rerank.

The two-pass mode is the throughput answer to running ``fbb.py:73-88``'s
distance in reduced precision: candidates come from a cheap (bf16) pass,
the final indices/distances from the exact f32 search over the candidate
union — tested here to be IDENTICAL to the plain f32 path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ganleaks_tpu.ops.distance import make_embed_fn
from ganleaks_tpu.ops.knn import (
    knn_argmin_streamed,
    knn_argmin_two_pass,
    knn_topk_streamed,
)
from ganleaks_tpu.ops.lpips import default_lpips_params, lpips_embed_fn


def brute_topk(q: np.ndarray, s: np.ndarray, k: int):
    d = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


@pytest.mark.parametrize("k", [1, 3, 8])
def test_topk_streamed_matches_bruteforce(rng, k):
    q = rng.standard_normal((9, 6)).astype(np.float32)
    s = rng.standard_normal((25, 6)).astype(np.float32)
    embed = make_embed_fn("l2")
    d, i = knn_topk_streamed(
        embed, jnp.asarray(q.reshape(9, 1, 2, 3)),
        jnp.asarray(s.reshape(25, 1, 2, 3)), k=k, q_block=4, s_block=7)
    ref_d, ref_i = brute_topk(q / np.sqrt(6), s / np.sqrt(6), k)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-5, atol=1e-6)


def test_topk_tie_break_first_index(rng):
    """Duplicated synthetic rows: every duplicate's distance ties, the
    EARLIEST index must occupy the earlier top-k slot (torch.min parity
    at k=1, fbb.py:86-88)."""
    q = rng.standard_normal((4, 8)).astype(np.float32)
    base = rng.standard_normal((6, 8)).astype(np.float32)
    s = np.concatenate([base, base, base])  # 18 rows, each distance x3
    embed = make_embed_fn("l2")
    d, i = knn_topk_streamed(
        embed, jnp.asarray(q.reshape(4, 2, 2, 2)),
        jnp.asarray(s.reshape(18, 2, 2, 2)), k=3, s_block=5)
    i = np.asarray(i)
    # the three copies of the nearest base row, in index order
    for row in range(4):
        assert i[row, 1] == i[row, 0] + 6
        assert i[row, 2] == i[row, 0] + 12
    d = np.asarray(d)
    np.testing.assert_allclose(d[:, 0], d[:, 1], rtol=0, atol=0)


def test_two_pass_identical_to_f32_path(rng):
    """bf16 candidate pass + f32 rerank == plain f32 search, bit-for-bit
    on indices and distances (LPIPS l2-lpips embedding, the headline
    distance)."""
    params = default_lpips_params("vgg")
    syn = rng.uniform(-1, 1, (40, 16, 16, 3)).astype(np.float32)
    queries = rng.uniform(-1, 1, (7, 16, 16, 3)).astype(np.float32)
    syn[13] = queries[3] * 0.99  # planted near-duplicate

    embed_hi = make_embed_fn(
        "l2-lpips", lpips_embed_fn(params, weight=0.2))
    embed_lo = make_embed_fn(
        "l2-lpips",
        lpips_embed_fn(params, weight=0.2, dtype=jnp.bfloat16,
                       compute_dtype=jnp.bfloat16),
        dtype=jnp.bfloat16)

    d_ref, i_ref = knn_argmin_streamed(
        embed_hi, jnp.asarray(queries), jnp.asarray(syn),
        engine="gemm", q_block=4, s_block=16)
    d2, i2 = knn_argmin_two_pass(
        embed_lo, embed_hi, jnp.asarray(queries), jnp.asarray(syn),
        k=4, q_block=4, s_block=16)

    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d_ref))
    assert int(np.asarray(i2)[3]) == 13


def test_two_pass_pixel_l2(rng):
    q = rng.standard_normal((5, 4, 4, 3)).astype(np.float32)
    s = rng.standard_normal((33, 4, 4, 3)).astype(np.float32)
    embed = make_embed_fn("l2")
    d_ref, i_ref = knn_argmin_streamed(embed, jnp.asarray(q),
                                       jnp.asarray(s), engine="gemm",
                                       s_block=8)
    d2, i2 = knn_argmin_two_pass(embed, embed, jnp.asarray(q),
                                 jnp.asarray(s), k=2, s_block=8)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d_ref))
