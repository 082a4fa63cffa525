"""The tap-structured ('taps') kNN engine must produce the same nearest
neighbors as the flat gemm engine: the embedding is the same vector split
into tower-native parts (``ops/distance.make_embed_parts_fn``), and the
fold accumulates one dot per part instead of one flat gemm
(``ops/knn.knn_argmin_streamed_parts``). Distances differ only by f32
summation order across parts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ganleaks_tpu.ops.distance import make_embed_fn, make_embed_parts_fn
from ganleaks_tpu.ops.knn import (
    knn_argmin_streamed,
    knn_argmin_streamed_parts,
    knn_argmin_two_pass,
    knn_topk_streamed,
    knn_topk_streamed_parts,
)
from ganleaks_tpu.ops.lpips import (
    init_lpips_params,
    lpips_embed_fn,
    lpips_embed_parts_fn,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_parts_embedding_matches_flat(rng):
    """concat(parts, unpacked to tower-native order) == flat embedding.

    Narrow taps are lane-packed by the HALVES permutation
    (``ops/lpips/lpips._pack_lanes``) — an order change that squared
    distances cannot see; ``_unpack_lanes`` inverts it exactly, so the
    values-and-order check runs against the unpacked layout."""
    from ganleaks_tpu.ops.lpips.lpips import _unpack_lanes

    params = init_lpips_params(0, "vgg")
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 3)).astype(np.float32))
    flat = make_embed_fn(
        "l2-lpips", lpips_embed_fn(params, weight=0.2))(x)
    parts = make_embed_parts_fn(
        "l2-lpips", lpips_embed_parts_fn(params, weight=0.2))(x)
    chans = [None, 64, 128, 256, 512, 512]  # pixel part + vgg taps
    cat = jnp.concatenate(
        [(p if c is None else _unpack_lanes(p, c)).reshape(p.shape[0], -1)
         for p, c in zip(parts, chans)], axis=1)
    assert cat.shape == flat.shape
    np.testing.assert_allclose(np.asarray(cat), np.asarray(flat),
                               rtol=1e-6, atol=1e-7)


def test_taps_engine_equals_gemm_lpips(rng):
    params = init_lpips_params(0, "vgg")
    q = jnp.asarray(rng.standard_normal((20, 16, 16, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((50, 16, 16, 3)).astype(np.float32))
    embed = make_embed_fn("l2-lpips", lpips_embed_fn(params, weight=0.2))
    parts = make_embed_parts_fn(
        "l2-lpips", lpips_embed_parts_fn(params, weight=0.2))
    d_ref, i_ref = knn_argmin_streamed(embed, q, s, engine="gemm",
                                       q_block=8, s_block=16)
    d, i = knn_argmin_streamed_parts(parts, q, s, q_block=8, s_block=16)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-5)


def test_taps_engine_l2_and_chunked_cache(rng):
    """l2-only parts (single part) + a cache too small for all queries:
    chunking must not change results; ragged tail blocks covered."""
    q = jnp.asarray(rng.standard_normal((30, 8, 8, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((70, 8, 8, 3)).astype(np.float32))
    embed = make_embed_fn("l2")
    parts = make_embed_parts_fn("l2")
    d_ref, i_ref = knn_argmin_streamed(embed, q, s, s_block=32)
    d, i = knn_argmin_streamed_parts(parts, q, s, q_block=8, s_block=32,
                                     query_cache_bytes=2000)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-6)


def test_topk_parts_equals_flat(rng):
    params = init_lpips_params(0, "vgg")
    q = jnp.asarray(rng.standard_normal((12, 16, 16, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((40, 16, 16, 3)).astype(np.float32))
    embed = make_embed_fn("l2-lpips", lpips_embed_fn(params, weight=0.2))
    parts = make_embed_parts_fn(
        "l2-lpips", lpips_embed_parts_fn(params, weight=0.2))
    d_ref, i_ref = knn_topk_streamed(embed, q, s, k=3, q_block=8, s_block=16)
    d, i = knn_topk_streamed_parts(parts, q, s, k=3, q_block=8, s_block=16)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-5)


def test_two_pass_taps_engine_exact_indices(rng):
    """engine='taps' two-pass (structured bf16 pass 1 + flat f32 re-rank)
    returns the full f32 search's indices."""
    params = init_lpips_params(0, "vgg")
    q = jnp.asarray(rng.standard_normal((10, 16, 16, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((30, 16, 16, 3)).astype(np.float32))
    embed_hi = make_embed_fn("l2-lpips", lpips_embed_fn(params, weight=0.2))
    parts_lo = make_embed_parts_fn(
        "l2-lpips", lpips_embed_parts_fn(params, weight=0.2))
    d_ref, i_ref = knn_argmin_streamed(embed_hi, q, s, engine="gemm",
                                       q_block=8, s_block=16)
    d, i = knn_argmin_two_pass(parts_lo, embed_hi, q, s, k=4,
                               engine="taps", q_block=8, s_block=16)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-6)


def test_taps_tie_break_first_index():
    """Duplicate synthetic rows: the FIRST index must win (torch.min
    semantics, fbb.py:86-88), across parts and blocks."""
    q = jnp.ones((4, 4, 4, 3), jnp.float32)
    one = np.ones((4, 4, 3), np.float32)
    s = jnp.asarray(np.stack([one * 3, one * 2, one * 2, one * 3,
                              one * 2, one * 5]))
    parts = make_embed_parts_fn("l2")
    d, i = knn_argmin_streamed_parts(parts, q, s, q_block=4, s_block=2)
    np.testing.assert_array_equal(np.asarray(i), np.ones(4, np.int32))
