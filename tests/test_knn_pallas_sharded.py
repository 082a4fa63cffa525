"""Pallas fused kernel (interpret mode) and multi-chip sharded/ring kNN on
the 8-device virtual CPU mesh — all must agree exactly with the
single-device search (SURVEY §4 'distributed without a cluster')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ganleaks_tpu.ops.distance import make_embed_fn, pixel_embedding
from ganleaks_tpu.ops.knn import knn_argmin
from ganleaks_tpu.ops.knn_pallas import knn_argmin_pallas
from ganleaks_tpu.parallel.knn_shard import knn_argmin_ring, knn_argmin_sharded


@pytest.fixture
def mesh8():
    devs = jax.devices()
    assert len(devs) == 8, "tests expect the virtual 8-device CPU mesh"
    return Mesh(np.array(devs), ("syn",))


def test_pallas_kernel_matches_reference_engine(rng):
    q = rng.standard_normal((50, 300)).astype(np.float32)
    s = rng.standard_normal((700, 300)).astype(np.float32)
    s[13] = q[7]   # exact hit
    s[500] = s[13]  # tie: first index must win

    d_ref, i_ref = knn_argmin(jnp.asarray(q), jnp.asarray(s),
                              engine="gemm", s_block=128)
    d_pl, i_pl = knn_argmin_pallas(jnp.asarray(q), jnp.asarray(s),
                                   q_block=16, s_block=128, k_block=128,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
    # near-zero distances carry rq+rs-2qs cancellation noise (~1e-4 on a
    # ~500 scale) in BOTH engines; atol reflects that, rtol stays tight
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-3)
    assert int(i_pl[7]) == 13


def test_pallas_kernel_ragged_shapes(rng):
    """Non-multiple N_q/N_s/K exercise the padding contract."""
    q = rng.standard_normal((9, 77)).astype(np.float32)
    s = rng.standard_normal((131, 77)).astype(np.float32)
    d_ref, i_ref = knn_argmin(jnp.asarray(q), jnp.asarray(s),
                              engine="exact", s_block=32)
    d_pl, i_pl = knn_argmin_pallas(jnp.asarray(q), jnp.asarray(s),
                                   q_block=8, s_block=128, k_block=128,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_syn", [64, 60])  # even and ragged sharding
def test_sharded_knn_equals_single_device(rng, mesh8, n_syn):
    syn = rng.standard_normal((n_syn, 6, 6, 3)).astype(np.float32)
    queries = rng.standard_normal((10, 6, 6, 3)).astype(np.float32)
    syn[40] = queries[2]  # exact zero-distance hit in a later shard

    embed = make_embed_fn("l2")
    d_ref, i_ref = knn_argmin(embed(jnp.asarray(queries)),
                              embed(jnp.asarray(syn)),
                              engine="gemm", s_block=16)
    d_sh, i_sh = knn_argmin_sharded(embed, jnp.asarray(queries),
                                    jnp.asarray(syn), mesh8,
                                    engine="gemm", q_block=4, s_block=4)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)


def test_sharded_tie_break_across_shards(rng, mesh8):
    """A distance tie spanning two shards must resolve to the smaller
    global index (torch.min semantics)."""
    syn = rng.standard_normal((32, 10)).astype(np.float32)
    queries = rng.standard_normal((3, 10)).astype(np.float32)
    syn[5] = queries[0]    # shard 1 (with 8 devices, shard = 4 rows)
    syn[29] = queries[0]   # shard 7 — same distance, larger index

    embed = lambda x: pixel_embedding(x)
    d_sh, i_sh = knn_argmin_sharded(embed, jnp.asarray(queries),
                                    jnp.asarray(syn), mesh8,
                                    engine="exact", q_block=4, s_block=4)
    assert int(i_sh[0]) == 5
    assert float(d_sh[0]) == 0.0


@pytest.mark.parametrize("n_syn,n_q", [(64, 16), (57, 11)])
def test_ring_knn_equals_single_device(rng, mesh8, n_syn, n_q):
    syn = rng.standard_normal((n_syn, 24)).astype(np.float32)
    queries = rng.standard_normal((n_q, 24)).astype(np.float32)
    syn[50] = queries[1]
    if n_syn > 55:
        syn[55] = queries[1]  # tie, rotated visit order

    embed = lambda x: x
    d_ref, i_ref = knn_argmin(jnp.asarray(queries), jnp.asarray(syn),
                              engine="gemm", s_block=16)
    d_rg, i_rg = knn_argmin_ring(embed, jnp.asarray(queries),
                                 jnp.asarray(syn), mesh8,
                                 engine="gemm", q_block=4, s_block=4)
    np.testing.assert_array_equal(np.asarray(i_rg), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_rg), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)
