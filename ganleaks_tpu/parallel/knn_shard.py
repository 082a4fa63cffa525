"""Multi-chip sharded kNN — the attack's scaling axis.

The reference is single-device; the fbb distance matrix
(queries x generated set) is the one computation worth scaling
(SURVEY.md §2.4). Two layouts, both over a 1-D mesh:

* :func:`knn_argmin_sharded` — generated set sharded across chips, queries
  replicated. Each chip streams its shard through the blocked kNN, then one
  tiny all-gather of per-chip (min, argmin) pairs rides ICI and a
  lexicographic (value, index) reduce yields the global first-index argmin
  — bit-equal to the single-device search.

* :func:`knn_argmin_ring` — BOTH sets sharded: query shards stay resident
  while generated-set shards rotate around the ring via ``ppermute``
  (ring-attention's communication pattern applied to a kNN reduction).
  Per-chip memory stays flat at (N_q + N_s)/n_dev regardless of set sizes;
  chip-to-chip traffic overlaps with the fold of the previous shard.

Tie-breaks: shards are contiguous index ranges, all-gather returns them in
shard order, and ``argmin`` picks the first — so equal distances resolve to
the smallest global index, matching ``torch.min`` (``fbb.py:86-88``). The
ring variant visits shards in per-chip rotated order, so it uses an explicit
lexicographic (distance, index) fold instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ganleaks_tpu.ops.knn import _fold_block, pad_rows

Array = jax.Array


def _local_search(embed_fn, queries: Array, syn_shard: Array,
                  n_valid_local, engine: str, q_block: int, s_block: int,
                  idx_offset) -> tuple[Array, Array]:
    """Blocked search of ``queries`` against one resident shard.

    ``n_valid_local``/``idx_offset`` may be traced (shard-dependent).
    Returns (min_dist, global argmin) for every query row.
    """
    n_q = queries.shape[0]
    n_s = syn_shard.shape[0]
    out_d, out_i = [], []
    for qs in range(0, n_q, q_block):
        q_blk = queries[qs:qs + q_block]
        emb_q = embed_fn(q_blk)
        rq = jnp.sum(jnp.square(emb_q.astype(jnp.float32)), axis=1)
        run_min = jnp.full((emb_q.shape[0],), jnp.inf, jnp.float32)
        run_idx = jnp.zeros((emb_q.shape[0],), jnp.int32)
        for ss in range(0, n_s, s_block):
            blk = syn_shard[ss:ss + s_block]
            if blk.shape[0] < s_block:
                blk = pad_rows(blk, s_block)
            emb_s = embed_fn(blk)
            n_valid_blk = jnp.clip(n_valid_local - ss, 0, s_block)
            run_min, run_idx = _fold_block(run_min, run_idx, emb_q, rq,
                                           emb_s, ss, n_valid_blk, engine)
        out_d.append(run_min)
        out_i.append(run_idx + jnp.asarray(idx_offset, jnp.int32))
    return jnp.concatenate(out_d), jnp.concatenate(out_i)


def knn_argmin_sharded(embed_fn, queries: Array, syn: Array, mesh: Mesh,
                       *, engine: str = "gemm", q_block: int = 2048,
                       s_block: int = 2048,
                       axis: str | None = None) -> tuple[Array, Array]:
    """Generated-set-sharded 1-NN (queries replicated on every chip)."""
    axis = axis or mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    n_s = syn.shape[0]
    shard = -(-n_s // n_dev)
    syn_p = pad_rows(syn, shard * n_dev)
    s_block = min(s_block, shard)

    def local(q, s_shard):
        me = jax.lax.axis_index(axis)
        offset = me * shard
        n_valid = jnp.clip(n_s - offset, 0, shard)
        d, i = _local_search(embed_fn, q, s_shard, n_valid, engine,
                             q_block, s_block, offset)
        all_d = jax.lax.all_gather(d, axis)          # (n_dev, n_q) over ICI
        all_i = jax.lax.all_gather(i, axis)
        best = jnp.argmin(all_d, axis=0)             # first shard on ties
        d_out = jnp.take_along_axis(all_d, best[None, :], axis=0)[0]
        i_out = jnp.take_along_axis(all_i, best[None, :], axis=0)[0]
        return d_out, i_out

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(axis)),
                       out_specs=(P(), P()),
                       check_vma=False)  # result replicated by construction
    return fn(queries, syn_p)


def knn_argmin_ring(embed_fn, queries: Array, syn: Array, mesh: Mesh,
                    *, engine: str = "gemm", q_block: int = 2048,
                    s_block: int = 2048,
                    axis: str | None = None) -> tuple[Array, Array]:
    """Ring-pass 1-NN: query shards resident, generated shards rotate.

    After ``n_dev`` steps every query shard has folded every generated
    shard; per-chip memory never exceeds one shard of each set.
    """
    axis = axis or mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    n_s = syn.shape[0]
    n_q = queries.shape[0]
    s_shard = -(-n_s // n_dev)
    q_shard = -(-n_q // n_dev)
    syn_p = pad_rows(syn, s_shard * n_dev)
    queries_p = pad_rows(queries, q_shard * n_dev)
    s_blk = min(s_block, s_shard)

    def local(q, s0):
        me = jax.lax.axis_index(axis)
        run_min = jnp.full((q.shape[0],), jnp.inf, jnp.float32)
        run_idx = jnp.zeros((q.shape[0],), jnp.int32)
        s_cur = s0
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        for t in range(n_dev):
            # after t right-rotations, we hold the shard born on (me - t)
            origin = (me - t) % n_dev
            offset = origin * s_shard
            n_valid = jnp.clip(n_s - offset, 0, s_shard)
            d, i = _local_search(embed_fn, q, s_cur, n_valid, engine,
                                 q_block, s_blk, offset)
            # lexicographic (distance, global index) fold: shards arrive in
            # rotated order, so index order must break ties explicitly
            better = (d < run_min) | ((d == run_min) & (i < run_idx))
            run_min = jnp.where(better, d, run_min)
            run_idx = jnp.where(better, i, run_idx)
            if t != n_dev - 1:
                s_cur = jax.lax.ppermute(s_cur, axis, perm)
        return run_min, run_idx

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axis), P(axis)),
                       out_specs=(P(axis), P(axis)))
    d, i = fn(queries_p, syn_p)
    return d[:n_q], i[:n_q]
