"""Blocked 1-NN search over embedding vectors.

Replaces the hot loop nest of the reference attack (``fbb.py:73-88``: python
loop over queries x python loop over synthetic batches, one ``.item()``
device sync per query) with a device-resident blocked reduction:

* the (queries x generated) distance matrix is never materialized — blocks
  of it are produced tile-by-tile and folded into a running (min, argmin);
* tie-break matches ``torch.min`` exactly: the FIRST index attaining the
  minimum wins (``fbb.py:86-88``) — blocks are visited in index order and
  updates use strict ``<``;
* two engines:
  - 'gemm'  : d = ||q||^2 + ||s||^2 - 2 q.s — the MXU path (one matmul per
              tile); also available as a fused Pallas kernel
              (``ops/knn_pallas.py``) that keeps the running argmin in VMEM;
  - 'exact' : d = sum((q - s)^2) computed elementwise — bit-faithful to the
              reference's subtraction order, used for golden parity tests.

The reference's ``custom_knn`` silently drops the ``len(syn) % BATCH_SIZE``
remainder (``fbb.py:77``); ``truncate_to_batches`` reproduces that when
strict parity against reference outputs is wanted.
"""

from __future__ import annotations

import weakref
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def truncate_to_batches(n_syn: int, batch_size: int) -> int:
    """Reference remainder-drop: only ``(n_syn // B) * B`` synthetic samples
    participate (``fbb.py:77``)."""
    return (n_syn // batch_size) * batch_size


def pad_rows(x: Array, block: int) -> Array:
    """Zero-pad axis 0 to a multiple of ``block`` (shared by every kNN
    layout, incl. the sharded variants in parallel/knn_shard)."""
    pad = (-x.shape[0]) % block
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x


@partial(jax.jit, static_argnames=("s_block", "engine"))
def _knn_block(emb_q: Array, emb_s: Array, n_s: int, s_block: int,
               engine: str) -> tuple[Array, Array]:
    """1-NN of each query row of ``emb_q`` against ``emb_s`` (padded to a
    multiple of ``s_block``; rows >= n_s masked out)."""
    nq = emb_q.shape[0]
    ns_pad = emb_s.shape[0]
    n_blocks = ns_pad // s_block

    rq = jnp.sum(jnp.square(emb_q.astype(jnp.float32)), axis=1)

    def body(i, carry):
        run_min, run_idx = carry
        s = jax.lax.dynamic_slice_in_dim(emb_s, i * s_block, s_block, 0)
        if engine == "gemm":
            rs = jnp.sum(jnp.square(s.astype(jnp.float32)), axis=1)
            cross = jax.lax.dot_general(
                emb_q, s, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            d = rq[:, None] + rs[None, :] - 2.0 * cross
        else:  # exact: reference subtraction order (x_gt - x_hat)^2
            diff = emb_q[:, None, :].astype(jnp.float32) \
                - s[None, :, :].astype(jnp.float32)
            d = jnp.sum(jnp.square(diff), axis=-1)
        col = i * s_block + jnp.arange(s_block)
        d = jnp.where(col[None, :] < n_s, d, jnp.inf)
        blk_arg = jnp.argmin(d, axis=1)              # first min in block
        blk_min = jnp.take_along_axis(d, blk_arg[:, None], axis=1)[:, 0]
        better = blk_min < run_min                    # strict: keep earlier
        run_min = jnp.where(better, blk_min, run_min)
        run_idx = jnp.where(better, col[0] + blk_arg, run_idx)
        return run_min, run_idx

    init = (jnp.full((nq,), jnp.inf, jnp.float32),
            jnp.zeros((nq,), jnp.int32))
    run_min, run_idx = jax.lax.fori_loop(0, n_blocks, body, init)
    return run_min, run_idx


def knn_argmin(emb_q: Array, emb_s: Array, *, engine: str = "gemm",
               q_block: int = 4096, s_block: int = 8192,
               pallas: bool = False) -> tuple[Array, Array]:
    """1-NN distances and first-min indices for all queries.

    Returns (min_dist (N_q,) float32, argmin (N_q,) int32). ``min_dist`` is
    exactly the reference's per-query loss value (``fbb.py:157``):
    ``mean-square pixels [+ 0.2*LPIPS]`` by construction of the embeddings.
    """
    n_q = emb_q.shape[0]
    n_s = emb_s.shape[0]
    s_block = min(s_block, max(8, n_s))
    if pallas and engine == "gemm":
        # the kernel picks its own VMEM-safe tile sizes; the XLA-path
        # q_block/s_block here are HBM-sized and would blow VMEM scratch
        from ganleaks_tpu.ops.knn_pallas import knn_argmin_pallas
        return knn_argmin_pallas(emb_q, emb_s)

    emb_s_p = pad_rows(emb_s, s_block)
    outs_d, outs_i = [], []
    for start in range(0, n_q, q_block):
        q = emb_q[start:start + q_block]
        d, i = _knn_block(q, emb_s_p, n_s, s_block, engine)
        outs_d.append(d)
        outs_i.append(i)
    return jnp.concatenate(outs_d), jnp.concatenate(outs_i)


@partial(jax.jit, static_argnames=("engine",))
def _fold_block(run_min: Array, run_idx: Array, emb_q: Array, rq: Array,
                emb_s_blk: Array, col0: int, n_valid: Array,
                engine: str) -> tuple[Array, Array]:
    """Fold one (q_block x s_block) distance tile into the running
    (min, argmin); first-index tie-break preserved (strict <)."""
    if engine == "gemm":
        rs = jnp.sum(jnp.square(emb_s_blk.astype(jnp.float32)), axis=1)
        cross = jax.lax.dot_general(
            emb_q, emb_s_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = rq[:, None] + rs[None, :] - 2.0 * cross
    else:
        diff = emb_q[:, None, :].astype(jnp.float32) \
            - emb_s_blk[None, :, :].astype(jnp.float32)
        d = jnp.sum(jnp.square(diff), axis=-1)
    local = jnp.arange(emb_s_blk.shape[0])
    d = jnp.where(local[None, :] < n_valid, d, jnp.inf)
    blk_arg = jnp.argmin(d, axis=1)
    blk_min = jnp.take_along_axis(d, blk_arg[:, None], axis=1)[:, 0]
    better = blk_min < run_min
    run_min = jnp.where(better, blk_min, run_min)
    run_idx = jnp.where(better, col0 + blk_arg.astype(jnp.int32), run_idx)
    return run_min, run_idx


_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _jit_cached(fn):
    try:
        return _JIT_CACHE.setdefault(fn, jax.jit(fn))
    except TypeError:  # unhashable/unweakrefable callables
        return jax.jit(fn)


def knn_argmin_streamed(embed_fn, queries: Array, syn: Array, *,
                        engine: str = "gemm", q_block: int = 2048,
                        s_block: int = 2048, pallas: bool = False,
                        query_cache_bytes: int = 6 << 30
                        ) -> tuple[Array, Array]:
    """1-NN where embeddings are produced on the fly, block by block —
    for feature spaces too large to materialize (LPIPS at 64x64 is ~512k
    dims/image: 100k images would be 200 GB).

    When the full query embedding matrix fits in ``query_cache_bytes`` of
    HBM it is featurized ONCE and every synthetic block is visited once:
    ``N_q + N_s`` forwards total. Otherwise the synthetic set is
    re-featurized per query block (``N_q + N_s * ceil(N_q/q_block)``).
    Queries/syn can be image arrays or anything ``embed_fn`` accepts, as
    long as axis 0 indexes samples.

    On device OOM (embedding buffers + tower activations exceeding HBM for
    the chosen blocks) the search restarts with halved blocks — results are
    block-size-invariant (tested), only throughput changes.
    """
    while True:
        try:
            return _knn_argmin_streamed(
                embed_fn, queries, syn, engine=engine, q_block=q_block,
                s_block=s_block, pallas=pallas,
                query_cache_bytes=query_cache_bytes)
        except Exception as e:  # jaxlib error types vary across backends
            if "RESOURCE_EXHAUSTED" not in str(e) or q_block <= 8:
                raise
            q_block = max(8, q_block // 2)
            s_block = max(8, s_block // 2)
            print(f"[knn] device OOM; retrying with q_block={q_block}, "
                  f"s_block={s_block}")


def _knn_argmin_streamed(embed_fn, queries: Array, syn: Array, *,
                         engine: str, q_block: int, s_block: int,
                         pallas: bool, query_cache_bytes: int
                         ) -> tuple[Array, Array]:
    n_q, n_s = queries.shape[0], syn.shape[0]
    # jit once PER FUNCTION OBJECT: block shapes are uniform, eager
    # dispatch of a VGG tower is pathologically slow on remote-compile
    # backends, and re-wrapping in jax.jit per call would drop the
    # compilation cache between the pos and neg searches
    embed_fn = _jit_cached(embed_fn)

    q_block = min(q_block, n_q)
    s_block = min(s_block, n_s)
    s_pad = (-n_s) % s_block

    def embed_q_block(qs: int):
        """Featurize one query block, padded to q_block so every block
        shares ONE compiled shape (ragged tails would each compile the
        whole tower — ~40s apiece on remote-compile backends)."""
        blk = queries[qs:qs + q_block]
        n_valid = blk.shape[0]
        if n_valid < q_block:
            blk = pad_rows(blk, q_block)
        return embed_fn(blk)[:n_valid]

    # probe the embedding width to decide whether queries fit resident
    probe = jax.eval_shape(embed_fn, jax.ShapeDtypeStruct(
        (1,) + tuple(queries.shape[1:]), queries.dtype))
    emb_bytes = n_q * probe.shape[1] * probe.dtype.itemsize
    if emb_bytes <= query_cache_bytes:
        emb_q_full = jnp.concatenate(
            [embed_q_block(qs) for qs in range(0, n_q, q_block)])
        rq = jnp.sum(jnp.square(emb_q_full.astype(jnp.float32)), axis=1)
        run_min = jnp.full((n_q,), jnp.inf, jnp.float32)
        run_idx = jnp.zeros((n_q,), jnp.int32)
        for ss in range(0, n_s, s_block):
            blk = syn[ss:ss + s_block]
            n_valid = blk.shape[0]
            if n_valid < s_block and s_pad:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((s_block - n_valid,) + blk.shape[1:],
                                    blk.dtype)], axis=0)
            emb_s = embed_fn(blk)
            if pallas and engine == "gemm":
                from ganleaks_tpu.ops.knn_pallas import knn_argmin_pallas
                d_blk, i_blk = knn_argmin_pallas(emb_q_full,
                                                 emb_s[:n_valid])
                better = d_blk < run_min
                run_min = jnp.where(better, d_blk, run_min)
                run_idx = jnp.where(better, ss + i_blk, run_idx)
            else:
                run_min, run_idx = _fold_block(
                    run_min, run_idx, emb_q_full, rq, emb_s, ss,
                    jnp.asarray(n_valid), engine)
        return run_min, run_idx

    out_d, out_i = [], []
    for qs in range(0, n_q, q_block):
        emb_q = embed_q_block(qs)
        rq = jnp.sum(jnp.square(emb_q.astype(jnp.float32)), axis=1)
        run_min = jnp.full((emb_q.shape[0],), jnp.inf, jnp.float32)
        run_idx = jnp.zeros((emb_q.shape[0],), jnp.int32)
        for ss in range(0, n_s, s_block):
            blk = syn[ss:ss + s_block]
            n_valid = blk.shape[0]
            if n_valid < s_block and s_pad:
                pad_shape = (s_block - n_valid,) + blk.shape[1:]
                blk = jnp.concatenate(
                    [blk, jnp.zeros(pad_shape, blk.dtype)], axis=0)
            emb_s = embed_fn(blk)
            if pallas and engine == "gemm":
                from ganleaks_tpu.ops.knn_pallas import knn_argmin_pallas
                d_blk, i_blk = knn_argmin_pallas(emb_q, emb_s[:n_valid])
                better = d_blk < run_min  # in-order: first index preserved
                run_min = jnp.where(better, d_blk, run_min)
                run_idx = jnp.where(better, ss + i_blk, run_idx)
            else:
                run_min, run_idx = _fold_block(
                    run_min, run_idx, emb_q, rq, emb_s, ss,
                    jnp.asarray(n_valid), engine)
        out_d.append(run_min)
        out_i.append(run_idx)
    return jnp.concatenate(out_d), jnp.concatenate(out_i)


def knn_argmin_reference_batched(emb_q: Array, emb_s: Array,
                                 batch_size: int) -> tuple[Array, Array]:
    """Strict-parity variant of :func:`knn_argmin`: replicates the
    reference's remainder-drop (``fbb.py:77``) before searching."""
    n_eff = truncate_to_batches(emb_s.shape[0], batch_size)
    return knn_argmin(emb_q, emb_s[:n_eff], engine="exact",
                      s_block=min(batch_size, n_eff) or 1)
