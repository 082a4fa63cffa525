"""Fused distance + running-argmin Pallas TPU kernel.

The gemm kNN engine (``ops/knn.py``) computes a (q_block x s_block) distance
tile with XLA and then min-reduces it — the tile round-trips through HBM.
This kernel fuses the matmul epilogue: the MXU accumulates q.s over the
K (feature) grid dimension in VMEM, and at the last K step the tile is
turned into distances and folded into a running (min, argmin) that lives in
VMEM scratch across the whole synthetic axis — the distance matrix never
touches HBM.

Grid: (n_q_tiles, n_s_tiles, n_k_tiles), K innermost, S next — TPU grids
are sequential, so VMEM scratch persists across the (s, k) sweep of one
q tile.

Tie-break parity: distances include the + ||q||^2 term (so values equal the
reference losses), and the in-tile argmin picks the FIRST minimal column
(min-index-over-equal-minima), with strict ``<`` across tiles — together
exactly ``torch.min``'s first-index semantics (``fbb.py:86-88``).

Padding contract (handled by the wrapper): K padded with zero columns
(no-op for dots and row norms), N_s padded with zero rows whose ``rs`` is
+inf so they can never win.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG_I32 = 2**31 - 1  # python literal: jnp constants would be captured tracers


def _knn_kernel(q_ref, s_ref, rq_ref, rs_ref, min_out, idx_out,
                acc, run_min, run_idx):
    s_i = pl.program_id(1)
    k_i = pl.program_id(2)
    n_s = pl.num_programs(1)
    n_k = pl.num_programs(2)

    @pl.when(k_i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        q_ref[:], s_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k_i == n_k - 1)
    def _():
        @pl.when(s_i == 0)
        def _():
            run_min[:] = jnp.full_like(run_min, jnp.inf)
            run_idx[:] = jnp.zeros_like(run_idx)

        tq, ts = acc.shape
        # d = ||q||^2 + ||s||^2 - 2 q.s  — true distances, reference-equal
        d = rq_ref[:] + rs_ref[:] - 2.0 * acc[:]   # (tq,1)+(1,ts) broadcast

        # first-minimal column in this tile
        blk_min = jnp.min(d, axis=1, keepdims=True)               # (tq, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)
        first = jnp.min(jnp.where(d == blk_min, cols, _BIG_I32),
                        axis=1, keepdims=True)                    # (tq, 1)

        better = blk_min < run_min[:]
        run_idx[:] = jnp.where(better, s_i * ts + first, run_idx[:])
        run_min[:] = jnp.where(better, blk_min, run_min[:])

        @pl.when(s_i == n_s - 1)
        def _():
            min_out[:] = run_min[:]
            idx_out[:] = run_idx[:]


def _pad_axis(x: Array, axis: int, mult: int, value: float = 0.0) -> Array:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=("q_block", "s_block", "k_block",
                                   "interpret", "vmem_clamp"))
def knn_argmin_pallas(emb_q: Array, emb_s: Array, *, q_block: int = 0,
                      s_block: int = 0, k_block: int = 0,
                      interpret: bool = False,
                      vmem_clamp: bool = True) -> tuple[Array, Array]:
    """1-NN (min distance, first-min index) over embedding rows.

    emb_q: (N_q, K), emb_s: (N_s, K) — any float dtype (accumulation f32).
    Returns float32 distances (exactly the reference loss values) and int32
    indices.

    Default tiles (0 = auto) follow the 2026-08-16 v5e sweep
    (tools/tune_knn.py at 2000x4096, K=512k): bf16 wants a maximal q tile
    (queries read once per (s,k) sweep) at (q<=2048, s=512, k=256) —
    136.6M pairs/s vs XLA-gemm's 140.4M; f32 tiles are twice the bytes so
    (q<=1024, s=1024, k=256) is the best config Mosaic still compiles
    (96M vs 114M).
    """
    n_q, k_dim = emb_q.shape
    n_s = emb_s.shape[0]
    wide = jnp.dtype(emb_q.dtype).itemsize >= 4
    if q_block == 0:
        q_block = min(1024 if wide else 2048, n_q)
    if s_block == 0:
        s_block = 1024 if wide else 512
    if k_block == 0:
        k_block = 256
    q_block = min(q_block, max(8, n_q))
    s_block = min(s_block, max(128, n_s))
    k_block = min(k_block, max(128, k_dim))
    # clamp the f32 accumulator tile to ~5 MB so callers can't blow the
    # ~16 MB VMEM budget by passing HBM-sized blocks (vmem_clamp=False for
    # explicit tile sweeps, e.g. tools/tune_knn.py); the default
    # (2048, 512) acc is 4 MB and must survive the clamp
    while vmem_clamp and q_block * s_block * 4 > (5 << 20):
        if s_block >= q_block and s_block > 128:
            s_block //= 2
        elif q_block > 8:
            q_block //= 2
        else:
            break

    rq = jnp.sum(jnp.square(emb_q.astype(jnp.float32)), axis=1)
    rs = jnp.sum(jnp.square(emb_s.astype(jnp.float32)), axis=1)

    q = _pad_axis(_pad_axis(emb_q, 0, q_block), 1, k_block)
    s = _pad_axis(_pad_axis(emb_s, 0, s_block), 1, k_block)
    rq_p = _pad_axis(rq, 0, q_block).reshape(-1, 1)          # (nq_p, 1)
    rs_p = _pad_axis(rs, 0, s_block,
                     value=jnp.inf).reshape(1, -1)           # (1, ns_p)

    nq_p, k_p = q.shape
    ns_p = s.shape[0]
    grid = (nq_p // q_block, ns_p // s_block, k_p // k_block)

    min_out, idx_out = pl.pallas_call(
        _knn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_block, k_block), lambda qi, si, ki: (qi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_block, k_block), lambda qi, si, ki: (si, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, 1), lambda qi, si, ki: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_block), lambda qi, si, ki: (0, si),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_block, 1), lambda qi, si, ki: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, 1), lambda qi, si, ki: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_p, 1), jnp.float32),
            jax.ShapeDtypeStruct((nq_p, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, s_block), jnp.float32),  # acc
            pltpu.VMEM((q_block, 1), jnp.float32),        # running min
            pltpu.VMEM((q_block, 1), jnp.int32),          # running argmin
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_p * ns_p * k_p,
            bytes_accessed=(nq_p * k_p + ns_p * k_p) * q.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(q, s, rq_p, rs_p)

    return min_out[:n_q, 0], idx_out[:n_q, 0]
