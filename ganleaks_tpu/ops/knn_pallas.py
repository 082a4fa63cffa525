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


def _knn_topk_kernel(k: int, q_ref, s_ref, rq_ref, rs_ref, d_out, i_out,
                     acc, run_d, run_i):
    """Fused distance + running per-query top-k (distance-ascending,
    FIRST-index tie-break — the torch.min semantics extended to k
    entries). Same grid contract as ``_knn_kernel``; the top-k state
    (q_block, k) lives in VMEM across the (s, k) sweep.

    The merge keeps the invariant "ascending distance, earliest global
    index first among equals": running entries are extracted before the
    tile's (they have lower s indices), and extraction always takes the
    first minimal column."""
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
            run_d[:] = jnp.full_like(run_d, jnp.inf)
            run_i[:] = jnp.zeros_like(run_i)

        tq, ts = acc.shape
        d = rq_ref[:] + rs_ref[:] - 2.0 * acc[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)

        # tile-local top-k by iterative first-min extraction (k is small
        # and static; each pass is one VPU reduction over the tile)
        loc_d, loc_i = [], []
        for _ in range(k):
            m = jnp.min(d, axis=1, keepdims=True)
            first = jnp.min(jnp.where(d == m, cols, _BIG_I32),
                            axis=1, keepdims=True)
            loc_d.append(m)
            loc_i.append(s_i * ts + first)
            d = jnp.where(cols == first, jnp.inf, d)

        cand_d = jnp.concatenate([run_d[:]] + loc_d, axis=1)   # (tq, 2k)
        cand_i = jnp.concatenate([run_i[:]] + loc_i, axis=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (tq, 2 * k), 1)
        new_d, new_i = [], []
        for _ in range(k):
            m = jnp.min(cand_d, axis=1, keepdims=True)
            p = jnp.min(jnp.where(cand_d == m, pos, _BIG_I32),
                        axis=1, keepdims=True)
            sel = jnp.sum(jnp.where(pos == p, cand_i, 0),
                          axis=1, keepdims=True)  # p unique per row
            new_d.append(m)
            new_i.append(sel)
            cand_d = jnp.where(pos == p, jnp.inf, cand_d)
        run_d[:] = jnp.concatenate(new_d, axis=1)
        run_i[:] = jnp.concatenate(new_i, axis=1)

        @pl.when(s_i == n_s - 1)
        def _():
            d_out[:] = run_d[:]
            i_out[:] = run_i[:]


def _device_vmem_bytes() -> int:
    """Physical VMEM of the local TPU generation (per core). v4/v5/v6
    class chips carry 128 MiB; older (v2/v3) and unknown kinds get the
    conservative 16 MiB so the kernel compiles everywhere instead of
    dying at Mosaic compile time (where RESOURCE_EXHAUSTED-style OOM
    resume never engages). Sizes both the scoped-vmem limit and the tile
    clamp; the streamed drivers additionally fall back to the XLA fold if
    Mosaic still refuses."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 16 << 20
    for tag in ("v4", "v5", "v6", "v7"):
        if tag in kind:
            return 128 << 20
    return 16 << 20


def _vmem_estimate(q_block: int, s_block: int, k_block: int, dtype) -> int:
    """Scoped-VMEM footprint of one kernel instance: f32 accumulator +
    double-buffered input tiles + the lane-padded (x, 1) blocks (rq, rs,
    min/idx outputs and scratch all pad their size-1 trailing dim to the
    128-lane tile)."""
    ebytes = jnp.dtype(dtype).itemsize
    acc = q_block * s_block * 4
    tiles = 2 * (q_block + s_block) * k_block * ebytes
    # rq + min_out + idx_out + scratch min/idx, ~2 buffers each
    lane_padded = 8 * q_block * 128 * 4
    return acc + tiles + lane_padded + (2 << 20)  # + slack


def _pad_axis(x: Array, axis: int, mult: int, value: float = 0.0) -> Array:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _should_demote(dtype) -> bool:
    """XLA's DEFAULT matmul precision on TPU computes f32 dots with bf16
    cross terms (measured on v5e: default-precision f32 dot == pure-bf16
    dot to the bit, 2.8e-3 rel err vs f64; ``precision=highest`` is 3.3x
    slower). Pre-demoting f32 operands to bf16 STREAMS is numerically
    identical to that in-register demotion but halves HBM traffic — so it
    is the default wherever XLA would demote anyway (TPU), and off where
    XLA does true f32 (CPU), keeping engine-parity tests exact."""
    return (jnp.dtype(dtype).itemsize >= 4
            and jax.default_backend() == "tpu")


def _prepare_tiles(emb_q, emb_s, rq, rs, q_block, s_block, k_block,
                   demote, vmem_clamp):
    """Shared prologue of both kernels: demote/norms, tile defaults, the
    VMEM clamp loop, padding, and the (grid, in_specs) layout — the two
    kernels differ only in kernel fn, output width, and scratch shapes.
    Returns (q, s, rq_p, rs_p, grid, in_specs, q_block, s_block)."""
    n_q, k_dim = emb_q.shape
    n_s = emb_s.shape[0]
    if demote is None:
        demote = _should_demote(emb_q.dtype)
    if rq is None:
        rq = jnp.sum(jnp.square(emb_q.astype(jnp.float32)), axis=1)
    if rs is None:
        rs = jnp.sum(jnp.square(emb_s.astype(jnp.float32)), axis=1)
    if demote and jnp.dtype(emb_q.dtype).itemsize >= 4:
        emb_q = emb_q.astype(jnp.bfloat16)
        emb_s = emb_s.astype(jnp.bfloat16)

    # tile defaults (0 = auto) follow the 2026-08-16 v5e sweep
    # (tools/tune_knn.py at 2000x4096, K=512k): maximal q tile (queries
    # are re-streamed once per s tile), s up to 2048, k=512
    wide = jnp.dtype(emb_q.dtype).itemsize >= 4
    if q_block == 0:
        q_block = min(1024 if wide else 2048, n_q)
    if s_block == 0:
        s_block = 1024 if wide else 2048
    if k_block == 0:
        k_block = 256 if wide else 512
    q_block = min(q_block, max(8, n_q))
    s_block = min(s_block, max(128, n_s))
    k_block = min(k_block, max(128, k_dim))
    # clamp the estimated VMEM footprint to ~72 MB (the scoped-vmem limit
    # in the callers is raised to 3/4 of the generation's physical VMEM;
    # vmem_clamp=False for explicit tile sweeps, e.g. tools/tune_knn.py)
    while vmem_clamp and _vmem_estimate(
            q_block, s_block, k_block, emb_q.dtype) \
            > _device_vmem_bytes() * 9 // 16:
        if s_block >= q_block and s_block > 128:
            s_block //= 2
        elif q_block > 8:
            q_block //= 2
        else:
            break

    q = _pad_axis(_pad_axis(emb_q, 0, q_block), 1, k_block)
    s = _pad_axis(_pad_axis(emb_s, 0, s_block), 1, k_block)
    rq_p = _pad_axis(rq, 0, q_block).reshape(-1, 1)          # (nq_p, 1)
    rs_p = _pad_axis(rs, 0, s_block,
                     value=jnp.inf).reshape(1, -1)           # (1, ns_p)

    nq_p, k_p = q.shape
    ns_p = s.shape[0]
    grid = (nq_p // q_block, ns_p // s_block, k_p // k_block)
    in_specs = [
        pl.BlockSpec((q_block, k_block), lambda qi, si, ki: (qi, ki),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s_block, k_block), lambda qi, si, ki: (si, ki),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((q_block, 1), lambda qi, si, ki: (qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_block), lambda qi, si, ki: (0, si),
                     memory_space=pltpu.VMEM),
    ]
    return q, s, rq_p, rs_p, grid, in_specs, q_block, s_block


@partial(jax.jit, static_argnames=("q_block", "s_block", "k_block",
                                   "interpret", "vmem_clamp", "demote"))
def knn_argmin_pallas(emb_q: Array, emb_s: Array, *, q_block: int = 0,
                      s_block: int = 0, k_block: int = 0,
                      interpret: bool = False,
                      vmem_clamp: bool = True,
                      demote: bool | None = None,
                      rq: Array | None = None,
                      rs: Array | None = None) -> tuple[Array, Array]:
    """1-NN (min distance, first-min index) over embedding rows.

    emb_q: (N_q, K), emb_s: (N_s, K) — any float dtype (accumulation f32).
    Returns float32 distances (exactly the reference loss values) and int32
    indices.

    ``demote`` (None = auto, see :func:`_should_demote`): stream f32
    operands as bf16 — same numerics as XLA's default-precision f32 matmul
    on TPU, half the HBM bytes. Norms are computed from the pre-demotion
    values; callers that already hold only bf16 streams can pass f32
    ``rq``/``rs`` (squared row norms) computed from their f32 originals —
    this is how the streamed attack path avoids holding f32 and bf16
    copies of the query matrix at once.

    Default tiles (0 = auto) follow the 2026-08-16 v5e sweep
    (tools/tune_knn.py at 2000x4096, K=512k): maximal q tile (queries are
    re-streamed once per s tile), s up to 2048, k=512 — 133.7M pairs/s vs
    the XLA gemm engine's 131.7M (bf16 streams).
    """
    n_q, n_s = emb_q.shape[0], emb_s.shape[0]
    (q, s, rq_p, rs_p, grid, in_specs,
     q_block, s_block) = _prepare_tiles(emb_q, emb_s, rq, rs, q_block,
                                        s_block, k_block, demote,
                                        vmem_clamp)
    nq_p, k_p = q.shape
    ns_p = s.shape[0]

    min_out, idx_out = pl.pallas_call(
        _knn_kernel,
        grid=grid,
        in_specs=in_specs,
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
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # the default scoped-vmem limit is 16 MB; large tiles (less
            # re-streaming of the query matrix) are the whole point of
            # the fused kernel, so claim 3/4 of the generation's VMEM
            vmem_limit_bytes=_device_vmem_bytes() * 3 // 4),
        interpret=interpret,
    )(q, s, rq_p, rs_p)

    return min_out[:n_q, 0], idx_out[:n_q, 0]


@partial(jax.jit, static_argnames=("k", "q_block", "s_block", "k_block",
                                   "interpret", "vmem_clamp", "demote"))
def knn_topk_pallas(emb_q: Array, emb_s: Array, *, k: int = 4,
                    q_block: int = 0, s_block: int = 0, k_block: int = 0,
                    interpret: bool = False, vmem_clamp: bool = True,
                    demote: bool | None = None,
                    rq: Array | None = None,
                    rs: Array | None = None) -> tuple[Array, Array]:
    """Per-query k smallest distances + indices, fused like
    :func:`knn_argmin_pallas` (same demote/tile/padding contract) with the
    running top-k state in VMEM. Entries are distance-ascending with
    first-global-index tie-break, so ``[:, 0]`` equals the argmin kernel's
    result. Rows beyond ``N_s`` can never enter (rs padded +inf); when
    ``N_s < k`` the trailing entries have d = +inf and UNSPECIFIED
    duplicate indices (the min-extraction merge re-selects an already
    extracted position once all finite candidates are used) — consumers
    must mask on d or dedupe (the two-pass driver's ``np.unique`` does).

    This is pass 1 of the exact-index throughput mode
    (``ops/knn.knn_argmin_two_pass``): the XLA fold pays a
    ``lax.top_k`` sort per (q_block x s_block) tile, this kernel pays k
    VPU min-extractions per s tile only at the last K step."""
    n_q, n_s = emb_q.shape[0], emb_s.shape[0]
    (q, s, rq_p, rs_p, grid, in_specs,
     q_block, s_block) = _prepare_tiles(emb_q, emb_s, rq, rs, q_block,
                                        s_block, k_block, demote,
                                        vmem_clamp)
    nq_p, k_p = q.shape
    ns_p = s.shape[0]

    d_out, i_out = pl.pallas_call(
        partial(_knn_topk_kernel, k),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((q_block, k), lambda qi, si, ki: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, k), lambda qi, si, ki: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_p, k), jnp.float32),
            jax.ShapeDtypeStruct((nq_p, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, s_block), jnp.float32),  # acc
            pltpu.VMEM((q_block, k), jnp.float32),        # running top-k d
            pltpu.VMEM((q_block, k), jnp.int32),          # running top-k i
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_p * ns_p * k_p,
            bytes_accessed=(nq_p * k_p + ns_p * k_p) * q.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_device_vmem_bytes() * 3 // 4),
        interpret=interpret,
    )(q, s, rq_p, rs_p)

    return d_out[:n_q], i_out[:n_q]
