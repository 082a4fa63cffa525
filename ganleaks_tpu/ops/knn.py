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

from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.utils.env import env_flag

# Streamed-search backpressure: the host may run at most this many
# featurize blocks ahead of the device (see _stream_search's docstring).
# 2 bounds pinned in-flight HBM to ~2 GB at north-star query blocks while
# keeping the device pipeline full (2 blocks ≈ 100-2000 ms of queued
# device work vs a ~40 ms tunnel RTT).
_SYNC_WINDOW = 2

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
    if engine == "pallas":
        engine, pallas = "gemm", True
    if engine not in ("gemm", "exact"):
        raise ValueError(f"unknown kNN engine {engine!r}; flat search "
                         "supports 'gemm'/'pallas'/'exact' ('taps' needs "
                         "the structured knn_argmin_streamed_parts path)")
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


@partial(jax.jit, static_argnames=("engine", "precision"))
def _fold_block(run_min: Array, run_idx: Array, emb_q: Array, rq: Array,
                emb_s_blk: Array, col0: int, n_valid: Array,
                engine: str, precision: str | None = None,
                rs: Array | None = None) -> tuple[Array, Array]:
    """Fold one (q_block x s_block) distance tile into the running
    (min, argmin); first-index tie-break preserved (strict <).

    ``precision``: forwarded to the gemm's ``dot_general``. TPU default
    precision computes f32 cross terms with bf16 multiplies;
    ``"highest"`` forces true-f32 products (bf16x6 passes) — used by the
    two-pass re-rank so returned distances are exact f32.

    ``rs``: optional precomputed f32 squared row norms of the block —
    passed by the streamed path when the block has been demoted to a bf16
    stream so norms keep full precision."""
    if engine == "gemm":
        if rs is None:
            rs = jnp.sum(jnp.square(emb_s_blk.astype(jnp.float32)), axis=1)
        cross = jax.lax.dot_general(
            emb_q, emb_s_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        d = rq[:, None] + rs[None, :] - 2.0 * cross
    elif engine == "exact":
        diff = emb_q[:, None, :].astype(jnp.float32) \
            - emb_s_blk[None, :, :].astype(jnp.float32)
        d = jnp.sum(jnp.square(diff), axis=-1)
    else:
        raise ValueError(f"unknown kNN engine {engine!r} "
                         "(flat fold supports 'gemm'/'exact')")
    local = jnp.arange(emb_s_blk.shape[0])
    d = jnp.where(local[None, :] < n_valid, d, jnp.inf)
    blk_arg = jnp.argmin(d, axis=1)
    blk_min = jnp.take_along_axis(d, blk_arg[:, None], axis=1)[:, 0]
    better = blk_min < run_min
    run_min = jnp.where(better, blk_min, run_min)
    run_idx = jnp.where(better, col0 + blk_arg.astype(jnp.int32), run_idx)
    return run_min, run_idx


def _stream_demote(dtype, precision: str | None) -> bool:
    """Store/stream f32 embeddings as bf16 on TPU (half the HBM bytes and
    half the query-cache footprint): XLA's DEFAULT matmul precision
    demotes f32 operands to bf16 in-register anyway, so the gemm results
    are the same math — norms (rq/rs) stay f32, computed pre-demotion.
    Disabled when the caller asked for true-f32 products
    (``precision='highest'``, e.g. the two-pass re-rank) or off-TPU."""
    return (precision is None
            and jnp.dtype(dtype).itemsize >= 4
            and jax.default_backend() == "tpu")


def _jit_cached(fn):
    """jit ``fn`` once per function object, caching the wrapper ON the
    object itself (``fn.__dict__``) so the cache entry — and its compiled
    executables — die with ``fn``. (A module-level WeakKeyDictionary is
    self-defeating here: the jitted wrapper strongly references ``fn``,
    so entries are never evicted and a long hyperparameter sweep leaks
    one compiled tower per embed closure.)"""
    try:
        d = fn.__dict__
    except AttributeError:  # bound methods / builtins: no caching
        return jax.jit(fn)
    if "_ganleaks_jit" not in d:
        d["_ganleaks_jit"] = jax.jit(fn)
    return d["_ganleaks_jit"]


_BOUND_METHOD_CACHES: dict = {}


def _fused_cache_for(embed_fn) -> dict:
    """Per-dtype cache of fused wrappers, stored on ``embed_fn`` so it is
    garbage-collected with it (see :func:`_jit_cached`).

    Bound methods have no ``__dict__`` (a fresh method object per
    attribute access); for those the cache keys on (underlying function,
    instance id) in a module table, with a finalizer evicting the entry —
    and its compiled towers — when the instance dies. Otherwise a fresh
    throwaway dict would silently recompile the full tower every search
    call (~40s apiece on remote-compile backends). Other exotic callables
    without ``__dict__`` still get the throwaway dict: pass a plain
    function/closure (or ``functools.partial``) for caching."""
    import weakref

    try:
        return embed_fn.__dict__.setdefault("_ganleaks_fused", {})
    except AttributeError:
        pass
    self_ = getattr(embed_fn, "__self__", None)
    func = getattr(embed_fn, "__func__", None)
    if self_ is not None and func is not None:
        key = (func, id(self_))
        entry = _BOUND_METHOD_CACHES.get(key)
        if entry is None:
            entry = _BOUND_METHOD_CACHES[key] = {}
            try:
                weakref.finalize(self_, _BOUND_METHOD_CACHES.pop, key, None)
            except TypeError:
                pass  # instance not weakref-able: entry lives forever
        return entry
    return {}


def _fused_embed_norms(embed_fn, cdtype):
    """jit-cached ``blk -> (embed(blk).astype(cdtype), f32 row norms)``.

    Fusing the tower, the norm reduction, and the cache-dtype cast into
    ONE compiled call is a memory fix, not a speed nicety: dispatched
    eagerly, ``part.astype(f32)`` + ``square`` each materialize a full
    HBM copy of the block (at the 100k x 20k north-star config a 2048-row
    LPIPS block is ~4 GB in f32 — two such transients alongside the
    resident query cache is what OOMed a 16 GB chip). Under jit the
    upcast/square live in registers and XLA frees tower activations
    before the outputs land."""
    per = _fused_cache_for(embed_fn)
    key = jnp.dtype(cdtype).name
    if key not in per:
        def emb_norms(blk):
            e = embed_fn(blk)
            r = jnp.sum(jnp.square(jnp.asarray(e).astype(jnp.float32)),
                        axis=1)
            return jnp.asarray(e).astype(cdtype), r
        # through _jit_cached so tests can force eager execution by
        # monkeypatching it (fault-injection mocks must run per call)
        per[key] = _jit_cached(emb_norms)
    return per[key]


def _block_norms(emb_norms, x: Array, start: int, block: int
                 ) -> tuple[Array, Array, int]:
    """Fused featurize+norms of ``x[start:start+block]``, zero-padded to
    ``block`` so blocks of one size share ONE compiled tower shape
    (ragged tails would each compile the whole tower — ~40s apiece on
    remote-compile backends). Returns padded outputs + valid count."""
    blk = x[start:start + block]
    n_valid = blk.shape[0]
    if n_valid < block:
        blk = pad_rows(blk, block)
    e, r = emb_norms(blk)
    return e, r, n_valid


def _is_oom(e: Exception) -> bool:
    return "RESOURCE_EXHAUSTED" in str(e)  # jaxlib types vary per backend


def _free_fence() -> bool:
    """Drain the device queue so buffers freed by dropped references (and
    by failed in-flight computations) are actually released before a
    retry's large allocation. TPU executes enqueued programs in order, so
    one trivial computation completing implies everything before it did.

    Returns False when the fence itself fails: a runtime that cannot run
    a scalar add is in a STICKY error state (observed on the tunneled
    v5e after a deferred async OOM: every later dispatch fails too, so
    the halving walk cascades s_block 1024->1 and then dies anyway,
    minutes later). Callers must treat False as "in-process resume is
    futile" and re-raise so a fresh process can retry."""
    try:
        jax.block_until_ready(jnp.zeros((), jnp.float32) + 1)
        return True
    except Exception as e:
        print(f"[knn] free-fence itself failed ({type(e).__name__}): "
              f"runtime is in a sticky error state; abandoning in-process "
              f"resume (a fresh process must retry)")
        return False


def _hbm_live() -> str:
    """Live-HBM snapshot for OOM-resume diagnostics (best effort: CPU
    devices and some PJRT plugins expose no memory_stats)."""
    try:
        s = jax.devices()[0].memory_stats()
        return (f"hbm {s['bytes_in_use'] / 2**30:.2f}"
                f"/{s['bytes_limit'] / 2**30:.2f} GiB in use")
    except Exception:
        return "hbm stats unavailable"


# Per-chip HBM by device_kind substring, first match wins (v5e/v6e are
# reported as 'TPU v5 lite'/'TPU v6 lite' by the PJRT plugin). Used only
# when live memory_stats are unavailable (the tunneled v5e plugin
# returns None).
_HBM_GIB_BY_KIND = (
    ("v5 lite", 16), ("v5e", 16),
    ("v6 lite", 32), ("v6e", 32),
    ("v5p", 95), ("v5", 95),
    ("v4", 32), ("v3", 32), ("v2", 8),
)


def _device_hbm_bytes() -> int | None:
    """Per-device HBM capacity in bytes, or None when unknown (CPU hosts,
    unrecognized TPU kinds). None disables the static stream planner —
    the OOM-halving resume remains the only sizing mechanism there."""
    try:
        d = jax.devices()[0]
    except Exception:
        return None
    if d.platform != "tpu":
        # CPU/GPU hosts: stay inert (CPU tests pin exact chunk/block
        # schedules; GPUs are out of scope)
        return None
    try:
        s = d.memory_stats()
        if s and "bytes_limit" in s:
            return int(s["bytes_limit"])
    except Exception:
        pass
    kind = getattr(d, "device_kind", "").lower()
    for tag, gib in _HBM_GIB_BY_KIND:
        if tag in kind:
            return gib << 30
    return None


def _auto_stream_plan(queries: Array, syn: Array, row_bytes: int, *,
                      q_block: int, s_block: int, cache_bytes: int,
                      resident_bytes: int | None = None,
                      feat_rows: int | None = None,
                      act_itemsize: int = 2,
                      hbm_bytes: int | None = None
                      ) -> tuple[int, int, int]:
    """Projection-driven (cache_bytes, s_block) adjustment for the
    streamed search. Uses the same static accounting as
    ``tools/hbm_projection.py`` (which imports this planner's arithmetic
    constants by behavior): resident images + query cache + 2 streamed
    synthetic blocks + a 2x tower-activation bound must fit 92% of HBM.
    The model is chip-calibrated: at the 20000x100000 uint8 north star it
    accepts the measured-fit one-sweep config (10 GiB cache, s_block
    1024 -> 204M pairs/s) and rejects the measured-OOM one (s_block 2048).

    Policy, in order:
      1. If caching ALL query rows (one synthetic featurize sweep — the
         cheapest possible schedule) fits at s_block, s_block/2 or
         s_block/4 (floor 512), adopt it: the synthetic tower sweep is
         the dominant cost and each extra chunk pays a full extra sweep.
      2. Otherwise cap the requested cache so the plan fits the budget
         (an over-ambitious request would OOM at allocation; on the
         tunneled backend a device OOM can leave the runtime in a STICKY
         error state where the in-process resume is futile).

    Inert when HBM capacity is unknown (CPU test hosts) or when
    ``GANLEAKS_NO_AUTO_PLAN=1`` (fixed-config experiments). The
    tower-activation bound assumes a bf16 tower for image inputs — the
    throughput default; f32-parity runs may under-budget and lean on the
    OOM resume. ``resident_bytes`` overrides the default
    ``queries.nbytes + syn.nbytes`` residency charge — the mesh driver
    passes its PER-CHIP residency (one synthetic shard + one host-shipped
    query block; the query cache it sizes here is replicated per chip).
    ``feat_rows`` overrides the PER-CHIP rows featurized per query block
    for the activation charge (defaults to ``q_block``; the mesh driver
    batch-shards featurize n_dev ways, so each chip only runs
    ``q_block / n_dev`` rows through the tower — charging the global
    q_block would overcharge activations up to n_dev-fold and wrongly
    refuse one-sweep schedules). ``q_block`` itself still sets the cache
    padding and the cache floor, which ARE global (the cache is
    replicated)."""
    if env_flag("GANLEAKS_NO_AUTO_PLAN"):
        return cache_bytes, s_block, q_block
    # hbm_bytes: explicit target capacity — tools/hbm_projection.py runs
    # THIS planner off-device so the projection cannot drift from it
    hbm = hbm_bytes if hbm_bytes is not None else _device_hbm_bytes()
    if hbm is None:
        return cache_bytes, s_block, q_block
    if queries.ndim == 4:
        # images: widest VGG activation x2 overlap, at the tower's
        # element size (act_itemsize: 2 for the bf16 production tower —
        # the chip-calibrated default — 4 for f32-parity towers, whose
        # activations measured an OOM the bf16-assumed charge accepted:
        # engine='gemm' dtype=float32 at 2000x20000, 2026-08-18)
        act_per_row = (queries.shape[1] * queries.shape[2] * 64 * 2
                       * act_itemsize)
    else:  # tabular: embed output rows, f32, x2 overlap
        act_per_row = int(np.prod(queries.shape[1:])) * 4 * 2

    if feat_rows is None:
        feat_rows = q_block

    # stream charge: _SYNC_WINDOW undrained blocks. The 2x multiplier is
    # chip-calibrated on the int8/bf16 production rows; f32 streams
    # (2 MB/row at 64x64 — 4 GB per 2048-block) measured an OOM at a
    # boundary this model accepted (2026-08-18, engine='exact': XLA fold
    # temps on the fat blocks ate the margin), so wide-dtype rows charge
    # one extra in-flight block
    stream_blocks = 2 if row_bytes <= (1 << 20) else 3

    def overhead(sb: int, fr: int) -> int:
        return (stream_blocks * sb * row_bytes
                + max(fr, sb) * act_per_row)

    n_q = queries.shape[0]
    padded = n_q + (-n_q) % q_block
    fold_bytes = padded * 8  # f32 best-distance + i32 argmin
    if resident_bytes is None:
        # HOST-backed inputs (numpy arrays, HostImageSet) are never
        # device-resident: _block_norms slices them per block and each
        # block ships transiently (2 in flight max, inside the overhead
        # term's slack). Only jax arrays occupy HBM for the whole search.
        resident_bytes = sum(int(x.nbytes) for x in (queries, syn)
                             if isinstance(x, jax.Array))
    budget = int(hbm * 0.92) - resident_bytes - fold_bytes
    need_one = padded * row_bytes  # cache holding EVERY query row
    sb = s_block
    while True:
        if need_one + overhead(sb, feat_rows) <= budget:
            if need_one > cache_bytes or sb != s_block:
                print(f"[knn] auto plan: one-sweep schedule fits — query "
                      f"cache {need_one / 2**30:.2f} GiB "
                      f"(requested {cache_bytes / 2**30:.2f}), "
                      f"s_block {s_block} -> {sb} "
                      f"(GANLEAKS_NO_AUTO_PLAN=1 for fixed configs)")
            # the cache allocation is bounded by the actual padded row
            # count, so raising the budget to need_one allocates exactly
            # the one-sweep cache and nothing more
            return max(cache_bytes, need_one), sb, q_block
        if sb // 2 < 512:
            break
        sb //= 2
    # one sweep unreachable even at s_block=512: fit the REQUESTED cache,
    # shrinking s_block first (an extra chunk costs a whole synthetic
    # tower sweep; a smaller stream block costs almost nothing)
    sb = s_block
    while cache_bytes > budget - overhead(sb, feat_rows) and sb // 2 >= 512:
        sb //= 2
    cap = budget - overhead(sb, feat_rows)
    qb, fr = q_block, feat_rows
    if cap < qb * row_bytes:
        # wide-row regime (256px+ towers): ONE q_block cache chunk plus
        # its featurize activations exceed the budget at the
        # 64px-calibrated block floors above. Returning the unreachable
        # floor as a "cap" guaranteed an unrecoverable alloc OOM
        # (pggan_highres 256px, 2026-08-20) — shrink the BLOCKS until
        # one chunk + its tower activations fit (floor 64 rows each).
        # Two wide-regime-only model corrections (the calibrated 64px
        # model absorbs both in its slack): (a) the QUERY featurize
        # phase keeps its own in-flight parts windows of qb*row bytes —
        # at 16 MB rows that term dominates and the sweep-only stream
        # charge under-counted it (second 256px OOM, same day);
        # (b) an extra 1/6 budget reserve, because an OOM on the
        # tunneled backend leaves the runtime sticky — resume is futile,
        # so the plan must simply never OOM.
        wide_budget = budget - budget // 6

        def overhead_wide(sb_, fr_, qb_):
            return (stream_blocks * max(sb_, qb_) * row_bytes
                    + max(fr_, sb_) * act_per_row)

        cap = wide_budget - overhead_wide(sb, fr, qb)
        while cap < qb * row_bytes and (qb > 64 or sb > 64):
            if sb >= qb and sb > 64:
                sb //= 2
            elif qb > 64:
                qb //= 2
                fr = max(1, feat_rows * qb // q_block)
            else:
                break
            cap = wide_budget - overhead_wide(sb, fr, qb)
    if cache_bytes > cap or qb != q_block:
        cap = max(qb * row_bytes, min(cap, cache_bytes))
        print(f"[knn] auto plan: requested cache "
              f"{cache_bytes / 2**30:.2f} GiB cannot fit next to the "
              f"stream; capping at {cap / 2**30:.2f} GiB, "
              f"s_block {s_block} -> {sb}, q_block {q_block} -> {qb} "
              f"(more synthetic sweeps)")
        return cap, sb, qb
    if sb != s_block:
        print(f"[knn] auto plan: s_block {s_block} -> {sb} so the "
              f"{cache_bytes / 2**30:.2f} GiB query cache fits")
    return cache_bytes, sb, qb


@partial(jax.jit, donate_argnums=(0,))
def _update_rows(buf: Array, part: Array, offset) -> Array:
    """In-place (donated) row-range write into a preallocated cache."""
    return jax.lax.dynamic_update_slice(
        buf, part, (offset,) + (0,) * (buf.ndim - 1))


def _drain(x):
    """``jax.block_until_ready`` behind a module hook: the streamed
    search's backpressure/verification sync points go through here so
    tests can inject DEFERRED (async-surfacing) failures at exactly the
    places a real TPU surfaces them."""
    return jax.block_until_ready(x)


def _flat_block_norms(emb_norms, x: Array, start: int, block: int
                      ) -> tuple[list[Array], Array, int]:
    """:func:`_block_norms` wrapped to the parts contract (1-part list) so
    flat and structured embeddings share one streaming driver."""
    e, r, n_valid = _block_norms(emb_norms, x, start, block)
    return [e], r, n_valid


def _stream_search(block_norms, probe, queries: Array, syn: Array, *,
                   q_block: int, s_block: int, query_cache_bytes: int,
                   cdtype, init_state, fold, take,
                   query_reuse: dict | None = None):
    """Shared chunked streaming driver for every streamed kNN variant
    (flat/parts x argmin/top-k): featurize the query rows chunk by chunk
    into preallocated donated cache buffers, sweep the synthetic set once
    per chunk, and resume on device OOM by halving only the offending
    dimension's block. For SYNC failures (raised at the failing block's
    own dispatch) completed cache rows and running fold state are kept —
    no finished block is recomputed. For DEFERRED failures (async
    execution OOMs surfacing at a later drain, after the failed block's
    poisoned outputs were committed into the donated cache / fold state)
    resume would silently keep the poison, so the driver restarts the
    smallest enclosing unit instead: the chunk featurize (fresh cache
    bufs) or the synthetic sweep (fresh fold state).

    Hooks:
      ``block_norms(x, start, block) -> (parts, f32 row norms, n_valid)``
      ``init_state(padded_rows) -> state``
      ``fold(state, q_bufs, rq, s_parts, rs, col0, n_valid) -> state``
          (may raise OOM; must not mutate ``state`` before succeeding)
      ``take(state, n_rows) -> per-query output tuple``

    Cache writes are CAPPED to the buffer end: after an OOM halves
    ``q_block`` to a size that does not divide the remaining span, an
    uncapped padded-block write would run past the buffer and
    ``dynamic_update_slice`` would clamp the start index — silently
    overwriting previously featurized rows.

    Both loops apply WINDOWED BACKPRESSURE: each iteration blocks on the
    featurize result from ``_SYNC_WINDOW`` blocks ago. Python
    dispatch outruns the device by the whole sweep otherwise, and the
    unbounded in-flight queue pins every pending block's outputs in HBM
    at once — observed at the 10 GB-cache north star as an OOM at row
    98304/100000 (the headroom filled with in-flight featurize outputs),
    after which retries kept failing against the still-undrained queue.
    Blocking on an old result costs one tunnel RTT per window and never
    stalls a healthy device (the work is long done).

    ``query_reuse`` (opt-in) carries the featurized query cache ACROSS
    CALLS: pass the same dict to repeated searches over the same query
    set (the fbb hyperparameter-search sweep re-runs the attack once per
    synthetic subdir, ``attack_models/fbb.py:113-123``, and the query
    embeddings are subdir-invariant) and the whole query featurize is
    skipped after the first call. Engages only when the query set fits
    ONE cache chunk (multi-chunk caches cannot all be held in HBM — the
    chunking exists because they don't fit). Keyed by shape/dtype plus a
    first-row content hash; the CALLER asserts full query invariance
    (the fbb sweep loads the query sets once). The held buffers are
    dropped on any OOM recovery that needs their HBM back."""
    n_q, n_s = queries.shape[0], syn.shape[0]
    row_bytes = _phys_row_bytes([tuple(p.shape[1:]) for p in probe],
                                jnp.dtype(cdtype).itemsize)
    # static HBM plan (no-op when capacity is unknown or
    # GANLEAKS_NO_AUTO_PLAN=1): upgrade to a one-sweep schedule when it
    # fits, cap over-ambitious caches before they OOM at allocation
    query_cache_bytes, s_block, q_block = _auto_stream_plan(
        queries, syn, row_bytes, q_block=q_block, s_block=s_block,
        cache_bytes=query_cache_bytes,
        act_itemsize=max(2, jnp.dtype(probe[0].dtype).itemsize))
    # chunk_rows rounds DOWN to a q_block multiple: full-size featurize
    # blocks tile the chunk exactly, so padded tails only appear at n_q
    chunk_rows = max(q_block,
                     int(query_cache_bytes // max(1, row_bytes))
                     // q_block * q_block)

    # cross-call reuse fingerprint (see docstring): shapes/dtypes plus a
    # first-row content hash — cheap (one row readback per call) and
    # catches the obvious caller error of swapping in a different
    # same-shaped query set without full-array comparison cost
    reuse_fp = None
    if query_reuse is not None:
        reuse_fp = (n_q,
                    tuple((tuple(p.shape[1:]), str(p.dtype))
                          for p in probe),
                    str(jnp.dtype(cdtype)),
                    hash(np.asarray(queries[0:1]).tobytes()))

    outs = []
    qs0 = 0
    s_block0 = s_block
    while qs0 < n_q:
        end = min(n_q, qs0 + chunk_rows)
        n_rows = end - qs0
        padded = n_rows + (-n_rows) % q_block
        reused = (query_reuse is not None and qs0 == 0 and end == n_q
                  and query_reuse.get("fp") == reuse_fp)
        if query_reuse and not reused and qs0 == 0 and end < n_q:
            # a held cache cannot engage on a multi-chunk schedule
            # (this call's plan shrank chunk_rows below n_q): drop it
            # now — otherwise it pins multi-GB HBM for the whole search
            # while never being read
            query_reuse.clear()
        if reused:
            # the held cache was verified (drained) when stored; its
            # padding may differ from this call's q_block — adopt it
            padded = query_reuse["padded"]
            bufs, rq = query_reuse["bufs"], query_reuse["rq"]
        else:
            try:
                bufs = [jnp.zeros((padded,) + tuple(p.shape[1:]), cdtype)
                        for p in probe]
                rq = jnp.zeros((padded,), jnp.float32)
                # surface alloc failures HERE, on EVERY buffer:
                # allocation is async, and blocking only on the small rq
                # let a failed multi-GB bufs alloc poison the runtime and
                # burst out of an unguarded eager op later (seen at the
                # 12 GB north-star cache: the OOM surfaced at a query
                # slice, skipping this resume entirely)
                jax.block_until_ready((bufs, rq))
            except Exception as e:
                # an over-ambitious query_cache_bytes must degrade to
                # more chunks, not kill the run (an 11 GB cache request
                # on a 16 GB chip OOMs at allocation, where no other
                # resume path can help)
                if not _is_oom(e):
                    raise
                if chunk_rows > q_block:
                    chunk_rows = max(q_block,
                                     (chunk_rows // 2) // q_block
                                     * q_block)
                elif q_block > 1:
                    # ONE q_block of cache rows itself overflows (wide
                    # rows at high resolution): the block must shrink,
                    # not just the chunk (pggan 256px, 2026-08-20)
                    q_block = max(1, q_block // 2)
                    chunk_rows = q_block
                else:
                    raise
                # drop device references a failed prior attempt left in
                # this frame's locals — when the OOM surfaced at
                # block_until_ready rather than inside the comprehension,
                # ``bufs``/``rq`` are BOUND to the failed multi-GB
                # buffers, and the last featurized query block
                # (``parts``) alone is ~1 GB at north-star shapes — then
                # fence so in-flight work, whose buffers pin HBM until
                # execution drains, completes before the retry
                # allocation (TPU executes in order). A held cross-call
                # cache is HBM this recovery needs back: drop it too.
                bufs = rq = None  # noqa: F841
                parts = rq_part = s_parts = rs_blk = None  # noqa: F841
                if query_reuse:
                    query_reuse.clear()
                if not _free_fence():
                    raise
                print(f"[knn] query cache allocation OOM; "
                      f"chunk_rows={chunk_rows} (more synthetic sweeps; "
                      f"{_hbm_live()})")
                continue
        qs = end if reused else qs0
        inflight: deque = deque()  # backpressure window (see docstring)
        refeaturize = False
        oom_err: Exception | None = None
        while qs < end:
            try:
                parts, rq_part, _ = block_norms(queries, qs, q_block)
            except Exception as e:
                # SYNC failure (raised at dispatch of THIS block):
                # nothing was written and qs has not advanced — halve
                # q_block and resume at this row
                if not _is_oom(e) or q_block <= 1:
                    raise
                q_block = max(1, q_block // 2)
                inflight.clear()  # may hold error buffers from the fail
                parts = rq_part = None  # noqa: F841
                if not _free_fence():
                    raise
                print(f"[knn] query featurize OOM; q_block={q_block} "
                      f"(resuming at row {qs}; {_hbm_live()})")
                continue
            try:
                cap = padded - (qs - qs0)
                if parts[0].shape[0] > cap:
                    parts = [p[:cap] for p in parts]
                    rq_part = rq_part[:cap]
                bufs = [_update_rows(b, p, qs - qs0)
                        for b, p in zip(bufs, parts)]
                rq = _update_rows(rq, rq_part, qs - qs0)
                qs += parts[0].shape[0]
                # bound the in-flight queue: block on the featurize from
                # _SYNC_WINDOW blocks ago (in-order execution ⇒ all its
                # predecessors, including their multi-GB parts outputs,
                # have drained)
                inflight.append(rq_part)
                if len(inflight) > _SYNC_WINDOW:
                    _drain(inflight.popleft())
            except Exception as e:
                # DEFERRED failure: an async OOM from a block dispatched
                # up to _SYNC_WINDOW iterations ago surfaces here, AFTER
                # its outputs were folded into the DONATED cache bufs
                # and qs advanced past it — the cache is poisoned and
                # resuming at qs would keep the poison. Drop the cache
                # and refeaturize the whole chunk at the halved q_block.
                if not _is_oom(e) or q_block <= 1:
                    raise
                q_block = max(1, q_block // 2)
                refeaturize, oom_err = True, e
                break
        if not refeaturize and not reused:
            try:
                # verify the WHOLE cache before sweeping: a deferred
                # featurize failure still in flight must not surface
                # mid-sweep masquerading as a fold failure (the sweep
                # resume paths assume the cache is good). Costs one sync
                # per CHUNK — noise next to the sweep it precedes.
                _drain((bufs, rq))
            except Exception as e:
                if not _is_oom(e) or q_block <= 1:
                    raise
                q_block = max(1, q_block // 2)
                refeaturize, oom_err = True, e
        if refeaturize:
            inflight.clear()
            bufs = rq = parts = rq_part = None  # noqa: F841
            if not _free_fence():
                raise oom_err
            print(f"[knn] deferred query featurize OOM; q_block={q_block} "
                  f"(refeaturizing the chunk at row {qs0}; {_hbm_live()})")
            continue  # fresh bufs at the chunk-loop top; qs0 unchanged
        if query_reuse is not None and not reused and qs0 == 0 \
                and end == n_q:
            # single-chunk cache, verified good: hold it for the next
            # call over the same query set (the sweep's next subdir)
            query_reuse.clear()
            query_reuse.update(fp=reuse_fp, padded=padded,
                               bufs=bufs, rq=rq)
        state = init_state(padded)
        ss = 0
        restart_chunk = False
        inflight_s: deque = deque()
        while True:
            if ss >= n_s:
                # sweep fully dispatched: drain the backpressure tail.
                # A deferred async failure from one of the LAST
                # _SYNC_WINDOW folds would otherwise escape the driver
                # entirely — take() is lazy, so it would burst at the
                # caller's readback where no halving resume exists (or,
                # on multi-chunk runs, masquerade as the NEXT chunk's
                # allocation OOM over a poisoned take() output)
                try:
                    _drain(state)
                    break
                except Exception as drain_e:
                    err, deferred = drain_e, True
            else:
                deferred = False
                try:
                    s_parts, rs_blk, n_valid = block_norms(syn, ss, s_block)
                    new_state = fold(state, bufs, rq, s_parts, rs_blk, ss,
                                     n_valid)
                    state = new_state
                    ss += n_valid
                    deferred = True  # past the commit: failures below
                    # belong to a fold already folded into `state`
                    # backpressure (see docstring) — a deferred async
                    # failure from a fold committed up to _SYNC_WINDOW
                    # blocks ago surfaces HERE, after `state` absorbed it
                    inflight_s.append(rs_blk)
                    if len(inflight_s) > _SYNC_WINDOW:
                        _drain(inflight_s.popleft())
                    continue
                except Exception as body_e:
                    err = body_e
            # shared OOM handler for the sweep body and the final drain
            e = err
            if not _is_oom(e):
                raise e
            if s_block > 1:
                s_block = max(1, s_block // 2)
                # fence BEFORE retrying: the failed attempt's in-flight
                # buffers pin HBM until the queue drains, so an
                # unfenced retry can OOM spuriously and cascade the
                # halving all the way to s_block=1
                inflight_s.clear()
                s_parts = rs_blk = None  # noqa: F841
                if not _free_fence():
                    raise e
                if deferred:
                    # the failed fold's poisoned output is already in
                    # `state` (and folds after it compounded it):
                    # reset the state and restart the sweep — the
                    # query cache is read-only to the fold and was
                    # verified before the sweep, so it survives
                    state = init_state(padded)
                    ss = 0
                    print(f"[knn] deferred synthetic stream OOM; "
                          f"s_block={s_block} (restarting the sweep; "
                          f"{_hbm_live()})")
                else:
                    print(f"[knn] synthetic stream OOM; "
                          f"s_block={s_block} (resuming at row {ss}; "
                          f"{_hbm_live()})")
                continue
            # s_block exhausted: the pressure is the RESIDENT side
            # (query cache + fold state), not the streamed block —
            # observed with an over-ambitious 12 GB cache whose
            # sweep died near the end with every s_block failing.
            # Shrink the cache and redo this chunk; smaller blocks
            # cannot help further, so raising here would be final.
            # (padded <= q_block: THIS chunk is already minimal —
            # shrinking chunk_rows cannot reduce its buffers, so a
            # restart would just loop)
            if chunk_rows <= q_block or padded <= q_block:
                raise e
            chunk_rows = max(q_block,
                             (chunk_rows // 2) // q_block * q_block)
            s_block = s_block0
            print(f"[knn] synthetic stream OOM persists at s_block=1; "
                  f"halving query cache to chunk_rows={chunk_rows} "
                  f"and restarting the chunk ({_hbm_live()})")
            restart_chunk = True
            oom_err = e
            break
        if restart_chunk:
            del bufs, rq, state
            parts = rq_part = s_parts = rs_blk = None  # noqa: F841
            if query_reuse:
                # the held cache (this chunk's own buffers, or a stale
                # entry) is HBM the shrunken-chunk retry needs back
                query_reuse.clear()
            if not _free_fence():
                raise oom_err
            continue
        del bufs, rq
        outs.append(take(state, n_rows))
        qs0 = end
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate(cols) for cols in zip(*outs))


def knn_argmin_streamed(embed_fn, queries: Array, syn: Array, *,
                        engine: str = "gemm", q_block: int = 2048,
                        s_block: int = 2048, pallas: bool = False,
                        query_cache_bytes: int = 8 << 30,
                        precision: str | None = None,
                        query_reuse: dict | None = None
                        ) -> tuple[Array, Array]:
    """1-NN where embeddings are produced on the fly, block by block —
    for feature spaces too large to materialize (LPIPS at 64x64 is ~512k
    dims/image: 100k images would be 200 GB).

    Query embeddings are cached in the largest chunks that fit
    ``query_cache_bytes`` of HBM; the synthetic set is re-featurized once
    per CHUNK: ``N_q + N_s * ceil(N_q / chunk_rows)`` forwards total
    (``N_q + N_s`` when all queries fit — at the 100k x 20k north-star
    config with the 4 GB default that is 5 synthetic sweeps, not the 49
    a per-q_block scheme would pay). Queries/syn can be image arrays or
    anything ``embed_fn`` accepts, as long as axis 0 indexes samples.

    On device OOM, only the OFFENDING dimension's block is halved and the
    search RESUMES: query featurize failures halve ``q_block`` keeping the
    already-featurized query blocks; synthetic-stream failures halve
    ``s_block`` keeping the running (min, argmin) partials and the query
    embedding cache — no completed block is recomputed. (That no-recompute
    guarantee holds for failures raised at the failing block's own
    dispatch; an OOM that surfaces ASYNC — at a later sync point, after
    poisoned outputs were already committed — restarts the enclosing
    chunk featurize or synthetic sweep, never resumes over poison: see
    ``_stream_search``.)

    ``engine`` is 'gemm' | 'exact' | 'pallas' ('pallas' = gemm math in the
    fused VMEM-argmin kernel, ``ops/knn_pallas.py``).
    """
    if engine == "pallas":
        engine, pallas = "gemm", True
    if precision == "highest":
        pallas = False  # fused kernel streams bf16; the fold honors precision
    if engine not in ("gemm", "exact"):
        raise ValueError(f"unknown kNN engine {engine!r}; the flat search "
                         "supports 'gemm'/'pallas'/'exact' ('taps' is "
                         "knn_argmin_streamed_parts)")
    if pallas:
        # the fused kernel iterates (2048, 2048) tiles internally, so a
        # bigger stream block buys nothing — and its operand-layout
        # copies sit OUTSIDE the planner's model (s_block=4096 measured
        # a chip OOM at a boundary the model accepted, 2026-08-18)
        s_block = min(s_block, 2048)
    n_q, n_s = queries.shape[0], syn.shape[0]
    q_block = min(q_block, n_q)
    s_block = min(s_block, n_s)

    probe = jax.eval_shape(embed_fn, jax.ShapeDtypeStruct(
        (1,) + tuple(queries.shape[1:]), queries.dtype))
    # never demote the 'exact' engine: its elementwise math is the
    # true-f32 reference-parity path on ANY backend (DIVERGENCES.md) —
    # the "XLA demotes gemm operands anyway" rationale only covers dots
    demote = _stream_demote(probe.dtype, precision) and engine != "exact"
    cdtype = jnp.bfloat16 if demote else probe.dtype
    # one fused compiled call per block shape: tower + f32 norms + cast
    # (see _fused_embed_norms — eager norm dispatch OOMs at scale)
    block_norms = partial(_flat_block_norms,
                          _fused_embed_norms(embed_fn, cdtype))

    def init_state(padded: int):
        return (jnp.full((padded,), jnp.inf, jnp.float32),
                jnp.zeros((padded,), jnp.int32))

    flags = {"pallas": pallas}

    def fold(state, bufs, rq, s_parts, rs_blk, ss, n_valid):
        run_min, run_idx = state
        emb_q, emb_s = bufs[0], s_parts[0]
        if flags["pallas"] and engine == "gemm":
            from ganleaks_tpu.ops.knn_pallas import knn_argmin_pallas
            if n_valid < emb_s.shape[0]:  # kernel masks by row count
                emb_s_k = emb_s[:n_valid]
                rs_k = rs_blk[:n_valid]
            else:
                emb_s_k, rs_k = emb_s, rs_blk
            try:
                d_blk, i_blk = knn_argmin_pallas(
                    emb_q, emb_s_k, rq=rq, rs=rs_k,
                    interpret=jax.default_backend() != "tpu")
            except Exception as e:
                # device OOM -> the streaming driver's halving resume;
                # anything else (e.g. a Mosaic VMEM refusal on a
                # small-VMEM generation) -> XLA gemm fold, same math
                if _is_oom(e):
                    raise
                print(f"[knn] pallas kernel unavailable "
                      f"({type(e).__name__}); using the XLA gemm fold")
                flags["pallas"] = False
            else:
                better = d_blk < run_min  # in-order: first index kept
                return (jnp.where(better, d_blk, run_min),
                        jnp.where(better, ss + i_blk, run_idx))
        return _fold_block(run_min, run_idx, emb_q, rq, emb_s, ss,
                           jnp.asarray(n_valid), engine, precision, rs_blk)

    def take(state, n_rows: int):
        return state[0][:n_rows], state[1][:n_rows]

    return _stream_search(block_norms, [probe], queries, syn,
                          q_block=q_block, s_block=s_block,
                          query_cache_bytes=query_cache_bytes,
                          cdtype=cdtype, init_state=init_state, fold=fold,
                          take=take, query_reuse=query_reuse)


# ---------------------------------------------------------------------------
# tap-structured ('taps') engine: embeddings as a LIST of parts in their
# tower-native layouts, d = sum_l ||part_l(q) - part_l(s)||^2.  Skips the
# flat relayout+concat of the embedding matrix (~27% of featurize wall time
# at 64x64 bf16 on v5e) while the per-part dot_general contracting (HW, C)
# runs at the same MXU rate as the flat matmul (204 TF/s measured both
# ways, 2048x2048 x K=500k).
# ---------------------------------------------------------------------------

def _fast_slow_dispatch(fast, slow, name: str):
    """Call the jitted Pallas-epilogue path, permanently falling back to
    the XLA path on any non-OOM failure (e.g. a Mosaic refusal on an
    unexpected TPU generation). Safe mid-search: both paths share the
    same op order and lane packing (``ops/lpips/lpips._pack_lanes``), so
    values agree bit-for-bit in interpret mode and to <=1 ULP of the
    embed dtype on real TPU (instruction-level rounding, e.g. XLA's
    divide->reciprocal rewrite) — inside every taps engine's documented
    error model; exact-index guarantees attach only to the two-pass
    re-rank, which never uses this path. OOMs re-raise for the streaming
    driver's halving resume.

    The try/except only fires when the dispatch runs EAGERLY (the
    single-chip streamers). Under an outer jit/shard_map (the mesh
    wrappers) a kernel failure surfaces at outer-compile time instead;
    the mesh drivers catch it there, call :func:`disable_fast_epilogue`,
    and rebuild — ``call.disable_fast`` is that switch."""
    state = {"fast": True}

    def call(blk):
        if state["fast"]:
            try:
                return fast(blk)
            except Exception as e:
                if _is_oom(e):
                    raise
                print(f"[knn] pallas {name} unavailable "
                      f"({type(e).__name__}); using the XLA path")
                state["fast"] = False
        return slow(blk)

    def disable() -> bool:
        was = state["fast"]
        state["fast"] = False
        return was
    call.disable_fast = disable
    return call


def disable_fast_epilogue(embed_fn) -> bool:
    """Flip every cached fast/slow dispatch of ``embed_fn`` to the XLA
    path and drop its compiled mesh wrappers (which traced the fast path
    inline). Returns True if anything was actually flipped — the mesh
    drivers call this when a non-OOM error escapes a compiled wrapper,
    then retry the step once against the rebuilt XLA-path wrapper."""
    per = _fused_cache_for(embed_fn)
    flipped = False
    for v in list(per.values()):
        fn = getattr(v, "disable_fast", None)
        if callable(fn):
            flipped = fn() or flipped
    if flipped:
        per.pop("_mesh", None)
    return flipped


def _retry_without_fast_epilogue(embed_fn, thunk):
    """Run ``thunk`` (a whole single-chip streamed search), retrying ONCE
    on the XLA epilogue path if a non-OOM error escapes while the Pallas
    fast path was active.

    :func:`_fast_slow_dispatch`'s per-block try/except only catches
    errors raised synchronously at dispatch; under JAX's async dispatch a
    kernel EXECUTION failure surfaces later, at a consuming op (the
    distance fold, or the caller's readback) — outside that try. The
    search is stateless-restartable (same property the OOM resume relies
    on), so the driver-level retry re-runs it against the flipped-to-XLA
    dispatch. OOMs re-raise untouched: one escaping ``_stream_search``
    means the halving resume is already exhausted.

    The one-element readback is what SURFACES a deferred execution error
    inside this try: on the tunneled backend even ``block_until_ready``
    can return before execution finishes, so without it the error would
    burst at the caller's own readback, past the retry. One element per
    output array (never ravel/reshape — that copies the whole array)
    costs a single ~40ms round trip per search."""
    def run():
        out = thunk()
        for a in jax.tree_util.tree_leaves(out):
            np.asarray(a[(0,) * a.ndim])
        return out

    try:
        return run()
    except Exception as e:
        if _is_oom(e) or not disable_fast_epilogue(embed_fn):
            raise
        print(f"[knn] pallas epilogue failed at execution "
              f"({type(e).__name__}); retrying on the XLA path")
        return run()


def _fused_parts_norms(embed_fn, cdtype):
    """jit-cached ``blk -> ([parts cast to cdtype], f32 row norms summed
    over parts)`` — same fusion rationale as :func:`_fused_embed_norms`.
    When the embed closure provides the Pallas tap epilogue
    (``make_fast_parts_norms``, TPU only) the fused single-pass kernel is
    used with the XLA composition as runtime fallback."""
    per = _fused_cache_for(embed_fn)
    key = "parts:" + jnp.dtype(cdtype).name
    if key not in per:
        def parts_norms(blk):
            out, r = [], None
            for p in embed_fn(blk):
                p = jnp.asarray(p)
                pr = jnp.sum(jnp.square(p.astype(jnp.float32)),
                             axis=tuple(range(1, p.ndim)))
                r = pr if r is None else r + pr
                out.append(p.astype(cdtype))
            return out, r
        slow = _jit_cached(parts_norms)
        maker = getattr(embed_fn, "make_fast_parts_norms", None)
        fast = maker(cdtype) if maker is not None else None
        per[key] = slow if fast is None else \
            _fast_slow_dispatch(jax.jit(fast), slow, "epilogue")
    return per[key]


def _fused_parts_norms_q(embed_fn, bounds: tuple):
    """int8-quantized variant of :func:`_fused_parts_norms`: each part is
    scaled by its static elementwise bound (``embed_fn.part_bound_fn``)
    and rounded to int8 INSIDE the fused call; row norms stay exact f32
    (computed pre-quantization). The v5e MXU runs s8xs8->s32 dots at
    2.36x the bf16 rate (measured 516 vs 219 T(FL)OPS) and the query
    cache shrinks 2x vs bf16 — the dominant cost at the north-star scale,
    where cache bytes set the number of synthetic re-featurize sweeps."""
    per = _fused_cache_for(embed_fn)
    key = "parts:int8:" + ",".join(f"{b:.6g}" for b in bounds)
    if key not in per:
        def parts_norms(blk):
            from ganleaks_tpu.ops.distance import quantize_int8
            out, r = [], None
            for p, a in zip(embed_fn(blk), bounds):
                p = jnp.asarray(p).astype(jnp.float32)
                pr = jnp.sum(jnp.square(p), axis=tuple(range(1, p.ndim)))
                r = pr if r is None else r + pr
                out.append(quantize_int8(p, a))
            return out, r
        slow = _jit_cached(parts_norms)
        maker = getattr(embed_fn, "make_fast_parts_norms", None)
        fast = maker(jnp.int8, tuple(bounds)) if maker is not None else None
        per[key] = slow if fast is None else \
            _fast_slow_dispatch(jax.jit(fast), slow, "int8 epilogue")
    return per[key]


def _quant_factors(bounds: tuple) -> tuple:
    """Per-part dequantization factors for the int8 cross term."""
    return tuple((a / 127.0) ** 2 for a in bounds)


def _quant_abs_err(bounds: tuple, part_shapes) -> float:
    """Rigorous L2 bound on the per-row embedding error introduced by
    round-to-nearest int8 quantization: err/element <= a_l/254, so
    ||delta phi|| <= sqrt(sum_l K_l (a_l/254)^2). Feeds the two-pass
    certificate's absolute-error term."""
    total = 0.0
    for a, shp in zip(bounds, part_shapes):
        k = 1
        for dim in shp:
            k *= dim
        total += k * (a / 254.0) ** 2
    return float(np.sqrt(total))


def _part_bounds_for(embed_fn, queries) -> tuple:
    """Static quantization scales for ``embed_fn``'s parts, plus the
    int32-accumulator safety check: each part's s8xs8->s32 dot must not
    be able to overflow (e.g. the pixel part at >=256x256 images could
    reach 127^2 * H*W*C > 2^31 — a silent wrap, not an error)."""
    if not hasattr(embed_fn, "part_bound_fn"):
        raise ValueError(
            "quantize=True needs embed_fn.part_bound_fn (per-part "
            "elementwise magnitude bounds; see "
            "ops/distance.make_embed_parts_fn)")
    shape = tuple(queries.shape[1:])
    bounds = tuple(embed_fn.part_bound_fn(shape))
    if hasattr(embed_fn, "part_int_dot_bound_fn"):
        dot_bounds = embed_fn.part_int_dot_bound_fn(shape)
    else:  # generic worst case: every element saturates
        probe = jax.eval_shape(embed_fn, jax.ShapeDtypeStruct(
            (1,) + shape, queries.dtype))
        dot_bounds = []
        for pshape in [tuple(p.shape[1:]) for p in probe]:
            k = 1
            for dim in pshape:
                k *= dim
            dot_bounds.append(float(k) * 127.5 ** 2)
    for l, db in enumerate(dot_bounds):
        if db >= 2.0 ** 31:
            raise ValueError(
                f"int8 engine disabled: part {l}'s cross dot can reach "
                f"{db:.3g} >= 2^31 and would silently wrap the int32 "
                f"accumulator at this input shape {shape}; use "
                f"engine='taps' (bf16) instead")
    return bounds


@partial(jax.jit, static_argnames=("factors",))
def _fold_block_parts_q(run_min: Array, run_idx: Array,
                        q_parts: list[Array], rq: Array,
                        s_parts: list[Array], rs: Array,
                        col0, n_valid: Array, factors: tuple
                        ) -> tuple[Array, Array]:
    """int8 analog of :func:`_fold_block_parts`: one s8xs8->s32
    dot_general per part, dequantized by the static per-part factor;
    masking/tie-break identical."""
    cross = None
    for q_l, s_l, f in zip(q_parts, s_parts, factors):
        dims = tuple(range(1, q_l.ndim))
        c = jax.lax.dot_general(q_l, s_l, ((dims, dims), ((), ())),
                                preferred_element_type=jnp.int32)
        c = c.astype(jnp.float32) * jnp.float32(f)
        cross = c if cross is None else cross + c
    d = rq[:, None] + rs[None, :] - 2.0 * cross
    local = jnp.arange(s_parts[0].shape[0])
    d = jnp.where(local[None, :] < n_valid, d, jnp.inf)
    blk_arg = jnp.argmin(d, axis=1)
    blk_min = jnp.take_along_axis(d, blk_arg[:, None], axis=1)[:, 0]
    better = blk_min < run_min
    run_min = jnp.where(better, blk_min, run_min)
    run_idx = jnp.where(better, col0 + blk_arg.astype(jnp.int32), run_idx)
    return run_min, run_idx


@partial(jax.jit, static_argnames=("k", "factors"))
def _fold_block_topk_parts_q(run_d: Array, run_i: Array,
                             q_parts: list[Array], rq: Array,
                             s_parts: list[Array], rs: Array,
                             col0, n_valid: Array, k: int, factors: tuple
                             ) -> tuple[Array, Array]:
    """Top-k analog of :func:`_fold_block_parts_q` (stable merge,
    first-index tie-break as :func:`_fold_block_topk`)."""
    cross = None
    for q_l, s_l, f in zip(q_parts, s_parts, factors):
        dims = tuple(range(1, q_l.ndim))
        c = jax.lax.dot_general(q_l, s_l, ((dims, dims), ((), ())),
                                preferred_element_type=jnp.int32)
        c = c.astype(jnp.float32) * jnp.float32(f)
        cross = c if cross is None else cross + c
    d = rq[:, None] + rs[None, :] - 2.0 * cross
    local = jnp.arange(s_parts[0].shape[0])
    d = jnp.where(local[None, :] < n_valid, d, jnp.inf)
    cat_d = jnp.concatenate([run_d, d], axis=1)
    cat_i = jnp.concatenate(
        [run_i, jnp.broadcast_to(col0 + local.astype(jnp.int32),
                                 d.shape)], axis=1)
    neg_top, pos = jax.lax.top_k(-cat_d, k)
    return -neg_top, jnp.take_along_axis(cat_i, pos, axis=1)


def _parts_block_norms(parts_norms, x: Array, start: int, block: int
                       ) -> tuple[list[Array], Array, int]:
    """Parts analog of :func:`_block_norms` (same padding contract)."""
    blk = x[start:start + block]
    n_valid = blk.shape[0]
    if n_valid < block:
        blk = pad_rows(blk, block)
    ps, r = parts_norms(blk)
    return ps, r, n_valid


@partial(jax.jit, static_argnames=("precision",))
def _fold_block_parts(run_min: Array, run_idx: Array, q_parts: list[Array],
                      rq: Array, s_parts: list[Array], rs: Array,
                      col0, n_valid: Array,
                      precision: str | None = None) -> tuple[Array, Array]:
    """Parts analog of :func:`_fold_block`: the cross term accumulates one
    dot_general per part (contracting every non-batch axis); tie-break and
    masking semantics identical."""
    cross = None
    for q_l, s_l in zip(q_parts, s_parts):
        dims = tuple(range(1, q_l.ndim))
        c = jax.lax.dot_general(q_l, s_l, ((dims, dims), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision)
        cross = c if cross is None else cross + c
    d = rq[:, None] + rs[None, :] - 2.0 * cross
    local = jnp.arange(s_parts[0].shape[0])
    d = jnp.where(local[None, :] < n_valid, d, jnp.inf)
    blk_arg = jnp.argmin(d, axis=1)
    blk_min = jnp.take_along_axis(d, blk_arg[:, None], axis=1)[:, 0]
    better = blk_min < run_min
    run_min = jnp.where(better, blk_min, run_min)
    run_idx = jnp.where(better, col0 + blk_arg.astype(jnp.int32), run_idx)
    return run_min, run_idx


def _phys_row_bytes(part_shapes, itemsize: int) -> int:
    """HBM bytes of one cached row across parts, including the TPU lane
    padding of each part's minor axis (rounds up to the 128-lane tile —
    e.g. a (HW, 64) tap stores as (HW, 128) physically)."""
    total = 0
    for shp in part_shapes:
        if not shp:
            continue
        minor = -(-shp[-1] // 128) * 128
        rows = 1
        for dim in shp[:-1]:
            rows *= dim
        total += rows * minor * itemsize
    return total


def knn_argmin_streamed_parts(embed_fn, queries: Array, syn: Array, *,
                              q_block: int = 2048, s_block: int = 2048,
                              query_cache_bytes: int = 8 << 30,
                              precision: str | None = None,
                              quantize: bool = False,
                              query_reuse: dict | None = None
                              ) -> tuple[Array, Array]:
    """1-NN like :func:`knn_argmin_streamed`, over a STRUCTURED embedding:
    ``embed_fn`` returns a list of parts (see
    ``ops/distance.make_embed_parts_fn``). Same chunked donated query
    cache, OOM-resume, and first-index tie-break; the distance fold runs
    one MXU dot per part instead of one flat gemm.

    ``quantize=True`` streams int8 parts (static per-part scales from
    ``embed_fn.part_bound_fn``; exact f32 row norms): 2.36x MXU rate and
    half the cache bytes vs bf16, at ~4e-3 additional relative distance
    error (rigorously bounded — see :func:`_quant_abs_err`). Scores are
    approximate like the bf16 throughput mode; for exact results use it
    as pass 1 of the certified two-pass (engine='taps-int8')."""
    n_q, n_s = queries.shape[0], syn.shape[0]
    q_block = min(q_block, n_q)
    s_block = min(s_block, n_s)

    probe = list(jax.eval_shape(embed_fn, jax.ShapeDtypeStruct(
        (1,) + tuple(queries.shape[1:]), queries.dtype)))
    if quantize:
        bounds = _part_bounds_for(embed_fn, queries)
        factors = _quant_factors(bounds)
        cdtype = jnp.int8
        block_norms = partial(_parts_block_norms,
                              _fused_parts_norms_q(embed_fn, bounds))

        def fold(state, bufs, rq, s_parts, rs_blk, ss, n_valid):
            return _fold_block_parts_q(state[0], state[1], bufs, rq,
                                       s_parts, rs_blk, ss,
                                       jnp.asarray(n_valid), factors)
    else:
        demote = _stream_demote(probe[0].dtype, precision)
        cdtype = jnp.bfloat16 if demote else probe[0].dtype
        block_norms = partial(_parts_block_norms,
                              _fused_parts_norms(embed_fn, cdtype))

        def fold(state, bufs, rq, s_parts, rs_blk, ss, n_valid):
            return _fold_block_parts(state[0], state[1], bufs, rq,
                                     s_parts, rs_blk, ss,
                                     jnp.asarray(n_valid), precision)

    def init_state(padded: int):
        return (jnp.full((padded,), jnp.inf, jnp.float32),
                jnp.zeros((padded,), jnp.int32))

    def take(state, n_rows: int):
        return state[0][:n_rows], state[1][:n_rows]

    return _retry_without_fast_epilogue(embed_fn, lambda: _stream_search(
        block_norms, probe, queries, syn,
        q_block=q_block, s_block=s_block,
        query_cache_bytes=query_cache_bytes,
        cdtype=cdtype, init_state=init_state, fold=fold, take=take,
        query_reuse=query_reuse))


@partial(jax.jit, static_argnames=("k",))
def _fold_block_topk_parts(run_d: Array, run_i: Array, q_parts: list[Array],
                           rq: Array, s_parts: list[Array], rs: Array,
                           col0, n_valid: Array, k: int
                           ) -> tuple[Array, Array]:
    """Top-k analog of :func:`_fold_block_parts` (same stable-merge
    first-index tie-break as :func:`_fold_block_topk`)."""
    cross = None
    for q_l, s_l in zip(q_parts, s_parts):
        dims = tuple(range(1, q_l.ndim))
        c = jax.lax.dot_general(q_l, s_l, ((dims, dims), ((), ())),
                                preferred_element_type=jnp.float32)
        cross = c if cross is None else cross + c
    d = rq[:, None] + rs[None, :] - 2.0 * cross
    local = jnp.arange(s_parts[0].shape[0])
    d = jnp.where(local[None, :] < n_valid, d, jnp.inf)
    cat_d = jnp.concatenate([run_d, d], axis=1)
    cat_i = jnp.concatenate(
        [run_i, jnp.broadcast_to(col0 + local.astype(jnp.int32),
                                 d.shape)], axis=1)
    neg_top, pos = jax.lax.top_k(-cat_d, k)
    return -neg_top, jnp.take_along_axis(cat_i, pos, axis=1)


def _topk_state_hooks(fold_one, k: int, with_info: bool):
    """init/fold/take hooks for the streamed top-k searches. With
    ``with_info`` the state additionally carries the per-query f32 norms
    (``rq``) and the running max synthetic norm (``rs_max``) — the inputs
    of the two-pass exactness certificate (:func:`two_pass_certificate`)."""
    def init_state(padded: int):
        base = (jnp.full((padded, k), jnp.inf, jnp.float32),
                jnp.zeros((padded, k), jnp.int32))
        if with_info:
            base += (jnp.zeros((padded,), jnp.float32),
                     jnp.zeros((), jnp.float32))
        return base

    def fold(state, bufs, rq, s_parts, rs_blk, ss, n_valid):
        d, i = fold_one(state[0], state[1], bufs, rq, s_parts, rs_blk, ss,
                        n_valid)
        if with_info:
            # padded synthetic rows are zeros -> rs 0, never inflate max
            return d, i, rq, jnp.maximum(state[3], jnp.max(rs_blk))
        return d, i

    def take(state, n_rows: int):
        out = (state[0][:n_rows], state[1][:n_rows])
        if with_info:
            out += (state[2][:n_rows], state[3][None])
        return out

    return init_state, fold, take


def knn_topk_streamed_parts(embed_fn, queries: Array, syn: Array, *,
                            k: int = 8, q_block: int = 2048,
                            s_block: int = 2048,
                            query_cache_bytes: int = 8 << 30,
                            with_info: bool = False,
                            quantize: bool = False,
                            query_reuse: dict | None = None):
    """Per-query k smallest distances + indices over a STRUCTURED
    embedding (parts list) — the top-k analog of
    :func:`knn_argmin_streamed_parts`, used as pass 1 of the two-pass
    exact-index mode with ``engine='taps'`` (``quantize=True`` for
    'taps-int8'). ``with_info`` appends ``(rq, rs_max)`` for the
    exactness certificate."""
    n_q, n_s = queries.shape[0], syn.shape[0]
    q_block = min(q_block, n_q)
    s_block = min(s_block, n_s)

    probe = list(jax.eval_shape(embed_fn, jax.ShapeDtypeStruct(
        (1,) + tuple(queries.shape[1:]), queries.dtype)))
    if quantize:
        bounds = _part_bounds_for(embed_fn, queries)
        factors = _quant_factors(bounds)
        cdtype = jnp.int8
        block_norms = partial(_parts_block_norms,
                              _fused_parts_norms_q(embed_fn, bounds))

        def fold_one(run_d, run_i, bufs, rq, s_parts, rs_blk, ss, n_valid):
            return _fold_block_topk_parts_q(run_d, run_i, bufs, rq,
                                            s_parts, rs_blk, ss,
                                            jnp.asarray(n_valid), k,
                                            factors)
    else:
        demote = _stream_demote(probe[0].dtype, None)
        cdtype = jnp.bfloat16 if demote else probe[0].dtype
        block_norms = partial(_parts_block_norms,
                              _fused_parts_norms(embed_fn, cdtype))

        def fold_one(run_d, run_i, bufs, rq, s_parts, rs_blk, ss, n_valid):
            return _fold_block_topk_parts(run_d, run_i, bufs, rq, s_parts,
                                          rs_blk, ss, jnp.asarray(n_valid),
                                          k)

    init_state, fold, take = _topk_state_hooks(fold_one, k, with_info)
    return _retry_without_fast_epilogue(embed_fn, lambda: _stream_search(
        block_norms, probe, queries, syn,
        q_block=q_block, s_block=s_block,
        query_cache_bytes=query_cache_bytes,
        cdtype=cdtype, init_state=init_state, fold=fold, take=take,
        query_reuse=query_reuse))


@partial(jax.jit, static_argnames=("k", "engine"))
def _fold_block_topk(run_d: Array, run_i: Array, emb_q: Array, rq: Array,
                     emb_s_blk: Array, col0: int, n_valid: Array,
                     k: int, engine: str,
                     rs: Array | None = None) -> tuple[Array, Array]:
    """Fold one distance tile into a running per-query top-k.

    ``run_d``/``run_i`` are (N_q, k), distance-ascending with FIRST-index
    tie-break: ``lax.top_k`` is stable (equal values keep lower position),
    running entries are concatenated before the block's columns, and
    column ids ascend — so among equal distances the earliest global index
    always stays in front, matching ``torch.min`` (``fbb.py:86-88``) when
    the top-1 is read off.
    """
    if engine == "gemm":
        if rs is None:
            rs = jnp.sum(jnp.square(emb_s_blk.astype(jnp.float32)), axis=1)
        cross = jax.lax.dot_general(
            emb_q, emb_s_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = rq[:, None] + rs[None, :] - 2.0 * cross
    elif engine == "exact":
        diff = emb_q[:, None, :].astype(jnp.float32) \
            - emb_s_blk[None, :, :].astype(jnp.float32)
        d = jnp.sum(jnp.square(diff), axis=-1)
    else:
        raise ValueError(f"unknown kNN engine {engine!r} "
                         "(flat fold supports 'gemm'/'exact')")
    local = jnp.arange(emb_s_blk.shape[0])
    d = jnp.where(local[None, :] < n_valid, d, jnp.inf)
    cat_d = jnp.concatenate([run_d, d], axis=1)
    cat_i = jnp.concatenate(
        [run_i, jnp.broadcast_to(col0 + local.astype(jnp.int32),
                                 d.shape)], axis=1)
    neg_top, pos = jax.lax.top_k(-cat_d, k)
    return -neg_top, jnp.take_along_axis(cat_i, pos, axis=1)


@partial(jax.jit, static_argnames=("k",))
def _merge_topk(run_d: Array, run_i: Array, blk_d: Array, blk_i: Array,
                k: int) -> tuple[Array, Array]:
    """Merge a block's top-k into the running top-k. ``lax.top_k`` is
    stable and running entries (earlier global indices) are concatenated
    first, so the first-index tie-break is preserved."""
    cat_d = jnp.concatenate([run_d, blk_d], axis=1)
    cat_i = jnp.concatenate([run_i, blk_i], axis=1)
    neg, pos = jax.lax.top_k(-cat_d, k)
    return -neg, jnp.take_along_axis(cat_i, pos, axis=1)


def knn_topk_streamed(embed_fn, queries: Array, syn: Array, *, k: int = 8,
                      engine: str = "gemm", q_block: int = 2048,
                      s_block: int = 2048,
                      query_cache_bytes: int = 8 << 30,
                      with_info: bool = False,
                      query_reuse: dict | None = None):
    """Per-query k smallest distances + their indices, streamed like
    :func:`knn_argmin_streamed` (embeddings produced block by block,
    queries featurized in the largest chunks that fit
    ``query_cache_bytes``; f32 embeddings stream as bf16 with f32 norms
    on TPU).

    ``engine='pallas'`` runs each block through the fused
    ``knn_topk_pallas`` kernel (top-k state in VMEM, k min-extractions
    per s tile) instead of the XLA ``lax.top_k`` fold (a sort per tile).
    """
    use_pallas = engine == "pallas"
    if use_pallas:
        engine = "gemm"  # same distance math
        s_block = min(s_block, 2048)  # kernel tile bound (see argmin)
    if engine not in ("gemm", "exact"):
        raise ValueError(f"unknown kNN engine {engine!r}; the flat top-k "
                         "supports 'gemm'/'pallas'/'exact' ('taps' is "
                         "knn_topk_streamed_parts)")
    n_q, n_s = queries.shape[0], syn.shape[0]
    q_block = min(q_block, n_q)
    s_block = min(s_block, n_s)

    probe = jax.eval_shape(embed_fn, jax.ShapeDtypeStruct(
        (1,) + tuple(queries.shape[1:]), queries.dtype))
    # 'exact' keeps true f32 on any backend (see knn_argmin_streamed)
    demote = _stream_demote(probe.dtype, None) and engine != "exact"
    cdtype = jnp.bfloat16 if demote else probe.dtype
    block_norms = partial(_flat_block_norms,
                          _fused_embed_norms(embed_fn, cdtype))

    flags = {"pallas": use_pallas}

    def fold_one(run_d, run_i, bufs, rq, s_parts, rs_blk, ss, n_valid):
        emb_q, emb_s = bufs[0], s_parts[0]
        if flags["pallas"]:
            from ganleaks_tpu.ops.knn_pallas import knn_topk_pallas
            if n_valid < emb_s.shape[0]:  # kernel masks by row count
                emb_s_k = emb_s[:n_valid]
                rs_blk_k = rs_blk[:n_valid]
            else:
                emb_s_k, rs_blk_k = emb_s, rs_blk
            try:
                blk_d, blk_i = knn_topk_pallas(
                    emb_q, emb_s_k, k=k, rq=rq, rs=rs_blk_k,
                    interpret=jax.default_backend() != "tpu")
            except Exception as e:
                if _is_oom(e):  # let the streaming driver halve blocks
                    raise
                print(f"[knn] pallas top-k kernel unavailable "
                      f"({type(e).__name__}); using the XLA top-k fold")
                flags["pallas"] = False
            else:
                return _merge_topk(run_d, run_i, blk_d, ss + blk_i, k)
        return _fold_block_topk(run_d, run_i, emb_q, rq, emb_s, ss,
                                jnp.asarray(n_valid), k, engine, rs_blk)

    init_state, fold, take = _topk_state_hooks(fold_one, k, with_info)
    return _stream_search(block_norms, [probe], queries, syn,
                          q_block=q_block, s_block=s_block,
                          query_cache_bytes=query_cache_bytes,
                          cdtype=cdtype, init_state=init_state, fold=fold,
                          take=take, query_reuse=query_reuse)


def two_pass_certificate(d_exact: np.ndarray, topk_d: np.ndarray,
                         rq: np.ndarray, rs_max: float,
                         eta: float, abs_err: float = 0.0) -> np.ndarray:
    """Per-query certificate that the two-pass result equals the full
    exact search. Returns a boolean mask (True = certified).

    Model: the pass-1 embedding of any row x differs from the exact
    embedding by at most ``eta * ||phi(x)|| + abs_err`` in L2 (relative
    term: bf16 tower + bf16 stream + default-precision gemm; absolute
    term: int8 quantization, rigorously bounded by
    :func:`_quant_abs_err`). With S := ||phi(q)|| + max_s ||phi(s)|| and
    A := eta*S + 2*abs_err, for every (q, s) pair

        |d_lo(q, s) - d(q, s)| <= eps_q := A * (2*S + A),

    so any synthetic row OUTSIDE the candidate union (its approx distance
    >= the query's k-th kept approx distance ``topk_max``) has true
    distance >= topk_max - eps_q. The re-ranked winner is certified exact
    — including the first-index tie-break — iff its exact distance is
    STRICTLY below that bound (non-strict could mean an equal-distance,
    lower-index row outside the union). ``topk_max = inf`` (fewer than k
    valid rows: every row was a candidate) certifies trivially.

    ``eta`` is the one modeling assumption; the gemm/stream part of it is
    rigorous (bf16 unit roundoff), the tower part is empirical — measured
    bf16-vs-f32 LPIPS embedding error is ~2e-3 relative, so the 2e-2
    default used for demoted streams carries a 10x margin. Queries that
    fail fall back to the full f32 search (see callers), so a too-LARGE
    eta costs correctness nothing — it only spends more fallback work; a
    too-small eta is the unsound direction (it certifies results the
    error model cannot actually guarantee), hence the 10x margin.
    """
    rq = np.maximum(np.asarray(rq, np.float64), 0.0)
    topk_max = np.asarray(topk_d, np.float64)[:, -1]
    s = np.sqrt(rq) + np.sqrt(max(float(rs_max), 0.0))
    a = eta * s + 2.0 * abs_err
    eps = a * (2.0 * s + a)
    return ~np.isfinite(topk_max) | (np.asarray(d_exact, np.float64)
                                     < topk_max - eps)


def _default_cert_eta(demoted: bool) -> float:
    """2e-2 when pass 1 streamed bf16 (tower error ~2e-3 measured, 10x
    margin); 1e-6 when pass 1 was full f32 (accumulation-order noise)."""
    return 2e-2 if demoted else 1e-6


def _rerank_candidates(embed_hi, queries: Array, syn, cand: np.ndarray, *,
                       engine: str, q_block: int, s_block: int,
                       query_cache_bytes: int,
                       query_reuse: dict | None = None
                       ) -> tuple[Array, Array]:
    """Exact re-rank restricted to the candidate union. Always the XLA
    gemm at ``precision='highest'`` (the pallas kernel's whole point is
    bf16 streams — wrong tool here). Blocks/cache shrink: everything here
    is f32 (2x the bytes end to end) and the candidate set is tiny, so
    small blocks cost ~nothing while full-size ones put the f32 peak past
    a 16 GB chip at the default attack sizes (measured: 2000x20000
    two-pass OOMed unrecoverably)."""
    if isinstance(syn, jax.Array):
        sub = jnp.take(syn, jnp.asarray(cand), axis=0)
    else:
        # host-backed set (numpy / io.stream.HostImageSet): gather the
        # few candidate rows host-side — jnp.asarray(syn) would ship
        # (and for a lazy set, decode) the ENTIRE generated set
        sub = jnp.asarray(syn[np.asarray(cand)])
    d, i_sub = knn_argmin_streamed(
        embed_hi, queries, sub,
        engine="gemm" if engine != "exact" else engine,
        q_block=min(q_block, 1024),
        s_block=min(s_block, 1024, max(8, len(cand))),
        query_cache_bytes=min(query_cache_bytes, 2 << 30),
        precision="highest", query_reuse=query_reuse)
    return d, jnp.asarray(cand, jnp.int32)[i_sub]


def knn_argmin_two_pass(embed_lo, embed_hi, queries: Array, syn: Array, *,
                        k: int = 8, engine: str = "gemm",
                        q_block: int = 2048, s_block: int = 2048,
                        query_cache_bytes: int = 8 << 30,
                        cert_eta: float | None = None,
                        return_cert: bool = False,
                        query_reuse: dict | None = None,
                        rerank_reuse: dict | None = None):
    """Throughput mode with exact-index re-ranking and a runtime
    exactness certificate.

    Pass 1 finds each query's top-``k`` candidates under the cheap
    embedding (``embed_lo``, e.g. a bf16 LPIPS tower at MXU-native rate);
    pass 2 re-runs the exact search (``embed_hi``, the reference-parity
    f32 path) restricted to the UNION of all candidates, at
    ``precision='highest'`` so returned distances are true f32. The
    result equals the full f32 search whenever each query's true nearest
    neighbor lands in the candidate union; :func:`two_pass_certificate`
    CHECKS that per query from pass-1 norms, and uncertified queries are
    re-searched against the FULL synthetic set in f32 — so the returned
    indices are exact under the (documented, 10x-margined) eta error
    model rather than by unchecked assumption.

    Replaces the precision/parity trade of running ``fbb.py:73-88``'s
    distance entirely in reduced precision: same throughput, exact
    indices. ``return_cert=True`` appends (certified_mask, n_fallback).

    ``engine='taps-int8'`` runs pass 1 with int8-quantized parts (2.36x
    MXU rate, half the cache bytes); the quantization's contribution to
    the certificate is an ABSOLUTE error term, rigorously bounded from
    the static scales — only the bf16-tower eta stays a modeled bound.
    """
    abs_err = 0.0
    probe = jax.eval_shape(embed_lo, jax.ShapeDtypeStruct(
        (1,) + tuple(queries.shape[1:]), queries.dtype))
    if engine in ("taps", "taps-int8"):
        # embed_lo must be the structured (parts) featurizer
        quant = engine == "taps-int8"
        if quant:
            bounds = _part_bounds_for(embed_lo, queries)
            abs_err = _quant_abs_err(
                bounds, [tuple(p.shape[1:]) for p in probe])
        topk_d, top_i, rq, rs_max = knn_topk_streamed_parts(
            embed_lo, queries, syn, k=k, q_block=q_block,
            s_block=s_block, query_cache_bytes=query_cache_bytes,
            with_info=True, quantize=quant, query_reuse=query_reuse)
    else:
        topk_d, top_i, rq, rs_max = knn_topk_streamed(
            embed_lo, queries, syn, k=k, engine=engine, q_block=q_block,
            s_block=s_block, query_cache_bytes=query_cache_bytes,
            with_info=True, query_reuse=query_reuse)
    cand = np.unique(np.asarray(top_i).ravel())
    d, idx = _rerank_candidates(embed_hi, queries, syn, cand,
                                engine=engine, q_block=q_block,
                                s_block=s_block,
                                query_cache_bytes=query_cache_bytes,
                                query_reuse=rerank_reuse)

    probe_dt = (list(probe)[0] if engine in ("taps", "taps-int8")
                else probe).dtype
    # 'reduced precision anywhere in pass 1' must select the 2e-2 eta:
    # a natively-bf16 embed_lo (what attack/fbb and bench construct) is
    # just as bf16 as an f32 one demoted by the streamer — keying on
    # _stream_demote alone under-estimated eta 1000x for exactly the
    # production configuration and would wrongly certify near-ties
    # keyed on itemsize, not the bf16 dtype alone: a natively-float16
    # embed_lo is just as reduced-precision as a bf16 one and must not
    # get the 1e-6 full-f32 eta (which would wrongly certify near-ties)
    demoted = (jnp.dtype(probe_dt).itemsize < 4
               or (_stream_demote(probe_dt, None) and engine != "exact")
               or engine == "taps-int8")  # int8 towers run bf16 upstream
    eta = cert_eta if cert_eta is not None else _default_cert_eta(demoted)
    cert = two_pass_certificate(np.asarray(d), np.asarray(topk_d),
                                np.asarray(rq), float(np.max(rs_max)),
                                eta, abs_err)
    bad = np.nonzero(~cert)[0]
    if bad.size:
        print(f"[knn] two-pass certificate failed for {bad.size} "
              f"queries; exact-f32 fallback search")
        d_fix, i_fix = knn_argmin_streamed(
            embed_hi, queries[bad], syn,
            engine="gemm" if engine != "exact" else engine,
            q_block=min(q_block, 1024), s_block=min(s_block, 1024),
            query_cache_bytes=min(query_cache_bytes, 2 << 30),
            precision="highest")
        d = jnp.asarray(np.asarray(d).copy())
        idx = jnp.asarray(np.asarray(idx).copy())
        d = d.at[jnp.asarray(bad)].set(d_fix)
        idx = idx.at[jnp.asarray(bad)].set(i_fix)
    if return_cert:
        return d, idx, cert, int(bad.size)
    return d, idx


def knn_argmin_reference_batched(emb_q: Array, emb_s: Array,
                                 batch_size: int) -> tuple[Array, Array]:
    """Strict-parity variant of :func:`knn_argmin`: replicates the
    reference's remainder-drop (``fbb.py:77``) before searching."""
    n_eff = truncate_to_batches(emb_s.shape[0], batch_size)
    return knn_argmin(emb_q, emb_s[:n_eff], engine="exact",
                      s_block=min(batch_size, n_eff) or 1)
