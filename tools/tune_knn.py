#!/usr/bin/env python
"""Sweep kNN engine configurations on the current backend.

Isolates the distance+argmin stage (embeddings pre-materialized, no LPIPS
tower) at one streamed-block granularity: emb_q (N_q, K) resident, one
emb_s block of (S_BLOCK, K), exactly what ``knn_argmin_streamed`` folds per
step. Reports pairs/sec per config so the winner can be hardcoded as the
default tile heuristic in ``ops/knn_pallas.py``.

Usage: python tools/tune_knn.py [--n_q 2000] [--s_rows 8192] [--k 512000]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401  (kept for ad-hoc host checks)


def _sync(out) -> None:
    """Force completion. On the tunneled remote backend
    ``block_until_ready`` returns before execution finishes — only a
    device->host readback actually waits on the compute chain."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])  # no ravel: tiled-layout copy blowup


def bench_fn(fn, *args, reps: int = 3) -> float:
    out = fn(*args)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)  # one readback after `reps` queued executions
    return (time.perf_counter() - t0) / reps


def main() -> None:
    from ganleaks_tpu.cli.common import enable_persistent_compilation_cache
    from ganleaks_tpu.ops.knn import _knn_block
    from ganleaks_tpu.ops.knn_pallas import knn_argmin_pallas

    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_q", type=int, default=2000)
    ap.add_argument("--s_rows", type=int, default=4096)
    ap.add_argument("--k", type=int, default=512000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    n_q, n_s, k = args.n_q, args.s_rows, args.k
    pairs = n_q * n_s
    print(f"# backend={jax.devices()[0].platform} n_q={n_q} n_s={n_s} k={k}")

    # generate ON DEVICE: the tunneled host->TPU link is ~13 MB/s, a host
    # transfer of GB-scale embeddings would dominate the session
    make = jax.jit(
        lambda key, n, dt: jax.random.normal(key, (n, k), jnp.float32)
        .astype(dt) * 0.01,
        static_argnums=(1, 2))

    results = []
    q = s = None
    for dtype in (jnp.float32, jnp.bfloat16):
        del q, s
        q = make(jax.random.key(0), n_q, dtype)
        s = make(jax.random.key(1), n_s, dtype)
        jax.block_until_ready((q, s))

        # XLA gemm engine (the current champion) at matching block size
        for s_block in (2048, 4096, 8192):
            if s_block > n_s:
                continue
            dt = bench_fn(lambda q=q, s=s, sb=s_block:
                          _knn_block(q, s, n_s, sb, "gemm"), reps=args.reps)
            results.append((f"gemm/{dtype.__name__}/s{s_block}",
                            pairs / dt))
            print(f"gemm   {dtype.__name__:9s} s_block={s_block:5d}  "
                  f"{pairs/dt/1e6:8.1f}M pairs/s  ({dt*1e3:.1f} ms)")

        # pallas tile sweep — large q/s tiles cut HBM re-streaming:
        # traffic ~= ns_tiles*Q_bytes + nq_tiles*S_bytes. On TPU f32
        # operands are demoted to bf16 streams inside the kernel
        # (ops/knn_pallas._should_demote), so tile bytes use itemsize 2;
        # the kernel raises the scoped-vmem limit to 96 MB, so the f32
        # accumulator can be tens of MB.
        from ganleaks_tpu.ops.knn_pallas import _should_demote, _vmem_estimate
        stream_dt = (jnp.bfloat16 if jax.default_backend() == "tpu"
                     else dtype)
        # mirror the streamed attack path: f32 embeddings are held as bf16
        # STREAMS with separate f32 norms (knn_argmin_streamed does this
        # hoisting), so the kernel never holds f32+bf16 copies at once
        if _should_demote(dtype):
            norm = jax.jit(lambda x: jnp.sum(
                jnp.square(x.astype(jnp.float32)), axis=1))
            cast = jax.jit(lambda x: x.astype(jnp.bfloat16))
            rq_a, rs_a = norm(q), norm(s)
            # demote sequentially, freeing each f32 original before the
            # next cast — both copies at once would exceed HBM at 512k dims
            qb_ = cast(q)
            jax.block_until_ready(qb_)
            del q
            q = qb_
            sb_ = cast(s)
            jax.block_until_ready(sb_)
            del s
            s = sb_
            jax.block_until_ready((rq_a, rs_a))
        else:
            rq_a = rs_a = None
        for (qb, sb, kb) in ((2048, 512, 256), (2048, 512, 512),
                             (2048, 1024, 512), (2048, 2048, 512),
                             (2048, 2048, 1024), (2048, 4096, 256),
                             (2048, 4096, 512), (2048, 8192, 256),
                             (2048, 8192, 512), (4096, 2048, 512),
                             (1024, 2048, 512), (2048, 2048, 256)):
            if _vmem_estimate(qb, sb, kb, stream_dt) > 88 << 20:
                continue
            try:
                dt = bench_fn(
                    lambda q=q, s=s, qb=qb, sb=sb, kb=kb:
                    knn_argmin_pallas(q, s, q_block=qb, s_block=sb,
                                      k_block=kb, vmem_clamp=False,
                                      rq=rq_a, rs=rs_a),
                    reps=args.reps)
            except Exception as e:
                print(f"pallas {dtype.__name__:9s} ({qb},{sb},{kb}) "
                      f"FAILED: {type(e).__name__}: {str(e)[:120]}")
                continue
            results.append((f"pallas/{dtype.__name__}/{qb}x{sb}x{kb}",
                            pairs / dt))
            print(f"pallas {dtype.__name__:9s} ({qb:4d},{sb:4d},{kb:4d})  "
                  f"{pairs/dt/1e6:8.1f}M pairs/s  ({dt*1e3:.1f} ms)")

    results.sort(key=lambda r: -r[1])
    print("\n# top 5:")
    for name, rate in results[:5]:
        print(f"#   {name}: {rate/1e6:.1f}M pairs/s")


if __name__ == "__main__":
    main()
