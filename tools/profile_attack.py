"""Stage-decomposed timing of the fbb attack core on the local chip.

Answers "where does the wall-clock go" without a trace viewer: times the
LPIPS featurize (tower+norms+cast, the streamed driver's compiled unit)
and the distance fold (per-part dot_general + argmin) separately at the
bench shapes, then compares their sum with the end-to-end streamed
search. All timings follow the tunnel discipline (docs/PERF.md):
device-resident inputs, one readback sync per measurement, RTT
subtracted.

    python tools/profile_attack.py --n_q 2000 --n_syn 20000
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

RTT = 0.040  # measured device->host readback latency on the tunnel


def _sync(x) -> None:
    np.asarray(x[(0,) * getattr(x, "ndim", 0)])


def timed(fn, *args, reps: int = 3) -> float:
    fn(*args)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _sync(leaf)
    return max(time.perf_counter() - t0 - RTT, 1e-9) / reps


def main() -> None:
    from ganleaks_tpu.cli.common import enable_persistent_compilation_cache
    from ganleaks_tpu.ops.distance import make_embed_parts_fn
    from ganleaks_tpu.ops.knn import (
        _fold_block_parts, _fused_parts_norms, knn_argmin_streamed_parts)
    from ganleaks_tpu.ops.lpips import default_lpips_params, lpips_embed_parts_fn

    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_q", type=int, default=2000)
    ap.add_argument("--n_syn", type=int, default=20000)
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--res", type=int, default=64)
    args = ap.parse_args()

    params = default_lpips_params("vgg")
    embed = make_embed_parts_fn(
        "l2-lpips", lpips_embed_parts_fn(params, weight=0.2,
                                         dtype=jnp.bfloat16,
                                         compute_dtype=jnp.bfloat16),
        dtype=jnp.bfloat16)
    fused = _fused_parts_norms(embed, jnp.bfloat16)

    B = args.block
    make = jax.jit(lambda key, n: jax.random.uniform(
        key, (n, args.res, args.res, 3), jnp.float32, -1, 1
        ).astype(jnp.bfloat16), static_argnums=(1,))
    blk = make(jax.random.key(0), B)
    _sync(blk)

    # --- featurize rate (the streamed driver's compiled unit) ---
    t = timed(fused, blk)
    img_rate = B / t
    print(f"featurize: {t*1e3:8.1f} ms / {B} imgs  -> {img_rate:,.0f} "
          f"imgs/s")

    # --- fold rate (per-part dots + argmin, one (B x B) tile) ---
    q_parts, rq = fused(blk)
    s_parts, rs = fused(make(jax.random.key(1), B))
    run = (jnp.full((B,), jnp.inf, jnp.float32),
           jnp.zeros((B,), jnp.int32))
    _sync(rq)
    k_dim = sum(int(np.prod(p.shape[1:])) for p in q_parts)

    def fold(rm, ri):
        return _fold_block_parts(rm, ri, q_parts, rq, s_parts, rs, 0,
                                 jnp.asarray(B))

    t = timed(fold, *run, reps=8)
    tf = 2 * B * B * k_dim / t / 1e12
    pair_rate = B * B / t
    print(f"fold:      {t*1e3:8.1f} ms / {B}x{B} tile (K={k_dim}) -> "
          f"{tf:6.1f} TF/s, {pair_rate/1e6:,.1f}M pairs/s")

    # --- projected vs measured end-to-end ---
    n_q, n_s = args.n_q, args.n_syn
    feat = (n_q + n_s) / img_rate
    fold_t = n_q * n_s / pair_rate
    print(f"projected: featurize {feat:6.2f} s + fold {fold_t:6.2f} s "
          f"= {feat+fold_t:6.2f} s")

    syn = make(jax.random.key(2), n_s)
    queries = make(jax.random.key(3), n_q)
    _sync(syn)
    # discard run 0: first execution of a new jit chain on this backend
    # can be ~15 s even after compile (see memory/PERF notes)
    d, _ = knn_argmin_streamed_parts(embed, queries, syn, q_block=B,
                                     s_block=B)
    _sync(d)
    t0 = time.perf_counter()
    d, i = knn_argmin_streamed_parts(embed, queries, syn, q_block=B,
                                     s_block=B)
    _sync(d)
    dt = time.perf_counter() - t0 - RTT
    print(f"measured end-to-end: {dt:6.2f} s "
          f"({n_q*n_s/dt/1e6:,.1f}M pairs/s) — gap "
          f"{dt - feat - fold_t:+.2f} s")


if __name__ == "__main__":
    main()
