"""Static HBM budget + sweep-count projection for an fbb attack config.

Answers, before touching a chip: will (n_q x n_syn) at this resolution
fit next to the query-embedding cache, and how many synthetic featurize
sweeps will the streamed search make? The numbers come from the SAME
accounting the engines use (``ops/knn._phys_row_bytes`` lane-padded
bytes, ``_stream_search``'s chunk_rows formula), so the projection
matches what actually allocates — this is the sizing arithmetic behind
docs/PERF.md's north-star runs (the reference has no counterpart; its
whole set simply had to fit one GPU, ``attack_models/fbb.py:133-145``).

    python tools/hbm_projection.py --n_q 20000 --n_syn 100000 \
        --engine taps-int8 --store uint8 --cache_gb 8 [--hbm_gb 16]

Pure host arithmetic + ``jax.eval_shape`` — runs anywhere, no device.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gb(x: float) -> str:
    return f"{x / (1 << 30):7.2f} GiB"


def project(n_q: int, n_syn: int, resolution: int, engine: str,
            dtype: str, store: str, cache_gb: float,
            q_block: int, s_block: int, hbm_gb: float,
            distance: str = "l2-lpips", lpips_net: str = "vgg") -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ganleaks_tpu.attack.fbb import build_embed_fn
    from ganleaks_tpu.config import AttackConfig
    from ganleaks_tpu.ops.knn import _auto_stream_plan, _phys_row_bytes

    structured = engine in ("taps", "taps-int8")
    # the SAME featurizer construction the attack driver uses (weight,
    # net, flat-vs-parts wiring) — a local copy would drift silently
    embed = build_embed_fn(
        AttackConfig(distance=distance, dtype=dtype, engine=engine,
                     lpips_net=lpips_net),
        structured=structured)

    img = jax.ShapeDtypeStruct((1, resolution, resolution, 3),
                               jnp.uint8 if store == "uint8"
                               else jnp.dtype(store))
    probe = jax.eval_shape(embed, img)
    probe = list(probe) if isinstance(probe, (list, tuple)) else [probe]

    # cache row bytes at the STREAM dtype (what _stream_search caches) on
    # the TPU this tool sizes for: int8 for taps-int8; otherwise f32
    # embeddings demote to a bf16 stream ON TPU (_stream_demote — this
    # process is pinned to CPU, so mirror the decision rather than call
    # it), and bf16 stays bf16
    if engine == "taps-int8":
        cdtype = jnp.int8
    elif jnp.dtype(probe[0].dtype).itemsize >= 4:
        cdtype = jnp.bfloat16  # _stream_demote on the TPU target
    else:
        cdtype = probe[0].dtype
    row = _phys_row_bytes([tuple(p.shape[1:]) for p in probe],
                          jnp.dtype(cdtype).itemsize)

    img_bytes = {"uint8": 1, "bfloat16": 2, "float32": 4}[store]
    # images: lane padding applies to the minor (=3 channel) axis on
    # device only when stored as the raw NHWC array; XLA keeps c=3 minor
    # padded to 128 lanes ONLY for <2D-tiled layouts — measured residency
    # tracks the logical bytes for big NHWC pools, so report logical.
    images = (n_q + n_syn) * resolution * resolution * 3 * img_bytes

    # run the LIVE planner (ops/knn._auto_stream_plan) with the target
    # HBM capacity: the projection cannot drift from the engines' own
    # accounting (one-sweep upgrade, over-ask capping, the wide-row
    # 3-block stream charge — drift here previously printed 'fits' for
    # configs the calibrated planner rejects)
    class _Stub:  # shape/ndim/nbytes carrier; not a jax.Array (so the
        # planner treats it as the tool's explicit resident_bytes says)
        def __init__(self, shape, itemsize):
            self.shape = shape
            self.ndim = len(shape)
            self.nbytes = int(np.prod(shape)) * itemsize

    q_stub = _Stub((n_q, resolution, resolution, 3), img_bytes)
    s_stub = _Stub((n_syn, resolution, resolution, 3), img_bytes)
    act_itemsize = max(2, jnp.dtype(probe[0].dtype).itemsize)
    hbm = int(hbm_gb * (1 << 30))
    cache_bytes, sb, q_block = _auto_stream_plan(
        q_stub, s_stub, row, q_block=q_block, s_block=s_block,
        cache_bytes=int(cache_gb * (1 << 30)), resident_bytes=images,
        act_itemsize=act_itemsize, hbm_bytes=hbm)

    chunk_rows = max(q_block, (cache_bytes // max(1, row))
                     // q_block * q_block)
    padded = n_q + (-n_q) % q_block
    eff_chunk = min(chunk_rows, padded)
    sweeps = -(-n_q // chunk_rows)

    cache = eff_chunk * row
    stream_blocks = 2 if row <= (1 << 20) else 3  # planner's wide-row rule
    sblock_stream = sb * row
    fold_state = padded * (4 + 4)  # f32 best-distance + i32 argmin
    # featurize working set: the VGG tower's widest activation for one
    # block (N, res, res, 64), x2 for XLA's producer+consumer overlap —
    # the planner's own act charge
    tower_act = (max(q_block, sb) * resolution * resolution * 64
                 * act_itemsize * 2)

    total = (images + cache + stream_blocks * sblock_stream
             + fold_state + tower_act)
    return {
        "row_bytes": row, "chunk_rows": chunk_rows, "sweeps": sweeps,
        "planned_cache": cache_bytes, "planned_s_block": sb,
        "images": images, "cache": cache,
        "stream": stream_blocks * sblock_stream,
        "fold": fold_state, "tower": tower_act, "total": total,
        "hbm": hbm,
        "fits": total <= hbm * 0.92,  # runtime reserve
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_q", type=int, default=20000)
    ap.add_argument("--n_syn", type=int, default=100000)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--engine", default="taps-int8",
                    choices=["gemm", "taps", "taps-int8"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--store", default="uint8",
                    choices=["uint8", "bfloat16", "float32"])
    ap.add_argument("--cache_gb", type=float, default=8.0)
    ap.add_argument("--q_block", type=int, default=2048)
    ap.add_argument("--s_block", type=int, default=2048)
    ap.add_argument("--hbm_gb", type=float, default=16.0,
                    help="per-chip HBM (v5e 16, v4 32, v5p 95)")
    args = ap.parse_args(argv)

    # pure host arithmetic + eval_shape: pin the CPU backend so the tool
    # never initializes an accelerator (the image's sitecustomize forces
    # jax_platforms='axon,cpu' even when JAX_PLATFORMS=cpu is exported,
    # and a dead TPU relay HANGS backend init)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    p = project(args.n_q, args.n_syn, args.resolution, args.engine,
                args.dtype, args.store, args.cache_gb, args.q_block,
                args.s_block, args.hbm_gb)
    print(f"config: {args.n_q}x{args.n_syn} @{args.resolution} "
          f"engine={args.engine} dtype={args.dtype} store={args.store} "
          f"cache={args.cache_gb}g")
    print(f"  cache row (lane-padded, stream dtype): {p['row_bytes']:,} B")
    print(f"  planner: cache {p['planned_cache'] / 2**30:.2f} GiB, "
          f"s_block {p['planned_s_block']}")
    print(f"  query chunk rows: {p['chunk_rows']:,}  ->  "
          f"synthetic featurize sweeps: {p['sweeps']}")
    print(f"  images (both sets, logical) {gb(p['images'])}")
    print(f"  query-embedding cache       {gb(p['cache'])}")
    print(f"  synthetic stream (in-flight) {gb(p['stream'])}")
    print(f"  fold state                  {gb(p['fold'])}")
    print(f"  tower activations (bound)   {gb(p['tower'])}")
    print(f"  TOTAL                       {gb(p['total'])}  of "
          f"{gb(p['hbm'])} HBM")
    print("  fits (with 8% runtime reserve):", p["fits"])
    if not p["fits"]:
        print("  -> shrink --cache_gb (more sweeps), use --store uint8, "
              "or shard over a mesh (parallel/knn_shard)")
    return 0 if p["fits"] else 1


if __name__ == "__main__":
    sys.exit(main())
