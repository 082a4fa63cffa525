"""Full-black-box membership-inference attack (reference:
``attack_models/fbb.py``).

For each query image (member 'pos' / non-member 'neg'), the score is the
negated distance to its nearest neighbor in the generated set under
``l2`` or ``l2 + 0.2*LPIPS`` (``utils.py:153-177``). The reference runs an
O(N_q * N_s) python loop nest with a full LPIPS forward per pair and one
host sync per query (``fbb.py:73-88,156-171``); here the whole search is a
device-resident blocked matmul over distance embeddings (``ops/distance``,
``ops/knn``), optionally sharded over the generated-set axis across a TPU
mesh (``parallel/knn_shard``).

Artifacts (byte-compatible with the reference):
  ``pos_loss.npy``/``neg_loss.npy``  (N, 1) float64 nearest distances;
  ``pos_idx.npy``/``neg_idx.npy``    sequential 0..N-1 — the reference
      saves these counters, not the NN indices (``fbb.py:162,171``; the
      neg file even reuses ``len(pos_loss)``) — replicated for
      cross-validation, with the TRUE indices additionally saved as
      ``pos_nn_idx.npy``/``neg_nn_idx.npy``;
  closest-pair PNGs for the first 20 queries (``fbb.py:91-106``);
  ``params.txt``/``params.pkl``.
"""

from __future__ import annotations

import os
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image

from ganleaks_tpu.config import AttackConfig
from ganleaks_tpu.io.artifacts import check_folder, dump_params, save_files
from ganleaks_tpu.io.images import to_uint8
from ganleaks_tpu.ops.distance import make_embed_fn
from ganleaks_tpu.ops.knn import knn_argmin_streamed, truncate_to_batches
from ganleaks_tpu.utils.logging import MetricsLogger, Throughput


def resolve_save_dir(cfg: AttackConfig) -> str:
    """``check_args`` save-dir layout (``fbb.py:42-67``)."""
    if cfg.params is not None and cfg.hyperparameter_search:
        subdir = cfg.syn_data_path.rstrip("/")
        exp_name = cfg.exp_name + "__" + subdir.split("/")[-2]
        save_dir = os.path.join(os.getcwd(), cfg.save_root, exp_name,
                                cfg.params)
    else:
        save_dir = os.path.join(os.getcwd(), cfg.save_root, cfg.exp_name)
    return check_folder(save_dir)


def build_embed_fn(cfg: AttackConfig, dtype=None, structured: bool = False):
    """Distance featurizer for the configured metric. ``structured=True``
    returns the parts form (list of tower-native tap layouts) for the
    'taps' engine — no flat relayout (``ops/distance.make_embed_parts_fn``)."""
    from ganleaks_tpu.ops.distance import make_embed_parts_fn
    dtype = dtype or jnp.dtype(cfg.dtype)
    maker = make_embed_parts_fn if structured else make_embed_fn
    if cfg.distance == "l2":
        return maker("l2", dtype=dtype)
    if cfg.distance != "l2-lpips":
        raise ValueError(f"unknown distance {cfg.distance!r}; "
                         "expected 'l2' or 'l2-lpips'")
    from ganleaks_tpu.ops.lpips import (
        default_lpips_params, load_lpips_params, lpips_embed_fn,
        lpips_embed_parts_fn)
    if cfg.lpips_weights:
        params = load_lpips_params(cfg.lpips_weights)
    else:
        params = default_lpips_params(cfg.lpips_net)
    cdt = jnp.dtype(cfg.lpips_compute_dtype) if cfg.lpips_compute_dtype \
        else None
    lp_maker = lpips_embed_parts_fn if structured else lpips_embed_fn
    return maker(
        "l2-lpips",
        lp_maker(params, weight=0.2, dtype=dtype, compute_dtype=cdt),
        dtype=dtype)


def resolve_auto_engine(cfg: AttackConfig) -> AttackConfig:
    """``engine='auto'``: pick the fastest configuration for the current
    backend. On TPU that is the quickstart throughput recipe — taps-int8
    parts with the bf16 tower (rigorously bounded score error,
    docs/PERF.md; add ``two_pass=True`` for certified-exact indices) —
    degraded to the bf16 'taps' recipe where int8 is infeasible at this
    input shape (the s32 dot bound is shape-dependent: at large
    resolutions a part's cross dot can reach 2^31 and
    ``ops/knn._part_bounds_for`` refuses; 'auto' must not pick a config
    that dies after data load, while an EXPLICIT engine='taps-int8'
    still raises loudly there). Anywhere else (CPU golden/parity runs)
    it is the reference-parity f32 gemm fold. A non-'auto' config passes
    through untouched."""
    if cfg.engine != "auto":
        return cfg
    if jax.default_backend() != "tpu":
        return replace(cfg, engine="gemm")
    cfg = replace(cfg, engine="taps-int8", dtype="bfloat16",
                  lpips_compute_dtype=cfg.lpips_compute_dtype
                  or "bfloat16")
    from ganleaks_tpu.ops.knn import _part_bounds_for
    probe = jax.ShapeDtypeStruct(
        (1, cfg.resolution, cfg.resolution, 3),
        jnp.uint8 if cfg.uint8_storage else jnp.float32)
    try:
        _part_bounds_for(build_embed_fn(cfg, structured=True), probe)
    except ValueError:
        cfg = replace(cfg, engine="taps")
    return cfg


def host_stream_enabled(cfg: AttackConfig, mesh=None) -> bool:
    """Resolve ``cfg.host_stream``. 'auto' (the default) turns the
    pipelined host ingest on exactly where it measured strictly better
    (docs/PERF.md "Real-data end-to-end"): single-chip runs with uint8
    storage. A mesh places its own device shardings, and f32 storage
    would pay 4x the bytes on every per-chunk re-ship. A PINNED
    host_stream=true on a mesh run raises instead of being silently
    dropped (the config documents true/false as pins)."""
    on_mesh = mesh is not None or cfg.n_chips > 1 or cfg.multihost
    hs = cfg.host_stream
    if isinstance(hs, str):
        if hs.strip().lower() == "auto":
            return not on_mesh and bool(cfg.uint8_storage)
        raise ValueError(f"host_stream must be true/false/'auto', "
                         f"got {hs!r}")
    if hs and on_mesh:
        raise ValueError(
            "host_stream=true is single-chip only (the mesh drivers "
            "place their own device shardings); use host_stream='auto' "
            "or n_chips=1 — silently ignoring the pin would betray the "
            "config")
    return bool(hs)


def attack_arrays(cfg: AttackConfig, syn: np.ndarray, pos: np.ndarray,
                  neg: np.ndarray, mesh=None,
                  logger: MetricsLogger | None = None,
                  sweep_cache: dict | None = None) -> dict:
    """Run the attack on in-memory NHWC [-1,1] arrays. Returns losses and
    true NN indices for both query sets.

    Both query sets go through ONE synthetic sweep (concatenated on the
    query axis, split after): per-query results are independent, and the
    expensive part — featurizing the whole generated set — would
    otherwise run twice (the reference's two loops, ``fbb.py:156-171``).

    ``sweep_cache`` (opt-in; ``run_attack`` passes one dict across all
    hyperparameter-search subdirs, ``fbb.py:113-123``) carries the
    sweep-invariant device state between calls: the built embed closures
    (whose per-closure jit caches would otherwise recompile the LPIPS
    tower per subdir) and the featurized QUERY embedding caches
    (``ops/knn``/``parallel/knn_shard`` ``query_reuse``) — on every
    path that owns one: single-chip streamed, mesh-sharded, ring
    (per-chip sharded cache), and both two-pass modes (separate lo /
    re-rank holders) — since the query sets do not change across
    subdirs. The CALLER must pass the same pos/neg arrays every call
    (run_attack loads them once); the engines double-check shape + a
    first-row hash."""
    logger = logger or MetricsLogger(echo=False)
    if cfg.shard_layout not in ("sharded", "ring"):
        raise ValueError(f"shard_layout must be 'sharded' or 'ring', "
                         f"got {cfg.shard_layout!r}")
    if cfg.engine == "auto":
        cfg = resolve_auto_engine(cfg)
        logger.log({"engine_resolved": cfg.engine, "dtype": cfg.dtype})
    # each embed closure is built ONCE — the per-closure compile caches
    # (fused embed+norms, mesh shard_map wrappers) live on the closure
    # object, so rebuilding per search() would recompile the whole tower
    # for the neg query set (~40s apiece on remote-compile backends) —
    # and ONLY for the branch the selected engine reads: every build
    # loads the LPIPS weights, and the flat form is dead on the
    # structured and two-pass paths
    structured = cfg.engine in ("taps", "taps-int8")
    embed_key = (cfg.engine, cfg.dtype, cfg.lpips_compute_dtype,
                 cfg.two_pass, cfg.distance, cfg.lpips_net,
                 cfg.lpips_weights)
    if sweep_cache is not None \
            and sweep_cache.get("embed_key") == embed_key:
        embed, embed_struct, embed_lo, embed_hi = sweep_cache["embeds"]
    else:
        embed = embed_struct = embed_lo = embed_hi = None
        if cfg.two_pass:
            lo_cfg = replace(cfg, dtype="bfloat16",
                             lpips_compute_dtype="bfloat16")
            hi_cfg = replace(cfg, dtype="float32",
                             lpips_compute_dtype=None)
            embed_lo = build_embed_fn(lo_cfg, structured=structured)
            embed_hi = build_embed_fn(hi_cfg)
        elif structured:
            embed_struct = build_embed_fn(cfg, structured=True)
        else:
            embed = build_embed_fn(cfg)
        if sweep_cache is not None:
            # a changed embedding invalidates every held QUERY cache
            # too: the reuse fingerprints hash the RAW query images,
            # not the embedding, so caches built under the old weights/
            # dtype would silently satisfy the fingerprint check
            for k in ("query_reuse", "query_reuse_lo", "query_reuse_hi"):
                sweep_cache.pop(k, None)
            sweep_cache["embed_key"] = embed_key
            sweep_cache["embeds"] = (embed, embed_struct,
                                     embed_lo, embed_hi)
    # cross-subdir query-embedding reuse, on every path that owns a
    # query cache: the single-pass engines (single-chip, mesh-sharded
    # and ring) share one holder, and the two-pass modes get separate
    # holders for the pass-1 (lo-precision) and re-rank (f32) caches —
    # their fingerprints differ, so one dict would evict the other every
    # call. The ring layout reuses its per-chip SHARDED cache (and skips
    # re-shipping the query images).
    query_reuse = reuse_lo = reuse_hi = None
    if sweep_cache is not None:
        if cfg.two_pass:
            reuse_lo = sweep_cache.setdefault("query_reuse_lo", {})
            reuse_hi = sweep_cache.setdefault("query_reuse_hi", {})
        else:
            query_reuse = sweep_cache.setdefault("query_reuse", {})

    if cfg.drop_remainder:  # strict parity with fbb.py:77
        k = truncate_to_batches(len(syn), cfg.BATCH_SIZE)
        syn = syn.limit(k) if hasattr(syn, "limit") else syn[:k]

    # host_stream (single-chip): keep the sets HOST-side; the streamed
    # engines slice them per block so decode + host->device shipping
    # overlap the device search, and neither set occupies HBM for the
    # run (io/stream.HostImageSet; the planner charges host inputs 0).
    # The mesh drivers place their own shardings — they take arrays.
    host_side = host_stream_enabled(cfg, mesh)
    syn_j = syn if host_side else jnp.asarray(syn)
    cache_bytes = int(cfg.query_cache_gb * (1 << 30))
    meter = Throughput()

    def search(queries: np.ndarray):
        q_j = queries if host_side else jnp.asarray(queries)
        if mesh is not None and cfg.shard_layout == "ring":
            # >HBM layout: both sets sharded, featurize-once, EMBEDDED
            # blocks rotate over ICI (parallel/knn_shard streamed ring);
            # supports every engine incl. taps/taps-int8
            if cfg.two_pass:
                raise ValueError("two_pass + shard_layout='ring' is not "
                                 "supported; use shard_layout='sharded' "
                                 "(silently ignoring either flag would "
                                 "betray the config)")
            from ganleaks_tpu.parallel.knn_shard import (
                knn_argmin_ring_streamed)
            d, i = knn_argmin_ring_streamed(
                embed_struct if structured else embed, q_j, syn_j, mesh,
                engine=cfg.engine, q_block=cfg.query_block,
                s_block=cfg.syn_block, query_reuse=query_reuse)
        elif mesh is not None and cfg.two_pass:
            # sharded streamed pass 1, replicated exact re-rank, runtime
            # exactness certificate (parallel/knn_shard)
            from ganleaks_tpu.parallel.knn_shard import (
                knn_argmin_two_pass_mesh)
            d, i = knn_argmin_two_pass_mesh(
                embed_lo, embed_hi, q_j, syn_j, mesh,
                k=cfg.two_pass_k, engine=cfg.engine,
                q_block=cfg.query_block, s_block=cfg.syn_block,
                query_cache_bytes=cache_bytes,
                query_reuse=reuse_lo, rerank_reuse=reuse_hi)
        elif mesh is not None:
            # mesh at single-chip engine parity: each chip featurizes only
            # its shard, chunked replicated query cache, bf16 streams,
            # OOM resume; 'taps' keeps its structured parts per shard
            from ganleaks_tpu.parallel.knn_shard import (
                knn_argmin_sharded_streamed)
            d, i = knn_argmin_sharded_streamed(
                embed_struct if structured else embed, q_j, syn_j, mesh,
                engine=cfg.engine, q_block=cfg.query_block,
                s_block=cfg.syn_block, query_cache_bytes=cache_bytes,
                query_reuse=query_reuse)
        elif cfg.two_pass:
            # exact-index throughput mode: reduced-precision tower
            # candidates + f32 re-rank at precision='highest' with the
            # runtime exactness certificate (ops/knn.knn_argmin_two_pass)
            from ganleaks_tpu.ops.knn import knn_argmin_two_pass
            d, i = knn_argmin_two_pass(
                embed_lo, embed_hi, q_j,
                syn_j, k=cfg.two_pass_k, engine=cfg.engine,
                q_block=cfg.query_block, s_block=cfg.syn_block,
                query_cache_bytes=cache_bytes,
                query_reuse=reuse_lo, rerank_reuse=reuse_hi)
        elif structured:
            # tap-structured embeddings: no flat relayout (docs/PERF.md);
            # 'taps-int8' streams int8 parts with static rigorous scales
            # (2.36x MXU rate, half the cache bytes; quantized scores —
            # add two_pass=True for certified exact results)
            from ganleaks_tpu.ops.knn import knn_argmin_streamed_parts
            d, i = knn_argmin_streamed_parts(
                embed_struct, q_j, syn_j,
                q_block=cfg.query_block, s_block=cfg.syn_block,
                quantize=cfg.engine == "taps-int8",
                query_cache_bytes=cache_bytes,
                query_reuse=query_reuse)
        else:
            d, i = knn_argmin_streamed(embed, q_j, syn_j,
                                       engine=cfg.engine,
                                       q_block=cfg.query_block,
                                       s_block=cfg.syn_block,
                                       query_cache_bytes=cache_bytes,
                                       query_reuse=query_reuse)
        jax.block_until_ready(d)
        meter.add(len(queries) * len(syn))
        # the ring layout returns P(axis)-sharded results: on one host
        # np.asarray is fine, across hosts the shards must be gathered
        from ganleaks_tpu.parallel.multihost import gather_to_host
        return gather_to_host(d).astype(np.float64), gather_to_host(i)

    loss, nn = search(np.concatenate([pos, neg], axis=0))
    pos_loss, neg_loss = loss[:len(pos)], loss[len(pos):]
    pos_nn, neg_nn = nn[:len(pos)], nn[len(pos):]
    logger.log({"query_pairs_per_sec": meter.rate(),
                "n_syn": len(syn), "n_pos": len(pos), "n_neg": len(neg)})
    return {"pos_loss": pos_loss, "pos_nn_idx": pos_nn,
            "neg_loss": neg_loss, "neg_nn_idx": neg_nn,
            "query_pairs_per_sec": meter.rate()}


def plot_closest_images(nn_idx: np.ndarray, queries: np.ndarray,
                        syn: np.ndarray, save_dir: str, class_type: str,
                        num: int = 20) -> None:
    """Query|NN side-by-side PNGs (``fbb.py:91-106``). Accepts [-1,1]
    floats or raw uint8 (the lossless device-storage form). uint8 input
    is routed through the SAME f64 scale + floor-truncate chain the
    float pipeline uses (``np.uint8(img*255)``, ``fbb.py:106``), so the
    plot artifacts are byte-identical regardless of storage mode — a
    uint8 shortcut would write x where the reference writes x-1 for
    half the byte values (floor of the re-scaled float)."""
    num = min(num, len(queries))
    for i in range(num):
        pair = np.concatenate([queries[i], syn[int(nn_idx[i])]], axis=1)
        if pair.dtype == np.uint8:
            pair = (2.0 * (pair.astype(np.float64) / 255.0)
                    - 1.0).astype(np.float32)
        pair = to_uint8(pair, drange=(-1, 1))
        PIL.Image.fromarray(pair).save(
            os.path.join(save_dir, f"{i}{class_type}.png"))


def run_attack(cfg: AttackConfig, mesh=None) -> list[dict]:
    """Full driver incl. the hyperparameter-search directory sweep
    (``fbb.py:111-179``). ``cfg.n_chips > 1`` builds a 1-D mesh and shards
    the generated set (or both sets with shard_layout='ring')."""
    if cfg.multihost:
        # wire up jax.distributed BEFORE any device enumeration; after
        # this jax.devices() is the GLOBAL list on every process and the
        # mesh below spans hosts (ICI within a slice, DCN across)
        from ganleaks_tpu.parallel.multihost import initialize
        initialize()
    if mesh is None and cfg.n_chips > 1:
        from ganleaks_tpu.parallel.multihost import global_mesh
        mesh = global_mesh(cfg.n_chips)  # spans hosts after initialize()
    if cfg.hyperparameter_search:
        root = cfg.syn_data_path
        # skip hidden dirs: a prior non-sweep run over ``root`` leaves a
        # ``.ganleaks_decoded`` cache dir (io/diskcache) that must not
        # become a sweep experiment (the reference enumerates everything,
        # fbb.py:113-118, but never plants dot-dirs)
        subdirs = sorted(
            os.path.join(root, o) for o in os.listdir(root)
            if os.path.isdir(os.path.join(root, o))
            and not o.startswith("."))
    else:
        subdirs = [cfg.syn_data_path]

    results = []
    # sweep-invariant state shared across subdirs: query arrays loaded
    # once (the reference re-reads both query dirs per subdir,
    # fbb.py:139-145), embed closures built once, and the featurized
    # query-embedding cache reused (attack_arrays docstring)
    sweep_cache: dict | None = {} if len(subdirs) > 1 else None
    pos = neg = None
    for subdir in subdirs:
        sub_cfg = replace(
            cfg, syn_data_path=subdir,
            params=(subdir.rstrip("/").split("/")[-1]
                    if cfg.hyperparameter_search else cfg.params))
        # resolve 'auto' BEFORE the params dump: the artifact must record
        # the configuration that actually produced the results (engine,
        # dtype), or a reproduction from params.txt on another backend
        # silently runs a different search
        was_auto = sub_cfg.engine == "auto"
        sub_cfg = resolve_auto_engine(sub_cfg)
        # SPMD contract: every process runs the same search; only
        # process 0 touches the (possibly shared) filesystem
        is_main = jax.process_index() == 0
        save_dir = resolve_save_dir(sub_cfg) if is_main else ""
        if is_main:
            dump_params(save_dir, sub_cfg)
        logger = MetricsLogger(os.path.join(save_dir, "metrics.jsonl")
                               if is_main else None, echo=is_main)
        if was_auto:  # attack_arrays sees the resolved cfg; keep the
            # engine_resolved record in metrics.jsonl (it logged this
            # before resolution moved up for params-dump provenance)
            logger.log({"engine_resolved": sub_cfg.engine,
                        "dtype": sub_cfg.dtype})

        from ganleaks_tpu.io.native import load_image_dir_native
        from ganleaks_tpu.io.npz import (load_npz_images,
                                         resolve_input_format)

        # uint8 storage (default) is lossless — the dequant LUT
        # reproduces the float pipeline bit-exactly
        # (ops/distance.images_unit_range) — and quarters both the
        # host->device transfer and the image HBM residency
        dt = np.uint8 if sub_cfg.uint8_storage else np.float32

        def _load(path, limit=None, streamable=False):
            # per-path format resolution: the reference dumps each
            # synthetic set both as a PNG dir and an NPZ array
            # (train_torch.py:160-165); ingesting the NPZ skips the
            # host decode entirely (io/npz docstring, bit-identical)
            if resolve_input_format(path, sub_cfg.input_format) == "npz":
                return load_npz_images(path, sub_cfg.resolution,
                                       limit=limit, dtype=dt)
            if streamable and host_stream_enabled(sub_cfg, mesh):
                # pipelined ingest: the generated set decodes lazily
                # block by block WITH readahead inside the streamed
                # search, so PNG decode + shipping overlap the device
                # featurize/fold instead of serializing in front of it
                # (io/stream); decoded rows persist across runs via the
                # disk cache (io/diskcache)
                from ganleaks_tpu.io.stream import HostImageSet
                return HostImageSet(path, sub_cfg.resolution, dtype=dt,
                                    disk_cache=sub_cfg.decode_cache)
            from ganleaks_tpu.io.diskcache import load_image_dir_cached
            return load_image_dir_cached(path, sub_cfg.resolution,
                                         limit=limit, dtype=dt,
                                         policy=sub_cfg.decode_cache)

        syn = _load(subdir, streamable=True)
        if pos is None:  # query sets are subdir-invariant: load once
            pos = _load(sub_cfg.pos_data_dir, limit=sub_cfg.data_num)
            neg = _load(sub_cfg.neg_data_dir, limit=sub_cfg.data_num)

        out = attack_arrays(sub_cfg, syn, pos, neg, mesh=mesh,
                            logger=logger, sweep_cache=sweep_cache)

        if is_main:
            seq_pos = np.arange(len(out["pos_loss"])).reshape(-1, 1)
            save_files(save_dir,
                       ["pos_loss", "pos_idx", "pos_nn_idx"],
                       [out["pos_loss"].reshape(-1, 1), seq_pos,
                        out["pos_nn_idx"].reshape(-1, 1)])
            # reference reuses len(pos_loss) for the neg counter (fbb.py:171)
            save_files(save_dir,
                       ["neg_loss", "neg_idx", "neg_nn_idx"],
                       [out["neg_loss"].reshape(-1, 1), seq_pos,
                        out["neg_nn_idx"].reshape(-1, 1)])

            if sub_cfg.save_plots:
                plot_closest_images(out["pos_nn_idx"], pos, syn,
                                    save_dir, "pos")
                plot_closest_images(out["neg_nn_idx"], neg, syn,
                                    save_dir, "neg")
        out["save_dir"] = save_dir
        results.append(out)
        logger.close()
    return results
