#!/usr/bin/env python
"""Headline benchmark: fbb LPIPS kNN attack throughput on TPU.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: LPIPS+L2 kNN query-pairs/sec, end to end (featurize + blocked
distance matmul + argmin), on the configured chip — the core computation of
``attack_models/fbb.py`` (whose measured torch-CPU throughput on this host
is ~15 query-pairs/sec; see BASELINE.md).

Usage:
    python bench.py            # full bench = the BASELINE north star
                               # (N_q=20000 x N_syn=100000 @64x64, uint8
                               # real-data residency, 10 GB query cache —
                               # the planner picks the one-sweep schedule)
    python bench.py --quick    # tiny smoke sizes
    python bench.py --n_q 2000 --n_syn 20000   # the pre-r3 default shape
    python bench.py --engine gemm|pallas
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# torch-CPU reference (single core, LPIPS VGG16 + L2 over 64-image batches,
# measured on this host 2026-08-16 — see BASELINE.md "measured baseline")
REFERENCE_CPU_PAIRS_PER_SEC = 15.0
# torch-CPU DCGAN sampling rate (single thread, quiet host, 512 images;
# tools/bench_reference_gen.py mirroring train_torch.py:138-174)
REFERENCE_CPU_GEN_IMAGES_PER_SEC = 240.0


def _sync(*arrays) -> None:
    """Force completion via a device->host readback: on the tunneled
    remote backend ``block_until_ready`` returns before execution
    finishes, so timing must end on an actual transfer. Single-element
    indexing (never ravel/reshape: that copies the whole array into a
    padded tiled layout — 42x blowup for NHWC c=3)."""
    for a in arrays:
        np.asarray(a[(0,) * a.ndim])


def run_bench(n_q: int, n_syn: int, resolution: int, engine: str,
              q_block: int, s_block: int, dtype: str,
              compute_dtype: str | None = None,
              two_pass: bool = False, two_pass_k: int = 4,
              store: str | None = None, cache_gb: float = 8.0) -> dict:
    from ganleaks_tpu.ops.distance import make_embed_fn, make_embed_parts_fn
    from ganleaks_tpu.ops.knn import (
        knn_argmin_streamed, knn_argmin_streamed_parts, knn_argmin_two_pass)
    from ganleaks_tpu.ops.lpips import (
        default_lpips_params, lpips_embed_fn, lpips_embed_parts_fn)

    # generate on device: the tunneled host->TPU link is ~13 MB/s.
    # store=None (default) resolves dtype-aware exactly like the old
    # hardcoded logic: bf16 images for the bf16 embedding mode (a no-op
    # for the bf16 tower, half the f32 HBM; the mode every recorded
    # BENCH number uses) and f32 images whenever the run is a parity
    # configuration (--dtype float32, or two_pass whose contract is
    # parity with the full f32 search) — so `--dtype float32` alone
    # still benchmarks true f32 pixels. store='uint8' is the attack
    # driver's real-data mode (cfg.uint8_storage): original bytes, 1/4
    # the f32 HBM, dequant inside the featurize jit
    # (ops/distance.images_unit_range) — ~10-15% slower than the bf16
    # cast at 2000x20000 (where the cache fits either way) but MATCHES
    # it at the 100k x 20k north star (measured 172.0M pairs/s = 11.6 s
    # with the 8 GB cache, 2026-08-17): there cache sweeps dominate,
    # and u8 is what lets real data fit next to the cache at all (f32
    # images would need 5.9 GB).
    if store is None:
        store = ("bfloat16"
                 if jnp.dtype(dtype) == jnp.bfloat16 and not two_pass
                 else "float32")
    if store == "uint8":
        def _mk(key, n):
            return jax.random.randint(
                key, (n, resolution, resolution, 3), 0, 256, jnp.int32
                ).astype(jnp.uint8)
    else:
        img_dtype = (jnp.bfloat16
                     if store == "bfloat16" and not two_pass
                     else jnp.float32)

        def _mk(key, n):
            return jax.random.uniform(
                key, (n, resolution, resolution, 3), jnp.float32, -1, 1
                ).astype(img_dtype)
    make = jax.jit(_mk, static_argnums=(1,))
    syn = make(jax.random.key(0), n_syn)
    queries = make(jax.random.key(1), n_q)
    _sync(syn, queries)
    cache_bytes = int(cache_gb * (1 << 30))

    params = default_lpips_params("vgg")
    cdt = jnp.dtype(compute_dtype) if compute_dtype else None
    embed = make_embed_fn("l2-lpips",
                          lpips_embed_fn(params, weight=0.2,
                                         dtype=jnp.dtype(dtype),
                                         compute_dtype=cdt),
                          dtype=jnp.dtype(dtype))

    if two_pass:
        # exact-index throughput mode: bf16 candidate pass + f32 rerank;
        # engine='taps'/'taps-int8' runs pass 1 on structured embeddings
        if engine in ("taps", "taps-int8"):
            embed_lo = make_embed_parts_fn(
                "l2-lpips", lpips_embed_parts_fn(params, weight=0.2,
                                                 dtype=jnp.bfloat16,
                                                 compute_dtype=jnp.bfloat16),
                dtype=jnp.bfloat16)
        else:
            embed_lo = make_embed_fn(
                "l2-lpips", lpips_embed_fn(params, weight=0.2,
                                           dtype=jnp.bfloat16,
                                           compute_dtype=jnp.bfloat16),
                dtype=jnp.bfloat16)

        # the re-rank pass must be the f32 parity tower regardless of the
        # CLI --dtype, or the advertised "exact f32 indices" is untrue
        embed_hi = make_embed_fn(
            "l2-lpips", lpips_embed_fn(params, weight=0.2,
                                       dtype=jnp.float32,
                                       compute_dtype=None),
            dtype=jnp.float32)

        def attack():
            d, i = knn_argmin_two_pass(embed_lo, embed_hi, queries, syn,
                                       k=two_pass_k, engine=engine,
                                       q_block=q_block, s_block=s_block,
                                       query_cache_bytes=cache_bytes)
            _sync(d, i)
            return d, i
    elif engine in ("taps", "taps-int8"):
        # structured embeddings: tower-native tap layouts, no flat
        # relayout; 'taps-int8' streams int8 parts (2.36x MXU rate)
        parts_embed = make_embed_parts_fn(
            "l2-lpips", lpips_embed_parts_fn(params, weight=0.2,
                                             dtype=jnp.dtype(dtype),
                                             compute_dtype=cdt),
            dtype=jnp.dtype(dtype))

        def attack():
            d, i = knn_argmin_streamed_parts(parts_embed, queries, syn,
                                             q_block=q_block,
                                             s_block=s_block,
                                             quantize=engine == "taps-int8",
                                             query_cache_bytes=cache_bytes)
            _sync(d, i)
            return d, i
    else:
        def attack():
            d, i = knn_argmin_streamed(embed, queries, syn, engine=engine,
                                       q_block=q_block, s_block=s_block,
                                       query_cache_bytes=cache_bytes)
            _sync(d, i)
            return d, i

    attack()  # compile warmup
    t0 = time.perf_counter()
    d, i = attack()
    dt = time.perf_counter() - t0
    pairs = n_q * n_syn
    return {"pairs_per_sec": pairs / dt, "seconds": dt,
            "n_q": n_q, "n_syn": n_syn,
            "check_min": float(jnp.min(d)), "check_idx": int(i[0])}


def run_gen_bench(num: int = 4096, batch: int = 512) -> dict:
    """Generator sampling throughput (BASELINE tracked metric
    'gen images/sec/chip'): full-width DCGAN, batched jit sampler."""
    from ganleaks_tpu.config import DCGANConfig
    from ganleaks_tpu.models.dcgan import Generator
    from ganleaks_tpu.train.dcgan import build_state
    from ganleaks_tpu.train.sample import sample_images

    cfg = DCGANConfig(ngf=64, nz=100)
    state = build_state(cfg, jax.random.key(0))
    gen = Generator(nz=cfg.nz, nc=cfg.nc, ngf=cfg.ngf)
    variables = {"params": state.gen.params,
                 "batch_stats": state.gen.batch_stats}
    sample_fn = lambda v, z: gen.apply(v, z, train=False)

    sample_images(sample_fn, variables, num, cfg.nz, batch,
                  jax.random.key(1))[1].block_until_ready()  # compile
    t0 = time.perf_counter()
    _, img = sample_images(sample_fn, variables, num, cfg.nz, batch,
                           jax.random.key(2))
    img.block_until_ready()
    dt = time.perf_counter() - t0
    return {"images_per_sec": num / dt, "seconds": dt, "num": num}


def resolve_defaults(*, quick: bool, n_q, n_syn, q_block, s_block,
                     cache_gb, store, two_pass: bool, dtype: str):
    """Resolve the CLI's None defaults into a concrete run config.

    The FULL default (no --quick, no explicit --n_q/--n_syn) is the
    BASELINE north star — 100k generated x 20k queries in the attack
    driver's real-data configuration: uint8 device residency + a 10 GB
    query-cache budget that the static planner (`ops/knn._auto_stream_plan`)
    turns into a one-sweep schedule (s_block 1024). Measured 204.6M
    pairs/s = 9.78 s attack, ~57 s bench wall incl. warmup with a warm
    compile cache (2026-08-18). Explicit sizes keep the pre-r3 behavior
    (store follows --dtype, 8 GB cache). Blocks default to the pallas
    kernel's (2048, 2048) tiles so its row padding is a no-op.
    Pure: unit-tested on CPU (tests/test_cli_config.py)."""
    north_star = not quick and n_q is None and n_syn is None
    if quick:
        dq, ds, dqb, dsb = 64, 512, 64, 256
    elif north_star:
        dq, ds, dqb, dsb = 20000, 100000, 2048, 2048
    else:
        # one size given explicitly: fill the OTHER with the pre-r3
        # default shape (2000x20000), never the 5-10x bigger north-star
        # sizes — `--n_q 2000` must keep meaning 2000x20000
        dq, ds, dqb, dsb = 2000, 20000, 2048, 2048
    n_q, n_syn = n_q or dq, n_syn or ds
    q_block, s_block = q_block or dqb, s_block or dsb
    if cache_gb is None:
        cache_gb = 10.0 if north_star else 8.0
    if north_star and store is None and not two_pass \
            and jnp.dtype(dtype) == jnp.bfloat16:
        store = "uint8"
    return n_q, n_syn, q_block, s_block, cache_gb, store


def _device_watchdog(timeout_s: float = 180.0) -> None:
    """Fail loudly if the device never answers, instead of hanging the
    caller forever: the tunneled TPU backend has been observed to wedge
    (connection accepted, no progress, ~0 CPU). One tiny committed
    computation must complete within ``timeout_s`` or we emit an honest
    error record and exit non-zero."""
    import os
    import threading

    done = threading.Event()
    err: list[str] = []

    def probe() -> None:
        try:
            out = np.asarray(
                jax.device_put(np.zeros(()), jax.devices()[0]) + 1.0)
            assert float(out) == 1.0
            done.set()
        except Exception as e:  # broken backend (e.g. libtpu skew)
            err.append(f"{type(e).__name__}: {e}")
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "fbb LPIPS kNN query-pairs/sec (device unresponsive)",
            "value": 0, "unit": "query-pairs/sec", "vs_baseline": 0,
            "error": f"device did not answer a trivial computation "
                     f"within {timeout_s:.0f}s (tunnel hang)"}), flush=True)
        os._exit(3)
    if err:
        print(json.dumps({
            "metric": "fbb LPIPS kNN query-pairs/sec (device broken)",
            "value": 0, "unit": "query-pairs/sec", "vs_baseline": 0,
            "error": err[0]}), flush=True)
        os._exit(3)


def main() -> None:
    from ganleaks_tpu.cli.common import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    _device_watchdog()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--metric", default="knn", choices=["knn", "gen"])
    # defaults = the fastest measured mode on v5e (docs/PERF.md):
    # bf16 LPIPS tower + tap-structured embeddings quantized to int8
    # streams (static rigorous scales, exact f32 norms) — 52.7M pairs/s
    # at 2000x20000, 204.6M at the 20000x100000 north star (uint8
    # store + one-sweep 10 GB cache, the full-bench default)
    ap.add_argument("--engine", default="taps-int8",
                    choices=["gemm", "pallas", "exact", "taps",
                             "taps-int8"])
    ap.add_argument("--n_q", type=int, default=None)
    ap.add_argument("--n_syn", type=int, default=None)
    ap.add_argument("--dtype", default="bfloat16",
                    help="embedding storage dtype ('float32' for the "
                         "reference-parity tower)")
    ap.add_argument("--compute_dtype", default="bfloat16",
                    help="'bfloat16' runs the LPIPS tower at MXU bf16 "
                         "rate; 'float32' for parity (pass with "
                         "--dtype float32)")
    ap.add_argument("--two_pass", action="store_true",
                    help="bf16 candidate pass + exact f32 re-rank; a "
                         "runtime certificate checks per query that the "
                         "result equals the full f32 search and falls "
                         "back to it where it cannot certify "
                         "(ops/knn.two_pass_certificate)")
    ap.add_argument("--two_pass_k", type=int, default=4)
    ap.add_argument("--q_block", type=int, default=None,
                    help="override the streamed engines' query block")
    ap.add_argument("--s_block", type=int, default=None,
                    help="override the streamed engines' synthetic block")
    ap.add_argument("--store", default=None,
                    choices=["uint8", "bfloat16", "float32"],
                    help="device-resident image dtype; the full-bench "
                         "north-star default is uint8 (the attack "
                         "driver's real-data storage — what lets the "
                         "one-sweep cache fit); with explicit --n_q/"
                         "--n_syn the default follows --dtype (bfloat16 "
                         "cast for the bf16 mode, f32 for parity/"
                         "two_pass runs)")
    ap.add_argument("--cache_gb", type=float, default=None,
                    help="query-embedding cache HBM budget; sets the "
                         "number of synthetic featurize sweeps "
                         "(default: 10 for the north-star default "
                         "shapes — one sweep — else 8)")
    ap.add_argument("--no_auto_plan", action="store_true",
                    help="disable the static HBM stream planner "
                         "(ops/knn._auto_stream_plan) so --cache_gb/"
                         "--s_block are used EXACTLY as given — for "
                         "fixed-config experiments")
    args = ap.parse_args()
    if args.no_auto_plan:
        os.environ["GANLEAKS_NO_AUTO_PLAN"] = "1"

    platform = jax.devices()[0].platform
    if args.metric == "gen":
        out = run_gen_bench(num=512 if args.quick else 4096)
        print(json.dumps({
            "metric": f"DCGAN 64x64 generation images/sec/chip ({platform})",
            "value": round(out["images_per_sec"], 1),
            "unit": "images/sec",
            "vs_baseline": round(out["images_per_sec"]
                                 / REFERENCE_CPU_GEN_IMAGES_PER_SEC, 1),
        }))
        return

    (n_q, n_syn, q_block, s_block,
     args.cache_gb, args.store) = resolve_defaults(
        quick=args.quick, n_q=args.n_q, n_syn=args.n_syn,
        q_block=args.q_block, s_block=args.s_block,
        cache_gb=args.cache_gb, store=args.store,
        two_pass=args.two_pass, dtype=args.dtype)

    engine = args.engine
    fallback_err = None
    try:
        out = run_bench(n_q, n_syn, 64, engine, q_block, s_block,
                        args.dtype, args.compute_dtype,
                        two_pass=args.two_pass, two_pass_k=args.two_pass_k,
                        store=args.store, cache_gb=args.cache_gb)
    except Exception as e:
        # A broken flagship engine must NOT produce a clean-looking
        # artifact: outside --quick the failure is fatal; in quick/smoke
        # mode we degrade to the XLA gemm fold but stamp the JSON line.
        if engine in ("pallas", "taps", "taps-int8") and args.quick:
            fallback_err = f"{type(e).__name__}: {e}"
            print(f"# {engine} engine failed ({fallback_err}); "
                  "falling back to gemm", flush=True)
            engine = "gemm"
            out = run_bench(n_q, n_syn, 64, engine, q_block, s_block,
                            args.dtype, args.compute_dtype,
                            two_pass=args.two_pass,
                            two_pass_k=args.two_pass_k,
                            store=args.store, cache_gb=args.cache_gb)
        elif "RESOURCE_EXHAUSTED" in str(e):
            # an OOM that escaped the streamed search's halving resume
            # means this process's runtime may be stuck in a sticky error
            # state — hand the parent a distinct exit code so it retries
            # in a FRESH process with half the query cache
            print(json.dumps({
                "metric": "fbb LPIPS kNN query-pairs/sec (device OOM)",
                "value": 0, "unit": "query-pairs/sec", "vs_baseline": 0,
                "error": f"unrecovered RESOURCE_EXHAUSTED at "
                         f"cache_gb={args.cache_gb}"}), flush=True)
            os._exit(4)
        else:
            raise

    value = out["pairs_per_sec"]
    mode = f"{engine}+two-pass" if args.two_pass else engine
    record = {
        "metric": f"fbb LPIPS kNN query-pairs/sec ({platform}, {mode}, "
                  f"{out['n_q']}x{out['n_syn']} @64x64)",
        "value": round(value, 1),
        "unit": "query-pairs/sec",
        "vs_baseline": round(value / REFERENCE_CPU_PAIRS_PER_SEC, 1),
    }
    if fallback_err is not None:
        record["fallback"] = True
        record["fallback_error"] = fallback_err
    # persist the NORTH-STAR measurement (the driver's plain
    # `python bench.py` config, succeeded on a real TPU, no fallback)
    # so a later tunnel outage can emit it as an honest `stale` record
    # instead of a bare zero (docs/PERF.md "bench honesty")
    north_star = (args.metric == "knn" and not args.quick
                  and args.n_q is None and args.n_syn is None
                  and not args.two_pass and engine == "taps-int8"
                  and fallback_err is None and platform == "tpu")
    if north_star:
        try:
            with open(_LAST_GOOD_PATH, "w") as f:
                json.dump(dict(record,
                               measured_at=time.strftime("%Y-%m-%d %H:%M"),
                               source="driver/bench.py run"), f)
        except OSError:
            pass  # a read-only checkout must not fail the bench
    print(json.dumps(record))


_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_last_good.json")


def _halve_cache(argv: list) -> list:
    """Return argv with --cache_gb halved (floor 1) and the static
    planner disabled, for OOM retries. Disabling the planner matters:
    `ops/knn._auto_stream_plan` upgrades any smaller request back to
    the one-sweep cache size (max(requested, need_one)), so a halved
    budget alone would re-run the exact plan that just OOM'd.
    Pure: unit-tested on CPU (tests/test_cli_config.py)."""
    argv = list(argv)
    halved = False
    for i, a in enumerate(argv):
        if a == "--cache_gb" and i + 1 < len(argv):
            argv[i + 1] = str(max(1.0, float(argv[i + 1]) / 2))
            halved = True
            break
        if a.startswith("--cache_gb="):
            v = max(1.0, float(a.split("=", 1)[1]) / 2)
            argv[i] = f"--cache_gb={v}"
            halved = True
            break
    if not halved:
        # half the RESOLVED default (resolve_defaults: 10 GB only for
        # the full north-star default shapes, 8 GB otherwise)
        explicit = any(a == f or a.startswith(f + "=")
                       for a in argv for f in ("--n_q", "--n_syn"))
        full_default = "--quick" not in argv and not explicit
        argv += ["--cache_gb", "5.0" if full_default else "4.0"]
    if "--no_auto_plan" not in argv:
        argv.append("--no_auto_plan")
    return argv


def _emit_stale_and_exit(rc: int, attempts_made: int) -> None:
    """Final-failure path for the DEFAULT (driver) invocation: every
    fresh-process retry hit an unresponsive/broken device, i.e. a tunnel
    outage, not a repo bug (round 3 lost its headline number to exactly
    this). Emit the last driver-verified north-star measurement clearly
    labeled ``stale`` — the error text and timestamp carry the honesty —
    and exit 0 so the artifact records the measurement instead of a bare
    zero. No last-good file ⇒ keep the non-zero rc."""
    import sys
    try:
        with open(_LAST_GOOD_PATH) as f:
            last = json.load(f)
    except (OSError, ValueError):
        sys.exit(rc)
    last["stale"] = True
    last["error"] = (f"device unreachable across {attempts_made} "
                     f"fresh-process attempts (tunnel outage); value is "
                     f"the last verified measurement, NOT from this run")
    print(json.dumps(last), flush=True)
    sys.exit(0)


if __name__ == "__main__":
    import os
    import subprocess
    import sys

    if os.environ.get("GANLEAKS_BENCH_CHILD"):
        main()
        sys.exit(0)
    # The tunneled backend wedges intermittently and a wedged client
    # process cannot recover (jax initializes the backend once) — retry
    # the whole bench in fresh subprocesses. A failed attempt prints its
    # error-stamped JSON line; a successful one prints the real record
    # LAST, which is what artifact parsers read.
    #
    # rc 3 (device unresponsive/broken) retries ride out a TUNNEL OUTAGE:
    # round 3's bench burned its 3 tries in ~9 minutes against a
    # multi-hour outage. The backoff below spreads the same fresh-process
    # retry over ~35 min of sleep (+ ~3 min watchdog per attempt, ~55 min
    # wall) before giving up. rc 4 (unrecovered OOM) keeps the immediate
    # halved-cache retry — waiting cannot help an OOM.
    env = dict(os.environ, GANLEAKS_BENCH_CHILD="1")

    argv = list(sys.argv)
    default_invocation = len(argv) == 1  # the driver's `python bench.py`
    outage_sleeps = [45, 90, 180, 360, 600, 900]  # s; ~36 min total
    if os.environ.get("GANLEAKS_BENCH_OUTAGE_SLEEPS") is not None:
        # drill/test hook: the stale-fallback path must be rehearsable
        # without a 36-minute wait (docs/PERF.md "bench honesty")
        outage_sleeps = [
            int(x) for x in
            os.environ["GANLEAKS_BENCH_OUTAGE_SLEEPS"].split(",") if x]
    oom_retries_left = 3
    rc = 1
    attempt = 0
    while True:
        attempt += 1
        rc = subprocess.call([sys.executable] + argv, env=env)
        if rc == 3 and outage_sleeps:
            delay = outage_sleeps.pop(0)
            print(f"# bench attempt {attempt} hit an unresponsive "
                  f"device; retrying in a fresh process in {delay}s "
                  f"({len(outage_sleeps)} retries left)",
                  file=sys.stderr, flush=True)
            time.sleep(delay)
            continue
        if rc == 4 and oom_retries_left:
            oom_retries_left -= 1
            argv = _halve_cache(argv)
            print(f"# bench attempt {attempt} died of an unrecovered "
                  f"device OOM; retrying in a fresh process with a "
                  f"smaller query cache", file=sys.stderr, flush=True)
            continue
        break  # 0 = done; 3/4 exhausted; anything else = real bug
    if rc == 3 and default_invocation:
        _emit_stale_and_exit(rc, attempt)
    sys.exit(rc)
