"""On-chip validation for the Pallas featurize epilogue
(``ops/lpips/epilogue_pallas``) at production block sizes.

The kernel was first chip-validated at 256-image blocks; this script is
the recorded recipe for validating the 2048-image production blocks
(per-tap timing, then value equality vs the XLA composition). Run it on
a live TPU after any kernel change:

    python tools/validate_epilogue.py [--n 2048]

Exit 0 = every tap compiled, ran, and matched the XLA path within the
embed dtype's documented tolerance. Nonzero = the failing tap is named;
the attack/bench dispatch falls back to the XLA path automatically
(``ops/knn._fast_slow_dispatch``), so a failure here costs ~10% featurize
throughput, not correctness.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS VGG tap shapes at 64x64 inputs: (H*W, C) per tap
TAPS_64 = [(4096, 64), (1024, 128), (256, 256), (64, 512), (16, 512)]
RTT = 0.040  # tunnel readback round-trip, subtracted from timings


def _sync(x):
    np.asarray(x[(0,) * x.ndim])


def timed(fn, *args, reps=6):
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    return max(time.perf_counter() - t0 - RTT, 1e-9) / reps, out


def xla_epilogue(fl, scale, embed_dtype):
    """The fallback composition, built from the PRODUCTION pieces
    (``ops/lpips/lpips.normalize_tensor`` + ``_pack_lanes`` in 'halves'
    mode — the packing the kernel emits), not a hand-rolled copy: this
    tool certifies the kernel against the path the dispatch actually
    falls back to, so it must track that path's code, not mirror it."""
    from ganleaks_tpu.ops.lpips.lpips import _pack_lanes, normalize_tensor
    x = fl.astype(jnp.float32)
    b = (normalize_tensor(x) * scale).astype(embed_dtype)
    rn = jnp.sum(jnp.square(b.astype(jnp.float32)), axis=(1, 2))
    return _pack_lanes(b, mode="halves"), rn


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048,
                    help="block size (images per featurize block)")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the image's sitecustomize "
                         "presets the TPU platform even when JAX_PLATFORMS "
                         "is exported; pair with "
                         "GANLEAKS_PALLAS_EPILOGUE_INTERPRET=1)")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")

    from ganleaks_tpu.cli.common import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from ganleaks_tpu.ops.lpips.epilogue_pallas import _enabled, tap_epilogue
    interp = _enabled() == "interpret"  # CPU smoke via the env toggle

    print(f"backend={jax.default_backend()} devices={jax.devices()} "
          f"interpret={interp}")
    n, failures, tot = args.n, 0, 0.0
    for (p, c) in TAPS_64:
        fl = jax.random.normal(jax.random.key(p), (n, p, c), jnp.float32)
        jax.block_until_ready(fl)
        sc = np.full(c, 0.01, np.float32)
        fast = jax.jit(lambda x, _c=c: tap_epilogue(
            x, np.full(_c, 0.01, np.float32), embed_dtype=jnp.bfloat16,
            out_dtype=jnp.bfloat16, interpret=interp))
        slow = jax.jit(lambda x, _sc=sc: xla_epilogue(x, _sc, jnp.bfloat16))
        try:
            t, (out, rn) = timed(fast, fl, reps=args.reps)
            ref_out, ref_rn = jax.device_get(slow(fl))
            out, rn = jax.device_get((out, rn))
            # <=1 ULP of bf16 per element (instruction-level rounding,
            # e.g. divide->reciprocal); rn is an f32 sum of ~p*c squares
            np.testing.assert_allclose(
                out.astype(np.float32), ref_out.astype(np.float32),
                rtol=1.6e-2, atol=1e-6)
            np.testing.assert_allclose(rn, ref_rn, rtol=1e-3)
            gb = n * p * c * (4 + 2) / 1e9
            print(f"tap ({p:4d},{c:3d}): {t*1e3:6.1f} ms "
                  f"({gb/t:5.0f} GB/s eff)  values OK", flush=True)
            tot += t
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"tap ({p},{c}): FAIL {type(e).__name__}", flush=True)
            failures += 1
        del fl
    if failures:
        print(f"FAIL: {failures}/{len(TAPS_64)} taps")
        return 1
    print(f"PASS: sum of taps {tot*1e3:.1f} ms at N={n} "
          f"(XLA epilogue measured 10.5-14.7 ms at N=2048)")
    print("next: python bench.py   (fused dispatch + end-to-end)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
