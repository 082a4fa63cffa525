"""Pallas tap-epilogue kernel (``ops/lpips/epilogue_pallas``).

The kernel fuses normalize/scale/cast(/quantize)/lane-pack/row-norms into
one pass; these tests pin value-parity against the XLA composition in
interpret mode (the kernel's math is ordinary jax ops, so interpret-mode
equality transfers to TPU up to instruction-level rounding — parts are
checked BITWISE, row norms to float-accumulation tolerance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganleaks_tpu.ops.distance import make_embed_parts_fn
from ganleaks_tpu.ops.knn import (
    _fused_parts_norms,
    _fused_parts_norms_q,
    knn_argmin_streamed_parts,
)
from ganleaks_tpu.ops.lpips import init_lpips_params, lpips_embed_parts_fn
from ganleaks_tpu.ops.lpips.epilogue_pallas import tap_epilogue
from ganleaks_tpu.ops.lpips.lpips import _pack_lanes, normalize_tensor

TAP_SHAPES = [  # (P, C) of every vgg tap at 16x16 input + a 64x64 tap0
    (256, 64), (64, 128), (16, 256), (4, 512), (1, 512), (4096, 64),
]


def _xla_reference(fl3, scale, embed_dtype, out_dtype, quant_bound):
    phi = normalize_tensor(fl3.astype(jnp.float32)) * jnp.asarray(scale)
    b = _pack_lanes(phi.astype(embed_dtype), mode="halves")
    rn = jnp.sum(jnp.square(b.astype(jnp.float32)), axis=(1, 2))
    if quant_bound is not None:
        out = jnp.clip(jnp.round(b.astype(jnp.float32)
                                 * (127.0 / quant_bound)),
                       -127, 127).astype(jnp.int8)
    else:
        out = b.astype(out_dtype)
    return out, rn


@pytest.mark.parametrize("p,c", TAP_SHAPES)
@pytest.mark.parametrize("mode", ["bf16", "f32-demote", "int8"])
def test_tap_epilogue_matches_xla(rng, p, c, mode):
    fl = jnp.asarray(
        rng.standard_normal((3, p, c)).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)  # bf16-tower-like values
    scale = np.abs(rng.standard_normal(c)).astype(np.float32) * 0.05
    embed_dtype, out_dtype, qb = {
        "bf16": (jnp.bfloat16, jnp.bfloat16, None),
        "f32-demote": (jnp.float32, jnp.bfloat16, None),
        "int8": (jnp.bfloat16, jnp.int8, 0.06),
    }[mode]
    res = tap_epilogue(fl, scale, embed_dtype=embed_dtype,
                       out_dtype=out_dtype, quant_bound=qb, interpret=True)
    assert res is not None
    out, rn = res
    want, rn_want = _xla_reference(fl, scale, embed_dtype, out_dtype, qb)
    assert out.shape == want.shape and out.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    np.testing.assert_allclose(np.asarray(rn), np.asarray(rn_want),
                               rtol=1e-6)


def test_tap_epilogue_envelope_returns_none(rng):
    fl = jnp.asarray(rng.standard_normal((2, 9, 64)).astype(np.float32))
    assert tap_epilogue(fl, np.ones(64, np.float32),
                        embed_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
                        interpret=True) is None  # odd P, C=64
    fl = jnp.asarray(rng.standard_normal((2, 8, 96)).astype(np.float32))
    assert tap_epilogue(fl, np.ones(96, np.float32),
                        embed_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
                        interpret=True) is None  # C not 64 / %128


def _fresh_embed(dtype):
    params = init_lpips_params(0, "vgg")
    return make_embed_parts_fn(
        "l2-lpips",
        lpips_embed_parts_fn(params, weight=0.2, dtype=dtype,
                             compute_dtype=jnp.bfloat16),
        dtype=dtype)


def test_fused_closure_fast_equals_slow(rng, monkeypatch):
    """The dispatch built by ``_fused_parts_norms`` with the interpret
    kernel must return bitwise-identical parts to the XLA path IN THE
    SAME (halves) packing mode — exactly the mid-search-fallback
    equivalence the dispatch promises."""
    from ganleaks_tpu.ops.knn import disable_fast_epilogue

    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "1")
    x = jnp.asarray(
        rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    fast = _fused_parts_norms(_fresh_embed(jnp.bfloat16), jnp.bfloat16)
    slow_embed = _fresh_embed(jnp.bfloat16)
    slow = _fused_parts_norms(slow_embed, jnp.bfloat16)
    disable_fast_epilogue(slow_embed)  # XLA path, halves packing (env on)
    pf, rf = fast(x)
    ps, rs = slow(x)
    assert len(pf) == len(ps) == 6  # pixel + 5 taps
    for a, b in zip(pf, ps):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rs), rtol=1e-6)


def test_fused_closure_int8_fast_equals_slow(rng, monkeypatch):
    x = jnp.asarray(
        rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    from ganleaks_tpu.ops.knn import disable_fast_epilogue

    e1 = _fresh_embed(jnp.bfloat16)
    bounds = tuple(e1.part_bound_fn((16, 16, 3)))
    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "1")
    fast = _fused_parts_norms_q(e1, bounds)
    slow_embed = _fresh_embed(jnp.bfloat16)
    slow = _fused_parts_norms_q(slow_embed, bounds)
    disable_fast_epilogue(slow_embed)  # XLA path, halves packing (env on)
    pf, rf = fast(x)
    ps, rs = slow(x)
    for a, b in zip(pf, ps):
        assert a.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rs), rtol=1e-6)


def test_streamed_search_with_interpret_epilogue(rng, monkeypatch):
    """End-to-end taps search: identical indices and distances whether
    the epilogue runs through the (interpret) kernel or XLA."""
    q = jnp.asarray(rng.standard_normal((10, 16, 16, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((30, 16, 16, 3)).astype(np.float32))
    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "1")
    d1, i1 = knn_argmin_streamed_parts(_fresh_embed(jnp.float32), q, s,
                                       q_block=4, s_block=8)
    monkeypatch.delenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET")
    d2, i2 = knn_argmin_streamed_parts(_fresh_embed(jnp.float32), q, s,
                                       q_block=4, s_block=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_env_zero_means_unset(monkeypatch):
    from ganleaks_tpu.ops.lpips import epilogue_pallas as ep

    monkeypatch.setenv("GANLEAKS_NO_PALLAS_EPILOGUE", "0")
    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "1")
    assert ep._enabled() == "interpret"
    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "0")
    assert ep._enabled() is None  # cpu backend, both vars effectively unset


def test_disable_fast_epilogue_flips_once(monkeypatch):
    from ganleaks_tpu.ops.knn import disable_fast_epilogue

    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "1")
    embed = _fresh_embed(jnp.bfloat16)
    _fused_parts_norms(embed, jnp.bfloat16)
    assert disable_fast_epilogue(embed) is True
    assert disable_fast_epilogue(embed) is False  # idempotent: no retry loop


def test_mesh_driver_disables_fast_on_wrapper_failure(rng, monkeypatch):
    """A kernel failure surfacing at the compiled mesh wrapper (where the
    dispatch's own try/except cannot run) must flip to the XLA path,
    rebuild, and finish with correct results."""
    import jax
    from jax.sharding import Mesh

    import ganleaks_tpu.parallel.knn_shard as ks

    q = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))
    s = jnp.asarray(
        rng.standard_normal((16, 16, 16, 3)).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("syn",))

    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "1")
    embed = _fresh_embed(jnp.bfloat16)
    orig = ks._build_embed_gather
    calls = {"n": 0}

    def flaky(*a, **k):
        g = orig(*a, **k)

        def wrapped(*ga):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("Mosaic refused under the mesh wrapper")
            return g(*ga)
        return wrapped

    monkeypatch.setattr(ks, "_build_embed_gather", flaky)
    d, i = ks.knn_argmin_sharded_streamed(embed, q, s, mesh, engine="taps",
                                          q_block=4, s_block=4)
    assert calls["n"] >= 2  # failed once, retried on the rebuilt wrapper

    monkeypatch.delenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET")
    monkeypatch.setattr(ks, "_build_embed_gather", orig)
    d2, i2 = ks.knn_argmin_sharded_streamed(_fresh_embed(jnp.bfloat16), q,
                                            s, mesh, engine="taps",
                                            q_block=4, s_block=4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d2))


def test_mesh_and_ring_with_interpret_epilogue(rng, monkeypatch):
    """Sharded-streamed and ring engines through the (interpret) kernel
    agree with the XLA pairs-packed path: identical indices, distances
    equal up to f32 summation order (the packing permutes elements)."""
    import jax
    from jax.sharding import Mesh

    from ganleaks_tpu.parallel.knn_shard import (
        knn_argmin_ring_streamed, knn_argmin_sharded_streamed)

    q = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))
    s = jnp.asarray(
        rng.standard_normal((20, 16, 16, 3)).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("syn",))

    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "1")
    d_sh, i_sh = knn_argmin_sharded_streamed(
        _fresh_embed(jnp.bfloat16), q, s, mesh, engine="taps",
        q_block=4, s_block=4)
    d_ri, i_ri = knn_argmin_ring_streamed(
        _fresh_embed(jnp.bfloat16), q, s, mesh, engine="taps",
        q_block=2, s_block=4)
    monkeypatch.delenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET")
    d_x, i_x = knn_argmin_sharded_streamed(
        _fresh_embed(jnp.bfloat16), q, s, mesh, engine="taps",
        q_block=4, s_block=4)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_x))
    np.testing.assert_array_equal(np.asarray(i_ri), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_x),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_ri), np.asarray(d_x),
                               rtol=1e-5)


def test_dispatch_falls_back_on_kernel_failure(rng, monkeypatch):
    """A failing kernel must permanently fall back to the XLA path
    mid-stream without changing results (non-OOM errors only)."""
    from ganleaks_tpu.ops import knn as knn_mod

    calls = {"n": 0}

    def boom(blk):
        calls["n"] += 1
        raise RuntimeError("Mosaic refused")

    embed = _fresh_embed(jnp.bfloat16)
    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "1")
    monkeypatch.setattr(embed, "make_fast_parts_norms",
                        lambda cdtype, bounds=None: boom)
    disp = knn_mod._fused_parts_norms(embed, jnp.bfloat16)
    x = jnp.asarray(
        rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    p1, r1 = disp(x)
    assert calls["n"] == 1
    p2, _ = disp(x)  # no second fast attempt
    assert calls["n"] == 1
    slow = _fused_parts_norms(_fresh_embed(jnp.bfloat16), jnp.bfloat16)
    ps, _ = slow(x)
    for a, b in zip(p1, ps):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_single_chip_driver_retries_on_deferred_execution_failure(
        rng, monkeypatch):
    """Async-dispatch regression: a kernel EXECUTION failure surfaces at a
    consuming op or readback, not at the dispatch's own try/except. The
    single-chip streamed drivers must flip to the XLA path and retry the
    whole (stateless-restartable) search once."""
    import ganleaks_tpu.ops.knn as knn

    monkeypatch.setenv("GANLEAKS_PALLAS_EPILOGUE_INTERPRET", "1")
    q = jnp.asarray(rng.standard_normal((6, 16, 16, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((12, 16, 16, 3)).astype(np.float32))

    embed = _fresh_embed(jnp.bfloat16)
    orig = knn._stream_search
    calls = {"n": 0}

    def deferred_failure(*a, **k):
        out = orig(*a, **k)
        calls["n"] += 1
        if calls["n"] == 1:  # as if the error burst at the final readback
            raise RuntimeError("XlaRuntimeError: deferred kernel failure")
        return out

    monkeypatch.setattr(knn, "_stream_search", deferred_failure)
    d, i = knn.knn_argmin_streamed_parts(embed, q, s, q_block=4, s_block=8)
    assert calls["n"] == 2  # failed once, retried once
    # the retry flipped this embed's cached dispatch to the XLA path
    assert not knn.disable_fast_epilogue(embed)

    monkeypatch.setattr(knn, "_stream_search", orig)
    ref_embed = _fresh_embed(jnp.bfloat16)
    knn.disable_fast_epilogue(ref_embed)
    d2, i2 = knn.knn_argmin_streamed_parts(ref_embed, q, s,
                                           q_block=4, s_block=8)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
    # parts are bitwise-equal across paths; row norms differ in summation
    # order (kernel accumulator vs jnp.sum), so d agrees to ~f32 ULPs
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), rtol=1e-5)


def test_retry_wrapper_reraises_oom_and_no_fast_failures():
    """OOMs must reach the caller untouched (the halving resume already
    ran), and a failure with no active fast dispatch (CPU, or already
    flipped) must not retry."""
    import pytest

    import ganleaks_tpu.ops.knn as knn

    class _NoFast:
        pass

    calls = {"n": 0}

    def boom():
        calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        knn._retry_without_fast_epilogue(_NoFast(), boom)
    assert calls["n"] == 1

    calls["n"] = 0

    def plain():
        calls["n"] += 1
        raise RuntimeError("Mosaic refused")

    with pytest.raises(RuntimeError, match="Mosaic"):
        knn._retry_without_fast_epilogue(_NoFast(), plain)
    assert calls["n"] == 1  # nothing to flip -> no blind second attempt
