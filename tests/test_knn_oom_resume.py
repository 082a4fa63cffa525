"""OOM backoff in the streamed kNN must RESUME, not restart.

``knn_argmin_streamed`` halves only the offending dimension's block on a
RESOURCE_EXHAUSTED failure and continues from where it was: completed
synthetic blocks are never re-featurized, the running (min, argmin)
partials survive, and the query-embedding cache is kept. These tests
inject RESOURCE_EXHAUSTED mid-stream through an eager (jit-bypassed)
embed mock and assert every row is featurized exactly once per sweep.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ganleaks_tpu.ops.knn as knn_mod
from ganleaks_tpu.ops.distance import make_embed_fn
from ganleaks_tpu.ops.knn import knn_argmin_streamed


class InjectingEmbed:
    """Flattening l2 embed that raises RESOURCE_EXHAUSTED on chosen call
    numbers and logs (first-row-id, n_rows) of every successful call.

    Rows are identity-tagged: row r of the source arrays is constant
    ``tag + r``, so ``ids[0]`` recovers which block arrived (zero-padded
    tail rows show up as tag 0 and are ignored via n_valid slicing by the
    caller)."""

    def __init__(self, fail_on_calls=()):
        self.calls = 0
        self.fail_on = set(fail_on_calls)
        self.log: list[tuple[float, int]] = []

    def __call__(self, x):
        import jax

        if isinstance(x, jax.core.Tracer):  # the eval_shape width probe
            flat = x.reshape(x.shape[0], -1)
            return flat / np.sqrt(flat.shape[1])
        self.calls += 1
        if self.calls in self.fail_on:
            raise RuntimeError("RESOURCE_EXHAUSTED: injected OOM (test)")
        self.log.append((float(x[0, 0, 0, 0]), int(x.shape[0])))
        flat = x.reshape(x.shape[0], -1)
        return flat / np.sqrt(flat.shape[1])


def tagged(n: int, tag: float) -> np.ndarray:
    """(n, 2, 2, 1) array whose row r is constant tag + r."""
    return (tag + np.arange(1, n + 1, dtype=np.float32)
            ).reshape(n, 1, 1, 1) * np.ones((1, 2, 2, 1), np.float32)


@pytest.fixture
def eager_knn(monkeypatch):
    """Bypass the jit cache so the mock executes (and can raise) on every
    call — trace-once jit semantics would swallow call-counted failures."""
    monkeypatch.setattr(knn_mod, "_jit_cached", lambda f: f)


def clean_result(queries, syn):
    embed = make_embed_fn("l2")
    d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                               jnp.asarray(syn), s_block=8, q_block=4)
    return np.asarray(d), np.asarray(i)


def coverage(log, tag, total):
    """Rows actually featurized (by first-row id + count), as a multiset
    of row indices relative to ``tag``."""
    rows = []
    for first, n in log:
        if not (tag < first <= tag + total):
            continue
        start = int(round(first - tag)) - 1
        rows.extend(range(start, min(start + n, total)))
    return rows


def test_syn_oom_resumes_without_recompute(eager_knn):
    queries = tagged(4, 1000.0)
    syn = tagged(32, 0.0)
    ref_d, ref_i = clean_result(queries, syn)

    # call 1 = query block; calls 2,3 = syn blocks 0-8, 8-16;
    # call 4 (syn block 16-24) raises -> s_block 8 -> 4, resume at row 16
    embed = InjectingEmbed(fail_on_calls=(4,))
    d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                               jnp.asarray(syn), s_block=8, q_block=4)

    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-6)

    syn_rows = coverage(embed.log, 0.0, 32)
    assert sorted(syn_rows) == list(range(32)), \
        "every synthetic row featurized exactly once (no recompute)"
    q_rows = coverage(embed.log, 1000.0, 4)
    assert sorted(q_rows) == list(range(4)), \
        "query cache survived the synthetic-stream OOM"


def test_query_oom_halves_q_block_keeps_parts(eager_knn):
    queries = tagged(8, 1000.0)
    syn = tagged(16, 0.0)
    ref_d, ref_i = clean_result(queries, syn)

    # call 1 = query rows 0-4; call 2 (query rows 4-8) raises ->
    # q_block 4 -> 2, resume at query row 4
    embed = InjectingEmbed(fail_on_calls=(2,))
    d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                               jnp.asarray(syn), s_block=8, q_block=4)

    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-6)
    q_rows = coverage(embed.log, 1000.0, 8)
    assert sorted(q_rows) == list(range(8)), \
        "completed query blocks kept; only the failed block re-walked"


def test_query_oom_non_dividing_halving_no_clamp_corruption(eager_knn):
    """q_block halving to a size that does NOT divide the remaining span
    (5 -> 2 over 10 rows) must not overrun the chunk buffer: an uncapped
    final write would make dynamic_update_slice CLAMP the start index and
    silently overwrite earlier featurized rows (regression: queries 8/9
    returned wrong neighbors)."""
    queries = tagged(10, 1000.0)
    syn = tagged(32, 0.0)
    embed = make_embed_fn("l2")
    ref_d, ref_i = knn_argmin_streamed(embed, jnp.asarray(queries),
                                       jnp.asarray(syn), s_block=8,
                                       q_block=5)

    inj = InjectingEmbed(fail_on_calls=(2,))  # rows 5-10 fail -> q_block 2
    d, i = knn_argmin_streamed(inj, jnp.asarray(queries),
                               jnp.asarray(syn), s_block=8, q_block=5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), rtol=1e-6)
    q_rows = coverage(inj.log, 1000.0, 10)
    assert sorted(set(q_rows)) == list(range(10)), \
        "every query row featurized despite the non-dividing halving"


def test_non_oom_errors_propagate(eager_knn):
    class Boom:
        def __call__(self, x):
            raise ValueError("not an oom")

    with pytest.raises(ValueError, match="not an oom"):
        knn_argmin_streamed(Boom(), jnp.asarray(tagged(4, 0.0)),
                            jnp.asarray(tagged(8, 100.0)), s_block=4,
                            q_block=4)


def test_exact_engine_never_demotes_to_bf16(eager_knn, monkeypatch):
    """On a TPU backend f32 embeddings stream as bf16 for the gemm engine
    — but the 'exact' engine is the documented true-f32 parity path and
    must keep f32 (regression: demotion was applied engine-blind)."""
    import jax

    seen = []

    class DtypeLogger(InjectingEmbed):
        def __call__(self, x):
            out = super().__call__(x)
            if not isinstance(x, jax.core.Tracer):
                seen.append(True)
            return out

    monkeypatch.setattr(knn_mod.jax, "default_backend", lambda: "tpu")
    assert knn_mod._stream_demote(jnp.float32, None)  # gemm path demotes

    # with engine='exact' the search must run its fold on f32 arrays:
    # verify by checking the cache dtype the fold receives
    folded_dtypes = []
    orig_fold = knn_mod._fold_block

    def spy_fold(run_min, run_idx, emb_q, rq, emb_s, *a, **k):
        folded_dtypes.append((emb_q.dtype, emb_s.dtype))
        return orig_fold(run_min, run_idx, emb_q, rq, emb_s, *a, **k)

    monkeypatch.setattr(knn_mod, "_fold_block", spy_fold)
    knn_argmin_streamed(DtypeLogger(), jnp.asarray(tagged(4, 1000.0)),
                        jnp.asarray(tagged(8, 0.0)), engine="exact",
                        s_block=4, q_block=4)
    assert folded_dtypes and all(
        qd == jnp.float32 and sd == jnp.float32 for qd, sd in folded_dtypes)


def test_topk_oom_resumes_like_argmin(eager_knn):
    """The unified streaming driver gives the top-k variants the same
    OOM-halving resume as argmin: inject a synthetic-stream OOM during
    knn_topk_streamed and assert identical results + no row recomputed."""
    from ganleaks_tpu.ops.knn import knn_topk_streamed

    queries = tagged(4, 1000.0)
    syn = tagged(32, 0.0)
    embed = make_embed_fn("l2")
    ref_d, ref_i = knn_topk_streamed(embed, jnp.asarray(queries),
                                     jnp.asarray(syn), k=3, s_block=8,
                                     q_block=4)

    inj = InjectingEmbed(fail_on_calls=(4,))  # 3rd syn block raises
    d, i = knn_topk_streamed(inj, jnp.asarray(queries), jnp.asarray(syn),
                             k=3, s_block=8, q_block=4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), rtol=1e-6)
    syn_rows = coverage(inj.log, 0.0, 32)
    assert sorted(syn_rows) == list(range(32)), \
        "top-k sweep resumed without recomputing completed blocks"


def test_syn_oom_at_min_block_shrinks_cache_and_restarts_chunk(eager_knn):
    """When s_block bottoms out at 1 and the OOM persists, the pressure
    is the RESIDENT query cache, not the streamed block: the driver must
    halve chunk_rows and redo the chunk (more synthetic sweeps) instead
    of raising — the graceful-degradation contract for an over-ambitious
    query_cache_bytes."""
    queries = tagged(8, 1000.0)
    syn = tagged(8, 0.0)
    embed0 = make_embed_fn("l2")
    ref_d, ref_i = (np.asarray(a) for a in knn_argmin_streamed(
        embed0, jnp.asarray(queries), jnp.asarray(syn),
        s_block=2, q_block=4))

    # cache budget sized to exactly one 8-row chunk (rows are 512 B
    # physical: a (4,) f32 part lane-padded to 128). calls 1,2 featurize
    # the two query blocks; call 3 = first syn block (s_block=2) raises
    # -> s_block 1; call 4 (s_block=1) raises -> cache halves to
    # chunk_rows=4, the chunk restarts with s_block reset to 2, and the
    # search finishes as two 4-row chunks.
    embed = InjectingEmbed(fail_on_calls=(3, 4))
    d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                               jnp.asarray(syn), s_block=2, q_block=4,
                               query_cache_bytes=8 * 512)

    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-6)
    # both 4-row chunks completed a FULL synthetic sweep (2 sweeps total)
    syn_rows = coverage(embed.log, 0.0, 8)
    assert sorted(syn_rows) == sorted(list(range(8)) * 2), \
        "each halved chunk sweeps the whole synthetic set"
    # queries featurized twice: once into the doomed 8-row chunk, once
    # across the two restarted 4-row chunks
    q_rows = coverage(embed.log, 1000.0, 8)
    assert sorted(q_rows) == sorted(list(range(8)) * 2), \
        "restart re-featurizes the chunk rows exactly once more"


def test_oom_at_minimum_block_reraises(eager_knn):
    embed = InjectingEmbed(fail_on_calls=set(range(1, 50)))
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        knn_argmin_streamed(embed, jnp.asarray(tagged(4, 1000.0)),
                            jnp.asarray(tagged(8, 0.0)), s_block=8,
                            q_block=8)


def test_randomized_oom_schedules_match_clean(eager_knn):
    """Differential fuzz over injection schedules: any combination of up
    to two RESOURCE_EXHAUSTED failures at random call indices must leave
    the result identical to the clean run (the deterministic tests above
    pin WHERE the resume logic acts; this pins that no schedule corrupts
    the fold)."""
    rng = np.random.default_rng(7)
    queries, syn = tagged(10, 1000.0), tagged(37, 0.0)  # non-dividing
    want_d, want_i = clean_result(queries, syn)
    for _ in range(12):
        fail_on = set(rng.integers(1, 40,
                                   size=int(rng.integers(1, 3))).tolist())
        embed = InjectingEmbed(fail_on_calls=fail_on)
        d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                                   jnp.asarray(syn), s_block=8, q_block=4)
        np.testing.assert_array_equal(np.asarray(i), want_i,
                                      err_msg=f"fail_on={sorted(fail_on)}")
        np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-6,
                                   err_msg=f"fail_on={sorted(fail_on)}")


class DrainInjector:
    """Wraps ``knn._drain``: raises RESOURCE_EXHAUSTED on chosen
    drain-call numbers — simulating an ASYNC execution failure that
    surfaces at a later sync point (the way the tunneled v5e actually
    delivers streaming OOMs), after the poisoned outputs were already
    committed downstream."""

    def __init__(self, fail_on=()):
        self.calls = 0
        self.fail_on = set(fail_on)

    def __call__(self, x):
        import jax

        self.calls += 1
        if self.calls in self.fail_on:
            raise RuntimeError("RESOURCE_EXHAUSTED: injected deferred OOM")
        return jax.block_until_ready(x)


class PoisoningEmbed(InjectingEmbed):
    """Returns wildly wrong embeddings on chosen call numbers (the block
    an async failure belonged to): if the driver keeps those outputs, the
    final neighbors are wrong — equality with the clean run proves the
    poisoned writes were discarded."""

    def __init__(self, poison_on_calls=()):
        super().__init__()
        self.poison_on = set(poison_on_calls)

    def __call__(self, x):
        import jax

        out = super().__call__(x)
        if (not isinstance(x, jax.core.Tracer)
                and self.calls in self.poison_on):
            out = out * 0.0 - 1e6
        return out


def test_deferred_query_oom_refeaturizes_chunk(eager_knn, monkeypatch):
    """An async query-featurize OOM surfaces only at a later drain, after
    the failed block's poisoned outputs were committed into the DONATED
    cache bufs and qs advanced past it. Resuming at qs (the old behavior)
    would keep the poison forever — the driver must drop the cache and
    refeaturize the chunk."""
    queries = tagged(8, 1000.0)
    syn = tagged(16, 0.0)
    ref_d, ref_i = clean_result(queries, syn)

    # call 2 (query rows 4-8) is the async-failed block: its outputs are
    # garbage, and the failure surfaces at the pre-sweep verification
    # drain (drain call 1) — after the garbage hit the donated cache
    embed = PoisoningEmbed(poison_on_calls=(2,))
    monkeypatch.setattr(knn_mod, "_drain", DrainInjector(fail_on=(1,)))
    d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                               jnp.asarray(syn), s_block=8, q_block=4)

    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-6)
    # the whole chunk was refeaturized once more (poison discarded)
    q_rows = coverage(embed.log, 1000.0, 8)
    assert sorted(q_rows) == sorted(list(range(8)) * 2), \
        "chunk refeaturized exactly once after the deferred OOM"


def test_deferred_syn_oom_restarts_sweep(eager_knn, monkeypatch):
    """An async fold OOM surfaces at the backpressure drain, up to
    _SYNC_WINDOW blocks after `state` absorbed the poisoned fold output.
    Resuming at the current row (the old behavior) would keep the poison
    in the running (min, argmin) — the driver must reset the state and
    restart the sweep (the verified query cache survives)."""
    queries = tagged(4, 1000.0)
    syn = tagged(32, 0.0)  # true NN of every query = syn row 31 (last blk)
    ref_d, ref_i = clean_result(queries, syn)

    # call 1 = query block; calls 2-5 = syn blocks. Poison call 5 (rows
    # 24-32, holding every true NN); the failure surfaces at its
    # backpressure drain (drain 1 = pre-sweep verify, 2 = popleft after
    # block 3, 3 = popleft after block 4 — the poisoned fold is in state)
    embed = PoisoningEmbed(poison_on_calls=(5,))
    monkeypatch.setattr(knn_mod, "_drain", DrainInjector(fail_on=(3,)))
    d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                               jnp.asarray(syn), s_block=8, q_block=4)

    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-6)
    # the sweep restarted: synthetic rows featurized twice, the query
    # cache was NOT refeaturized
    syn_rows = coverage(embed.log, 0.0, 32)
    assert sorted(syn_rows) == sorted(list(range(32)) * 2), \
        "sweep restarted exactly once after the deferred fold OOM"
    q_rows = coverage(embed.log, 1000.0, 4)
    assert sorted(q_rows) == list(range(4)), \
        "query cache survived the sweep restart"


def test_randomized_mixed_oom_schedules_match_clean(eager_knn, monkeypatch):
    """Differential fuzz mixing SYNC failures (raised in the embed call)
    with DEFERRED ones (raised at a drain): any schedule of up to one of
    each, at random call indices, must leave the result identical to the
    clean run — no poison survives, no row is lost."""
    rng = np.random.default_rng(11)
    queries, syn = tagged(10, 1000.0), tagged(37, 0.0)  # non-dividing
    want_d, want_i = clean_result(queries, syn)
    for _ in range(10):
        sync_on = set(rng.integers(1, 40, size=1).tolist()) \
            if rng.integers(0, 2) else set()
        drain_on = set(rng.integers(1, 10, size=1).tolist())
        embed = InjectingEmbed(fail_on_calls=sync_on)
        monkeypatch.setattr(knn_mod, "_drain",
                            DrainInjector(fail_on=drain_on))
        d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                                   jnp.asarray(syn), s_block=8, q_block=4)
        msg = f"sync={sorted(sync_on)} drain={sorted(drain_on)}"
        np.testing.assert_array_equal(np.asarray(i), want_i, err_msg=msg)
        np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-6,
                                   err_msg=msg)


def test_sticky_runtime_aborts_resume_immediately(eager_knn, monkeypatch):
    """When the free-fence itself cannot run (sticky runtime error state,
    observed on the tunneled v5e after a deferred async OOM), the halving
    walk is futile — the search must re-raise the original OOM at the
    FIRST resume attempt instead of cascading s_block all the way to 1."""
    monkeypatch.setattr(knn_mod, "_free_fence", lambda: False)
    embed = InjectingEmbed(fail_on_calls=(2,))  # first synthetic block
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        knn_argmin_streamed(embed, jnp.asarray(tagged(4, 1000.0)),
                            jnp.asarray(tagged(32, 0.0)), s_block=8,
                            q_block=4)
    # exactly one failed synthetic call: no post-fence-failure retries
    assert embed.calls == 2


def test_final_drain_catches_trailing_deferred_oom(eager_knn, monkeypatch,
                                                   capsys):
    """A deferred async failure from one of the LAST _SYNC_WINDOW folds
    has no later popleft to surface at: the end-of-sweep drain must
    catch it and restart the sweep — before the fix it escaped to the
    caller's readback (take() is lazy) where no halving resume exists."""
    queries = tagged(4, 1000.0)
    syn = tagged(8, 0.0)
    ref_d, ref_i = clean_result(queries, syn)
    # one query block (no popleft), drain 1 = pre-sweep cache verify;
    # s_block=8 -> ONE fold step, never pops the window, so drain 2 is
    # the FINAL state drain
    monkeypatch.setattr(knn_mod, "_drain", DrainInjector(fail_on=(2,)))
    embed = make_embed_fn("l2")
    d, i = knn_argmin_streamed(embed, jnp.asarray(queries),
                               jnp.asarray(syn), s_block=8, q_block=4)
    assert "deferred synthetic stream OOM" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-6)


def test_cache_alloc_oom_shrinks_q_block_when_chunk_at_floor(eager_knn,
                                                             monkeypatch):
    """Round-5 256px failure: when ONE q_block of cache rows itself
    overflows (wide rows), the alloc-OOM handler used to re-raise
    (chunk_rows == q_block had no resume). It must now halve q_block
    itself and continue, with results equal to the clean run."""
    rng = np.random.default_rng(9)
    q = rng.standard_normal((16, 8)).astype(np.float32)
    s = rng.standard_normal((40, 8)).astype(np.float32)
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8)

    row = 128 * 4  # f32 row, minor axis lane-padded 8 -> 128
    fails = {"n": 2}
    orig_zeros = knn_mod.jnp.zeros

    def failing_zeros(shape, *a, **kw):
        if (fails["n"] and isinstance(shape, tuple) and shape
                and isinstance(shape[0], int) and shape[0] >= 8
                and len(shape) == 2):
            fails["n"] -= 1
            raise RuntimeError("RESOURCE_EXHAUSTED: injected alloc OOM")
        return orig_zeros(shape, *a, **kw)

    monkeypatch.setattr(knn_mod.jnp, "zeros", failing_zeros)
    # cache sized to exactly one 16-row chunk: fail #1 halves chunk_rows
    # to q_block (8), fail #2 hits the chunk==q_block floor -> q_block
    # halves to 4 and the search completes
    d1, i1 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8,
                                 query_cache_bytes=16 * row)
    assert fails["n"] == 0, "both injected failures must have fired"
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)
