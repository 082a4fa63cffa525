"""Performance-grade mesh kNN (parallel/knn_shard streamed engine):
equality with the single-device flagship engines, featurize-work bounds
(each shard featurized once per query chunk, not once per query block),
OOM resume, the two-pass exactness certificate, and the LPIPS-on-mesh
end-to-end attack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import ganleaks_tpu.parallel.knn_shard as ks
from ganleaks_tpu.ops.distance import make_embed_fn, make_embed_parts_fn
from ganleaks_tpu.ops.knn import (
    knn_argmin_streamed,
    knn_argmin_two_pass,
    knn_topk_streamed,
)


@pytest.fixture
def mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("syn",))


def _data(rng, n_q=13, n_s=45, hw=8):
    q = rng.standard_normal((n_q, hw, hw, 3)).astype(np.float32)
    s = rng.standard_normal((n_s, hw, hw, 3)).astype(np.float32)
    return q, s


@pytest.mark.parametrize("engine", ["gemm", "exact", "taps"])
def test_mesh_streamed_equals_single_device(rng, mesh, engine):
    q, s = _data(rng)
    flat = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(flat, jnp.asarray(q), jnp.asarray(s),
                                 engine="gemm" if engine == "taps"
                                 else engine, q_block=4, s_block=4)
    emb = make_embed_parts_fn("l2") if engine == "taps" else \
        make_embed_fn("l2")
    d1, i1 = ks.knn_argmin_sharded_streamed(emb, q, s, mesh, engine=engine,
                                            q_block=4, s_block=4)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_mesh_streamed_multi_chunk_and_ties(rng, mesh):
    # duplicated rows force cross-shard ties -> first global index must win
    q, s = _data(rng, n_q=11, n_s=40)
    s[25] = s[3]
    s[39] = s[3]
    q[0] = s[3]
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=4, s_block=4)
    # tiny cache -> several query chunks
    d1, i1 = ks.knn_argmin_sharded_streamed(
        embed, q, s, mesh, q_block=4, s_block=4,
        query_cache_bytes=8 * 192 * 4)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    assert int(np.asarray(i1)[0]) == 3  # not 25/39: earliest duplicate


def test_mesh_topk_equals_single_device(rng, mesh):
    q, s = _data(rng)
    embed = make_embed_fn("l2")
    td0, ti0 = knn_topk_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 k=5, q_block=4, s_block=4)
    td1, ti1, info = ks.knn_topk_sharded_streamed(
        embed, q, s, mesh, k=5, q_block=4, s_block=4, with_info=True)
    np.testing.assert_array_equal(np.asarray(ti0), np.asarray(ti1))
    np.testing.assert_allclose(np.asarray(td0), np.asarray(td1), rtol=1e-6)
    # certificate inputs: true norms of the (padded-free) sets
    emb_s = np.asarray(embed(jnp.asarray(s)))
    assert float(info["rs_max"]) == pytest.approx(
        float(np.max(np.sum(emb_s ** 2, axis=1))), rel=1e-5)
    emb_q = np.asarray(embed(jnp.asarray(q)))
    np.testing.assert_allclose(np.asarray(info["rq"]),
                               np.sum(emb_q ** 2, axis=1), rtol=1e-5)


def test_mesh_featurize_work_is_per_chunk_not_per_qblock(rng, mesh,
                                                         monkeypatch):
    """The round-2 gap: the old sharded path re-featurized the synthetic
    shard once per QUERY BLOCK. The streamed mesh engine must sweep each
    shard once per query CHUNK: fold steps == shard_p / s_block, and
    query featurize steps == n_q / q_block."""
    counts = {"fold": 0, "gather": 0}
    orig_fold, orig_gather = ks._build_fold_step, ks._build_embed_gather

    def counting(builder, key):
        def build(*a, **kw):
            fn = builder(*a, **kw)

            def wrapped(*args, **kw2):
                counts[key] += 1
                return fn(*args, **kw2)
            return wrapped
        return build

    monkeypatch.setattr(ks, "_build_fold_step", counting(orig_fold, "fold"))
    monkeypatch.setattr(ks, "_build_embed_gather",
                        counting(orig_gather, "gather"))
    q, s = _data(rng, n_q=16, n_s=64)
    embed = make_embed_fn("l2")
    d1, i1 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh,
                                            q_block=8, s_block=4)
    d0, i0 = knn_argmin_streamed(make_embed_fn("l2"), jnp.asarray(q),
                                 jnp.asarray(s), q_block=8, s_block=8)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    shard_p = 8  # ceil(64/8 devices) rounded to s_block
    assert counts["gather"] == 16 // 8                 # n_q / q_block
    assert counts["fold"] == shard_p // 4              # ONE shard sweep


def test_mesh_oom_resume_halves_s_block(rng, mesh, monkeypatch):
    q, s = _data(rng, n_q=8, n_s=32)
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(make_embed_fn("l2"), jnp.asarray(q),
                                 jnp.asarray(s), q_block=8, s_block=4)
    orig = ks._build_fold_step
    state = {"raised": False}

    def flaky(*a, **kw):
        fn = orig(*a, **kw)

        def wrapped(*args, **kw2):
            if not state["raised"]:
                state["raised"] = True
                raise RuntimeError("RESOURCE_EXHAUSTED (fault injection)")
            return fn(*args, **kw2)
        return wrapped

    monkeypatch.setattr(ks, "_build_fold_step", flaky)
    d1, i1 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh,
                                            q_block=8, s_block=4)
    assert state["raised"]
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


# ---------------------------------------------------------------------------
# two-pass exactness certificate
# ---------------------------------------------------------------------------

def _adversarial_sets(k=3, gamma=5e-3, delta=1e-4, far=False):
    """Query at the origin; true NN is row 0 (norm 1); rows 1..k have norm
    1+delta. ``embed_lo`` inflates row values in [0.9, 1.1] by (1+gamma)
    — a relative embedding error <= gamma that pushes the true NN OUT of
    the lo top-k (gamma >> delta) without touching the decoys. With
    ``far=True`` the decoys sit at norm 2 and the certificate margin is
    huge (negative control)."""
    d = 8
    syn = np.zeros((k + 1, d), np.float32)
    syn[0, 0] = 1.0
    decoy = 2.0 if far else 1.0 + delta
    for j in range(k):
        syn[j + 1, 1 + j] = decoy
    q = np.zeros((1, d), np.float32)

    def embed_hi(x):
        return jnp.asarray(x)

    def embed_lo(x):
        x = jnp.asarray(x)
        boost = jnp.where((x > 0.9) & (x < 1.1), 1.0 + gamma, 1.0)
        return x * boost

    return q, syn, embed_lo, embed_hi


def test_two_pass_certificate_catches_missed_nn():
    """Adversarial near-tie: the true NN is outside the lo-embedding top-k
    union. The certificate must flag the query and the fallback must
    return the exact first-index answer anyway."""
    q, syn, embed_lo, embed_hi = _adversarial_sets()
    d, i, cert, n_fb = knn_argmin_two_pass(
        embed_lo, embed_hi, jnp.asarray(q), jnp.asarray(syn), k=3,
        engine="gemm", q_block=4, s_block=4, cert_eta=1e-2,
        return_cert=True)
    assert not cert[0]          # certificate caught the miss
    assert n_fb == 1            # exact fallback ran
    assert int(np.asarray(i)[0]) == 0   # and fixed the index
    assert float(np.asarray(d)[0]) == pytest.approx(1.0, rel=1e-6)


def test_two_pass_certificate_passes_when_separated():
    q, syn, embed_lo, embed_hi = _adversarial_sets(far=True)
    d, i, cert, n_fb = knn_argmin_two_pass(
        embed_lo, embed_hi, jnp.asarray(q), jnp.asarray(syn), k=3,
        engine="gemm", q_block=4, s_block=4, cert_eta=1e-2,
        return_cert=True)
    assert cert.all() and n_fb == 0
    assert int(np.asarray(i)[0]) == 0


def test_two_pass_mesh_certificate_and_fallback(mesh):
    q, syn, embed_lo, embed_hi = _adversarial_sets()
    d, i, cert, n_fb = ks.knn_argmin_two_pass_mesh(
        embed_lo, embed_hi, q, syn, mesh, k=3, engine="gemm",
        q_block=8, s_block=4, cert_eta=1e-2, return_cert=True)
    assert not cert[0] and n_fb == 1
    assert int(np.asarray(i)[0]) == 0

    q2, syn2, embed_lo2, embed_hi2 = _adversarial_sets(far=True)
    d2, i2, cert2, n_fb2 = ks.knn_argmin_two_pass_mesh(
        embed_lo2, embed_hi2, q2, syn2, mesh, k=3, engine="gemm",
        q_block=8, s_block=4, cert_eta=1e-2, return_cert=True)
    assert cert2.all() and n_fb2 == 0


# ---------------------------------------------------------------------------
# LPIPS on the mesh, end to end (round-2 Weak #4)
# ---------------------------------------------------------------------------

def test_attack_lpips_taps_on_mesh_equals_single_chip(rng, mesh):
    from ganleaks_tpu.attack.fbb import attack_arrays
    from ganleaks_tpu.config import AttackConfig

    syn = rng.uniform(-1, 1, (12, 32, 32, 3)).astype(np.float32)
    pos = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    cfg = AttackConfig(distance="l2-lpips", engine="taps",
                       query_block=8, syn_block=4, resolution=32)
    out1 = attack_arrays(cfg, syn, pos, neg)
    out8 = attack_arrays(cfg, syn, pos, neg, mesh=mesh)
    np.testing.assert_array_equal(out1["pos_nn_idx"], out8["pos_nn_idx"])
    np.testing.assert_array_equal(out1["neg_nn_idx"], out8["neg_nn_idx"])
    np.testing.assert_allclose(out1["pos_loss"], out8["pos_loss"],
                               rtol=2e-5)
    np.testing.assert_allclose(out1["neg_loss"], out8["neg_loss"],
                               rtol=2e-5)


def test_attack_two_pass_on_mesh(rng, mesh):
    from ganleaks_tpu.attack.fbb import attack_arrays
    from ganleaks_tpu.config import AttackConfig

    syn = rng.uniform(-1, 1, (12, 32, 32, 3)).astype(np.float32)
    pos = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    base = AttackConfig(distance="l2", engine="gemm", query_block=8,
                        syn_block=4, resolution=32)
    ref = attack_arrays(base, syn, pos, neg)
    from dataclasses import replace
    tp = replace(base, two_pass=True, two_pass_k=4)
    out = attack_arrays(tp, syn, pos, neg, mesh=mesh)
    np.testing.assert_array_equal(ref["pos_nn_idx"], out["pos_nn_idx"])
    np.testing.assert_allclose(ref["pos_loss"], out["pos_loss"], rtol=1e-5)


def test_mesh_int8_equals_single_chip_int8(rng, mesh):
    """engine='taps-int8' on the mesh reproduces the single-chip
    quantized search bit-for-bit (same static scales, same fold math)."""
    q, s = _data(rng)
    emb = make_embed_parts_fn("l2")
    d0, i0 = ks.knn_argmin_sharded_streamed(emb, q, s, mesh,
                                            engine="taps-int8",
                                            q_block=8, s_block=4)
    from ganleaks_tpu.ops.knn import knn_argmin_streamed_parts
    d1, i1 = knn_argmin_streamed_parts(make_embed_parts_fn("l2"),
                                       jnp.asarray(q), jnp.asarray(s),
                                       q_block=8, s_block=4, quantize=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_two_pass_mesh_int8_exact(rng, mesh):
    """Mesh two-pass with int8 pass 1: certified exact f32 results (the
    absolute quantization error rides the certificate)."""
    q, s = _data(rng, n_q=7, n_s=29)
    emb8 = make_embed_parts_fn("l2")
    flat = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(flat, jnp.asarray(q), jnp.asarray(s),
                                 q_block=4, s_block=8,
                                 precision="highest")
    d, i, cert, n_fb = ks.knn_argmin_two_pass_mesh(
        emb8, flat, q, s, mesh, k=3, engine="taps-int8", q_block=8,
        s_block=4, return_cert=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d0), rtol=1e-6)


# ---------------------------------------------------------------------------
# streamed ring (>HBM layout at streamed-engine parity)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("engine", ["gemm", "exact", "taps", "taps-int8"])
def test_ring_streamed_equals_single_device(rng, mesh, engine):
    q, s = _data(rng, n_q=19, n_s=53)
    if engine in ("taps", "taps-int8"):
        emb = make_embed_parts_fn("l2")
    else:
        emb = make_embed_fn("l2")
    d1, i1 = ks.knn_argmin_ring_streamed(emb, q, s, mesh, engine=engine,
                                         q_block=4, s_block=4)
    if engine == "taps-int8":
        from ganleaks_tpu.ops.knn import knn_argmin_streamed_parts
        d0, i0 = knn_argmin_streamed_parts(
            make_embed_parts_fn("l2"), jnp.asarray(q), jnp.asarray(s),
            q_block=4, s_block=4, quantize=True)
    else:
        d0, i0 = knn_argmin_streamed(
            make_embed_fn("l2"), jnp.asarray(q), jnp.asarray(s),
            engine="gemm" if engine == "taps" else engine,
            q_block=4, s_block=4)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_ring_streamed_cross_shard_ties(rng, mesh):
    q, s = _data(rng, n_q=10, n_s=41)
    s[33] = s[2]
    s[40] = s[2]
    q[1] = s[2]
    embed = make_embed_fn("l2")
    d1, i1 = ks.knn_argmin_ring_streamed(embed, q, s, mesh,
                                         q_block=4, s_block=4)
    assert int(np.asarray(i1)[1]) == 2  # earliest global duplicate wins
    d0, i0 = knn_argmin_streamed(make_embed_fn("l2"), jnp.asarray(q),
                                 jnp.asarray(s), q_block=4, s_block=4)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_ring_streamed_featurizes_each_row_once(rng, mesh, monkeypatch):
    """The old ring re-featurized every arriving image shard on every
    chip (n_dev tower passes per synthetic row). The streamed ring must
    run ONE ring step per s_block and one qcache fill per q_block —
    embeddings rotate, towers don't rerun."""
    counts = {"step": 0, "qcache": 0}
    orig_step, orig_q = ks._build_ring_step, ks._build_ring_qcache

    def counting(builder, key):
        def build(*a, **kw):
            fn = builder(*a, **kw)

            def wrapped(*args, **kw2):
                counts[key] += 1
                return fn(*args, **kw2)
            return wrapped
        return build

    monkeypatch.setattr(ks, "_build_ring_step",
                        counting(orig_step, "step"))
    monkeypatch.setattr(ks, "_build_ring_qcache",
                        counting(orig_q, "qcache"))
    q, s = _data(rng, n_q=16, n_s=64)
    embed = make_embed_fn("l2")
    d1, i1 = ks.knn_argmin_ring_streamed(embed, q, s, mesh,
                                         q_block=2, s_block=4)
    # q_shard_p = 2 rows/chip -> 1 fill; shard_p = 8 -> 2 ring steps
    assert counts["qcache"] == 1
    assert counts["step"] == 2
    d0, i0 = knn_argmin_streamed(make_embed_fn("l2"), jnp.asarray(q),
                                 jnp.asarray(s), q_block=8, s_block=8)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_ring_streamed_oom_resume(rng, mesh, monkeypatch):
    q, s = _data(rng, n_q=8, n_s=32)
    embed = make_embed_fn("l2")
    orig = ks._build_ring_step
    state = {"raised": False}

    def flaky(*a, **kw):
        fn = orig(*a, **kw)

        def wrapped(*args, **kw2):
            if not state["raised"]:
                state["raised"] = True
                raise RuntimeError("RESOURCE_EXHAUSTED (fault injection)")
            return fn(*args, **kw2)
        return wrapped

    monkeypatch.setattr(ks, "_build_ring_step", flaky)
    d1, i1 = ks.knn_argmin_ring_streamed(embed, q, s, mesh,
                                         q_block=4, s_block=4)
    assert state["raised"]
    d0, i0 = knn_argmin_streamed(make_embed_fn("l2"), jnp.asarray(q),
                                 jnp.asarray(s), q_block=8, s_block=8)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_attack_driver_ring_layout(rng, mesh):
    from dataclasses import replace

    from ganleaks_tpu.attack.fbb import attack_arrays
    from ganleaks_tpu.config import AttackConfig

    syn = rng.uniform(-1, 1, (12, 16, 16, 3)).astype(np.float32)
    pos = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    base = AttackConfig(distance="l2", engine="taps", query_block=8,
                        syn_block=4, resolution=16)
    ref = attack_arrays(base, syn, pos, neg)
    ring = replace(base, shard_layout="ring")
    out = attack_arrays(ring, syn, pos, neg, mesh=mesh)
    np.testing.assert_array_equal(ref["pos_nn_idx"], out["pos_nn_idx"])
    np.testing.assert_allclose(ref["pos_loss"], out["pos_loss"],
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# deferred (async-surfacing) failures: restart, never resume over poison
# ---------------------------------------------------------------------------

class _OneShotDrainOOM:
    """Raises RESOURCE_EXHAUSTED on chosen _drain call numbers, passing
    through otherwise — simulates an async execution failure surfacing at
    a later sync point, the way a real TPU delivers streaming OOMs."""

    def __init__(self, fail_on=(1,)):
        self.calls = 0
        self.fail_on = set(fail_on)

    def __call__(self, x):
        self.calls += 1
        if self.calls in self.fail_on:
            raise RuntimeError("RESOURCE_EXHAUSTED: injected deferred OOM")
        return jax.block_until_ready(x)


def test_mesh_deferred_query_oom_refeaturizes_chunk(rng, mesh, monkeypatch,
                                                    capsys):
    """A deferred featurize failure surfaces at the pre-sweep cache
    verification: the replicated donated cache may hold the failed
    block's poisoned writes, so the chunk must REFEATURIZE (fresh bufs,
    halved q_block), not resume."""
    q, s = _data(rng, n_q=32, n_s=32)
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=16, s_block=8)
    inj = _OneShotDrainOOM(fail_on=(1,))  # the pre-sweep verify drain
    monkeypatch.setattr(ks, "_drain", inj)
    d1, i1 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh,
                                            q_block=16, s_block=8)
    assert inj.calls >= 1
    assert "deferred query featurize OOM" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_mesh_deferred_fold_oom_restarts_sweep(rng, mesh, monkeypatch,
                                               capsys):
    """A deferred fold failure surfaces at the sweep's backpressure drain
    AFTER the poisoned fold was committed into the running state: the
    sweep must restart with fresh state (the verified cache survives)."""
    q, s = _data(rng, n_q=8, n_s=64)
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8)
    # drain 1 = pre-sweep verify; drain 2 = first sweep popleft (after
    # the 3rd of 4 fold steps at s_block=2 over the 8-row shards)
    inj = _OneShotDrainOOM(fail_on=(2,))
    monkeypatch.setattr(ks, "_drain", inj)
    d1, i1 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh,
                                            q_block=8, s_block=2)
    assert "deferred synthetic stream OOM" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_ring_deferred_query_oom_refills_cache(rng, mesh, monkeypatch,
                                               capsys):
    q, s = _data(rng, n_q=32, n_s=32)
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8)
    # q_shard_p=4, q_block=2 -> 2 fill calls (no popleft within the
    # window); drain 1 = the pre-sweep verify
    inj = _OneShotDrainOOM(fail_on=(1,))
    monkeypatch.setattr(ks, "_drain", inj)
    d1, i1 = ks.knn_argmin_ring_streamed(embed, q, s, mesh,
                                         q_block=2, s_block=4)
    assert "deferred query featurize OOM" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_ring_deferred_step_oom_restarts_sweep(rng, mesh, monkeypatch,
                                               capsys):
    q, s = _data(rng, n_q=8, n_s=64)
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8)
    # drain 1 = verify; drain 2 = first ring-sweep popleft
    inj = _OneShotDrainOOM(fail_on=(2,))
    monkeypatch.setattr(ks, "_drain", inj)
    d1, i1 = ks.knn_argmin_ring_streamed(embed, q, s, mesh,
                                         q_block=4, s_block=2)
    assert "deferred synthetic stream OOM" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


# ---------------------------------------------------------------------------
# non-dividing block sizes: tail steps must keep global indices exact
# ---------------------------------------------------------------------------

def test_mesh_planner_nondivisor_s_block_exact(rng, mesh, monkeypatch):
    """The HBM planner can return an s_block that does not divide the
    padded shard (shard_p is fixed before the plan runs): the sweep must
    shrink its final step instead of letting the clamped dynamic_slice
    mis-attribute global indices near each shard end (regression: row
    labels shifted by shard_p % s_block, silently wrong neighbors)."""
    q, s = _data(rng, n_q=6, n_s=36)  # shard=5 over 8 devices
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8)
    monkeypatch.setattr(ks, "_auto_stream_plan",
                        lambda *a, **kw: (kw["cache_bytes"], 3,
                                          kw["q_block"]))
    d1, i1 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh,
                                            q_block=8, s_block=5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_mesh_oom_halving_to_nondivisor_s_block_exact(rng, mesh,
                                                      monkeypatch):
    """An OOM halving from an odd s_block (5 -> 2 over shard_p=5) stops
    dividing the shard: resume must stay index-exact via the tail step."""
    q, s = _data(rng, n_q=6, n_s=36)
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8)
    orig = ks._build_fold_step
    state = {"raised": False}

    def flaky(*a, **kw):
        fn = orig(*a, **kw)

        def wrapped(*args, **kw2):
            if not state["raised"]:
                state["raised"] = True
                raise RuntimeError("RESOURCE_EXHAUSTED (fault injection)")
            return fn(*args, **kw2)
        return wrapped

    monkeypatch.setattr(ks, "_build_fold_step", flaky)
    d1, i1 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh,
                                            q_block=8, s_block=5)
    assert state["raised"]
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_ring_oom_halving_to_nondivisor_blocks_exact(rng, mesh,
                                                     monkeypatch):
    """Ring layout: q_block and s_block halvings that stop dividing the
    padded shards (5 -> 2 over 5) must neither shift query-cache row
    offsets nor mislabel synthetic indices (both walks tail-step)."""
    q, s = _data(rng, n_q=37, n_s=37)  # q_shard=shard=5 over 8 devices
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8)
    state = {"q": False, "s": False}
    orig_q, orig_s = ks._build_ring_qcache, ks._build_ring_step

    def flaky(orig, which):
        def builder(*a, **kw):
            fn = orig(*a, **kw)

            def wrapped(*args, **kw2):
                if not state[which]:
                    state[which] = True
                    raise RuntimeError(
                        "RESOURCE_EXHAUSTED (fault injection)")
                return fn(*args, **kw2)
            return wrapped
        return builder

    monkeypatch.setattr(ks, "_build_ring_qcache", flaky(orig_q, "q"))
    monkeypatch.setattr(ks, "_build_ring_step", flaky(orig_s, "s"))
    d1, i1 = ks.knn_argmin_ring_streamed(embed, q, s, mesh,
                                         q_block=5, s_block=5)
    assert state["q"] and state["s"]
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_mesh_final_drain_catches_trailing_deferred_oom(rng, mesh,
                                                        monkeypatch,
                                                        capsys):
    """A deferred failure from one of the LAST _SYNC_WINDOW folds (no
    later popleft to surface it) must be caught by the end-of-sweep
    drain and resumed, not escape to combine()/readback."""
    q, s = _data(rng, n_q=8, n_s=32)  # shard=4, s_block=4 -> 1 fold step
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8)
    # drain 1 = pre-sweep verify; the single fold never pops the window,
    # so drain 2 is the FINAL state drain
    inj = _OneShotDrainOOM(fail_on=(2,))
    monkeypatch.setattr(ks, "_drain", inj)
    d1, i1 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh,
                                            q_block=8, s_block=4)
    assert "deferred synthetic stream OOM" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_ring_final_drain_catches_trailing_deferred_oom(rng, mesh,
                                                        monkeypatch,
                                                        capsys):
    q, s = _data(rng, n_q=8, n_s=32)  # shard=4, s_block=4 -> 1 ring step
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=8)
    inj = _OneShotDrainOOM(fail_on=(2,))  # 1=verify, 2=final state drain
    monkeypatch.setattr(ks, "_drain", inj)
    d1, i1 = ks.knn_argmin_ring_streamed(embed, q, s, mesh,
                                         q_block=4, s_block=4)
    assert "deferred synthetic stream OOM" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)
