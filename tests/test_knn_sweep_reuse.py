"""Sweep-level query-embedding reuse (``ops/knn`` ``query_reuse`` +
``attack/fbb`` ``sweep_cache``).

The fbb hyperparameter-search sweep re-runs the attack once per synthetic
subdir (reference ``attack_models/fbb.py:113-123``) but the query sets are
subdir-invariant — re-featurizing them per subdir is pure waste. These
tests pin (a) exactness: reuse returns bit-identical results; (b) the
skip: the second search performs ZERO query featurize cache writes;
(c) the fbb sweep wires it up end to end; (d) safety: a different
same-shaped query set does not silently reuse a stale cache.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import ganleaks_tpu.ops.knn as knn_mod
from ganleaks_tpu.ops.distance import make_embed_fn, make_embed_parts_fn
from ganleaks_tpu.ops.knn import knn_argmin_streamed, knn_argmin_streamed_parts


def _data(n_q=24, n_s=64, d=48, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n_q, d)).astype(np.float32)
    s = rng.normal(size=(n_s, d)).astype(np.float32)
    return q, s


def _count_cache_writes(monkeypatch):
    """Count query-cache row writes (one per featurized query block per
    part) — the observable that distinguishes 'featurized' from
    'reused'."""
    calls = {"n": 0}
    orig = knn_mod._update_rows

    def counting(buf, part, offset):
        calls["n"] += 1
        return orig(buf, part, offset)

    monkeypatch.setattr(knn_mod, "_update_rows", counting)
    return calls


def test_reuse_is_exact_and_skips_featurize(monkeypatch):
    q, s = _data()
    embed = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(embed, q, s, q_block=8, s_block=16)

    calls = _count_cache_writes(monkeypatch)
    holder: dict = {}
    d1, i1 = knn_argmin_streamed(embed, q, s, q_block=8, s_block=16,
                                 query_reuse=holder)
    first = calls["n"]
    assert first > 0 and holder, "first call must featurize and store"

    d2, i2 = knn_argmin_streamed(embed, q, s, q_block=8, s_block=16,
                                 query_reuse=holder)
    assert calls["n"] == first, "second call must skip the query featurize"

    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_reuse_parts_engine(monkeypatch):
    q, s = _data(d=27)
    q4 = q.reshape(-1, 3, 3, 3)
    s4 = s.reshape(-1, 3, 3, 3)
    embed = make_embed_parts_fn("l2")
    d0, i0 = knn_argmin_streamed_parts(embed, q4, s4, q_block=8, s_block=16)

    calls = _count_cache_writes(monkeypatch)
    holder: dict = {}
    knn_argmin_streamed_parts(embed, q4, s4, q_block=8, s_block=16,
                              query_reuse=holder)
    first = calls["n"]
    d2, i2 = knn_argmin_streamed_parts(embed, q4, s4, q_block=8,
                                       s_block=16, query_reuse=holder)
    assert calls["n"] == first
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i2))


def test_different_queries_do_not_reuse(monkeypatch):
    """A different query set (same shape) must refeaturize, not return
    the previous set's neighbors — the first-row hash catches the swap."""
    q, s = _data()
    q_other = q[::-1].copy()  # same shape, different first row
    embed = make_embed_fn("l2")
    holder: dict = {}
    knn_argmin_streamed(embed, q, s, q_block=8, s_block=16,
                        query_reuse=holder)
    calls = _count_cache_writes(monkeypatch)
    d, i = knn_argmin_streamed(embed, q_other, s, q_block=8, s_block=16,
                               query_reuse=holder)
    assert calls["n"] > 0, "swapped queries must refeaturize"
    d_ref, i_ref = knn_argmin_streamed(embed, q_other, s, q_block=8,
                                       s_block=16)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_fbb_sweep_featurizes_queries_once(tmp_path, monkeypatch):
    """End to end: a 3-subdir hyperparameter-search sweep featurizes the
    query sets exactly once, and each subdir's artifacts equal the
    corresponding standalone (non-sweep) attack."""
    from dataclasses import replace

    from ganleaks_tpu.attack.fbb import run_attack
    from ganleaks_tpu.config import AttackConfig
    from ganleaks_tpu.io.images import save_png

    rng = np.random.default_rng(1)

    def dump(dirname, n, seed):
        r = np.random.default_rng(seed)
        d = tmp_path / dirname
        d.mkdir(parents=True)
        imgs = r.uniform(-1, 1, (n, 8, 8, 3)).astype(np.float32)
        for k, im in enumerate(imgs):
            save_png(im, str(d / f"{k:03d}.png"), drange=(-1, 1))

    for j in range(3):
        dump(f"syn_root/params{j}", 20, seed=10 + j)
    dump("pos", 6, seed=3)
    dump("neg", 6, seed=4)

    cfg = AttackConfig(
        exp_name="sweep", syn_data_path=str(tmp_path / "syn_root"),
        pos_data_dir=str(tmp_path / "pos"),
        neg_data_dir=str(tmp_path / "neg"),
        distance="l2", engine="gemm", resolution=8,
        hyperparameter_search=True, save_plots=False,
        save_root=str(tmp_path / "out_sweep"))

    calls = _count_cache_writes(monkeypatch)
    results = run_attack(cfg)
    assert len(results) == 3
    sweep_writes = calls["n"]

    # standalone runs for comparison (fresh counter; each featurizes its
    # own queries)
    calls["n"] = 0
    solo = []
    for j in range(3):
        solo_cfg = replace(
            cfg, hyperparameter_search=False,
            syn_data_path=str(tmp_path / f"syn_root/params{j}"),
            save_root=str(tmp_path / f"out_solo{j}"))
        solo.extend(run_attack(solo_cfg))
    solo_writes = calls["n"]

    # the sweep shares one query featurize across 3 subdirs: strictly
    # fewer cache writes than three standalone runs
    assert sweep_writes < solo_writes

    for r_sweep, r_solo in zip(results, solo):
        np.testing.assert_array_equal(r_sweep["pos_loss"],
                                      r_solo["pos_loss"])
        np.testing.assert_array_equal(r_sweep["neg_loss"],
                                      r_solo["neg_loss"])
        np.testing.assert_array_equal(r_sweep["pos_nn_idx"],
                                      r_solo["pos_nn_idx"])
        np.testing.assert_array_equal(r_sweep["neg_nn_idx"],
                                      r_solo["neg_nn_idx"])


def test_reuse_dropped_on_chunk_restart():
    """The held buffers are HBM an OOM recovery needs back: simulate the
    restart paths clearing the holder."""
    q, s = _data()
    embed = make_embed_fn("l2")
    holder: dict = {}
    knn_argmin_streamed(embed, q, s, q_block=8, s_block=16,
                        query_reuse=holder)
    assert holder["fp"][0] == len(q)
    assert holder["bufs"][0].shape[0] >= len(q)
    # a mismatched fingerprint (e.g. different n_q) must not engage
    d, i = knn_argmin_streamed(embed, q[:16], s, q_block=8, s_block=16,
                               query_reuse=holder)
    d_ref, _ = knn_argmin_streamed(embed, q[:16], s, q_block=8, s_block=16)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))


# ---------------------------------------------------------------------------
# VERDICT r4 #6: reuse on the mesh drivers and the two-pass paths (the
# round-4 feature was single-chip single-pass only)
# ---------------------------------------------------------------------------

import jax
from jax.sharding import Mesh

import ganleaks_tpu.parallel.knn_shard as ks


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("syn",))


def _count_mesh_cache_writes(monkeypatch):
    """knn_shard binds ops.knn._update_rows by name at import — count its
    own binding."""
    calls = {"n": 0}
    orig = ks._update_rows

    def counting(buf, part, offset):
        calls["n"] += 1
        return orig(buf, part, offset)

    monkeypatch.setattr(ks, "_update_rows", counting)
    return calls


def test_reuse_mesh_sharded(monkeypatch):
    q, s = _data(n_q=24, n_s=64)
    mesh = _mesh()
    embed = make_embed_fn("l2")
    d0, i0 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh,
                                            q_block=8, s_block=8)
    calls = _count_mesh_cache_writes(monkeypatch)
    holder: dict = {}
    d1, i1 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh, q_block=8,
                                            s_block=8, query_reuse=holder)
    first = calls["n"]
    assert first > 0 and holder, "first call must featurize and store"
    d2, i2 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh, q_block=8,
                                            s_block=8, query_reuse=holder)
    assert calls["n"] == first, "second call must skip the query featurize"
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_reuse_mesh_different_queries_do_not_reuse(monkeypatch):
    q, s = _data(n_q=24, n_s=64)
    mesh = _mesh()
    embed = make_embed_fn("l2")
    holder: dict = {}
    ks.knn_argmin_sharded_streamed(embed, q, s, mesh, q_block=8, s_block=8,
                                   query_reuse=holder)
    q_other = q[::-1].copy()
    calls = _count_mesh_cache_writes(monkeypatch)
    d, i = ks.knn_argmin_sharded_streamed(embed, q_other, s, mesh,
                                          q_block=8, s_block=8,
                                          query_reuse=holder)
    assert calls["n"] > 0, "swapped queries must refeaturize"
    d_ref, i_ref = ks.knn_argmin_sharded_streamed(embed, q_other, s, mesh,
                                                  q_block=8, s_block=8)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_reuse_ring(monkeypatch):
    q, s = _data(n_q=24, n_s=64)
    mesh = _mesh()
    embed = make_embed_fn("l2")
    d0, i0 = ks.knn_argmin_ring_streamed(embed, q, s, mesh,
                                         q_block=8, s_block=8)
    fills = {"n": 0}
    orig = ks._build_ring_qcache

    def wrap(*a, **k):
        fn = orig(*a, **k)

        def counted(*aa, **kk):
            fills["n"] += 1
            return fn(*aa, **kk)
        return counted

    monkeypatch.setattr(ks, "_build_ring_qcache", wrap)
    holder: dict = {}
    d1, i1 = ks.knn_argmin_ring_streamed(embed, q, s, mesh, q_block=8,
                                         s_block=8, query_reuse=holder)
    first = fills["n"]
    assert first > 0 and holder, "first call must fill the sharded cache"
    d2, i2 = ks.knn_argmin_ring_streamed(embed, q, s, mesh, q_block=8,
                                         s_block=8, query_reuse=holder)
    assert fills["n"] == first, "second call must reuse the sharded cache"
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_reuse_two_pass(monkeypatch):
    from ganleaks_tpu.ops.knn import knn_argmin_two_pass

    q, s = _data()
    lo = make_embed_fn("l2")
    hi = make_embed_fn("l2")
    d0, i0 = knn_argmin_two_pass(lo, hi, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=16)
    calls = _count_cache_writes(monkeypatch)
    lo_h: dict = {}
    hi_h: dict = {}
    d1, i1 = knn_argmin_two_pass(lo, hi, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=16,
                                 query_reuse=lo_h, rerank_reuse=hi_h)
    first = calls["n"]
    assert first > 0 and lo_h and hi_h, \
        "first call must featurize and store both caches"
    d2, i2 = knn_argmin_two_pass(lo, hi, jnp.asarray(q), jnp.asarray(s),
                                 q_block=8, s_block=16,
                                 query_reuse=lo_h, rerank_reuse=hi_h)
    assert calls["n"] == first, \
        "second call must skip both query featurizes"
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_reuse_two_pass_mesh(monkeypatch):
    q, s = _data(n_q=24, n_s=64)
    mesh = _mesh()
    lo = make_embed_fn("l2")
    hi = make_embed_fn("l2")
    d0, i0 = ks.knn_argmin_two_pass_mesh(lo, hi, q, s, mesh,
                                         q_block=8, s_block=8)
    mesh_calls = _count_mesh_cache_writes(monkeypatch)
    chip_calls = _count_cache_writes(monkeypatch)  # the rerank is 1-chip
    lo_h: dict = {}
    hi_h: dict = {}
    d1, i1 = ks.knn_argmin_two_pass_mesh(lo, hi, q, s, mesh, q_block=8,
                                         s_block=8, query_reuse=lo_h,
                                         rerank_reuse=hi_h)
    first_mesh, first_chip = mesh_calls["n"], chip_calls["n"]
    assert first_mesh > 0 and lo_h and hi_h
    d2, i2 = ks.knn_argmin_two_pass_mesh(lo, hi, q, s, mesh, q_block=8,
                                         s_block=8, query_reuse=lo_h,
                                         rerank_reuse=hi_h)
    assert mesh_calls["n"] == first_mesh
    assert chip_calls["n"] == first_chip
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.parametrize("variant", ["mesh_sharded", "mesh_ring",
                                     "two_pass"])
def test_fbb_sweep_reuse_all_paths(tmp_path, monkeypatch, variant):
    """The fbb sweep wires reuse on every path: mesh-sharded, ring, and
    two-pass sweeps produce bit-identical artifacts to standalone runs
    with strictly fewer query featurize writes."""
    from dataclasses import replace

    from ganleaks_tpu.attack.fbb import run_attack
    from ganleaks_tpu.config import AttackConfig
    from ganleaks_tpu.io.images import save_png

    def dump(dirname, n, seed):
        r = np.random.default_rng(seed)
        d = tmp_path / dirname
        d.mkdir(parents=True)
        imgs = r.uniform(-1, 1, (n, 8, 8, 3)).astype(np.float32)
        for k, im in enumerate(imgs):
            save_png(im, str(d / f"{k:03d}.png"), drange=(-1, 1))

    for j in range(2):
        dump(f"syn_root/params{j}", 20, seed=10 + j)
    dump("pos", 6, seed=3)
    dump("neg", 6, seed=4)

    cfg = AttackConfig(
        exp_name="sweep", syn_data_path=str(tmp_path / "syn_root"),
        pos_data_dir=str(tmp_path / "pos"),
        neg_data_dir=str(tmp_path / "neg"),
        distance="l2", engine="gemm", resolution=8,
        hyperparameter_search=True, save_plots=False,
        save_root=str(tmp_path / "out_sweep"))
    if variant == "mesh_sharded":
        cfg = replace(cfg, n_chips=4)
    elif variant == "mesh_ring":
        cfg = replace(cfg, n_chips=4, shard_layout="ring")
    else:
        cfg = replace(cfg, two_pass=True)

    chip_calls = _count_cache_writes(monkeypatch)
    mesh_calls = _count_mesh_cache_writes(monkeypatch)
    ring_fills = {"n": 0}
    orig_qc = ks._build_ring_qcache

    def wrap(*a, **k):
        fn = orig_qc(*a, **k)

        def counted(*aa, **kk):
            ring_fills["n"] += 1
            return fn(*aa, **kk)
        return counted

    monkeypatch.setattr(ks, "_build_ring_qcache", wrap)

    results = run_attack(cfg)
    assert len(results) == 2
    sweep_writes = (chip_calls["n"], mesh_calls["n"], ring_fills["n"])

    chip_calls["n"] = mesh_calls["n"] = ring_fills["n"] = 0
    solo = []
    for j in range(2):
        solo_cfg = replace(
            cfg, hyperparameter_search=False,
            syn_data_path=str(tmp_path / f"syn_root/params{j}"),
            save_root=str(tmp_path / f"out_solo{j}"))
        solo.extend(run_attack(solo_cfg))
    solo_writes = (chip_calls["n"], mesh_calls["n"], ring_fills["n"])

    assert sum(sweep_writes) < sum(solo_writes), (sweep_writes,
                                                  solo_writes)
    for r_sweep, r_solo in zip(results, solo):
        np.testing.assert_array_equal(r_sweep["pos_loss"],
                                      r_solo["pos_loss"])
        np.testing.assert_array_equal(r_sweep["neg_loss"],
                                      r_solo["neg_loss"])
        np.testing.assert_array_equal(r_sweep["pos_nn_idx"],
                                      r_solo["pos_nn_idx"])
        np.testing.assert_array_equal(r_sweep["neg_nn_idx"],
                                      r_solo["neg_nn_idx"])


def test_layout_flip_does_not_collide_holders():
    """Round-5 review: sharded and ring holders have incompatible
    schemas; with one shared holder a layout flip must refeaturize (the
    fingerprints carry a layout tag), never KeyError or reuse the other
    layout's cache."""
    q, s = _data(n_q=24, n_s=64)
    mesh = _mesh()
    embed = make_embed_fn("l2")
    holder: dict = {}
    d0, i0 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh, q_block=8,
                                            s_block=8, query_reuse=holder)
    d1, i1 = ks.knn_argmin_ring_streamed(embed, q, s, mesh, q_block=8,
                                         s_block=8, query_reuse=holder)
    # and back again (the ring stored its schema into the holder)
    d2, i2 = ks.knn_argmin_sharded_streamed(embed, q, s, mesh, q_block=8,
                                            s_block=8, query_reuse=holder)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d2), rtol=1e-6)


def test_embed_change_invalidates_query_holders(monkeypatch):
    """Round-5 review: attack_arrays rebuilds embeds when embed_key
    changes but the query-cache fingerprints only hash RAW images — the
    holders must be dropped with the embeds, or stale embeddings are
    silently reused."""
    from ganleaks_tpu.attack.fbb import attack_arrays
    from ganleaks_tpu.config import AttackConfig

    rng = np.random.default_rng(3)
    syn = rng.uniform(-1, 1, (20, 8, 8, 3)).astype(np.float32)
    pos = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    base = AttackConfig(distance="l2", resolution=8, save_plots=False)

    cache: dict = {}
    from dataclasses import replace
    attack_arrays(replace(base, engine="gemm"), syn, pos, neg,
                  sweep_cache=cache)
    assert cache.get("query_reuse"), "gemm pass must store a holder"
    held = dict(cache["query_reuse"])

    out = attack_arrays(replace(base, engine="exact"), syn, pos, neg,
                        sweep_cache=cache)
    # the engine flip changed embed_key: the old holder must have been
    # DROPPED and the cache refilled by a fresh featurize (the raw-image
    # fingerprint alone cannot distinguish the embeddings)
    assert cache["embed_key"][0] == "exact"
    fresh = cache.get("query_reuse", {})
    assert not fresh or fresh["bufs"][0] is not held["bufs"][0]

    solo = attack_arrays(replace(base, engine="exact"), syn, pos, neg)
    np.testing.assert_array_equal(out["pos_nn_idx"], solo["pos_nn_idx"])
    np.testing.assert_array_equal(out["pos_loss"], solo["pos_loss"])
