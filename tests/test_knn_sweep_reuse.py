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
