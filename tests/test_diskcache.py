"""Persistent decoded-image disk cache (``io/diskcache``): repeat runs
over unchanged files must serve decoded pixels from the memmapped cache
with ZERO PNG decodes, and any input change (file touched, different
decode params, partial prior walk) must miss and re-decode.

The reference re-decodes its PNG dirs on every invocation
(``attack_models/fbb.py:101-110``); this cache is what makes repeat
attacks / hyperparameter sweeps skip the host decode that bounds the
real-data end-to-end wall clock (docs/PERF.md)."""

import os
from dataclasses import replace

import numpy as np
import pytest

from ganleaks_tpu.io.diskcache import DecodeCache, load_image_dir_cached
from ganleaks_tpu.io.images import save_png
from ganleaks_tpu.io.native import load_image_dir_native
from ganleaks_tpu.io.stream import HostImageSet


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv("GANLEAKS_DECODE_CACHE", raising=False)


@pytest.fixture
def png_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "data"
    d.mkdir()
    for k in range(10):
        save_png(rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32),
                 str(d / f"{k:03d}.png"), drange=(-1, 1))
    return str(d)


def test_eager_loader_second_call_is_decode_free(png_dir, monkeypatch):
    calls = []
    import ganleaks_tpu.io.native as native_mod
    orig = native_mod.load_image_paths_native

    def counting(paths, *a, **kw):
        calls.append(len(paths))
        return orig(paths, *a, **kw)

    monkeypatch.setattr(native_mod, "load_image_paths_native", counting)
    first = load_image_dir_cached(png_dir, 16, dtype=np.uint8)
    assert sum(calls) == 10
    second = load_image_dir_cached(png_dir, 16, dtype=np.uint8)
    assert sum(calls) == 10, "second run must not decode"
    assert isinstance(second, np.memmap) and not second.flags.writeable
    np.testing.assert_array_equal(np.asarray(first), np.asarray(second))
    eager = load_image_dir_native(png_dir, 16, dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(second), eager)


def test_key_includes_params_and_limit(png_dir):
    a = load_image_dir_cached(png_dir, 16, dtype=np.uint8)
    b = load_image_dir_cached(png_dir, 16, dtype=np.float32)
    c = load_image_dir_cached(png_dir, 16, dtype=np.uint8, limit=4)
    assert a.shape[0] == 10 and c.shape[0] == 4
    assert b.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(a[:4]), np.asarray(c))
    cache_dir = os.path.join(png_dir, ".ganleaks_decoded")
    npys = [f for f in os.listdir(cache_dir) if f.endswith(".npy")]
    assert len(npys) == 3, "distinct params must key distinct entries"


def test_touched_file_invalidates(png_dir, monkeypatch):
    load_image_dir_cached(png_dir, 16, dtype=np.uint8)
    victim = os.path.join(png_dir, "003.png")
    st = os.stat(victim)
    os.utime(victim, ns=(st.st_atime_ns, st.st_mtime_ns + 10_000_000))
    calls = []
    import ganleaks_tpu.io.native as native_mod
    orig = native_mod.load_image_paths_native

    def counting(paths, *a, **kw):
        calls.append(len(paths))
        return orig(paths, *a, **kw)

    monkeypatch.setattr(native_mod, "load_image_paths_native", counting)
    load_image_dir_cached(png_dir, 16, dtype=np.uint8)
    assert sum(calls) == 10, "mtime change must force a re-decode"


def test_host_stream_publishes_and_second_set_is_decode_free(
        png_dir, monkeypatch):
    eager = load_image_dir_native(png_dir, 16, dtype=np.uint8)
    first = HostImageSet(png_dir, 16, dtype=np.uint8, readahead=False)
    for s in range(0, 10, 4):                   # full sweep -> publish
        np.testing.assert_array_equal(first[s:s + 4], eager[s:s + 4])
    calls = []
    import ganleaks_tpu.io.stream as stream_mod
    orig = stream_mod.load_image_paths_native

    def counting(paths, *a, **kw):
        calls.append(len(paths))
        return orig(paths, *a, **kw)

    monkeypatch.setattr(stream_mod, "load_image_paths_native", counting)
    second = HostImageSet(png_dir, 16, dtype=np.uint8, readahead=False)
    np.testing.assert_array_equal(np.asarray(second), eager)
    np.testing.assert_array_equal(second[np.asarray([7, 1, 1])],
                                  eager[[7, 1, 1]])
    assert not calls, "a published cache must serve every access pattern"


def test_partial_walk_does_not_publish(png_dir):
    partial = HostImageSet(png_dir, 16, dtype=np.uint8, readahead=False)
    _ = partial[0:4]                            # 4 of 10 rows only
    sidecars = []
    cache_dir = os.path.join(png_dir, ".ganleaks_decoded")
    if os.path.isdir(cache_dir):
        sidecars = [f for f in os.listdir(cache_dir)
                    if f.endswith(".json")]
    assert not sidecars, "incomplete decode must not publish a sidecar"
    fresh = DecodeCache(png_dir, partial.paths, 16, partial.mode,
                        np.uint8)
    assert fresh.load() is None


def test_policy_off_and_env_override(png_dir, monkeypatch, tmp_path):
    hs = HostImageSet(png_dir, 16, dtype=np.uint8, disk_cache=False,
                      readahead=False)
    _ = np.asarray(hs)
    assert not os.path.isdir(os.path.join(png_dir, ".ganleaks_decoded"))
    monkeypatch.setenv("GANLEAKS_DECODE_CACHE", "off")
    load_image_dir_cached(png_dir, 16, dtype=np.uint8)
    assert not os.path.isdir(os.path.join(png_dir, ".ganleaks_decoded"))
    alt = str(tmp_path / "altcache")
    monkeypatch.setenv("GANLEAKS_DECODE_CACHE", alt)
    load_image_dir_cached(png_dir, 16, dtype=np.uint8)
    assert any(f.endswith(".json") for f in os.listdir(alt))
    assert not os.path.isdir(os.path.join(png_dir, ".ganleaks_decoded"))


def test_explicit_dir_policy(png_dir, tmp_path):
    pin = str(tmp_path / "pinned")
    load_image_dir_cached(png_dir, 16, dtype=np.uint8, policy=pin)
    assert any(f.endswith(".npy") for f in os.listdir(pin))


def test_attack_second_run_decode_free_and_equal(png_dir, tmp_path,
                                                 monkeypatch):
    from ganleaks_tpu.attack.fbb import run_attack
    from ganleaks_tpu.config import AttackConfig

    qdir = tmp_path / "q"
    qdir.mkdir()
    rng = np.random.default_rng(3)
    for k in range(3):
        save_png(rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32),
                 str(qdir / f"{k}.png"), drange=(-1, 1))
    cfg = AttackConfig(distance="l2", engine="gemm", host_stream=True,
                       syn_data_path=png_dir, pos_data_dir=str(qdir),
                       neg_data_dir=str(qdir), resolution=16,
                       query_block=4, syn_block=4,
                       save_root=str(tmp_path / "out1"))
    ref = run_attack(cfg)[0]

    calls = []
    import ganleaks_tpu.io.native as native_mod
    orig = native_mod.load_image_paths_native

    def counting(paths, *a, **kw):
        calls.append(len(paths))
        return orig(paths, *a, **kw)

    monkeypatch.setattr(native_mod, "load_image_paths_native", counting)
    monkeypatch.setattr("ganleaks_tpu.io.stream.load_image_paths_native",
                        counting)
    out = run_attack(replace(cfg, save_root=str(tmp_path / "out2")))[0]
    assert not calls, "re-run over unchanged data must not decode"
    np.testing.assert_array_equal(ref["pos_nn_idx"], out["pos_nn_idx"])
    np.testing.assert_allclose(ref["pos_loss"], out["pos_loss"],
                               rtol=1e-6)
    off = run_attack(replace(cfg, save_root=str(tmp_path / "out3"),
                             decode_cache=False))[0]
    assert calls, "decode_cache=False must fall back to decoding"
    np.testing.assert_array_equal(ref["pos_nn_idx"], off["pos_nn_idx"])


def test_sweep_skips_cache_dir_and_enumerates_subdirs(png_dir, tmp_path,
                                                      monkeypatch):
    """The directory sweep (``hyperparameter_search``, reference
    ``fbb.py:113-123``) must enumerate experiment subdirs but never the
    hidden ``.ganleaks_decoded`` cache a prior non-sweep run planted in
    the root."""
    from ganleaks_tpu.attack.fbb import run_attack
    from ganleaks_tpu.config import AttackConfig

    monkeypatch.chdir(tmp_path)
    root = tmp_path / "sweeps" / "syn_root"
    rng = np.random.default_rng(7)
    for exp in ("expA", "expB"):
        d = root / exp
        d.mkdir(parents=True)
        for k in range(5):
            save_png(rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32),
                     str(d / f"{k}.png"), drange=(-1, 1))
    qdir = tmp_path / "q"
    qdir.mkdir()
    for k in range(3):
        save_png(rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32),
                 str(qdir / f"{k}.png"), drange=(-1, 1))
    # a prior flat run's cache dir inside the sweep root must be skipped
    (root / ".ganleaks_decoded").mkdir()
    cfg = AttackConfig(distance="l2", engine="gemm", resolution=16,
                       query_block=4, syn_block=4,
                       syn_data_path=str(root), pos_data_dir=str(qdir),
                       neg_data_dir=str(qdir), exp_name="sweep",
                       hyperparameter_search=True,
                       save_root=str(tmp_path / "out"))
    results = run_attack(cfg)
    assert len(results) == 2, "one result per experiment subdir"
    out_root = tmp_path / "out" / "sweep__syn_root"
    assert sorted(os.listdir(out_root)) == ["expA", "expB"]
    for exp in ("expA", "expB"):
        assert (out_root / exp / "pos_loss.npy").exists()
        assert (out_root / exp / "params.txt").exists()


def test_rewriter_never_corrupts_published_entry(png_dir):
    """A second writer on the SAME key (concurrent sweep process, or a
    re-decode after a transient load error) must not touch the published
    bytes: open_for_write targets a per-process temp file, never the
    published ``.npy`` (in-place truncation would serve zeroed pixels
    under a still-valid sidecar)."""
    first = np.asarray(load_image_dir_cached(png_dir, 16, dtype=np.uint8))
    assert first.any(), "fixture images must be non-zero"
    paths = [os.path.join(png_dir, f) for f in sorted(os.listdir(png_dir))
             if f.endswith(".png")]
    rewriter = DecodeCache(png_dir, paths, 16, 0, np.uint8)
    assert rewriter.enabled
    mm = rewriter.open_for_write()   # crashes before mark_complete
    assert mm is not None
    assert rewriter._tmp_path != rewriter.npy_path
    again = DecodeCache(png_dir, paths, 16, 0, np.uint8).load()
    assert again is not None, "published entry must survive a re-writer"
    np.testing.assert_array_equal(np.asarray(again), first)
    del mm


def test_env_off_beats_explicit_policy_path(png_dir, tmp_path,
                                            monkeypatch):
    """GANLEAKS_DECODE_CACHE=off must win over a config-pinned cache
    dir (the operator's global kill switch on quota'd disks)."""
    pin = str(tmp_path / "pinned_env")
    monkeypatch.setenv("GANLEAKS_DECODE_CACHE", "off")
    load_image_dir_cached(png_dir, 16, dtype=np.uint8, policy=pin)
    assert not os.path.isdir(pin)
    monkeypatch.delenv("GANLEAKS_DECODE_CACHE")
    load_image_dir_cached(png_dir, 16, dtype=np.uint8, policy=pin)
    assert any(f.endswith(".json") for f in os.listdir(pin))


def test_gc_prunes_stale_entries_and_crashed_tmps(png_dir, tmp_path,
                                                  monkeypatch):
    """Publishing an entry garbage-collects the cache dir: entries
    beyond the keep budget and day-old writer temps go; fresh temps (a
    live concurrent writer) stay."""
    monkeypatch.setenv("GANLEAKS_DECODE_CACHE_KEEP", "1")
    cache_dir = os.path.join(png_dir, ".ganleaks_decoded")
    load_image_dir_cached(png_dir, 16, dtype=np.uint8)
    # a crashed writer's day-old temp + a live (fresh) one
    stale = os.path.join(cache_dir, "deadbeef.npy.w123")
    live = os.path.join(cache_dir, "cafecafe.npy.w456")
    for p in (stale, live):
        with open(p, "wb") as f:
            f.write(b"x")
    old = os.path.getmtime(stale) - 2 * 24 * 3600
    os.utime(stale, (old, old))
    # different key (different dtype) -> publish triggers the GC
    load_image_dir_cached(png_dir, 16, dtype=np.float32)
    names = os.listdir(cache_dir)
    assert not any(n.startswith("deadbeef") for n in names), "stale tmp"
    assert any(n.startswith("cafecafe") for n in names), "live tmp kept"
    assert sum(n.endswith(".json") for n in names) == 1, \
        "keep=1 leaves only the newest published entry"
    assert sum(n.endswith(".npy") for n in names) == 1
    # the surviving entry is the one just published and still loads
    assert isinstance(
        load_image_dir_cached(png_dir, 16, dtype=np.float32), np.memmap)
