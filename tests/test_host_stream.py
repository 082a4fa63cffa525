"""Pipelined host ingest (``io/stream.HostImageSet``): array-like parity
with the eager loader, readahead overlap, and attack equality with the
device-resident path (the ``host_stream`` config)."""

import threading
from dataclasses import replace

import numpy as np
import pytest

import ganleaks_tpu.io.stream as stream_mod
from ganleaks_tpu.io.images import save_png
from ganleaks_tpu.io.native import load_image_dir_native
from ganleaks_tpu.io.stream import HostImageSet


@pytest.fixture
def png_dir(tmp_path):
    rng = np.random.default_rng(0)
    for k in range(12):
        save_png(rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32),
                 str(tmp_path / f"{k:03d}.png"), drange=(-1, 1))
    return str(tmp_path)


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_matches_eager_loader(png_dir, dtype):
    eager = load_image_dir_native(png_dir, 16, dtype=dtype)
    lazy = HostImageSet(png_dir, 16, dtype=dtype)
    assert lazy.shape == eager.shape and lazy.dtype == eager.dtype
    assert lazy.nbytes == eager.nbytes and len(lazy) == 12
    np.testing.assert_array_equal(lazy[0:5], eager[0:5])
    np.testing.assert_array_equal(lazy[5:12], eager[5:12])
    np.testing.assert_array_equal(lazy[7], eager[7])
    np.testing.assert_array_equal(lazy[np.asarray([9, 2, 3, 4, 2])],
                                  eager[[9, 2, 3, 4, 2]])
    np.testing.assert_array_equal(lazy[::3], eager[::3])
    np.testing.assert_array_equal(np.asarray(lazy), eager)
    lim = lazy.limit(7)
    assert len(lim) == 7 and lim.shape[0] == 7
    np.testing.assert_array_equal(lim[0:7], eager[:7])


def test_sequential_reads_served_by_readahead(png_dir, monkeypatch):
    """Walking the set in equal sequential windows must decode at most
    the FIRST window on the calling thread — the rest comes from the
    background prefetch (the whole point: decode overlaps device work)."""
    main_thread_decodes = []
    orig = stream_mod.load_image_paths_native

    def counting(paths, *a, **kw):
        if threading.current_thread() is threading.main_thread():
            main_thread_decodes.append(len(paths))
        return orig(paths, *a, **kw)

    monkeypatch.setattr(stream_mod, "load_image_paths_native", counting)
    lazy = HostImageSet(png_dir, 16)
    for start in range(0, 12, 4):
        _ = lazy[start:start + 4]
    assert main_thread_decodes == [4], \
        "only the first window decodes synchronously"


def test_second_sweep_served_from_ram_cache(png_dir, monkeypatch):
    """Multi-chunk schedules re-sweep the generated set once per chunk:
    rows decode ONCE, later sweeps come from the host RAM cache (no
    re-decode — decode is the host bottleneck)."""
    calls = []
    orig = stream_mod.load_image_paths_native

    def counting(paths, *a, **kw):
        calls.append(len(paths))
        return orig(paths, *a, **kw)

    monkeypatch.setattr(stream_mod, "load_image_paths_native", counting)
    lazy = HostImageSet(png_dir, 16, readahead=False)
    first = [lazy[s:s + 4].copy() for s in range(0, 12, 4)]
    n_decode_calls = len(calls)
    second = [lazy[s:s + 4] for s in range(0, 12, 4)]
    assert len(calls) == n_decode_calls, "second sweep re-decoded"
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_resume_style_rewalk_is_correct(png_dir):
    """A mid-walk block-size change (what an OOM resume does) must not
    be corrupted by a stale prefetch window."""
    eager = load_image_dir_native(png_dir, 16, dtype=np.uint8)
    lazy = HostImageSet(png_dir, 16, dtype=np.uint8)
    _ = lazy[0:4]                       # primes prefetch of [4:8)
    np.testing.assert_array_equal(lazy[4:6], eager[4:6])  # halved block
    np.testing.assert_array_equal(lazy[6:8], eager[6:8])
    np.testing.assert_array_equal(lazy[8:12], eager[8:12])


@pytest.mark.parametrize("engine", ["gemm", "taps-int8"])
def test_attack_host_stream_equals_resident(png_dir, engine):
    from ganleaks_tpu.attack.fbb import attack_arrays
    from ganleaks_tpu.config import AttackConfig

    rng = np.random.default_rng(1)
    pos = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    base = AttackConfig(distance="l2", engine=engine, query_block=4,
                        syn_block=4, resolution=16)
    syn_eager = load_image_dir_native(png_dir, 16, dtype=np.uint8)
    ref = attack_arrays(base, syn_eager, pos, neg)
    out = attack_arrays(replace(base, host_stream=True),
                        HostImageSet(png_dir, 16, dtype=np.uint8),
                        pos, neg)
    np.testing.assert_array_equal(ref["pos_nn_idx"], out["pos_nn_idx"])
    np.testing.assert_array_equal(ref["neg_nn_idx"], out["neg_nn_idx"])
    np.testing.assert_allclose(ref["pos_loss"], out["pos_loss"], rtol=1e-6)


def test_attack_host_stream_two_pass(png_dir):
    """two_pass gathers candidate rows from the host set (fancy index)
    — the re-rank must not eagerly decode/ship the whole set."""
    from ganleaks_tpu.attack.fbb import attack_arrays
    from ganleaks_tpu.config import AttackConfig

    rng = np.random.default_rng(2)
    pos = rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    base = AttackConfig(distance="l2", engine="gemm", two_pass=True,
                        two_pass_k=2, query_block=4, syn_block=4,
                        resolution=16)
    syn_eager = load_image_dir_native(png_dir, 16, dtype=np.uint8)
    ref = attack_arrays(base, syn_eager, pos, neg)
    out = attack_arrays(replace(base, host_stream=True),
                        HostImageSet(png_dir, 16, dtype=np.uint8),
                        pos, neg)
    np.testing.assert_array_equal(ref["pos_nn_idx"], out["pos_nn_idx"])
    np.testing.assert_allclose(ref["neg_loss"], out["neg_loss"],
                               rtol=1e-6)


def test_run_attack_host_stream_e2e(png_dir, tmp_path):
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
                       save_root=str(tmp_path / "out"), save_plots=True)
    out = run_attack(cfg)
    assert len(out) == 1 and "pos_loss" in out[0]
    np.testing.assert_allclose(out[0]["pos_loss"], out[0]["neg_loss"])


def test_indexing_errors_like_ndarray(png_dir):
    lazy = HostImageSet(png_dir, 16)
    eager = load_image_dir_native(png_dir, 16, dtype=np.uint8)
    np.testing.assert_array_equal(lazy[-1], eager[-1])
    np.testing.assert_array_equal(lazy[np.asarray([4, -1, -12])],
                                  eager[[4, -1, -12]])
    with pytest.raises(IndexError):
        _ = lazy[12]
    with pytest.raises(IndexError):
        _ = lazy[np.asarray([0, 12])]
    with pytest.raises(IndexError):
        _ = lazy[-13]


def test_strided_slice_decodes_only_selected_rows(png_dir, monkeypatch):
    decoded = []
    orig = stream_mod.load_image_paths_native

    def counting(paths, *a, **kw):
        decoded.append(len(paths))
        return orig(paths, *a, **kw)

    monkeypatch.setattr(stream_mod, "load_image_paths_native", counting)
    lazy = HostImageSet(png_dir, 16, readahead=False)
    eager = load_image_dir_native(png_dir, 16, dtype=np.uint8)
    np.testing.assert_array_equal(lazy[::5], eager[::5])
    assert sum(decoded) == 3, "decoded only the 3 selected rows"


def test_host_stream_auto_resolution():
    from ganleaks_tpu.attack.fbb import host_stream_enabled
    from ganleaks_tpu.config import AttackConfig

    assert host_stream_enabled(AttackConfig())  # auto + uint8 single-chip
    assert not host_stream_enabled(AttackConfig(uint8_storage=False))
    assert not host_stream_enabled(AttackConfig(n_chips=8))
    assert not host_stream_enabled(AttackConfig(), mesh=object())
    assert host_stream_enabled(AttackConfig(host_stream=True,
                                            uint8_storage=False))
    assert not host_stream_enabled(AttackConfig(host_stream=False))
    with pytest.raises(ValueError, match="host_stream"):
        host_stream_enabled(AttackConfig(host_stream="sometimes"))


def test_boolean_mask_indexing(png_dir):
    """A boolean mask must select rows numpy-style (regression: it was
    read as integer indices 0/1, returning copies of the first rows)."""
    hs = HostImageSet(png_dir, 16, dtype=np.uint8, readahead=False)
    eager = np.asarray(hs)
    mask = np.zeros(len(hs), bool)
    mask[[2, 5, 7]] = True
    np.testing.assert_array_equal(hs[mask], eager[mask])
    with pytest.raises(IndexError, match="boolean mask"):
        _ = hs[np.ones(3, bool)]
