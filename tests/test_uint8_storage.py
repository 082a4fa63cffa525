"""Lossless uint8 image residency (``ops/distance.images_unit_range``).

PNG pixels are natively 8-bit, so the device-resident image sets can be
held as uint8 and dequantized back to the [-1, 1] floats the host
readers produce. On CPU — this suite's backend, and the home of every
golden/parity test — the dequant is a 256-entry LUT, bit-identical to
the readers' f64 pipeline by construction, so everything here asserts
BIT equality. On TPU the LUT gather is a slow scalar path, so the
engine uses ``(2x-255)/255`` instead; XLA rewrites the division to a
reciprocal-multiply under jit, costing 1 ULP of the pixel value on
126/256 bytes — a bound pinned here (portably: the rewrite fires on
CPU too) and absorbed by every engine's documented error model;
``GANLEAKS_U8_LUT=1`` forces bit-exactness on TPU. Layers covered: the
dequant itself, the embed closures, each kNN engine, the mesh paths,
the loaders, and the full attack driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganleaks_tpu.attack.fbb import attack_arrays
from ganleaks_tpu.config import AttackConfig
from ganleaks_tpu.io.images import (
    load_image_dir,
    save_png,
    unit_to_uint8_exact,
)
from ganleaks_tpu.ops.distance import (
    images_unit_range,
    make_embed_fn,
    make_embed_parts_fn,
)
from ganleaks_tpu.ops.lpips import (
    init_lpips_params,
    lpips_embed_fn,
    lpips_embed_parts_fn,
)


def _host_pipeline(u8: np.ndarray) -> np.ndarray:
    """The readers' exact math: f64 ``2*(x/255)-1`` cast to f32
    (``io/images.read_image`` + ``load_image_dir``)."""
    return (2.0 * (u8.astype(np.float64) / 255.0) - 1.0).astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def test_lut_bitexact_for_all_256_bytes():
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    got = np.asarray(images_unit_range(jnp.asarray(u8)))
    want = _host_pipeline(u8)
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_strict_env_forces_lut_and_matches_default_on_cpu(monkeypatch):
    """GANLEAKS_U8_LUT=1 must select the LUT on any backend; on CPU the
    default path already IS the LUT, so the two agree bit-for-bit."""
    u8 = jnp.asarray(np.arange(256, dtype=np.uint8))
    default = np.asarray(images_unit_range(u8))
    monkeypatch.setenv("GANLEAKS_U8_LUT", "1")
    strict = np.asarray(images_unit_range(u8))
    np.testing.assert_array_equal(default.view(np.int32),
                                  strict.view(np.int32))


def test_tpu_fast_formula_is_within_one_ulp_of_exact():
    """The TPU-only arithmetic path ((2x-255)/255, division rewritten to
    reciprocal-multiply by XLA under jit) must stay within 1 ULP of the
    host pipeline for every byte — the bound the engine error models and
    DIVERGENCES.md quote. Checked under jit on this backend (the rewrite
    fires on CPU too, which is what makes the bound portable)."""
    u8 = jnp.asarray(np.arange(256, dtype=np.uint8))
    fast = np.asarray(jax.jit(
        lambda x: (2.0 * x.astype(jnp.float32) - 255.0) / 255.0)(u8))
    want = _host_pipeline(np.arange(256, dtype=np.uint8))
    ulp = np.abs(fast.view(np.int32) - want.view(np.int32))
    assert ulp.max() <= 1


def test_floats_pass_through_unchanged(rng):
    f = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    out = np.asarray(images_unit_range(jnp.asarray(f)))
    np.testing.assert_array_equal(out, f)


def test_unit_to_uint8_exact_roundtrip():
    u8 = np.arange(256, dtype=np.uint8)
    assert np.array_equal(unit_to_uint8_exact(_host_pipeline(u8)), u8)
    # idempotent on uint8 input
    assert np.array_equal(unit_to_uint8_exact(u8), u8)


@pytest.mark.parametrize("distance", ["l2", "l2-lpips"])
def test_embed_closures_bitexact_u8_vs_f32(rng, distance):
    u8 = rng.integers(0, 256, (6, 16, 16, 3), dtype=np.uint8)
    f32 = _host_pipeline(u8)
    lp = init_lpips_params(seed=0, net="vgg")
    flat = make_embed_fn(distance, lpips_embed_fn(lp, weight=0.2)
                         if distance == "l2-lpips" else None)
    a = np.asarray(flat(jnp.asarray(u8)))
    b = np.asarray(flat(jnp.asarray(f32)))
    np.testing.assert_array_equal(a.view(np.int32), b.view(np.int32))

    parts = make_embed_parts_fn(distance, lpips_embed_parts_fn(lp, weight=0.2)
                                if distance == "l2-lpips" else None)
    for pa, pb in zip(parts(jnp.asarray(u8)), parts(jnp.asarray(f32))):
        np.testing.assert_array_equal(np.asarray(pa).view(np.int32),
                                      np.asarray(pb).view(np.int32))


def _fixture_sets(rng):
    syn = rng.integers(0, 256, (40, 16, 16, 3), dtype=np.uint8)
    pos = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
    neg = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
    syn[7] = pos[1]  # an exact member leak the search must find
    return syn, pos, neg


@pytest.mark.parametrize("engine", ["gemm", "exact", "taps", "taps-int8"])
def test_attack_engines_identical_u8_vs_f32(rng, engine):
    syn, pos, neg = _fixture_sets(rng)
    cfg = AttackConfig(distance="l2-lpips", engine=engine,
                       query_block=4, syn_block=16)
    o8 = attack_arrays(cfg, syn, pos, neg)
    of = attack_arrays(cfg, _host_pipeline(syn), _host_pipeline(pos),
                       _host_pipeline(neg))
    np.testing.assert_array_equal(o8["pos_nn_idx"], of["pos_nn_idx"])
    np.testing.assert_array_equal(o8["pos_loss"], of["pos_loss"])
    np.testing.assert_array_equal(o8["neg_loss"], of["neg_loss"])
    assert o8["pos_nn_idx"][1] == 7


def test_attack_two_pass_identical_u8_vs_f32(rng):
    syn, pos, neg = _fixture_sets(rng)
    cfg = AttackConfig(distance="l2-lpips", engine="taps", two_pass=True,
                       query_block=4, syn_block=16)
    o8 = attack_arrays(cfg, syn, pos, neg)
    of = attack_arrays(cfg, _host_pipeline(syn), _host_pipeline(pos),
                       _host_pipeline(neg))
    np.testing.assert_array_equal(o8["pos_nn_idx"], of["pos_nn_idx"])
    np.testing.assert_array_equal(o8["pos_loss"], of["pos_loss"])


@pytest.mark.parametrize("layout", ["sharded", "ring"])
def test_attack_mesh_identical_u8_vs_f32(rng, layout):
    import jax
    from jax.sharding import Mesh

    syn, pos, neg = _fixture_sets(rng)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), ("syn",))
    cfg = AttackConfig(distance="l2", engine="gemm", shard_layout=layout,
                       query_block=4, syn_block=8)
    o8 = attack_arrays(cfg, syn, pos, neg, mesh=mesh)
    of = attack_arrays(cfg, _host_pipeline(syn), _host_pipeline(pos),
                       _host_pipeline(neg), mesh=mesh)
    np.testing.assert_array_equal(o8["pos_nn_idx"], of["pos_nn_idx"])
    np.testing.assert_array_equal(o8["pos_loss"], of["pos_loss"])
    assert o8["pos_nn_idx"][1] == 7


def test_loader_uint8_dtype_matches_float_pipeline(rng, tmp_path):
    for i in range(4):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        save_png(img.astype(np.float64) / 255.0, str(tmp_path / f"{i}.png"))
    f = load_image_dir(str(tmp_path), resolution=16)
    u = load_image_dir(str(tmp_path), resolution=16, dtype=np.uint8)
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(_host_pipeline(u).view(np.int32),
                                  f.view(np.int32))


def test_run_attack_uint8_storage_artifacts_identical(rng, tmp_path):
    """End-to-end driver parity: uint8_storage produces byte-identical
    loss/index artifacts to the float pipeline."""
    import os

    from ganleaks_tpu.attack.fbb import run_attack
    from dataclasses import replace

    dirs = {}
    for name, n in [("syn", 24), ("pos", 4), ("neg", 4)]:
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            save_png(img.astype(np.float64) / 255.0, str(d / f"{i}.png"))
        dirs[name] = str(d)

    base = AttackConfig(
        exp_name="u8", syn_data_path=dirs["syn"],
        pos_data_dir=dirs["pos"], neg_data_dir=dirs["neg"],
        data_num=4, resolution=16, distance="l2", engine="gemm",
        query_block=4, syn_block=8,
        save_root=str(tmp_path / "out_u8"), save_plots=True)
    cwd = os.getcwd()
    os.chdir(tmp_path)  # run_attack joins save_root onto cwd
    try:
        run_attack(replace(base, uint8_storage=True))
        run_attack(replace(base, uint8_storage=False, exp_name="f32",
                           save_root=str(tmp_path / "out_f32")))
    finally:
        os.chdir(cwd)
    a = np.load(tmp_path / "out_u8" / "u8" / "pos_loss.npy")
    b = np.load(tmp_path / "out_f32" / "f32" / "pos_loss.npy")
    np.testing.assert_array_equal(a, b)
    ai = np.load(tmp_path / "out_u8" / "u8" / "pos_nn_idx.npy")
    bi = np.load(tmp_path / "out_f32" / "f32" / "pos_nn_idx.npy")
    np.testing.assert_array_equal(ai, bi)
    # the closest-pair PNG artifacts are byte-identical: the uint8 path
    # must route through the reference's floor-truncate scale chain
    # (fbb.py:106), not dump raw bytes (which would differ by 1 for
    # half the byte values)
    for name in ["0pos.png", "0neg.png"]:
        a = (tmp_path / "out_u8" / "u8" / name).read_bytes()
        b = (tmp_path / "out_f32" / "f32" / name).read_bytes()
        assert a == b, f"{name} differs between uint8 and f32 storage"
