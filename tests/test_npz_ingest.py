"""NPZ ingest (io/npz.py): bit-parity with the PNG path, layout/key
handling, and the attack driver's format auto-resolution.

The reference dumps every synthetic set twice — PNG dir + NPZ array
(``gan_models/dcgan/train_torch.py:160-165``, ``pggan/train.py:251-253``,
``vaegan/sample.py:57-59``) — but its attack only ever reads the PNGs.
These tests pin the contract that ingesting the NPZ is indistinguishable
from reading the PNGs the same floats produced."""

import os

import numpy as np
import pytest

from ganleaks_tpu.io.images import load_image_dir, save_png
from ganleaks_tpu.io.native import load_image_dir_native
from ganleaks_tpu.io.npz import (find_npz_files, load_npz_images,
                                 resolve_input_format)


def _write_both(tmp_path, floats01_nchw, key="fake", sub="run"):
    """One fixture in the reference's dual-dump layout: the floats as an
    NPZ under npz_images/ and their floor-quantized PNGs under
    png_images/ (exactly what train_torch.py:155-165 writes)."""
    npz_dir = tmp_path / "npz_images" / sub
    png_dir = tmp_path / "png_images" / sub
    os.makedirs(npz_dir)
    os.makedirs(png_dir)
    np.savez(npz_dir / "dump.npz", **{key: floats01_nchw})
    nhwc = np.transpose(floats01_nchw, (0, 2, 3, 1))
    for i, img in enumerate(nhwc):
        save_png(img, str(png_dir / f"img_{i:04d}.png"))  # floor, [0,1]
    return str(npz_dir / "dump.npz"), str(png_dir)


def test_bit_parity_with_png_dir(tmp_path, rng):
    floats = rng.uniform(0, 1, (7, 16, 16, 3)).astype(np.float32)
    npz_path, png_dir = _write_both(
        tmp_path, np.transpose(floats, (0, 3, 1, 2)))
    from_png = load_image_dir(png_dir, resolution=16)
    from_npz = load_npz_images(npz_path, resolution=16)
    np.testing.assert_array_equal(from_npz, from_png.astype(np.float32))
    # uint8 storage path: raw bytes identical too
    u8_png = load_image_dir_native(png_dir, 16, dtype=np.uint8)
    u8_npz = load_npz_images(npz_path, 16, dtype=np.uint8)
    np.testing.assert_array_equal(u8_npz, u8_png)


def test_resize_parity_with_png_dir(tmp_path, rng):
    # stored at 16, attacked at 8 -> both paths go through PIL's default
    # resize on the same uint8 bytes (attack_models/utils.py:79)
    floats = rng.uniform(0, 1, (5, 16, 16, 3)).astype(np.float32)
    npz_path, png_dir = _write_both(
        tmp_path, np.transpose(floats, (0, 3, 1, 2)))
    np.testing.assert_array_equal(
        load_npz_images(npz_path, resolution=8),
        load_image_dir(png_dir, resolution=8).astype(np.float32))


def test_vaegan_nhwc_key(tmp_path, rng):
    # vaegan/sample.py:57-59 writes key 'img_r01' already NHWC
    arr = rng.uniform(0, 1, (4, 12, 12, 3)).astype(np.float32)
    p = tmp_path / "generated.npz"
    np.savez(p, img_r01=arr)
    out = load_npz_images(str(p), resolution=12)
    expect = 2.0 * ((np.clip(arr, 0, 1) * 255).astype(np.uint8)
                    .astype(np.float64) / 255.0) - 1.0
    np.testing.assert_array_equal(out, expect.astype(np.float32))


def test_grayscale_broadcasts_like_L_mode_png(tmp_path, rng):
    arr = rng.uniform(0, 1, (3, 1, 10, 10)).astype(np.float32)  # NCHW, 1ch
    p = tmp_path / "g.npz"
    np.savez(p, fake=arr)
    out = load_npz_images(str(p), resolution=10)
    assert out.shape == (3, 10, 10, 3)
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    np.testing.assert_array_equal(out[..., 0], out[..., 2])


def test_uint8_input_passthrough(tmp_path, rng):
    u8 = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    p = tmp_path / "u.npz"
    np.savez(p, images=u8)
    np.testing.assert_array_equal(
        load_npz_images(str(p), 8, dtype=np.uint8), u8)


def test_quantize_false_keeps_floats(tmp_path, rng):
    arr = rng.uniform(0, 1, (4, 3, 8, 8)).astype(np.float32)
    p = tmp_path / "f.npz"
    np.savez(p, fake=arr)
    out = load_npz_images(str(p), 8, quantize=False)
    np.testing.assert_allclose(
        out, 2.0 * np.transpose(arr, (0, 2, 3, 1)) - 1.0, rtol=1e-6)
    with pytest.raises(ValueError, match="float output"):
        load_npz_images(str(p), 8, dtype=np.uint8, quantize=False)


def test_multi_file_sorted_concat_and_limit(tmp_path, rng):
    d = tmp_path / "runs"
    for name in ("b", "a"):  # written out of order; ingest sorts
        os.makedirs(d / name)
        np.savez(d / name / "x.npz",
                 fake=np.full((2, 3, 4, 4), 0.25 if name == "a" else 0.75,
                              np.float32))
    assert len(find_npz_files(str(d))) == 2
    out = load_npz_images(str(d), 4, limit=3)
    assert out.shape[0] == 3
    # sorted order: the 'a' dir's two images come first
    lo = 2.0 * (int(0.25 * 255) / 255.0) - 1.0
    np.testing.assert_allclose(out[0], np.full((4, 4, 3), lo), atol=1e-6)


def test_bad_inputs(tmp_path):
    p = tmp_path / "bad.npz"
    np.savez(p, foo=np.zeros((2, 2)), bar=np.zeros((3, 3)))
    with pytest.raises(ValueError, match="no image array"):
        load_npz_images(str(p), 4)
    p2 = tmp_path / "neg.npz"
    np.savez(p2, fake=np.full((1, 3, 4, 4), -0.5, np.float32))
    with pytest.raises(ValueError, match=r"\[0, 1\] convention"):
        load_npz_images(str(p2), 4)
    with pytest.raises(FileNotFoundError):
        load_npz_images(str(tmp_path / "empty_dir_nope"), 4)


def test_resolve_input_format(tmp_path, rng):
    floats = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    npz_path, png_dir = _write_both(
        tmp_path, np.transpose(floats, (0, 3, 1, 2)))
    assert resolve_input_format(npz_path) == "npz"
    assert resolve_input_format(os.path.dirname(npz_path)) == "npz"
    assert resolve_input_format(png_dir) == "png"
    # mixed dir (PNGs present) stays on the PNG path under 'auto'
    assert resolve_input_format(str(tmp_path)) == "png"
    assert resolve_input_format(str(tmp_path), "npz") == "npz"
    with pytest.raises(ValueError, match="auto/png/npz"):
        resolve_input_format(png_dir, "tiff")


def test_fid_from_paths_npz_equals_png_dir(tmp_path, rng):
    """fid_from_paths accepts the reference's NPZ image dumps and scores
    them identically to the PNG dir written from the same floats
    (mu/sigma stats NPZs keep their existing meaning)."""
    from ganleaks_tpu.ops import fid as fid_ops

    params = fid_ops.init_inception_params(seed=0)
    a = rng.uniform(0, 1, (6, 3, 32, 32)).astype(np.float32)
    b = rng.uniform(0, 1, (6, 3, 32, 32)).astype(np.float32)
    npz_a, png_a = _write_both(tmp_path, a, sub="a")
    npz_b, png_b = _write_both(tmp_path, b, sub="b")
    v_png = fid_ops.fid_from_paths(params, png_a, png_b, batch_size=3,
                                   method="scipy")
    v_npz = fid_ops.fid_from_paths(params, npz_a, npz_b, batch_size=3,
                                   method="scipy")
    assert np.isclose(v_png, v_npz, rtol=1e-5)
    # stats-NPZ convention unchanged: precomputed mu/sigma round-trips
    acts = fid_ops.get_activations(
        params,
        load_npz_images(npz_a, resolution=None,
                        dtype=np.uint8).astype(np.float32),
        batch_size=3)
    mu, sigma = fid_ops.activation_statistics(acts)
    sp = tmp_path / "stats.npz"
    np.savez(sp, mu=mu, sigma=sigma)
    v_stats = fid_ops.fid_from_paths(params, str(sp), npz_b, batch_size=3,
                                     method="scipy")
    assert np.isclose(v_stats, v_npz, rtol=1e-5)


def test_rank_deficient_fid_finite_via_scipy_fallback(rng):
    """Newton-Schulz diverges (nan) on rank-deficient covariance
    products (few samples x 2048 features); _tr_sqrt_product must fall
    back to the reference's scipy-with-eps-retry path instead of
    returning nan (z_fid.py:141-149 never returns nan)."""
    from ganleaks_tpu.ops import fid as fid_ops

    acts1 = rng.normal(size=(8, 64)).astype(np.float64)
    acts2 = rng.normal(size=(8, 64)).astype(np.float64)
    m1, s1 = fid_ops.activation_statistics(acts1)
    m2, s2 = fid_ops.activation_statistics(acts2)
    with np.testing.suppress_warnings() as sup:
        sup.filter(UserWarning)
        v_ns = fid_ops.frechet_distance(m1, s1, m2, s2,
                                        method="newton-schulz")
        v_sp = fid_ops.frechet_distance(m1, s1, m2, s2, method="scipy")
    assert np.isfinite(v_ns)
    np.testing.assert_allclose(v_ns, v_sp, rtol=1e-4)


def test_attack_on_npz_equals_attack_on_png(tmp_path, rng):
    """E2E through run_attack: the NPZ-ingested synthetic set produces
    byte-identical scores and NN indices to the PNG dir (the driver's
    'auto' picks npz for the npz_images dir on its own)."""
    from ganleaks_tpu.attack.fbb import run_attack
    from ganleaks_tpu.config import AttackConfig

    syn = rng.uniform(0, 1, (10, 8, 8, 3)).astype(np.float32)
    npz_path, png_dir = _write_both(tmp_path,
                                    np.transpose(syn, (0, 3, 1, 2)))
    pos_dir = tmp_path / "pos"
    neg_dir = tmp_path / "neg"
    os.makedirs(pos_dir)
    os.makedirs(neg_dir)
    for i in range(4):
        save_png(np.clip(syn[i] + rng.normal(0, .05, syn[i].shape), 0, 1),
                 str(pos_dir / f"p{i}.png"))
        save_png(rng.uniform(0, 1, (8, 8, 3)),
                 str(neg_dir / f"n{i}.png"))

    def run(syn_path):
        cfg = AttackConfig(
            exp_name="npz_parity", syn_data_path=syn_path,
            pos_data_dir=str(pos_dir), neg_data_dir=str(neg_dir),
            data_num=4, resolution=8, distance="l2", engine="gemm",
            save_root=str(tmp_path / "out" / os.path.basename(syn_path)),
            query_block=4, syn_block=8, save_plots=False,
            host_stream=False)
        return run_attack(cfg)[0]

    a = run(os.path.dirname(npz_path))
    b = run(png_dir)
    np.testing.assert_array_equal(a["pos_loss"], b["pos_loss"])
    np.testing.assert_array_equal(a["neg_loss"], b["neg_loss"])
    np.testing.assert_array_equal(a["pos_nn_idx"], b["pos_nn_idx"])
    np.testing.assert_array_equal(a["neg_nn_idx"], b["neg_nn_idx"])


def test_out_of_range_float_dump_raises(tmp_path):
    """A 0-255-scaled float dump must fail loudly, not clip to all-white
    images (the [0,1]-convention guard checks BOTH bounds)."""
    p = tmp_path / "scaled.npz"
    np.savez(p, fake=np.random.default_rng(0).uniform(
        0, 255, (2, 3, 4, 4)).astype(np.float32))
    with pytest.raises(ValueError, match=r"\[0, 1\] convention"):
        load_npz_images(str(p), 4)


def test_unknown_key_picked_via_header_peek(tmp_path, rng):
    """The unknown-key fallback must find the single 4-D member from the
    .npy headers (no full decompression) and load it correctly."""
    from ganleaks_tpu.io.npz import _member_ndims

    p = tmp_path / "odd.npz"
    imgs = rng.uniform(0, 1, (3, 4, 4, 3)).astype(np.float32)
    np.savez_compressed(p, weird_name=imgs, meta=np.arange(5))
    assert _member_ndims(str(p)) == {"weird_name": 4, "meta": 1}
    out = load_npz_images(str(p), 4)
    assert out.shape == (3, 4, 4, 3)
    expect = 2.0 * ((np.clip(imgs, 0, 1) * 255).astype(np.uint8)
                    .astype(np.float64) / 255.0) - 1.0
    np.testing.assert_allclose(out, expect.astype(np.float32), atol=1e-7)


def test_image_dir_with_stats_npz_stays_png(tmp_path, rng):
    """A jpg/png image dir that also holds a precomputed stats ``.npz``
    (the FID layout, ``z_fid.py:286-300``) must resolve to the image
    path — images win over npz under 'auto'."""
    import PIL.Image

    d = tmp_path / "photos"
    d.mkdir()
    u8 = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    PIL.Image.fromarray(u8).save(d / "a.jpg")
    np.savez(d / "stats.npz", mu=np.zeros(4), sigma=np.eye(4))
    assert resolve_input_format(str(d)) == "png"
    # and a dir with ONLY npz content still resolves to npz
    d2 = tmp_path / "arrays"
    d2.mkdir()
    np.savez(d2 / "x.npz", fake=np.zeros((1, 3, 4, 4), np.float32))
    assert resolve_input_format(str(d2)) == "npz"


def test_vaegan_sample_dir_resolves_to_npz(tmp_path):
    """The reference VAE-GAN sampler writes a samples.png preview grid
    NEXT TO generated.npz (sample.py:53-59); resolving that dir to the
    image path silently attacked ONE grid image while the row claimed
    20,000 samples (rounds 4-5). The exact layout now resolves to npz;
    any other image+npz mix keeps the documented images-first rule."""
    from ganleaks_tpu.io.images import save_png
    from ganleaks_tpu.io.npz import resolve_input_format

    d = tmp_path / "vaegan_samples"
    d.mkdir()
    rng = np.random.default_rng(0)
    np.savez(d / "generated.npz",
             noise=rng.normal(size=(8, 4)).astype(np.float32),
             img_r01=rng.uniform(size=(8, 8, 8, 3)).astype(np.float32))
    save_png(rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32),
             str(d / "samples.png"), drange=(-1, 1))
    assert resolve_input_format(str(d)) == "npz"

    # a real image DIR with a stats npz stays on the image path
    d2 = tmp_path / "png_dir"
    d2.mkdir()
    for i in range(3):
        save_png(rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32),
                 str(d2 / f"im{i}.png"), drange=(-1, 1))
    np.savez(d2 / "stats.npz", mu=np.zeros(3))
    assert resolve_input_format(str(d2)) == "png"


def test_preview_grid_detection_edge_cases(tmp_path):
    """Round-5 review hardening: (a) the grid filename matches
    case-insensitively (a 'Samples.PNG' grid must not silently revive
    the n_syn=1 bug); (b) a SIBLING npz beside generated.npz disables
    the flip — resolving the dir to npz would make the loader
    concatenate every npz under it (e.g. query dumps) into the
    synthetic set."""
    from ganleaks_tpu.io.images import save_png
    from ganleaks_tpu.io.npz import resolve_input_format

    rng = np.random.default_rng(1)

    d = tmp_path / "upper"
    d.mkdir()
    np.savez(d / "generated.npz",
             img_r01=rng.uniform(size=(4, 8, 8, 3)).astype(np.float32))
    save_png(rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32),
             str(d / "Samples.PNG"), drange=(-1, 1))
    assert resolve_input_format(str(d)) == "npz"

    d2 = tmp_path / "sibling"
    d2.mkdir()
    np.savez(d2 / "generated.npz",
             img_r01=rng.uniform(size=(4, 8, 8, 3)).astype(np.float32))
    np.savez(d2 / "pos.npz",
             images=rng.uniform(size=(4, 8, 8, 3)).astype(np.float32))
    save_png(rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32),
             str(d2 / "samples.png"), drange=(-1, 1))
    assert resolve_input_format(str(d2)) == "png"
