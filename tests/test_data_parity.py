"""PGGAN data-pipeline parity: PIL-NEAREST resize + RandomHorizontalFlip.

The reference reloads the training set per resolution through
``transforms.Resize(size, interpolation=Image.NEAREST)`` +
``RandomHorizontalFlip(p=0.5)`` (``gan_models/pggan/train.py:82-88``).
``nearest_resize`` must be element-exact vs PIL; ``random_hflip`` must flip
each sample independently with p=0.5 and be key-deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image
import pytest

from ganleaks_tpu.io.data import random_hflip
from ganleaks_tpu.io.images import nearest_resize


@pytest.mark.parametrize("src,dst", [(128, 64), (128, 32), (128, 16),
                                     (128, 8), (128, 4), (100, 7),
                                     (64, 64), (7, 5)])
def test_nearest_resize_matches_pil(rng, src, dst):
    img = rng.integers(0, 256, (src, src, 3), dtype=np.uint8)
    pil = np.asarray(PIL.Image.fromarray(img).resize(
        (dst, dst), PIL.Image.NEAREST))
    ours = nearest_resize(img.astype(np.float32)[None], dst)[0]
    np.testing.assert_array_equal(ours.astype(np.uint8), pil)


def test_nearest_resize_on_device(rng):
    imgs = rng.standard_normal((5, 32, 32, 3)).astype(np.float32)
    host = nearest_resize(imgs, 8)
    dev = np.asarray(nearest_resize(jnp.asarray(imgs), 8))
    np.testing.assert_array_equal(host, dev)


def test_random_hflip_per_sample(rng):
    imgs = jnp.asarray(rng.standard_normal((64, 4, 6, 3))
                       .astype(np.float32))
    out = np.asarray(random_hflip(imgs, jax.random.key(0)))
    src = np.asarray(imgs)
    flipped = [bool((out[i] == src[i, :, ::-1, :]).all()
                    and not (out[i] == src[i]).all()) for i in range(64)]
    kept = [bool((out[i] == src[i]).all()) for i in range(64)]
    assert all(f or k for f, k in zip(flipped, kept))
    assert 10 < sum(flipped) < 54  # p=0.5, 64 draws
    # key-deterministic
    out2 = np.asarray(random_hflip(imgs, jax.random.key(0)))
    np.testing.assert_array_equal(out, out2)


def test_random_hflip_leading_axes(rng):
    """privPGGAN feeds (splits, batch, H, W, C): each (split, sample) must
    draw independently."""
    imgs = jnp.asarray(rng.standard_normal((4, 16, 2, 5, 3))
                       .astype(np.float32))
    out = np.asarray(random_hflip(imgs, jax.random.key(1)))
    src = np.asarray(imgs)
    states = {(s, b): bool((out[s, b] == src[s, b]).all())
              for s in range(4) for b in range(16)}
    assert 10 < sum(states.values()) < 54


def test_center_crop_reader_correct_below_64(tmp_path):
    """The reference decrements its downsample factor (vaegan/utils.py:
    63-66) — resolution=32 returned a 16x16 image. We halve log2(factor)
    times: correct shapes at every power-of-two resolution, bit-parity
    at 64 (the only resolution the reference uses). DIVERGENCES.md."""
    import PIL.Image

    from ganleaks_tpu.io.images import read_image_center_crop
    from ganleaks_tpu.io.native import MODE_CENTER_CROP, load_image_paths_native

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (218, 178, 3), dtype=np.uint8)
    p = str(tmp_path / "celeba.png")
    PIL.Image.fromarray(raw).save(p)
    for res in (128, 64, 32, 16):
        out = read_image_center_crop(p, res)
        assert out.shape == (res, res, 3), res
        nat = load_image_paths_native([p], res, mode=MODE_CENTER_CROP)
        np.testing.assert_allclose(nat[0], out, atol=1e-6)


def test_save_png_batch_native_rejects_float(tmp_path):
    from ganleaks_tpu.io.native import save_png_batch_native

    with pytest.raises(TypeError, match="uint8"):
        save_png_batch_native(np.zeros((1, 4, 4, 3), np.float32),
                              [str(tmp_path / "x.png")])


def test_native_corrupt_png_falls_back_not_terminates(tmp_path):
    """A truncated PNG must surface as a catchable per-image failure
    (status -> PIL fallback -> Python exception), never process death
    from an exception escaping the decode worker thread."""
    import PIL.Image

    from ganleaks_tpu.io.native import load_image_paths_native

    good = str(tmp_path / "good.png")
    PIL.Image.fromarray(
        np.zeros((8, 8, 3), np.uint8)).save(good)
    bad = str(tmp_path / "bad.png")
    with open(good, "rb") as f:
        blob = f.read()
    with open(bad, "wb") as f:
        f.write(blob[: len(blob) // 2])  # truncated mid-stream
    with pytest.raises(Exception):
        load_image_paths_native([good, bad], 8)
    # and the good file alone still decodes
    out = load_image_paths_native([good], 8)
    assert out.shape == (1, 8, 8, 3)


def test_train_reader_converts_palette_and_rgba(tmp_path):
    """Non-RGB training PNGs (palette / RGBA) must load as RGB pixel
    values — the reader previously fed palette INDICES (or a 4th
    channel) into training with no error."""
    import PIL.Image

    from ganleaks_tpu.io.data import load_train_images

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    PIL.Image.fromarray(rgb).convert("P", palette=PIL.Image.ADAPTIVE).save(
        tmp_path / "p.png")
    rgba = np.concatenate([rgb, np.full((16, 16, 1), 255, np.uint8)], -1)
    PIL.Image.fromarray(rgba, "RGBA").save(tmp_path / "a.png")
    out = load_train_images(str(tmp_path), 16)
    assert out.shape == (2, 16, 16, 3)
    # the RGBA file decodes to exactly the original RGB values
    expect = (rgb.astype(np.float32) / 255.0) * 2.0 - 1.0
    np.testing.assert_allclose(out[0], expect, atol=1e-6)
