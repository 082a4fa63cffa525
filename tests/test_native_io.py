"""Native C++ batched PNG loader vs the PIL readers: bit-identical on the
exact-size path and the center-crop/box-downsample path; per-image fallback
for mismatched sizes."""

import numpy as np
import PIL.Image
import pytest

from ganleaks_tpu.io.images import (
    load_image_dir,
    read_image,
    read_image_center_crop,
    save_png,
)
from ganleaks_tpu.io.native import (
    MODE_CENTER_CROP,
    load_image_dir_native,
    native_available,
)

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native loader not built")


@needs_native
def test_native_exact_path_bit_identical(tmp_path, rng):
    for i in range(10):
        save_png(rng.random((64, 64, 3)).astype(np.float32),
                 str(tmp_path / f"img_{i:02d}.png"), drange=(0, 1))
    a = load_image_dir_native(str(tmp_path), 64)
    b = load_image_dir(str(tmp_path), 64)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32


@needs_native
def test_native_center_crop_bit_identical(tmp_path, rng):
    paths = []
    for i in range(4):
        arr = rng.integers(0, 255, (218, 178, 3), dtype=np.uint8)
        p = str(tmp_path / f"c{i}.png")
        PIL.Image.fromarray(arr).save(p)
        paths.append(p)
    a = load_image_dir_native(str(tmp_path), 64, mode=MODE_CENTER_CROP)
    b = np.stack([read_image_center_crop(p, 64) for p in paths])
    np.testing.assert_array_equal(a, b)


@needs_native
def test_native_encoder_pixel_identical(tmp_path, rng):
    """gl_save_batch PNGs decode to exactly the bytes that went in, and the
    round-trip through our own readers matches PIL-written files."""
    from ganleaks_tpu.io.native import save_png_batch_native
    imgs = rng.integers(0, 256, (12, 64, 64, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"e{i:02d}.png") for i in range(len(imgs))]
    save_png_batch_native(imgs, paths, compress_level=1)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(
            np.asarray(PIL.Image.open(p).convert("RGB")), imgs[i])
    # the native loader reads the native encoder's files bit-identically
    # to PIL-written ones (same pixels -> same [-1,1] floats)
    a = load_image_dir_native(str(tmp_path), 64)
    b = load_image_dir(str(tmp_path), 64)
    np.testing.assert_array_equal(a, b)


def test_write_synthetic_artifacts_pngs_roundtrip(tmp_path, rng):
    """write_synthetic_artifacts' PNG dump (now on the native encoder)
    yields the same uint8 pixels as save_png's ToPILImage-parity path,
    whichever encoder actually ran."""
    from ganleaks_tpu.io.artifacts import write_synthetic_artifacts
    from ganleaks_tpu.io.images import to_uint8
    imgs01 = rng.random((5, 16, 16, 3)).astype(np.float32)
    noise = rng.standard_normal((5, 8)).astype(np.float32)
    dirs = write_synthetic_artifacts(str(tmp_path), "m", imgs01, noise)
    want = to_uint8(imgs01, (0.0, 1.0))
    import os
    files = sorted(os.listdir(dirs["png_images"]),
                   key=lambda s: int(s.split("_")[1].split(".")[0]))
    assert len(files) == 5
    for i, f in enumerate(files):
        got = np.asarray(PIL.Image.open(
            os.path.join(dirs["png_images"], f)).convert("RGB"))
        np.testing.assert_array_equal(got, want[i])


@needs_native
def test_native_fallback_on_mismatched_size(tmp_path, rng):
    """A 32x32 image in EXACT mode must route through the PIL-resize
    fallback and still match read_image."""
    small = rng.random((32, 32, 3)).astype(np.float32)
    save_png(small, str(tmp_path / "small.png"), drange=(0, 1))
    save_png(rng.random((64, 64, 3)).astype(np.float32),
             str(tmp_path / "big.png"), drange=(0, 1))
    a = load_image_dir_native(str(tmp_path), 64)
    b = np.stack([read_image(str(tmp_path / "big.png"), 64),
                  read_image(str(tmp_path / "small.png"), 64)])
    # sorted order: big.png, small.png
    np.testing.assert_allclose(a[0], b[0], atol=1e-7)
    np.testing.assert_allclose(a[1], b[1], atol=1e-7)
