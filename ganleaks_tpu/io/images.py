"""Host-side image IO.

The reference has two distinct image readers whose semantics the attack
results depend on:

* resize variant (``attack_models/utils.py:60-84``): PIL resize to the target
  resolution (no crop), then scale to [-1, 1];
* center-crop variant (``gan_models/vaegan/utils.py:44-71``): crop a 128x128
  window centered at (cx=89, cy=121), then repeated 2x box-downsampling.

Both are kept as explicit named transforms. Images are returned NHWC float32
in [-1, 1]; NHWC is the TPU-native conv layout (the reference permutes to
NCHW for torch, ``fbb.py:135``).
"""

from __future__ import annotations

import fnmatch
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import PIL.Image


def get_filepaths_from_dir(data_dir: str, ext: str = "png") -> list[str]:
    """Recursive sorted glob, identical semantics to
    ``attack_models/utils.py:43-57`` (os.walk + fnmatch + sorted)."""
    pattern = "*." + ext
    path_list = []
    for d, _s, flist in os.walk(data_dir):
        for filename in flist:
            if fnmatch.fnmatch(filename, pattern):
                path_list.append(os.path.join(d, filename))
    return sorted(path_list)


def read_image(filepath: str, resolution: int = 64) -> np.ndarray:
    """Resize-variant reader (``attack_models/utils.py:60-84``).

    If the stored image already has shape (resolution, resolution, 3) it is
    used as-is; otherwise PIL ``resize`` (its default filter, matching the
    reference's bare ``img.resize((r, r))`` at ``utils.py:79``). Returns HWC
    float in [-1, 1] — the exact `2*(img/255)-1` scaling of ``utils.py:82``.
    """
    pil = PIL.Image.open(filepath)
    if pil.mode != "RGB":  # palette/gray/alpha inputs crash the reference;
        pil = pil.convert("RGB")  # normalize instead (robustness divergence)
    img = np.asarray(pil)
    if img.shape != (resolution, resolution, 3):
        img = PIL.Image.fromarray(img)
        img = img.resize((resolution, resolution))
        img = np.asarray(img)
    return 2.0 * (img / 255.0) - 1.0


def read_image_center_crop(filepath: str, resolution: int = 64,
                           cx: int = 89, cy: int = 121) -> np.ndarray:
    """Center-crop-variant reader (``gan_models/vaegan/utils.py:44-71``).

    Crops [cy-64:cy+64, cx-64:cx+64], then repeatedly 2x box-downsamples from
    128 down to ``resolution`` with rint/clip round-tripping through uint8.
    Bit-identical to the reference at its only used resolution (64, one
    halving). DIVERGENCE (see DIVERGENCES.md): the reference decrements its
    resize factor by 1 per halving instead of halving it
    (``vaegan/utils.py:63-66``), so below 64 it returns the WRONG shape
    (resolution=32 -> a 16x16 image) and crashes any consumer that stacks
    the batch; we halve log2(factor) times, matching the native loader.
    """
    pil = PIL.Image.open(filepath)
    if pil.mode != "RGB":
        pil = pil.convert("RGB")
    img = np.asarray(pil)
    if img.shape != (resolution, resolution, 3):
        img = img[cy - 64: cy + 64, cx - 64: cx + 64]
        resize_factor = 128 // resolution
        img = img.astype(np.float32)
        while resize_factor > 1:
            img = (img[0::2, 0::2, :] + img[0::2, 1::2, :]
                   + img[1::2, 0::2, :] + img[1::2, 1::2, :]) * 0.25
            resize_factor //= 2
        img = np.rint(img).clip(0, 255).astype(np.uint8)
    img = img.astype(np.float32) / 255.0
    return img * 2.0 - 1.0


def unit_to_uint8_exact(arr: np.ndarray) -> np.ndarray:
    """Invert the readers' ``2*(x/255)-1`` scaling back to the original
    bytes: ``rint((v+1)*127.5)`` recovers ``x`` exactly for every byte
    value (the 256 reachable floats are ~0.004 apart — ULP-level reader
    variation cannot move one across a rounding boundary). Lets uint8
    device residency (``ops/distance.images_unit_range``) be layered on
    any [-1, 1] float source without touching its decode path.

    Converted in row chunks: a whole-array ``astype(float64)`` would be
    a 2x-the-f32 transient (≈10 GB at the 100k north star) on top of
    the already-resident f32 source — a memory spike in a feature whose
    point is memory reduction."""
    if arr.dtype == np.uint8:
        return arr
    out = np.empty(arr.shape, np.uint8)
    step = max(1, (64 << 20) // max(1, int(np.prod(arr.shape[1:])) * 8))
    for i in range(0, arr.shape[0], step):
        blk = arr[i:i + step].astype(np.float64)
        out[i:i + step] = np.rint((blk + 1.0) * 127.5).astype(np.uint8)
    return out


def load_image_dir(data_dir: str, resolution: int = 64, ext: str = "png",
                   limit: int | None = None, reader=read_image,
                   num_threads: int = 8, dtype=np.float32) -> np.ndarray:
    """Load a directory of images into one NHWC array: float32 in [-1, 1]
    (default), or the original uint8 bytes with ``dtype=np.uint8`` (for
    lossless uint8 device residency — see
    ``ops/distance.images_unit_range``).

    Threaded PNG decode replaces the reference's serial list comprehension
    (``fbb.py:134``); thread (not process) pool because PIL decodes release
    the GIL in zlib.
    """
    paths = get_filepaths_from_dir(data_dir, ext)
    if limit is not None:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no *.{ext} files under {data_dir}")
    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        imgs = list(pool.map(lambda p: reader(p, resolution), paths))
    out = np.asarray(imgs, dtype=np.float32)
    if np.dtype(dtype) == np.uint8:
        return unit_to_uint8_exact(out)
    return out


def to_uint8(img: np.ndarray, drange=(-1.0, 1.0),
             rounding: str = "floor") -> np.ndarray:
    """Map images from ``drange`` to uint8 [0, 255].

    ``rounding='floor'`` truncates like torchvision ``ToPILImage``
    (``train_torch.py:155``) and ``np.uint8(img*255)`` (``fbb.py:106``);
    ``rounding='rint'`` matches the VAE-GAN grid saver
    (``vaegan/utils.py:110``). Byte-level parity with the reference PNGs
    requires matching the right one per artifact.
    """
    lo, hi = drange
    img = np.clip((img - lo) / (hi - lo), 0.0, 1.0) * 255.0
    if rounding == "rint":
        img = np.rint(img)
    return img.astype(np.uint8)


def save_png(img: np.ndarray, path: str, drange=(0.0, 1.0),
             rounding: str = "floor") -> None:
    """Save one HWC image. With the defaults this matches torchvision's
    ``ToPILImage`` on a [0,1] tensor (``train_torch.py:155,171-174``)."""
    PIL.Image.fromarray(to_uint8(img, drange, rounding)).save(path)


def nearest_resize(images, size: int):
    """PIL-NEAREST-exact resize over the trailing (H, W, C) axes.

    Output pixel ``i`` samples input row/col ``floor((i + 0.5) * S / s)``
    — PIL's center-aligned nearest mapping, verified element-exact against
    ``PIL.Image.resize(..., NEAREST)`` in tests. Replicates the PGGAN
    loader's ``transforms.Resize(size, interpolation=Image.NEAREST)``
    (``gan_models/pggan/train.py:82-88``) as a pure gather, so it runs
    device-side on jnp arrays as well as on numpy."""
    h, w = images.shape[-3], images.shape[-2]
    if h == size and w == size:
        return images
    ri = np.floor((np.arange(size) + 0.5) * h / size).astype(np.int32)
    ci = np.floor((np.arange(size) + 0.5) * w / size).astype(np.int32)
    return images[..., ri[:, None], ci[None, :], :]
