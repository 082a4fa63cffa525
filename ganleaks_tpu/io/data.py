"""Device-resident datasets.

The reference streams individual PNGs through DataLoader worker processes
(``dcgan/utils.py:6-26``, ``pggan/train.py:92``). At GAN-Leaks scale
(<= 30k images at 64x64, ~350 MB) the whole training set fits in HBM, so we
decode once on the host and keep the array on device; a "batch" is a gather
by a shuffled index vector — no host<->device traffic inside the epoch.
"""

from __future__ import annotations

import numpy as np
import PIL.Image
import jax
import jax.numpy as jnp

from ganleaks_tpu.io.images import get_filepaths_from_dir


def _read_train_image(path: str, resolution: int) -> np.ndarray:
    """Training-data reader matching torchvision
    ``Resize -> ToTensor -> Normalize(0.5, 0.5)`` (``train_torch.py:60-64``):
    bilinear resize (torchvision's default interpolation), then [-1, 1]."""
    img = PIL.Image.open(path)
    if img.mode != "RGB":
        # palette/RGBA/16-bit inputs: torchvision's loader yields RGB;
        # skipping the convert fed palette INDICES (or a 4th channel)
        # into training with no error
        img = img.convert("RGB")
    if img.size != (resolution, resolution):
        img = img.resize((resolution, resolution), PIL.Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def load_train_images(data_dir: str, resolution: int = 64,
                      limit: int | None = None,
                      num_threads: int = 8) -> np.ndarray:
    """Flat image dir -> NHWC float32 array in [-1, 1] (threaded decode;
    PIL releases the GIL in zlib/jpeg)."""
    from concurrent.futures import ThreadPoolExecutor

    paths = get_filepaths_from_dir(data_dir, "png")
    paths += get_filepaths_from_dir(data_dir, "jpg")
    paths = sorted(paths)
    if limit is not None:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no images under {data_dir}")
    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        imgs = list(pool.map(lambda p: _read_train_image(p, resolution),
                             paths))
    return np.stack(imgs)


def epoch_batch_indices(rng: np.random.Generator, n: int, batch_size: int,
                        drop_last: bool = False) -> list[np.ndarray]:
    """Shuffled batch index vectors for one epoch (DataLoader shuffle=True)."""
    perm = rng.permutation(n)
    batches = [perm[i:i + batch_size] for i in range(0, n, batch_size)]
    if drop_last and batches and len(batches[-1]) < batch_size:
        batches.pop()
    return batches


class DeviceDataset:
    """The whole training set as one device array plus an index-batch iterator."""

    def __init__(self, images: np.ndarray, seed: int = 0,
                 sharding: jax.sharding.Sharding | None = None):
        self.images = (jax.device_put(images, sharding) if sharding
                       else jnp.asarray(images))
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return int(self.images.shape[0])

    def epoch(self, batch_size: int, drop_last: bool = False):
        for idx in epoch_batch_indices(self._rng, len(self), batch_size,
                                       drop_last):
            yield self.images[jnp.asarray(idx)]


def random_hflip(batch, key):
    """``RandomHorizontalFlip(p=0.5)`` (``gan_models/pggan/train.py:83``)
    as a device-side masked reverse along W — one Bernoulli draw per
    sample (all leading axes before HWC), jit-safe."""
    lead = batch.shape[:-3]
    flip = jax.random.bernoulli(key, 0.5, lead + (1, 1, 1))
    return jnp.where(flip, batch[..., ::-1, :], batch)
