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
