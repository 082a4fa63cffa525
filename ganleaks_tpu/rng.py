"""RNG discipline.

The reference seeds ad hoc (``torch.manual_seed(0)``/``np.random.seed(0)`` in
``privDCGAN.py:67-68`` and ``pggan/train.py:148-149``, ``manualSeed =
random.randint(...)`` in ``vaegan/train.py:253``, nothing in dcgan/wgangp).
Here every stochastic consumer derives from one ``jax.random.key`` via named
folds, so runs are reproducible and shard-invariant by construction.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def fold_name(key: jax.Array, name: str) -> jax.Array:
    """Derive a named subkey (stable across runs, independent per name)."""
    digest = hashlib.sha256(name.encode()).digest()
    tag = int.from_bytes(digest[:4], "little")
    return jax.random.fold_in(key, tag)


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    return jax.random.fold_in(key, epoch)


def normal_noise(key: jax.Array, batch: int, nz: int,
                 dtype=jnp.float32) -> jax.Array:
    """Latent noise z ~ N(0,1), shape (batch, nz).

    The reference samples NCHW ``(batch, nz, 1, 1)`` (``train_torch.py:95``);
    our generators take flat (batch, nz) and reshape internally.
    """
    return jax.random.normal(key, (batch, nz), dtype=dtype)
