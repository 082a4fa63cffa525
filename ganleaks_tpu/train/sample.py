"""Batched jit sampling from a trained generator.

The reference samples the whole synthetic set in one eager batch
(``train_torch.py:152-158``) or a python loop (``pggan/train.py:230-249``)
and denormalizes with ``Normalize(mean=-1, std=2)`` == ``(x+1)/2``
(``train_torch.py:154``). Here: one compiled ``lax.map`` over fixed-size
batches, so a 100k-sample dump is a single device computation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=64)
def _build_sampler(sample_fn: Callable, nbatch: int, batch: int, nz: int):
    """Compile the batched sampler once per (fn, shape) combination —
    defining the jit inside the call site would recompile every call."""

    @jax.jit
    def run(variables, key):
        keys = jax.random.split(key, nbatch)

        def one(k):
            z = jax.random.normal(k, (batch, nz))
            img = sample_fn(variables, z)
            return z, jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

        return jax.lax.map(one, keys)

    return run


def sample_images(sample_fn: Callable[[Any, Array], Array], variables: Any,
                  num: int, nz: int, batch: int,
                  key: Array) -> tuple[Array, Array]:
    """Draw ``num`` samples with ``sample_fn(variables, z) -> images[-1,1]``.

    Pads internally to a batch multiple and truncates. Returns
    (noise (num, nz), images01 (num, H, W, C) in [0, 1]). The generator
    should run in eval mode inside ``sample_fn`` (running BN stats),
    matching ``gen.eval()`` at ``train_torch.py:150``.

    Pass a STABLE ``sample_fn`` (module-level function or reused closure)
    so the compiled sampler is cache-hit across calls.
    """
    nbatch = -(-num // batch)
    run = _build_sampler(sample_fn, nbatch, batch, nz)
    zs, imgs = run(variables, key)
    zs = zs.reshape(-1, nz)[:num]
    imgs = imgs.reshape((-1,) + imgs.shape[2:])[:num]
    return zs, imgs


def sample_to_host(sample_fn, variables, num, nz, batch, key
                   ) -> tuple[np.ndarray, np.ndarray]:
    z, img = sample_images(sample_fn, variables, num, nz, batch, key)
    return np.asarray(z), np.asarray(img)
