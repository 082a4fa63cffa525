"""Checkpointing.

The reference saves ``state_dict`` pickles at end of training
(``train_torch.py:131-136``); VAE-GAN alone checkpoints periodically with
resume (``vaegan/train.py:284-294,401-414``). Here every trainer saves a
final msgpack of the full train state (VAE-GAN also periodically, with
resume — mirroring the reference); :func:`save_orbax`/:func:`load_orbax`
are the sharding-aware alternative for multi-host runs (library surface,
exercised by tests — no trainer defaults to them), and
``ganleaks_tpu.tools.convert_victim`` lets reference-trained victims be
attacked for cross-validation.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_state(path: str, state: Any) -> None:
    """Msgpack-serialize a pytree (flax serialization; no pickle)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_state(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_orbax(path: str, state: Any) -> None:
    """Orbax checkpoint of an arbitrary train-state pytree (async-capable,
    sharding-aware — preferred for multi-host runs)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_orbax(path: str, target: Any) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def save_params_npz(path: str, params: Any) -> None:
    """Flatten a param pytree to an npz of path-keyed arrays (portable,
    inspectable — used for converted torch checkpoints too)."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(_key_str(k) for k in keypath)
        flat[name] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    """Inverse of :func:`save_params_npz` — rebuilds the nested dict."""
    flat = np.load(path)
    tree: dict = {}
    for name in flat.files:
        parts = name.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[name]
    return tree


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)
