"""Persistent decoded-image disk cache (memmapped .npy).

PNG decode is the real-data pipeline's wall-clock bound: the north-star
device search runs in ~10 s while host decode of the same 120k images
takes ~2 min (docs/PERF.md). The decoded pixels are a pure function of
(file bytes, resolution, resize mode, dtype), so cache them ONCE as a raw
``.npy`` beside the data and serve every later run as a read-only memmap
— repeat attacks, sweeps over attack hyperparameters, and eval re-runs
then skip the decode entirely. The reference re-decodes its PNG dirs
from scratch on every invocation (``attack_models/fbb.py:101-110``).

Layout: ``<cache_dir>/<key>.npy`` plus ``<key>.json``, the completeness
sidecar, written atomically (tmp + rename) only after every row has been
decoded. A reader trusts a cache only when the sidecar exists and its
recorded shape/dtype match; a crashed or concurrent partial write leaves
no sidecar and is simply overwritten by the next full decode. Two
processes racing on the SAME key write identical bytes (the decode is
deterministic and the key pins its inputs), so overlapped writes — even
one publishing while the other is mid-write — can never serve torn
data, only duplicate work. The key is
a sha1 over the loader version, the decode parameters, and each file's
(relative path, size, mtime_ns) — touching any input file, reordering
the directory, or changing resolution/mode/dtype misses and re-decodes.

Cache location (``_resolve_cache_dir``): the ``GANLEAKS_DECODE_CACHE``
env var wins ('0'/'off' disables globally, any other value is the cache
dir); otherwise ``<data_dir>/.ganleaks_decoded`` when the data dir is
writable, else ``~/.cache/ganleaks_tpu/decoded``.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

_VERSION = 1  # bump to invalidate every existing cache entry
_ENV = "GANLEAKS_DECODE_CACHE"


def _resolve_cache_dir(data_dir: str, policy) -> str | None:
    """Where (if anywhere) the cache for ``data_dir`` lives.

    ``policy`` is the config knob: False/'off' disables for this set;
    True/'auto' consults the env var, then picks a default location.
    A path string pins the directory explicitly.
    """
    if policy in (False, "off", "false", "0"):
        return None
    if isinstance(policy, str) and policy not in ("auto", "true", "1"):
        return policy  # explicit directory from config
    env = os.environ.get(_ENV)
    if env is not None:
        if env.strip().lower() in ("", "0", "off", "false"):
            return None
        return env
    if os.access(data_dir, os.W_OK):
        return os.path.join(data_dir, ".ganleaks_decoded")
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "ganleaks_tpu", "decoded")


class DecodeCache:
    """One (path list, decode params) cache entry.

    ``load()`` returns the complete read-only memmap or None;
    ``open_for_write()`` a writable memmap rows are decoded into;
    ``mark_complete()`` flushes it and publishes the sidecar.
    Every filesystem failure degrades to "no cache" — decode correctness
    never depends on this module.
    """

    def __init__(self, data_dir: str, paths: list, resolution: int,
                 mode: int, dtype, policy="auto"):
        self.shape = (len(paths), resolution, resolution, 3)
        self.dtype = np.dtype(dtype)
        self.complete = False
        self._dir = _resolve_cache_dir(data_dir, policy)
        self._mm = None
        if self._dir is None:
            self.npy_path = self.sidecar_path = None
            return
        h = hashlib.sha1()
        h.update(f"v{_VERSION}|{resolution}|{mode}|"
                 f"{self.dtype.name}|{len(paths)}".encode())
        try:
            for p in paths:
                st = os.stat(p)
                rel = os.path.relpath(p, data_dir)
                h.update(f"{rel}|{st.st_size}|{st.st_mtime_ns}".encode())
        except OSError:
            self.npy_path = self.sidecar_path = None
            self._dir = None
            return
        key = h.hexdigest()[:24]
        self.npy_path = os.path.join(self._dir, f"{key}.npy")
        self.sidecar_path = os.path.join(self._dir, f"{key}.json")

    @property
    def enabled(self) -> bool:
        return self.npy_path is not None

    def load(self):
        """The complete cached array as a read-only memmap, or None."""
        if not self.enabled:
            return None
        try:
            with open(self.sidecar_path) as f:
                meta = json.load(f)
            if (tuple(meta["shape"]) != self.shape
                    or meta["dtype"] != self.dtype.name):
                return None
            arr = np.load(self.npy_path, mmap_mode="r")
            if arr.shape != self.shape or arr.dtype != self.dtype:
                return None
        except Exception:
            return None
        self.complete = True
        return arr

    def open_for_write(self):
        """A writable memmap of the right shape/dtype, or None.

        Rows are written by the caller as they decode; nothing is
        published until :meth:`mark_complete`, so torn writes (crash,
        concurrent process) are invisible to readers.
        """
        if not self.enabled:
            return None
        try:
            os.makedirs(self._dir, exist_ok=True)
            self._mm = np.lib.format.open_memmap(
                self.npy_path, mode="w+", dtype=self.dtype,
                shape=self.shape)
        except Exception:
            self._mm = None
        return self._mm

    def mark_complete(self, arr=None) -> None:
        """Flush the memmap and atomically publish the sidecar."""
        if not self.enabled or self.complete:
            return
        try:
            mm = self._mm if self._mm is not None else arr
            if isinstance(mm, np.memmap):
                mm.flush()
            elif arr is not None:
                # rows were decoded into a plain RAM array (memmap open
                # failed earlier, or the caller cached in RAM): persist
                # the finished set in one shot
                os.makedirs(self._dir, exist_ok=True)
                np.save(self.npy_path, np.asarray(arr, self.dtype))
            else:
                return
            tmp = self.sidecar_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"shape": self.shape, "dtype": self.dtype.name,
                           "version": _VERSION}, f)
            os.replace(tmp, self.sidecar_path)
            self.complete = True
        except Exception:
            pass


def load_image_dir_cached(data_dir: str, resolution: int = 64,
                          ext: str = "png", limit: int | None = None,
                          mode: int | None = None,
                          num_threads: int | None = None,
                          dtype=np.float32, policy="auto") -> np.ndarray:
    """``load_image_dir_native`` behind the disk cache.

    First call decodes (threaded native loader) and persists; later
    calls with unchanged files memmap the cached bytes read-only — the
    query sets of a re-run attack cost a file open instead of a decode.
    ``limit`` is part of the key (the limited prefix is what's cached).
    """
    from ganleaks_tpu.io.images import get_filepaths_from_dir
    from ganleaks_tpu.io.native import MODE_EXACT, load_image_paths_native

    if mode is None:
        mode = MODE_EXACT
    paths = get_filepaths_from_dir(data_dir, ext)
    if limit is not None:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no *.{ext} files under {data_dir}")
    dc = DecodeCache(data_dir, paths, resolution, mode, dtype, policy)
    cached = dc.load()
    if cached is not None:
        return cached
    arr = load_image_paths_native(paths, resolution, mode=mode,
                                  num_threads=num_threads, dtype=dtype)
    mm = dc.open_for_write()
    if mm is not None:
        mm[:] = arr
    dc.mark_complete(arr)
    return arr
