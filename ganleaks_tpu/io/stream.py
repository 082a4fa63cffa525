"""Lazy block-decoded image sets for pipelined ingest.

The reference decodes every PNG up front and moves the whole set to the
device before the first distance is computed (``fbb.py:133-145``). At the
100k x 20k north star that serializes ~50 s of host PNG decode plus ~5 s
of host->device transfer IN FRONT of a ~10 s device search.

:class:`HostImageSet` indexes like an ``(N, H, W, C)`` array but decodes
rows on demand (native threaded loader, ``io/native.py``) with background
readahead of the sequentially-next window — so the streamed kNN engines'
block slices (``ops/knn._block_norms``: ``x[start:start+block]``) pull
decode, host->device shipping, and the device-side featurize/fold into
ONE overlapped pipeline. The set is stateless on the host: an OOM-resume
re-slice simply re-decodes (docs/PERF.md "Host artifact IO").
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ganleaks_tpu.io.images import get_filepaths_from_dir
from ganleaks_tpu.io.native import MODE_EXACT, load_image_paths_native


class HostImageSet:
    """A directory of images as a lazily-decoded array-like.

    Supports the access patterns of the streamed engines and the attack
    driver: ``x[start:stop]`` (sequential block reads, with readahead),
    ``x[i]`` (single row, e.g. the viz NN gather) and ``x[index_array]``
    (the two-pass candidate gather). Every access returns a fresh decoded
    ``np.ndarray``. With the default ``cache_decoded=True`` each row
    decodes at most ONCE and is kept in host RAM (the full decoded set —
    exactly what the eager loader would hold; multi-chunk schedules
    re-sweep from RAM instead of re-decoding). ``cache_decoded=False``
    drops that cache for sets larger than host memory: then only the one
    prefetched window is held and the footprint is O(paths), at the cost
    of re-decoding on every re-sweep.
    """

    def __init__(self, data_dir: str, resolution: int = 64,
                 ext: str = "png", limit: int | None = None,
                 mode: int = MODE_EXACT, dtype=np.uint8,
                 num_threads: int | None = None, readahead: bool = True,
                 cache_decoded: bool = True, disk_cache="auto"):
        from ganleaks_tpu.io.diskcache import DecodeCache

        self.paths = get_filepaths_from_dir(data_dir, ext)
        if limit is not None:
            self.paths = self.paths[:limit]
        if not self.paths:
            raise FileNotFoundError(f"no *.{ext} files under {data_dir}")
        self.resolution = resolution
        self.mode = mode
        self.dtype = np.dtype(dtype)
        self.num_threads = num_threads
        self.shape = (len(self.paths), resolution, resolution, 3)
        # one worker: decode is CPU-bound on this host class; the point
        # is overlap with DEVICE work, not host parallelism (the native
        # loader threads inside one decode call already use the cores)
        self._pool = ThreadPoolExecutor(max_workers=1) if readahead \
            else None
        self._next: tuple | None = None  # ((start, stop), Future)
        # persistent decoded cache (io/diskcache): a complete entry from
        # an earlier run serves every read as a read-only memmap — zero
        # decode this process; otherwise rows decode into a writable
        # memmap that is published (sidecar) once the last row lands, so
        # the NEXT run skips the decode
        self._dc = DecodeCache(data_dir, self.paths, resolution, mode,
                               self.dtype, policy=disk_cache)
        cached = self._dc.load()
        if cached is not None:
            self._cache = cached
            self._have = np.ones(len(self.paths), bool)
            return
        # decoded-row HOST cache (host RAM is ~8x device HBM here): a
        # multi-chunk schedule re-sweeps the generated set once per
        # chunk — decode each row once, serve re-sweeps from RAM. Costs
        # exactly what the eager loader holds anyway; disable for sets
        # bigger than host memory. Backed by the writable cache memmap
        # when available (same bytes, and the OS flushes them to disk
        # for the next run's free ride).
        self._cache = None
        if cache_decoded:
            mm = self._dc.open_for_write()
            self._cache = mm if mm is not None \
                else np.empty(self.shape, self.dtype)
        self._have = (np.zeros(len(self.paths), bool)
                      if cache_decoded else None)

    def __len__(self) -> int:
        return self.shape[0]

    @property
    def nbytes(self) -> int:
        """Logical size of the DECODED set. Note it is never resident on
        the host or device all at once — the HBM planner charges host-
        backed inputs nothing (``ops/knn._auto_stream_plan``)."""
        return int(np.prod(self.shape)) * self.dtype.itemsize

    @property
    def ndim(self) -> int:
        return 4

    def _decode(self, start: int, stop: int) -> np.ndarray:
        if self._have is not None and self._have[start:stop].all():
            return self._cache[start:stop].copy()
        arr = load_image_paths_native(
            self.paths[start:stop], self.resolution, mode=self.mode,
            num_threads=self.num_threads, dtype=self.dtype)
        if self._cache is not None:
            # data first, THEN the flags: a concurrent reader (readahead
            # worker vs main thread) may see have=False and re-decode,
            # never a True flag over unwritten rows
            self._cache[start:stop] = arr
            self._have[start:stop] = True
            if not self._dc.complete and self._have.all():
                # last row landed: publish the disk cache for later runs
                self._dc.mark_complete(self._cache)
        return arr

    def _window(self, start: int, stop: int) -> np.ndarray:
        """Decode [start, stop), serving/priming the readahead window."""
        arr = None
        if self._next is not None:
            (ps, pe), fut = self._next
            if (ps, pe) == (start, stop):
                arr = fut.result()
                self._next = None
            elif fut.done():  # stale prefetch (resume changed the walk)
                self._next = None
            else:
                fut.result()  # drain: one worker, must not queue behind
                self._next = None
        if arr is None:
            arr = self._decode(start, stop)
        if self._pool is not None:
            nxt = (stop, min(len(self), stop + (stop - start)))
            if nxt[1] > nxt[0]:
                self._next = (nxt, self._pool.submit(self._decode, *nxt))
        return arr

    def __getitem__(self, idx) -> np.ndarray:
        if isinstance(idx, slice):
            start, stop, step = idx.indices(len(self))
            if step != 1:  # decode only the selected rows, not the set
                return self[np.arange(start, stop, step)]
            if start >= stop:
                return np.empty((0,) + self.shape[1:], self.dtype)
            return self._window(start, stop)
        if isinstance(idx, (int, np.integer)):
            i = int(idx)
            i0 = i + len(self) if i < 0 else i
            if not 0 <= i0 < len(self):
                raise IndexError(f"index {i} out of range for "
                                 f"HostImageSet of length {len(self)}")
            return self._decode(i0, i0 + 1)[0]
        rows = np.asarray(idx)
        if rows.ndim != 1:
            raise TypeError(f"HostImageSet: unsupported index {idx!r}")
        if rows.dtype == bool:
            # numpy boolean-mask semantics — treating the mask as int
            # indices would silently return copies of rows 0/1
            if len(rows) != len(self):
                raise IndexError(
                    f"boolean mask of length {len(rows)} does not match "
                    f"HostImageSet of length {len(self)}")
            rows = np.nonzero(rows)[0]
        rows = np.where(rows < 0, rows + len(self), rows)
        if rows.size and (rows.min() < 0 or rows.max() >= len(self)):
            raise IndexError(f"index out of range for HostImageSet of "
                             f"length {len(self)}")
        out = np.empty((len(rows),) + self.shape[1:], self.dtype)
        order = np.argsort(rows, kind="stable")
        k = 0
        while k < len(order):  # decode contiguous runs in one call
            j = k
            while (j + 1 < len(order)
                   and rows[order[j + 1]] == rows[order[j]] + 1):
                j += 1
            lo, hi = int(rows[order[k]]), int(rows[order[j]]) + 1
            out[order[k:j + 1]] = self._decode(lo, hi)
            k = j + 1
        return out

    def __array__(self, dtype=None, copy=None) -> np.ndarray:
        """Full eager decode — lets ``np.asarray``/``jnp.asarray`` (the
        non-streaming paths: mesh device_put, viz grids) consume the set
        like any array. Defeats laziness by design; the streamed engines
        never call it."""
        arr = self._decode(0, len(self))
        return arr.astype(dtype) if dtype is not None else arr

    def limit(self, n: int) -> "HostImageSet":
        """A view over the first ``n`` rows (lazy — no decode)."""
        clone = object.__new__(HostImageSet)
        clone.__dict__.update(self.__dict__)
        clone.paths = self.paths[:n]
        clone.shape = (len(clone.paths),) + self.shape[1:]
        clone._next = None
        return clone
