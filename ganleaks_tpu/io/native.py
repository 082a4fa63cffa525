"""ctypes bindings for the native batched PNG loader (``native/``).

Gives the host path (the only part of the pipeline not on the TPU) a
threaded C++ decode with fused [-1,1] conversion. Falls back to the PIL
readers per-image on any decode/shape mismatch (so PIL-resize semantics
stay byte-faithful) and falls back entirely if the library isn't built.

Build once:  make -C native      (auto-attempted on first use)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ganleaks_tpu.io.images import (
    get_filepaths_from_dir,
    read_image,
    read_image_center_crop,
)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libganleaks_io.so")

MODE_EXACT = 0
MODE_CENTER_CROP = 1

_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        src = os.path.join(_NATIVE_DIR, "ganleaks_io.cpp")
        stale = os.path.exists(src) and (
            not os.path.exists(_SO_PATH)
            or os.path.getmtime(src) > os.path.getmtime(_SO_PATH))
        if stale:
            subprocess.run(["make", "-B", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        lib.gl_load_batch.restype = ctypes.c_int
        lib.gl_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        if hasattr(lib, "gl_save_batch"):  # stale .so: loader-only v1
            lib.gl_save_batch.restype = ctypes.c_int
            lib.gl_save_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
    except Exception as e:  # missing toolchain/libpng: pure-python fallback
        print(f"[native] loader unavailable ({e}); using PIL")
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def load_image_paths_native(paths: list, resolution: int = 64,
                            mode: int = MODE_EXACT,
                            num_threads: int | None = None,
                            dtype=np.float32) -> np.ndarray:
    """Explicit path list -> NHWC array via the C++ loader; per-image PIL
    fallback keeps resize semantics identical for mismatched sizes.
    ``dtype=np.uint8`` returns the original bytes (exact re-encode,
    ``io.images.unit_to_uint8_exact``) for lossless uint8 device
    residency."""
    lib = _load_library()
    n = len(paths)
    out = np.empty((n, resolution, resolution, 3), np.float32)

    def finish(arr: np.ndarray) -> np.ndarray:
        if np.dtype(dtype) == np.uint8:
            from ganleaks_tpu.io.images import unit_to_uint8_exact
            return unit_to_uint8_exact(arr)
        return arr

    if lib is None:
        reader = (read_image_center_crop if mode == MODE_CENTER_CROP
                  else read_image)
        for i, p in enumerate(paths):
            out[i] = reader(p, resolution)
        return finish(out)

    num_threads = num_threads or min(8, os.cpu_count() or 1)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    status = np.zeros(n, np.int32)
    lib.gl_load_batch(
        c_paths, n, resolution, mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads)

    # per-image fallback: non-PNG files, shape mismatches (PIL-resize path)
    fallback_reader = (read_image_center_crop if mode == MODE_CENTER_CROP
                       else read_image)
    for i in np.nonzero(status)[0]:
        out[i] = fallback_reader(paths[i], resolution)
    return finish(out)


def load_image_dir_native(data_dir: str, resolution: int = 64,
                          ext: str = "png", limit: int | None = None,
                          mode: int = MODE_EXACT,
                          num_threads: int | None = None,
                          dtype=np.float32) -> np.ndarray:
    """Directory -> NHWC float32 in [-1, 1] (:func:`load_image_paths_native`
    over the sorted recursive glob)."""
    paths = get_filepaths_from_dir(data_dir, ext)
    if limit is not None:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no *.{ext} files under {data_dir}")
    return load_image_paths_native(paths, resolution, mode=mode,
                                   num_threads=num_threads, dtype=dtype)


def save_png_batch_native(images_u8: np.ndarray, paths: list,
                          compress_level: int = 1,
                          num_threads: int | None = None) -> None:
    """Encode a uint8 NHWC RGB batch to per-image PNGs via the C++
    thread-pool encoder, replacing the reference's python loop over
    ToPILImage + Image.save (``train_torch.py:160-174``). PNG is lossless:
    outputs decode pixel-identical to PIL's (byte layout differs —
    libpng's deflate/filter choices are its own). ``compress_level``
    defaults to 1 (best speed): the dump is a bulk artifact whose only
    consumers re-decode it. Per-image PIL fallback on any encode error;
    full PIL fallback when the library isn't built."""
    images_u8 = np.asarray(images_u8)
    if images_u8.dtype != np.uint8:
        # an implicit C-cast would silently corrupt the dump ([0,1]
        # floats become all 0s/1s, negatives wrap mod 256) — callers own
        # the quantization step (io.images.to_uint8, which also owns the
        # floor-vs-rint parity choice)
        raise TypeError(
            f"save_png_batch_native expects uint8 pixels, got "
            f"{images_u8.dtype}; convert with io.images.to_uint8 first")
    images_u8 = np.ascontiguousarray(images_u8)
    n, h, w, c = images_u8.shape
    # a real error, not an assert (stripped under python -O): mismatched
    # lengths would hand the C encoder NULL path slots, a wrong channel
    # count a wrong pixel stride
    if len(paths) != n or c != 3:
        raise ValueError(f"save_png_batch_native: {n} images (c={c}) "
                         f"vs {len(paths)} paths; need equal counts and "
                         f"RGB (c=3)")

    lib = _load_library()
    if lib is None or not hasattr(lib, "gl_save_batch"):
        import PIL.Image
        for img, p in zip(images_u8, paths):
            PIL.Image.fromarray(img).save(p)
        return

    num_threads = num_threads or min(8, os.cpu_count() or 1)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    status = np.zeros(n, np.int32)
    lib.gl_save_batch(
        c_paths, n, h, w,
        images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(compress_level),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads)
    if status.any():
        import PIL.Image
        for i in np.nonzero(status)[0]:
            PIL.Image.fromarray(images_u8[i]).save(paths[i])
