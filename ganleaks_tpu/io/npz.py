"""NPZ image-set ingest — attack directly on the reference's array dumps.

Every reference generator writes its synthetic set twice: a PNG dir
(what ``attack_models/fbb.py:133-135`` reads) AND an NPZ array dump —
``npz_images/<ts>/dcgan_synthetic_data.npz`` with key ``fake`` (NCHW,
[0, 1]; ``gan_models/dcgan/train_torch.py:160-165``),
``npz_images/<ts>/pggan_images.npz`` with key ``fake``
(``gan_models/pggan/train.py:251-253``), and the VAE-GAN sampler's
``generated.npz`` with key ``img_r01`` (NHWC, [0, 1];
``gan_models/vaegan/sample.py:57-59``). The reference attack never uses
them; it pays a full PNG decode of data it already has as arrays.

Here the attack can ingest the NPZ directly. The real-data end-to-end
wall clock is host-PNG-decode-bound (~840 imgs/s/core — docs/PERF.md),
so skipping the decode removes the dominant cost for NPZ-backed sets:
a 100k x 64x64 uint8 load is one sequential read instead of ~2 min of
inflate.

Parity contract: with ``quantize=True`` (default) the float arrays are
floor-quantized to uint8 exactly as torchvision ``ToPILImage`` truncates
when the reference writes the PNGs (``train_torch.py:155,171-174``), so
the loaded set is BIT-IDENTICAL to reading the corresponding PNG dir —
same scores, same NN indices (tests/test_npz_ingest.py asserts this).
``quantize=False`` keeps the continuous float values (more information
than the reference's own attack ever sees).
"""

from __future__ import annotations

import os

import numpy as np

from ganleaks_tpu.io.images import get_filepaths_from_dir, to_uint8

# keys tried in order; each maps to its documented layout
_KNOWN_KEYS = (
    ("fake", "NCHW"),       # dcgan/pggan synthetic dumps, [0, 1]
    ("img_r01", "NHWC"),    # vaegan generated.npz, [0, 1]
    ("images", "NHWC"),     # generic escape hatch
)


def find_npz_files(path: str) -> list[str]:
    """``path`` itself if it is an ``.npz`` file, else the recursive
    sorted ``*.npz`` glob under it (the reference nests one file per
    timestamped run dir; multiple files concatenate in sorted order,
    mirroring the PNG reader's sorted-walk semantics,
    ``attack_models/utils.py:43-57``)."""
    if os.path.isfile(path):
        return [path]
    return get_filepaths_from_dir(path, "npz")


def _member_ndims(path: str) -> dict[str, int]:
    """Member name -> ndim, read from the .npy headers inside the zip
    WITHOUT inflating any array data (an unknown-key NPZ can hold several
    multi-GB members; ``f[k].ndim`` would decompress each in full)."""
    import zipfile

    from numpy.lib import format as npf

    ndims: dict[str, int] = {}
    with zipfile.ZipFile(path) as z:
        for name in z.namelist():
            if not name.endswith(".npy"):
                continue
            with z.open(name) as f:
                version = npf.read_magic(f)
                if version == (1, 0):
                    shape, _, _ = npf.read_array_header_1_0(f)
                elif version == (2, 0):
                    shape, _, _ = npf.read_array_header_2_0(f)
                else:  # future header version: caller falls back
                    raise ValueError(f"npy header version {version}")
                ndims[name[:-4]] = len(shape)
    return ndims


def _pick_array(f: np.lib.npyio.NpzFile, path: str) -> tuple[np.ndarray, str]:
    for key, layout in _KNOWN_KEYS:
        if key in f.files:
            return f[key], layout
    try:
        ndims = _member_ndims(path)
        four_d = [k for k in f.files if ndims.get(k) == 4]
    except Exception:  # unreadable headers: pay the full-inflate scan
        four_d = [k for k in f.files if f[k].ndim == 4]
    if len(four_d) == 1:
        return f[four_d[0]], "auto"
    raise ValueError(
        f"{path}: no image array found (keys {f.files}); expected one of "
        f"{[k for k, _ in _KNOWN_KEYS]} or a single 4-D array")


def _to_nhwc(arr: np.ndarray, layout: str, path: str) -> np.ndarray:
    if arr.ndim != 4:
        raise ValueError(f"{path}: image array must be 4-D, got {arr.shape}")
    if layout == "auto":
        # channels axis is whichever of dim 1 / dim 3 holds 1 or 3; a
        # declared key decides the genuinely ambiguous (tiny-image) case
        if arr.shape[3] in (1, 3):
            layout = "NHWC"
        elif arr.shape[1] in (1, 3):
            layout = "NCHW"
        else:
            raise ValueError(f"{path}: cannot infer layout from {arr.shape}")
    if layout == "NCHW":
        arr = np.transpose(arr, (0, 2, 3, 1))
    if arr.shape[3] not in (1, 3):
        raise ValueError(f"{path}: expected 1 or 3 channels, got {arr.shape}")
    return arr


def _resize_uint8(u8: np.ndarray, resolution: int) -> np.ndarray:
    """Per-image PIL resize with the library default filter — the exact
    path a stored PNG of this byte content would take through
    ``read_image`` (``attack_models/utils.py:79``)."""
    import PIL.Image
    out = np.empty((u8.shape[0], resolution, resolution, u8.shape[3]),
                   np.uint8)
    for i in range(u8.shape[0]):
        img = u8[i, :, :, 0] if u8.shape[3] == 1 else u8[i]
        pil = PIL.Image.fromarray(img).resize((resolution, resolution))
        out[i] = np.asarray(pil).reshape(resolution, resolution, -1)
    return out


def load_npz_images(path: str, resolution: int | None = 64,
                    limit: int | None = None, dtype=np.float32,
                    quantize: bool = True) -> np.ndarray:
    """Load the reference's NPZ synthetic dumps as one NHWC image set.

    Output matches ``io.images.load_image_dir`` on the corresponding PNG
    dir: float32 in [-1, 1] (default) or the raw uint8 bytes
    (``dtype=np.uint8``, for lossless device residency). Grayscale
    arrays broadcast to 3 channels like PIL's RGB conversion of an
    ``L``-mode PNG. ``quantize=False`` skips the uint8 round-trip and
    returns ``2*x - 1`` of the stored floats (float output only; no
    PNG-parity claim, and native-resolution inputs only).
    ``resolution=None`` keeps each file's native size (the FID path's
    convention — ``ops/fid.fid_from_paths`` feeds native-size images,
    ``z_fid.py:293-298``)."""
    files = find_npz_files(path)
    if not files:
        raise FileNotFoundError(f"no *.npz files under {path}")
    parts: list[np.ndarray] = []
    n = 0
    for fp in files:
        with np.load(fp) as f:
            arr, layout = _pick_array(f, fp)
            arr = _to_nhwc(np.asarray(arr), layout, fp)
        if arr.dtype == np.uint8:
            u8 = arr
        else:
            arr = arr.astype(np.float32, copy=False)
            if arr.size:
                lo, hi = float(arr.min()), float(arr.max())
                # both bounds, loudly: a [-1,1] dump would flatten its
                # lower half and a 0-255-scaled dump would saturate to
                # all-white under the clip below — silent garbage scores
                if lo < -0.05 or hi > 1.0 + 1e-6:
                    raise ValueError(
                        f"{fp}: float values span [{lo:g}, {hi:g}] — "
                        f"expected the reference's [0, 1] convention "
                        f"(train_torch.py:158, sample.py:55-59); a "
                        f"[-1, 1] or 0-255-scaled dump must be "
                        f"renormalized before ingest")
            if not quantize:
                if np.dtype(dtype) == np.uint8:
                    raise ValueError("quantize=False requires float output")
                if resolution is not None and arr.shape[1] != resolution:
                    raise ValueError(
                        "quantize=False supports native-resolution input "
                        f"only, got {arr.shape[1]} vs {resolution}")
                parts.append(2.0 * arr - 1.0)
                n += len(arr)
                if limit is not None and n >= limit:
                    break
                continue
            # ToPILImage truncation: floor(clip(x, 0, 1) * 255)
            # (train_torch.py:155) — io.images.to_uint8 owns that
            # parity contract, so route through it
            u8 = to_uint8(arr, drange=(0.0, 1.0))
        if u8.shape[3] == 1:
            u8 = np.broadcast_to(u8, u8.shape[:3] + (3,)).copy()
        if resolution is not None and (u8.shape[1] != resolution
                                       or u8.shape[2] != resolution):
            u8 = _resize_uint8(u8, resolution)
        if np.dtype(dtype) == np.uint8:
            parts.append(u8)
        else:
            # readers' exact math: f64 2*(x/255)-1 cast to f32
            # (io/images.read_image)
            parts.append(
                (2.0 * (u8.astype(np.float64) / 255.0) - 1.0)
                .astype(np.float32))
        n += len(u8)
        if limit is not None and n >= limit:
            break
    out = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
    return out[:limit] if limit is not None else out


def _scan_for_resolution(path: str) -> tuple[list[str], list[str]]:
    """ONE walk answering every auto-resolution question: lowercased
    image and npz basenames under ``path``, each capped at 2 entries
    (the decisions below only need none / exactly-one / several), with
    an early exit once both caps are hit — a 120k-file synthetic dir is
    not walked three times for one format decision."""
    imgs: list[str] = []
    npzs: list[str] = []
    for _d, _s, flist in os.walk(path):
        for fn in flist:
            low = fn.lower()
            if low.endswith((".png", ".jpg", ".jpeg")):
                if len(imgs) < 2:
                    imgs.append(low)
            elif low.endswith(".npz"):
                if len(npzs) < 2:
                    npzs.append(low)
        if len(imgs) >= 2 and len(npzs) >= 2:
            break
    return imgs, npzs


def resolve_input_format(path: str, fmt: str = "auto") -> str:
    """'png' | 'npz' for one image-set path. 'auto' picks npz only when
    the path is an ``.npz`` file or a dir with npz content and NO image
    files (the reference keeps ``png_images/`` and ``npz_images/``
    disjoint, ``train_torch.py:160-162``), so existing image-dir
    workflows never change behavior. Images are probed FIRST: a jpg/png
    dir that also holds a stats ``.npz`` (the FID layout,
    ``z_fid.py:286-300``) must stay on the image path."""
    if fmt in ("png", "npz"):
        return fmt
    if fmt != "auto":
        raise ValueError(f"input_format must be auto/png/npz, got {fmt!r}")
    if os.path.isfile(path):
        return "npz" if path.endswith(".npz") else "png"
    imgs, npzs = _scan_for_resolution(path)
    if imgs:
        if imgs == ["samples.png"] and npzs == ["generated.npz"]:
            # the reference VAE-GAN sampler's exact layout
            # (gan_models/vaegan/sample.py:53-59): a 10x10 preview grid
            # beside the real sample array dump. Treating the grid as
            # the synthetic set silently attacked ONE image while the
            # run claimed thousands (rounds 4-5 measurement rows with
            # n_syn=1). Requiring generated.npz to be the ONLY npz also
            # pins the subsequent load to that file — with siblings the
            # loader would concatenate every npz under the path.
            return "npz"
        if npzs:
            # ambiguous dir: images win by the documented rule, but say
            # so — a preview image beside an array dump has silently
            # shrunk an attack's synthetic set before
            print(f"[io] {path!r} holds BOTH images and .npz files; "
                  f"attacking the IMAGES (input_format='npz' or an "
                  f"explicit .npz path selects the arrays)")
        return "png"
    if npzs:
        return "npz"
    return "png"
