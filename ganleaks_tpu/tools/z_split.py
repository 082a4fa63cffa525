"""CelebA member/non-member dataset splitter (reference: ``z_split.py``).

Identities with exactly ``num_same_id`` images form the private (member)
pool; identities with fewer form the public (non-member) pool
(``z_split.py:41-43``). ``num_images/3`` images are drawn from each pool;
members are center-cropped (178x218 -> 128x128 at cx=89, cy=121) and written
to BOTH the training dir (plus a random-crop ``_a1`` and a horizontal-flip
``_a2`` augmentation) and the positive-query dir; non-members go cropped to
the negative dir (``z_split.py:82-131``).

Host-only tool. Additionally packs each output set into a single ``.npy``
array file for fast device feeding (a TPU-pipeline addition; PNGs remain
the canonical cross-check artifact).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import PIL.Image

from ganleaks_tpu.config import SplitConfig


def read_identity_annotations(path: str) -> dict[str, list[str]]:
    """``{identity: [filename...]}`` (``z_split.py:34-38``).

    Line format is ``<identity> <filename>`` — the reference's variable
    names suggest the opposite, but its later use (``len(diz[i]) ==
    num_same_id`` and ``private_images += diz[identity]``,
    ``z_split.py:41-53``) only works when the FIRST token is the grouping
    key (identity) and the second is the image filename.
    """
    diz: dict[str, list[str]] = {}
    with open(path) as f:
        for line in f:
            annotation, identity = line.strip().split()
            if not diz and annotation.lower().endswith(
                    (".jpg", ".jpeg", ".png")):
                # the OFFICIAL identity_CelebA.txt is '<filename> <id>' —
                # the opposite order. Grouping by filename makes every
                # pool empty/garbage silently; fail loudly instead.
                raise ValueError(
                    f"{path}: first token {annotation!r} looks like a "
                    f"filename — this tool (like the reference, "
                    f"z_split.py:34-38) expects '<identity> <filename>' "
                    f"lines; swap the columns of the standard CelebA "
                    f"identity file before splitting")
            diz.setdefault(annotation, []).append(identity)
    return diz


def select_images(diz: dict[str, list[str]], num_images: int,
                  num_same_id: int) -> tuple[list[str], list[str]]:
    """Private/public image lists (``z_split.py:41-66``)."""
    private_ids = [i for i in diz if len(diz[i]) == num_same_id]
    public_ids = [i for i in diz if len(diz[i]) < num_same_id]
    if not private_ids:
        raise ValueError(
            f"no identity has exactly num_same_id={num_same_id} images — "
            f"empty member pool (identity counts range "
            f"{min(map(len, diz.values()))}..{max(map(len, diz.values()))}"
            f" over {len(diz)} identities); check the annotation file's "
            f"column order and num_same_id")
    assert not any(a in private_ids for a in public_ids), \
        "The two lists are not disjoint!"
    assert num_images % 30 == 0, (
        "num_images must be divisible by 30!, either 510, 1020, 2040, "
        "10002, 20001")
    considered = num_images // 3

    def take(ids):
        out: list[str] = []
        for ident in ids:
            if len(out) >= considered:
                break
            room = considered - len(out)
            out += diz[ident] if room > len(diz[ident]) else \
                diz[ident][:room]
        return out

    private_images = take(private_ids)
    public_images = take(public_ids)
    assert not any(img in private_images for img in public_images), \
        "The two lists are not disjoint!"
    return private_images, public_images


def center_crop_128(img: np.ndarray, cx: int = 89,
                    cy: int = 121) -> np.ndarray:
    assert img.shape == (218, 178, 3)
    return img[cy - 64: cy + 64, cx - 64: cx + 64]


def random_crop(img: np.ndarray, rng: np.random.Generator,
                crop_size=(128, 128)) -> np.ndarray:
    """(``z_split.py:125-131``; note the reference samples x from the
    height range and y from the width range — replicated)."""
    w, h = img.shape[:2]
    x = rng.integers(0, h - crop_size[0])
    y = rng.integers(0, w - crop_size[1])
    return img[y:y + crop_size[0], x:x + crop_size[1]]


def run_split(cfg: SplitConfig) -> dict[str, int]:
    diz = read_identity_annotations(cfg.identity_annotations)
    private_images, public_images = select_images(diz, cfg.num_images,
                                                  cfg.num_same_id)

    for d in (cfg.output_dir0, cfg.output_dir1, cfg.output_dir2):
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(cfg.seed)
    # packed rows carry their output FILENAME so the array can be stacked
    # in sorted-filename order — the exact row order every PNG consumer
    # sees (io.images.get_filepaths_from_dir sorts); stacking in
    # annotation-iteration order would silently mispair rows against
    # glob-derived artifacts
    packs: dict[str, list] = {"train": [], "pos": [], "neg": []}

    for img_name in private_images:
        img_id = img_name.split(".")[0]
        raw = np.asarray(PIL.Image.open(
            os.path.join(cfg.input_dir, img_name)))
        crop = center_crop_128(raw)
        a1 = random_crop(raw, rng)
        a2 = np.fliplr(crop)
        PIL.Image.fromarray(crop).save(
            os.path.join(cfg.output_dir1, img_id + ".png"))
        for suffix, arr in (("", crop), ("_a1", a1), ("_a2", a2)):
            fn = img_id + suffix + ".png"
            PIL.Image.fromarray(arr).save(
                os.path.join(cfg.output_dir0, fn))
            packs["train"].append((fn, arr))
        packs["pos"].append((img_id + ".png", crop))

    for img_name in public_images:
        img_id = img_name.split(".")[0]
        raw = np.asarray(PIL.Image.open(
            os.path.join(cfg.input_dir, img_name)))
        crop = center_crop_128(raw)
        PIL.Image.fromarray(crop).save(
            os.path.join(cfg.output_dir2, img_id + ".png"))
        packs["neg"].append((img_id + ".png", crop))

    # packed array files for fast TPU feeding, row i == sorted PNG i
    for name, d in (("train", cfg.output_dir0), ("pos", cfg.output_dir1),
                    ("neg", cfg.output_dir2)):
        if packs[name]:
            np.save(os.path.join(d, f"_packed_{name}.npy"),
                    np.stack([arr for _, arr in sorted(packs[name])]))
    return {"members": len(private_images),
            "non_members": len(public_images)}
