"""Matplotlib visualization helpers (reference:
``attack_models/utils.py:90-148``): ground-truth grids, optimization
progress with per-image losses, and the 8x8 sample sheet."""

from __future__ import annotations

import os

import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

NCOLS = 5  # attack_models/utils.py:16


def inverse_transform(imgs: np.ndarray) -> np.ndarray:
    """[-1,1] -> [0,1] (``utils.py:90-98``)."""
    return (np.asarray(imgs) + 1.0) / 2.0


def visualize_gt(imgs: np.ndarray, save_dir: str) -> str:
    """(``utils.py:101-116``)."""
    path = os.path.join(save_dir, "input.png")
    _grid(np.clip(inverse_transform(imgs), 0.0, 1.0), path)
    return path


def visualize_progress(imgs: np.ndarray, loss: np.ndarray, save_dir: str,
                       counter: int) -> str:
    """(``utils.py:119-138``)."""
    imgs = np.clip(inverse_transform(imgs), 0.0, 1.0)
    nrows = int(np.ceil(len(imgs) / NCOLS))
    plt.figure()
    for i in range(len(imgs)):
        plt.subplot(nrows, NCOLS, i + 1)
        plt.imshow(imgs[i])
        plt.title("loss: %.4f" % loss[i],
                  fontdict={"fontsize": 8, "color": "blue"})
        plt.axis("off")
    path = os.path.join(save_dir, "output_%d.png" % counter)
    plt.savefig(path)
    plt.close()
    return path


def visualize_samples(img_r01: np.ndarray, save_dir: str) -> str:
    """8x8 sample sheet (``utils.py:141-148``); input already in [0,1]."""
    plt.figure(figsize=(20, 20))
    for i in range(min(64, len(img_r01))):
        plt.subplot(8, 8, i + 1)
        plt.imshow(img_r01[i])
        plt.axis("off")
    plt.tight_layout()
    path = os.path.join(save_dir, "samples.png")
    plt.savefig(path)
    plt.close()
    return path


def _grid(imgs: np.ndarray, path: str) -> None:
    nrows = int(np.ceil(len(imgs) / NCOLS))
    plt.figure()
    for i in range(len(imgs)):
        plt.subplot(nrows, NCOLS, i + 1)
        plt.imshow(imgs[i])
        plt.axis("off")
    plt.savefig(path)
    plt.close()
