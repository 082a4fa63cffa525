"""Per-epoch sample-grid logging (observability parity with the
reference's wandb image grids, ``train_torch.py:125-127`` and
``pggan/train.py:190-197``): grids must land in the run dir as PNG files
during DCGAN/PGGAN training."""

import glob
import os

import numpy as np
from PIL import Image

from ganleaks_tpu.config import DCGANConfig, PGGANConfig
from ganleaks_tpu.utils.logging import MetricsLogger, tile_image_grid


def test_tile_image_grid_shapes(rng):
    imgs = rng.random((5, 16, 16, 3)).astype(np.float32)
    grid = tile_image_grid(imgs, ncols=8)
    # 5 images at ncols=8 -> one row of 5 columns
    assert grid.shape == (16, 5 * 16, 3)
    assert grid.dtype == np.uint8

    grid2 = tile_image_grid(rng.random((10, 8, 8, 3)), ncols=4)
    assert grid2.shape == (3 * 8, 4 * 8, 3)  # 10 -> 3 rows of 4, padded

    gray = tile_image_grid(rng.random((4, 8, 8, 1)), ncols=2)
    assert gray.shape == (16, 16)  # single-channel squeezed for PIL


def test_tile_image_grid_values():
    one = np.full((1, 2, 2, 3), 0.5, np.float32)
    assert np.all(tile_image_grid(one) == 128)  # round(0.5*255)


def test_logger_writes_grid_png(tmp_path, rng):
    logger = MetricsLogger(image_dir=str(tmp_path / "grids"))
    path = logger.log_image_grid("samples",
                                 rng.random((9, 8, 8, 3)), step=3)
    assert path is not None and os.path.exists(path)
    img = np.asarray(Image.open(path))
    assert img.shape == (2 * 8, 8 * 8, 3)
    logger.close()

    silent = MetricsLogger()  # no sinks -> no-op
    assert silent.log_image_grid("x", rng.random((2, 4, 4, 3))) is None


def test_dcgan_training_emits_grids(tmp_path, rng):
    cfg = DCGANConfig(batch_size=8, num_epochs=2, ngf=8, ndf=8, nz=16,
                      num_generated=4, image_size=64, save_model=False,
                      PATH=str(tmp_path / "model"),
                      PATH_syn_data=str(tmp_path / "syn"))
    from ganleaks_tpu.train import dcgan as dcgan_train
    images = rng.standard_normal((16, 64, 64, 3)).astype(np.float32)
    dcgan_train.train(cfg, images=images)
    grids = sorted(glob.glob(os.path.join(cfg.PATH, "sample_grids", "*.png")))
    assert len(grids) == 2  # one per epoch
    assert np.asarray(Image.open(grids[0])).shape == (8 * 64, 8 * 64, 3)


def test_pggan_training_emits_grids(tmp_path, rng):
    cfg = PGGANConfig(batch_sizes=[8], num_epochs=1, nz=16, in_channels=16,
                      image_size=8, start_img_size=4, save_model=False,
                      PATH=str(tmp_path / "model"),
                      PATH_syn_data=str(tmp_path / "syn"))
    from ganleaks_tpu.train import pggan as pggan_train
    images = rng.standard_normal((16, 8, 8, 3)).astype(np.float32)
    pggan_train.train(cfg, images=images)
    grids = glob.glob(os.path.join(cfg.PATH, "sample_grids", "*.png"))
    assert len(grids) == 2  # one per (resolution, epoch): 4x4 and 8x8


def test_metrics_logger_survives_arrays_and_keeps_strings(tmp_path):
    """Non-float-coercible values must degrade to JSON-safe forms, not
    kill the run at a logging call; numeric strings stay strings."""
    import json

    from ganleaks_tpu.utils.logging import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path, echo=False)
    lg.log({"arr": np.arange(3), "run": "0012", "x": np.float32(2.5),
            "flag": True, "obj": object()})
    rec = json.loads(open(path).read().splitlines()[-1])
    assert rec["arr"] == [0, 1, 2]
    assert rec["run"] == "0012"
    assert rec["x"] == 2.5 and rec["flag"] is True
    assert isinstance(rec["obj"], str)
