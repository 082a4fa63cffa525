"""E2E for the 2AFC/JND scorer CLI (``cli/lpips_scores.py``) — the
DistModel evaluation surface (``dist_model.py:253-330``) from the command
line, over both input forms (single .npz and the original LPIPS dataset
directory layout)."""

import json
import os

import numpy as np
import pytest

from ganleaks_tpu.cli.lpips_scores import main
from ganleaks_tpu.ops.lpips.fakenets import l2_distance
from ganleaks_tpu.ops.lpips.scoring import (make_pair_dist_fn, score_2afc,
                                            score_jnd)


def rand_imgs(rng, n, res=16):
    return rng.uniform(-1, 1, size=(n, res, res, 3)).astype(np.float32)


def test_2afc_npz_l2_matches_direct(tmp_path):
    rng = np.random.default_rng(0)
    ref, p0, p1 = (rand_imgs(rng, 12) for _ in range(3))
    judge = rng.uniform(0, 1, 12)
    npz = tmp_path / "triplets.npz"
    np.savez(npz, ref=ref, p0=p0, p1=p1, judge=judge)
    out = tmp_path / "out.json"

    main([f"data_dir={npz}", "mode=2afc", "model=l2", "batch_size=5",
          f"out_json={out}"])

    got = json.loads(out.read_text())
    want = score_2afc(l2_distance(ref, p0), l2_distance(ref, p1), judge)
    assert got["n"] == 12
    assert abs(got["score"] - want) < 1e-12


def test_jnd_directory_layout(tmp_path):
    from ganleaks_tpu.io.images import load_image_dir, save_png

    rng = np.random.default_rng(1)
    n = 10
    for sub in ("p0", "p1"):
        os.makedirs(tmp_path / sub)
        for k in range(n):
            save_png(rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32),
                     str(tmp_path / sub / f"{k:03d}.png"), drange=(-1, 1))
    os.makedirs(tmp_path / "same")
    sames = rng.integers(0, 2, n).astype(np.float64)
    for k in range(n):
        np.save(tmp_path / "same" / f"{k:03d}.npy", sames[k])
    out = tmp_path / "out.json"

    main([f"data_dir={tmp_path}", "mode=jnd", "model=l2", "resolution=16",
          f"out_json={out}"])

    got = json.loads(out.read_text())
    # expected from the images as the CLI reloads them (8-bit PNG trip)
    a = load_image_dir(str(tmp_path / "p0"), resolution=16)
    b = load_image_dir(str(tmp_path / "p1"), resolution=16)
    want = score_jnd(l2_distance(a, b), sames)
    assert got["n"] == n
    assert abs(got["score"] - want) < 1e-12


def test_netlin_dist_fn_matches_lpips_pair():
    import jax.numpy as jnp

    from ganleaks_tpu.ops.lpips.lpips import default_lpips_params, lpips_pair

    rng = np.random.default_rng(2)
    a, b = rand_imgs(rng, 4, 32), rand_imgs(rng, 4, 32)
    dist = make_pair_dist_fn("net-lin", net="vgg")
    want = np.asarray(lpips_pair(default_lpips_params(net="vgg"),
                                 jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(dist(a, b), want, rtol=1e-5)


def test_unknown_model_raises():
    with pytest.raises(ValueError, match="unknown distance model"):
        make_pair_dist_fn("resnet-gan")
