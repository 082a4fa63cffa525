"""L2/DSSIM FakeNet distances: rgb2lab against reference CIELAB values,
SSIM properties (identity, range, known degradation ordering)."""

import numpy as np

from ganleaks_tpu.ops.lpips.fakenets import (
    dssim_distance,
    l2_distance,
    rgb2lab,
    ssim,
)


def test_rgb2lab_reference_values():
    # white, black, pure red (standard CIELAB D65 values)
    rgb = np.array([[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0],
                     [1.0, 0.0, 0.0]]])
    lab = rgb2lab(rgb)[0]
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.02)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=1e-6)
    # red ~ (53.24, 80.09, 67.20)
    np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.05)


def test_ssim_identity_and_ordering(rng):
    a = rng.uniform(0, 255, (32, 32, 3))
    assert abs(ssim(a, a, 255.0) - 1.0) < 1e-12
    slight = a + rng.normal(0, 2, a.shape)
    heavy = a + rng.normal(0, 40, a.shape)
    s1 = ssim(a, slight, 255.0)
    s2 = ssim(a, heavy, 255.0)
    assert 1.0 > s1 > s2


def test_l2_and_dssim_distances(rng):
    a = rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)

    d_rgb = l2_distance(a, b, "RGB")
    np.testing.assert_allclose(d_rgb, np.mean((a - b) ** 2, axis=(1, 2, 3)),
                               rtol=1e-6)
    d_lab = l2_distance(a, b, "Lab")
    assert (d_lab > 0).all()
    np.testing.assert_allclose(l2_distance(a, a, "Lab"), 0.0, atol=1e-12)

    for cs in ("RGB", "Lab"):
        d = dssim_distance(a, b, cs)
        assert d.shape == (3,)
        assert (d > 0).all() and (d < 1).all()
        np.testing.assert_allclose(dssim_distance(a, a, cs), 0.0,
                                   atol=1e-12)
