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


def test_2afc_and_jnd_scores(rng):
    from ganleaks_tpu.ops.lpips.scoring import score_2afc, score_jnd

    # gt = fraction of humans judging p1 more similar; a perfect metric
    # has d1 < d0 exactly when gt = 1 (dist_model.py:278-288)
    gts = (rng.random(50) > 0.5).astype(np.float64)
    d0 = np.where(gts == 1, 0.9, 0.1)
    d1 = np.where(gts == 1, 0.1, 0.9)
    assert score_2afc(d0, d1, gts) == 1.0
    assert score_2afc(d1, d0, gts) == 0.0   # anti-metric
    # exact ties score 0.5 (the reference's EVAL formula,
    # dist_model.py:287 — its training-side compute_accuracy folds ties
    # toward p0, but the scorer does not)
    assert score_2afc(d0, d0, gts) == 0.5

    # JND: perfectly separable distances -> mAP 1
    sames = np.array([1, 1, 1, 0, 0, 0], np.float64)
    ds = np.array([0.1, 0.2, 0.3, 0.8, 0.9, 1.0])
    assert abs(score_jnd(ds, sames) - 1.0) < 1e-12
    # the reference's voc_ap uses the monotone precision ENVELOPE, so its
    # AP upper-bounds sklearn's step integral but tracks it closely
    from sklearn.metrics import average_precision_score

    ds = rng.random(200)
    sames = (rng.random(200) < 0.4).astype(np.float64)
    ours = score_jnd(ds, sames)
    ref = average_precision_score(sames, -ds)
    assert ours >= ref - 1e-12
    assert abs(ours - ref) < 0.05


def test_lab_l2_reference_formula_and_byte_truncation(rng):
    """Reference chain (verified against /root/reference bytes):
    tensor2im truncates to uint8 BEFORE rgb2lab (util.py:134-138), and
    util.l2 carries a 0.5 factor (util.py:42-43). Regression: the port
    kept continuous floats (3rd-decimal divergence) and dropped the 0.5
    (exactly 2x the reference distance)."""
    from ganleaks_tpu.ops.lpips.fakenets import (l2_distance, rgb2lab,
                                                 ssim)

    x0 = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
    x1 = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
    u0 = ((x0.astype(np.float64) + 1.0) * 127.5).astype(np.uint8)
    u1 = ((x1.astype(np.float64) + 1.0) * 127.5).astype(np.uint8)
    ref = 0.5 * np.mean((rgb2lab(u0 / 255.0) / 100.0
                         - rgb2lab(u1 / 255.0) / 100.0) ** 2,
                        axis=(1, 2, 3))
    np.testing.assert_allclose(l2_distance(x0, x1, "Lab"), ref,
                               rtol=1e-12)
    # sub-byte perturbations vanish after the uint8 round-trip: a
    # truncation-faithful port scores them as EXACT ties
    eps = 1.0 / 512.0  # < half a byte step of 2/255
    x2 = np.clip(x0 + eps * (x0 < 0.9), -1.0, 1.0).astype(np.float32)
    base = ((x0.astype(np.float64) + 1.0) * 127.5).astype(np.uint8)
    pert = ((x2.astype(np.float64) + 1.0) * 127.5).astype(np.uint8)
    if (base == pert).all():  # rng-dependent, holds for most draws
        np.testing.assert_array_equal(l2_distance(x0, x2, "Lab"),
                                      np.zeros(2))
    del ssim  # imported to assert the module still exposes it
