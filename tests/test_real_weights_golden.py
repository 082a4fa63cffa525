"""Goldens that run only when REAL pretrained weights are present
(docs/WEIGHTS.md): conversion-schema pinning for the LPIPS VGG16 npz and
the Inception pool_3 npz. Skipped in the zero-egress image."""

import hashlib
import os

import numpy as np
import pytest

_LPIPS = os.path.expanduser(os.environ.get("GANLEAKS_LPIPS_VGG_NPZ", ""))
_INCEPTION = os.path.expanduser(os.environ.get("GANLEAKS_INCEPTION_NPZ", ""))


def _sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


@pytest.mark.skipif(not (_LPIPS and os.path.exists(_LPIPS)),
                    reason="set GANLEAKS_LPIPS_VGG_NPZ to a converted "
                           "real-weights npz (docs/WEIGHTS.md)")
def test_real_lpips_vgg_golden():
    import jax.numpy as jnp

    from ganleaks_tpu.ops.lpips import lpips_pair, reference_lin_weights
    from ganleaks_tpu.ops.lpips.backbones import VGG16_CONVS
    from ganleaks_tpu.ops.lpips.lpips import load_lpips_params

    print(f"lpips npz sha256: {_sha(_LPIPS)}")
    params = load_lpips_params(_LPIPS)
    assert params["net"] in ("vgg", "vgg16")

    # conv shapes == the tower spec
    specs = [l for l in VGG16_CONVS if not isinstance(l, str)]
    assert len(params["convs"]) == len(specs)
    c = 3
    for conv, (out, k, _s, _p) in zip(params["convs"], specs):
        assert conv["kernel"].shape == (k, k, c, out)
        c = out

    # the lin heads are real in BOTH files — bit equality or the
    # conversion is broken
    for got, want in zip(params["lins"], reference_lin_weights("vgg")):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # metric axioms on the real tower
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    noise = jnp.asarray(
        (rng.standard_normal((2, 64, 64, 3)) * 0.01).astype(np.float32))
    unrelated = jnp.asarray(
        rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    assert float(np.max(np.asarray(lpips_pair(params, x, x)))) < 1e-8
    near = np.asarray(lpips_pair(params, x, x + noise))
    far = np.asarray(lpips_pair(params, x, unrelated))
    assert (near < far).all()


@pytest.mark.skipif(not (_INCEPTION and os.path.exists(_INCEPTION)),
                    reason="set GANLEAKS_INCEPTION_NPZ to a converted "
                           "real-weights npz (docs/WEIGHTS.md)")
def test_real_inception_fid_golden():
    from ganleaks_tpu.ops.fid import fid_from_image_sets, get_activations
    from ganleaks_tpu.utils.checkpoint import load_params_npz

    print(f"inception npz sha256: {_sha(_INCEPTION)}")
    params = load_params_npz(_INCEPTION)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (8, 64, 64, 3)).astype(np.float32)
    feats = get_activations(params, imgs)
    assert feats.shape == (8, 2048)
    assert float(fid_from_image_sets(params, imgs, imgs)) < 1e-3
