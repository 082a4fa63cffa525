"""FID: Frechet distance backends vs the scipy reference semantics;
Inception tower shape; z_split tool semantics on a synthetic CelebA."""

import os

import numpy as np
import PIL.Image
import pytest

from ganleaks_tpu.config import SplitConfig
from ganleaks_tpu.ops import fid as fid_ops
from ganleaks_tpu.tools.z_split import run_split


def random_stats(rng, dim=16):
    a = rng.standard_normal((200, dim)).astype(np.float64)
    b = rng.standard_normal((200, dim)).astype(np.float64) * 1.3 + 0.4
    return (a.mean(0), np.cov(a, rowvar=False),
            b.mean(0), np.cov(b, rowvar=False))


@pytest.mark.parametrize("method", ["newton-schulz", "eigh"])
def test_frechet_distance_matches_scipy(rng, method):
    m1, s1, m2, s2 = random_stats(rng)
    ref = fid_ops.frechet_distance(m1, s1, m2, s2, method="scipy")
    out = fid_ops.frechet_distance(m1, s1, m2, s2, method=method)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_frechet_distance_identity_is_zero(rng):
    m1, s1, _, _ = random_stats(rng)
    d = fid_ops.frechet_distance(m1, s1, m1, s1, method="eigh")
    assert abs(d) < 1e-3


def test_inception_pool3_shape_and_fid(rng):
    params = fid_ops.init_inception_params(seed=0)
    imgs1 = rng.uniform(0, 255, (4, 64, 64, 3)).astype(np.float32)
    imgs2 = imgs1 * 0.5 + 64.0
    acts = fid_ops.get_activations(params, imgs1, batch_size=2)
    assert acts.shape == (4, 2048)
    # remainder drop (z_fid.py:88): 5 images, batch 2 -> 4 activations
    acts5 = fid_ops.get_activations(
        params, rng.uniform(0, 255, (5, 64, 64, 3)).astype(np.float32),
        batch_size=2)
    assert acts5.shape == (4, 2048)

    val_same = fid_ops.fid_from_image_sets(params, imgs1, imgs1,
                                           batch_size=2, method="eigh")
    val_diff = fid_ops.fid_from_image_sets(params, imgs1, imgs2,
                                           batch_size=2, method="eigh")
    assert val_diff > val_same


def make_fake_celeba(tmp_path, rng, n_private_ids=3, n_public=8,
                     num_same_id=4):
    """Synthetic 178x218 'CelebA' + identity annotations."""
    img_dir = tmp_path / "celeba"
    os.makedirs(img_dir)
    lines = []
    idx = 0
    for ident in range(1, n_private_ids + 1):   # exactly num_same_id each
        for _ in range(num_same_id):
            name = f"{idx:06d}.jpg"
            arr = rng.integers(0, 255, (218, 178, 3), dtype=np.uint8)
            PIL.Image.fromarray(arr).save(img_dir / name)
            lines.append(f"{ident} {name}")
            idx += 1
    for j in range(n_public):                    # 1 image each (< num_same)
        name = f"{idx:06d}.jpg"
        arr = rng.integers(0, 255, (218, 178, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(img_dir / name)
        lines.append(f"{1000 + j} {name}")
        idx += 1
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(lines) + "\n")
    return str(img_dir), str(ann)


def test_z_split_tool(tmp_path, rng):
    img_dir, ann = make_fake_celeba(tmp_path, rng)
    cfg = SplitConfig(num_images=30, identity_annotations=ann,
                      input_dir=img_dir,
                      output_dir0=str(tmp_path / "train"),
                      output_dir1=str(tmp_path / "pos"),
                      output_dir2=str(tmp_path / "neg"),
                      num_same_id=4)
    counts = run_split(cfg)
    assert counts == {"members": 10, "non_members": 8}

    train = [f for f in os.listdir(tmp_path / "train")
             if f.endswith(".png")]
    pos = [f for f in os.listdir(tmp_path / "pos") if f.endswith(".png")]
    neg = [f for f in os.listdir(tmp_path / "neg") if f.endswith(".png")]
    assert len(train) == 30  # 10 members x (orig + a1 + a2)
    assert len(pos) == 10 and len(neg) == 8
    assert sum(1 for f in train if f.endswith("_a1.png")) == 10
    assert sum(1 for f in train if f.endswith("_a2.png")) == 10

    # crops are 128x128; member PNGs equal the center crop of the source
    arr = np.asarray(PIL.Image.open(tmp_path / "pos" / pos[0]))
    assert arr.shape == (128, 128, 3)
    src_name = pos[0].replace(".png", ".jpg")
    src = np.asarray(PIL.Image.open(os.path.join(img_dir, src_name)))
    # jpg is lossy so compare against the jpg-decoded pixel values directly
    np.testing.assert_array_equal(arr, src[121 - 64:121 + 64,
                                           89 - 64:89 + 64])

    # packed arrays exist
    assert os.path.exists(tmp_path / "train" / "_packed_train.npy")
    packed = np.load(tmp_path / "pos" / "_packed_pos.npy")
    assert packed.shape == (10, 128, 128, 3)


def test_z_split_rejects_bad_num_images(tmp_path, rng):
    img_dir, ann = make_fake_celeba(tmp_path, rng)
    cfg = SplitConfig(num_images=31, identity_annotations=ann,
                      input_dir=img_dir,
                      output_dir0=str(tmp_path / "t"),
                      output_dir1=str(tmp_path / "p"),
                      output_dir2=str(tmp_path / "n"), num_same_id=4)
    with pytest.raises(AssertionError):
        run_split(cfg)


def test_fid_activations_on_mesh_match_single_device(rng):
    """Mesh-sharded Inception featurize (one tower per chip) equals the
    single-device path."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from ganleaks_tpu.ops.fid import get_activations, init_inception_params

    params = init_inception_params(0)
    imgs = rng.uniform(0, 255, (16, 32, 32, 3)).astype(np.float32)
    a0 = get_activations(params, imgs, batch_size=8)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    a1 = get_activations(params, imgs, batch_size=8, mesh=mesh)
    assert a0.shape == a1.shape == (16, 2048)
    np.testing.assert_allclose(a0, a1, rtol=2e-4, atol=2e-5)


def test_fid_mesh_handles_indivisible_batches(rng):
    """batch_size (reference default 50) need not divide the mesh size:
    rows pad to a mesh multiple per batch and the output slices back."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from ganleaks_tpu.ops.fid import get_activations, init_inception_params

    params = init_inception_params(0)
    imgs = rng.uniform(0, 255, (13, 32, 32, 3)).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    a0 = get_activations(params, imgs, batch_size=6, drop_remainder=False)
    a1 = get_activations(params, imgs, batch_size=6, drop_remainder=False,
                         mesh=mesh)
    assert a1.shape == (13, 2048)
    np.testing.assert_allclose(a0, a1, rtol=2e-4, atol=2e-5)


def test_z_split_rejects_filename_first_annotations(tmp_path, rng):
    """The standard identity_CelebA.txt is '<filename> <identity>' —
    the opposite of the reference's expected order. Feeding it must
    fail loudly, not produce an empty member pool / garbage split."""
    img_dir, ann = make_fake_celeba(tmp_path, rng)
    swapped = tmp_path / "swapped.txt"
    swapped.write_text("\n".join(
        " ".join(reversed(line.split()))
        for line in open(ann).read().splitlines()) + "\n")
    cfg = SplitConfig(num_images=30, identity_annotations=str(swapped),
                      input_dir=img_dir,
                      output_dir0=str(tmp_path / "t"),
                      output_dir1=str(tmp_path / "p"),
                      output_dir2=str(tmp_path / "n"), num_same_id=4)
    with pytest.raises(ValueError, match="looks like a filename"):
        run_split(cfg)
    # and an id-first file where nothing hits num_same_id fails loudly too
    cfg2 = SplitConfig(num_images=30, identity_annotations=ann,
                       input_dir=img_dir,
                       output_dir0=str(tmp_path / "t2"),
                       output_dir1=str(tmp_path / "p2"),
                       output_dir2=str(tmp_path / "n2"), num_same_id=7)
    with pytest.raises(ValueError, match="empty member pool"):
        run_split(cfg2)


def test_z_split_packed_rows_match_sorted_pngs(tmp_path, rng):
    """Packed array row i must equal sorted-glob PNG i (the order every
    consumer reads the directory in)."""
    from ganleaks_tpu.io.images import get_filepaths_from_dir

    img_dir, ann = make_fake_celeba(tmp_path, rng)
    cfg = SplitConfig(num_images=30, identity_annotations=ann,
                      input_dir=img_dir,
                      output_dir0=str(tmp_path / "train"),
                      output_dir1=str(tmp_path / "pos"),
                      output_dir2=str(tmp_path / "neg"), num_same_id=4)
    run_split(cfg)
    packed = np.load(tmp_path / "train" / "_packed_train.npy")
    paths = get_filepaths_from_dir(str(tmp_path / "train"), "png")
    assert len(paths) == len(packed) == 30
    for i in (0, 7, 29):
        np.testing.assert_array_equal(
            packed[i], np.asarray(PIL.Image.open(paths[i])))
