"""Frechet Inception Distance, device-side (reference: ``z_fid.py``).

* activations: Flax InceptionV3 pool_3 (``ops/inception.py``) in fixed-size
  batches (``z_fid.py:68-105`` uses batch 50 and DROPS the final partial
  batch for the in-memory path — replicated behind ``drop_remainder``);
* statistics: mu / covariance with np.cov semantics (rowvar=False, ddof=1);
* Frechet distance ``||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))`` with
  three sqrtm backends: Newton-Schulz iteration (device, differentiable),
  symmetrized eigh (device), scipy (host, exactly ``z_fid.py:109-160``
  including the eps-jitter retry and imaginary-part guard).
"""

from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.ops.inception import InceptionV3Pool3, preprocess

Array = jax.Array


def init_inception_params(seed: int = 0) -> dict:
    """Surrogate (seeded) InceptionV3 params; swap in converted torchvision
    weights via ``tools/convert_inception.py`` for standard-FID numbers."""
    model = InceptionV3Pool3()
    return model.init(jax.random.key(seed),
                      jnp.zeros((1, 299, 299, 3)))


_FORWARD_CACHE: dict = {}


def _forward_pool3(mesh=None):
    """Module-cached jitted Inception forward (params passed as an
    ARGUMENT so jax's own cache hits across ``get_activations`` calls —
    a per-call closure recompiled the ~300-op graph on every FID
    evaluation, twice per fid_from_* call)."""
    if mesh not in _FORWARD_CACHE:
        model = InceptionV3Pool3()
        fn = lambda params, x: model.apply(params, preprocess(x))
        if mesh is None:
            _FORWARD_CACHE[mesh] = jax.jit(fn)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            _FORWARD_CACHE[mesh] = jax.jit(
                fn, out_shardings=NamedSharding(mesh, P()))
    return _FORWARD_CACHE[mesh]


def get_activations(params: dict, images: np.ndarray, batch_size: int = 50,
                    drop_remainder: bool = True, mesh=None) -> np.ndarray:
    """pool_3 activations for [0,255]-range NHWC images
    (``z_fid.py:68-105``; its array path drops the last partial batch).

    ``mesh``: optional 1-D device mesh — each batch is sharded over its
    leading axis (one tower per chip, no cross-chip comms until the tiny
    replicated output), so featurize throughput scales linearly in chips.
    ``batch_size`` should then be a multiple of the mesh size."""
    fwd = _forward_pool3(mesh)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        n_dev = mesh.shape[axis]
        rep = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P(axis, None, None, None))
        params = jax.device_put(params, rep)

        def forward(x):
            # pad rows to a mesh multiple (any batch_size/directory size
            # works), slice the replicated output back
            rows = len(x)
            pad = (-rows) % n_dev
            if pad:
                x = np.concatenate(
                    [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            out = fwd(params, jax.device_put(jnp.asarray(x), data_sh))
            return out[:rows]
    else:
        def forward(x):
            return fwd(params, jnp.asarray(x))

    n = len(images)
    if batch_size > n:
        batch_size = n
    n_batches = n // batch_size if drop_remainder else -(-n // batch_size)
    outs = []
    for i in range(n_batches):
        batch = images[i * batch_size:(i + 1) * batch_size]
        if len(batch) < batch_size:  # pad final partial batch for one shape
            pad = batch_size - len(batch)
            padded = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:],
                                                     batch.dtype)])
            outs.append(np.asarray(forward(padded))[:len(batch)])
        else:
            outs.append(np.asarray(forward(batch)))
    return np.concatenate(outs)


def activation_statistics(acts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """mu, sigma (np.cov rowvar=False => ddof=1), ``z_fid.py:180-183``."""
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


# ---------------------------------------------------------------------------
# matrix square root backends
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iters",))
def sqrtm_newton_schulz(a: Array, iters: int = 30) -> Array:
    """Newton-Schulz iteration for the principal square root of a PSD-ish
    matrix — matmul-only, so it runs on the MXU and differentiates."""
    dim = a.shape[0]
    norm = jnp.sqrt(jnp.sum(jnp.square(a)))
    y = a / norm
    z = jnp.eye(dim, dtype=a.dtype)
    eye3 = 3.0 * jnp.eye(dim, dtype=a.dtype)

    def body(_, yz):
        y, z = yz
        t = 0.5 * (eye3 - z @ y)
        return y @ t, t @ z

    y, _ = jax.lax.fori_loop(0, iters, body, (y, z))
    return y * jnp.sqrt(norm)


def sqrtm_eigh(a: Array) -> Array:
    """Square root via eigendecomposition of the symmetrized matrix."""
    sym = (a + a.T) / 2.0
    w, v = jnp.linalg.eigh(sym)
    w = jnp.maximum(w, 0.0)
    return (v * jnp.sqrt(w)) @ v.T


def _tr_sqrt_product(sigma1: np.ndarray, sigma2: np.ndarray,
                     method: str, eps: float) -> float:
    if method == "scipy":
        from scipy import linalg

        covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
        if not np.isfinite(covmean).all():  # z_fid.py:145-149
            warnings.warn("fid produces singular product; adding %s to "
                          "diagonal of cov estimates" % eps)
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
        if np.iscomplexobj(covmean):        # z_fid.py:152-156
            if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
                m = np.max(np.abs(covmean.imag))
                raise ValueError("Imaginary component {}".format(m))
            covmean = covmean.real
        return float(np.trace(covmean))

    # device paths: Tr(sqrt(S1 S2)) = Tr(sqrt(S^1/2 S2 S^1/2)) via the
    # symmetric similarity trick so eigh/NS see a (near-)PSD argument
    s1 = jnp.asarray(sigma1, jnp.float32)
    s2 = jnp.asarray(sigma2, jnp.float32)
    offset = eps * jnp.eye(s1.shape[0], dtype=jnp.float32)
    root1 = sqrtm_eigh(s1 + offset)
    inner = root1 @ (s2 + offset) @ root1
    if method == "newton-schulz":
        root = sqrtm_newton_schulz(inner)
    elif method == "eigh":
        root = sqrtm_eigh(inner)
    else:
        raise ValueError(f"unknown sqrtm method {method!r}")
    tr = float(jnp.trace(root))
    if not np.isfinite(tr):
        # Newton-Schulz diverges on strongly rank-deficient products
        # (n_samples << 2048 features). The reference's only sqrtm is
        # scipy-with-eps-retry (z_fid.py:141-149), so every input it
        # survives must stay finite here too — fall back to that path
        # rather than return nan.
        warnings.warn(f"{method} sqrtm produced a non-finite trace; "
                      "falling back to the scipy path")
        return _tr_sqrt_product(sigma1, sigma2, "scipy", eps)
    return tr


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6,
                     method: str = "newton-schulz") -> float:
    """``calculate_frechet_distance`` (``z_fid.py:109-160``)."""
    mu1 = np.atleast_1d(np.asarray(mu1))
    mu2 = np.atleast_1d(np.asarray(mu2))
    sigma1 = np.atleast_2d(np.asarray(sigma1))
    sigma2 = np.atleast_2d(np.asarray(sigma2))
    assert mu1.shape == mu2.shape, \
        "Training and test mean vectors have different lengths"
    assert sigma1.shape == sigma2.shape, \
        "Training and test covariances have different dimensions"

    diff = mu1 - mu2
    tr_covmean = _tr_sqrt_product(sigma1, sigma2, method, eps)
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_covmean)


def fid_from_image_sets(params: dict, images1: np.ndarray,
                        images2: np.ndarray, batch_size: int = 50,
                        method: str = "newton-schulz",
                        mesh=None) -> float:
    """End-to-end FID between two [0,255] image sets
    (``calculate_fid_given_paths``, ``z_fid.py:303-317``). ``mesh``
    shards the Inception featurize batch-wise across chips."""
    m1, s1 = activation_statistics(
        get_activations(params, images1, batch_size, mesh=mesh))
    m2, s2 = activation_statistics(
        get_activations(params, images2, batch_size, mesh=mesh))
    return frechet_distance(m1, s1, m2, s2, method=method)


def fid_from_paths(params: dict, path1: str, path2: str,
                   batch_size: int = 50,
                   method: str = "newton-schulz", mesh=None) -> float:
    """Path flavor: each arg is an image dir (jpg+png), a precomputed
    ``.npz`` with mu/sigma (``z_fid.py:286-300``), or one of the
    reference's NPZ image dumps (``npz_images/``/``generated.npz`` —
    keys ``fake``/``img_r01``; the reference re-decodes the PNG dir it
    wrote from the same arrays). Image NPZs are floor-quantized to the
    PNG bytes (``io/npz.py``) so the FID matches the PNG-dir path."""
    stats = []
    for p in (path1, path2):
        precomputed = None
        if p.endswith(".npz"):
            with np.load(p) as f:
                if "mu" in f.files:
                    precomputed = (f["mu"][:], f["sigma"][:])
        if precomputed is not None:
            stats.append(precomputed)
        else:
            from ganleaks_tpu.io.npz import (load_npz_images,
                                             resolve_input_format)

            if resolve_input_format(p) == "npz":
                # native-size bytes, 0-255 float32 like the PIL branch
                imgs = load_npz_images(p, resolution=None,
                                       dtype=np.uint8).astype(np.float32)
            else:
                import pathlib

                files = (list(pathlib.Path(p).glob("*.jpg"))
                         + list(pathlib.Path(p).glob("*.png")))
                import PIL.Image

                imgs = np.array([np.asarray(PIL.Image.open(str(fn)),
                                            dtype=np.float32)
                                 for fn in files])
            stats.append(activation_statistics(
                get_activations(params, imgs, batch_size, mesh=mesh)))
    (m1, s1), (m2, s2) = stats
    return frechet_distance(m1, s1, m2, s2, method=method)
