"""LPIPS (net-lin) perceptual distance, JAX-native.

Faithful port of the inference path of the vendored PerceptualSimilarity
code (``attack_models/lpips_pytorch``):

* inputs in [-1, 1], shifted/scaled per channel by the v0.1 constants
  (``networks_basic.py:115-116,135-136``);
* backbone taps unit-normalized per pixel over channels with eps OUTSIDE
  the sqrt (``util/util.py:70-73``);
* squared differences 1x1-convolved by the non-negative lin-head weights,
  spatially averaged, summed over the 5 layers
  (``networks_basic.py:158-181``).

Two evaluation modes:

* :func:`lpips_pair` — the pairwise form used for parity tests against the
  reference (identical math, <=1e-5);
* :func:`lpips_embed` — the factorized form: since every term is a
  quadratic in the normalized features and the lin weights are >= 0,
  ``LPIPS(x,y) = ||phi(x) - phi(y)||^2`` with
  ``phi_l = f_l * sqrt(w_l / (H_l * W_l))`` — this is what makes the whole
  fbb attack one matmul (see ``ops/knn.py``).

The attack's 0.2 LPIPS coefficient (``attack_models/utils.py:176``) is
folded into the embedding via ``weight=0.2``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.ops.lpips.backbones import (
    backbone_channels,
    backbone_features,
    init_backbone_params,
)

Array = jax.Array

# v0.1 input normalization constants (networks_basic.py:115-116)
LPIPS_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
LPIPS_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)

_EPS_NORM = 1e-10  # util.normalize_tensor eps (util/util.py:70)


def normalize_tensor(feat: Array, eps: float = _EPS_NORM) -> Array:
    """f / (||f||_c + eps): channel-unit vectors per pixel
    (``util/util.py:70-73``; channels last here)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / (norm + eps)


def _scale_input(x: Array) -> Array:
    """(x - shift) / scale (``networks_basic.py:135-136``). uint8 image
    storage is converted to the exact [-1, 1] f32 the host readers
    produce first (``ops/distance.images_unit_range``), so every LPIPS
    surface tolerates uint8-resident inputs."""
    from ganleaks_tpu.ops.distance import images_unit_range

    x = images_unit_range(x)
    return (x - LPIPS_SHIFT.astype(x.dtype)) / LPIPS_SCALE.astype(x.dtype)


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_lpips_params(seed: int = 0, net: str = "vgg",
                      lin_weights: list[np.ndarray] | None = None) -> dict:
    """Surrogate-backbone LPIPS params (deterministic from seed). If the
    real lin-head weights are available (they ship with the reference as a
    7 KB file) pass them via ``lin_weights``; otherwise uniform heads."""
    key = jax.random.key(seed)
    convs = init_backbone_params(key, net)
    chns = backbone_channels(net)
    if lin_weights is None:
        lins = [jnp.full((c,), 1.0 / c, jnp.float32) for c in chns]
    else:
        lins = [jnp.asarray(w, jnp.float32).reshape(-1) for w in lin_weights]
    return {"net": net, "convs": convs, "lins": lins}


def save_lpips_params(path: str, params: dict) -> None:
    flat = {"net": np.asarray(params["net"])}
    for i, c in enumerate(params["convs"]):
        flat[f"conv{i}/kernel"] = np.asarray(c["kernel"])
        flat[f"conv{i}/bias"] = np.asarray(c["bias"])
    for i, l in enumerate(params["lins"]):
        flat[f"lin{i}"] = np.asarray(l)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_lpips_params(path: str) -> dict:
    z = np.load(path)
    net = str(z["net"])
    convs = []
    i = 0
    while f"conv{i}/kernel" in z.files:
        convs.append({"kernel": jnp.asarray(z[f"conv{i}/kernel"]),
                      "bias": jnp.asarray(z[f"conv{i}/bias"])})
        i += 1
    lins = []
    i = 0
    while f"lin{i}" in z.files:
        lins.append(jnp.asarray(z[f"lin{i}"]))
        i += 1
    return {"net": net, "convs": convs, "lins": lins}


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def _features(params: dict, x: Array,
              compute_dtype=None) -> list[Array]:
    """Backbone taps; ``compute_dtype=bfloat16`` runs the conv tower at MXU
    bf16 rate (features are unit-normalized right after, so the relative
    error stays at bf16 epsilon ~ 4e-3 — fine for attack throughput runs;
    parity runs keep f32)."""
    xs = _scale_input(x)
    if compute_dtype is not None:
        xs = xs.astype(compute_dtype)
    return backbone_features(params["convs"], xs, params["net"])


def lpips_pair(params: dict, x: Array, y: Array) -> Array:
    """LPIPS(x, y) for batches (broadcast on the leading axis), the faithful
    per-layer computation of ``networks_basic.py:134-181``. Inputs NHWC in
    [-1, 1]."""
    if x.shape[0] != y.shape[0]:
        n = max(x.shape[0], y.shape[0])
        x = jnp.broadcast_to(x, (n,) + x.shape[1:])
        y = jnp.broadcast_to(y, (n,) + y.shape[1:])
    fx = _features(params, x)
    fy = _features(params, y)
    val = 0.0
    for fl_x, fl_y, w in zip(fx, fy, params["lins"]):
        diff = jnp.square(normalize_tensor(fl_x) - normalize_tensor(fl_y))
        lin = jnp.sum(diff * w.astype(diff.dtype), axis=-1)  # 1x1 conv, no bias
        val = val + jnp.mean(lin, axis=(1, 2))               # spatial mean
    return val


def pnet_pair(params: dict, x: Array, y: Array) -> Array:
    """Uncalibrated 'net' distance (``networks_basic.PNet``,
    ``networks_basic.py:21-73``): sum over layers of
    ``1 - mean_{h,w} cos_sim(f_x, f_y)`` — the DistModel ``model='net'``
    factory branch (``dist_model.py:77-79``)."""
    if x.shape[0] != y.shape[0]:
        n = max(x.shape[0], y.shape[0])
        x = jnp.broadcast_to(x, (n,) + x.shape[1:])
        y = jnp.broadcast_to(y, (n,) + y.shape[1:])
    fx = _features(params, x)
    fy = _features(params, y)
    val = 0.0
    for fl_x, fl_y in zip(fx, fy):
        cos = jnp.sum(normalize_tensor(fl_x) * normalize_tensor(fl_y),
                      axis=-1)                       # util.cos_sim
        val = val + (1.0 - jnp.mean(cos, axis=(1, 2)))
    return val


def lpips_embed(params: dict, x: Array, weight: float = 1.0,
                dtype=jnp.float32, compute_dtype=None) -> Array:
    """phi(x): concatenated scaled normalized features, so that
    ``weight * LPIPS(x, y) == ||phi(x) - phi(y)||^2`` exactly (lin weights
    are >= 0 for the shipped v0.1 heads; negatives are clamped and would be
    reported by the converter)."""
    feats = _features(params, x, compute_dtype)
    parts = []
    for fl, w in zip(feats, params["lins"]):
        n, h, wd, _c = fl.shape
        scale = jnp.sqrt(jnp.maximum(w, 0.0) * (weight / (h * wd)))
        # normalization in f32 regardless of tower dtype
        phi = normalize_tensor(fl.astype(jnp.float32)) * scale
        parts.append(phi.reshape(n, -1).astype(dtype))
    return jnp.concatenate(parts, axis=1)


def lpips_embed_fn(params: dict, weight: float = 0.2, dtype=jnp.float32,
                   compute_dtype=None):
    """Closure for ``ops/distance.make_embed_fn`` ('l2-lpips' distance,
    ``attack_models/utils.py:166-176``)."""
    def embed(x: Array) -> Array:
        return lpips_embed(params, x, weight=weight, dtype=dtype,
                           compute_dtype=compute_dtype)
    return embed


def lpips_embed_parts(params: dict, x: Array, weight: float = 1.0,
                      dtype=jnp.float32, compute_dtype=None) -> list[Array]:
    """Tap-structured phi: list of (N, H_l*W_l, C_l) arrays such that the
    sum of per-part squared distances equals :func:`lpips_embed`'s flat
    ``||phi(x)-phi(y)||^2`` — same values, different memory layout.

    Keeping each tap in its tower-native (spatial, channel) layout skips
    the flat relayout (the ``reshape(n, -1)`` + concat into one (N, 500k)
    matrix), which measures at ~27% of featurize wall time at 64x64 bf16
    on v5e — while a ``dot_general`` contracting (HW, C) runs at the same
    MXU rate as the flat matmul (204 TF/s measured either way). Consumed
    by the 'taps' kNN engine (``ops/knn.knn_argmin_streamed_parts``)."""
    feats = _features(params, x, compute_dtype)
    parts = []
    for fl, w in zip(feats, params["lins"]):
        n, h, wd, c = fl.shape
        scale = jnp.sqrt(jnp.maximum(w, 0.0) * (weight / (h * wd)))
        phi = normalize_tensor(fl.astype(jnp.float32)) * scale
        # pack narrow-channel taps to full 128-element lanes (same linear
        # order, so the flat-equivalence invariant holds): a (HW, 64) tap
        # would store lane-padded to (HW, 128) physically — 2x the HBM
        # bytes in the query cache and every distance-fold read
        cols = c
        rows = h * wd
        while cols < 128 and rows % 2 == 0:
            cols *= 2
            rows //= 2
        parts.append(phi.astype(dtype).reshape(n, rows, cols))
    return parts


def lpips_part_bounds(params: dict, sample_shape: tuple,
                      weight: float = 0.2) -> list[float]:
    """Per-part elementwise bound max|phi_l| for the parts embedding at a
    given input ``sample_shape`` (H, W, C): every component of a
    unit-normalized feature vector is <= 1, so
    ``|phi_l| <= max_c sqrt(w_lc * weight / (H_l * W_l))``. Rigorous —
    used as the static quantization scale of the int8 kNN engine
    (``ops/knn`` ``quantize=True``)."""
    feats = jax.eval_shape(
        lambda x: _features(params, x),
        jax.ShapeDtypeStruct((1,) + tuple(sample_shape), jnp.float32))
    bounds = []
    for fl, w in zip(feats, params["lins"]):
        _n, h, wd, _c = fl.shape
        wmax = float(np.max(np.maximum(np.asarray(w), 0.0)))
        bounds.append(float(np.sqrt(wmax * weight / (h * wd))))
    return bounds


def lpips_part_int_dot_bounds(params: dict,
                              sample_shape: tuple) -> list[float]:
    """Per-part bound on |int8 cross dot|: per pixel the channel vector is
    unit-normalized, so its int8 image has L2 <= 127 + 0.5*sqrt(C)
    (rounding), and Cauchy-Schwarz gives |dot per pixel| <= that squared;
    summed over H_l*W_l pixels. Feeds the int32-accumulator safety check
    of the quantized engine (``ops/knn._part_bounds_for``)."""
    feats = jax.eval_shape(
        lambda x: _features(params, x),
        jax.ShapeDtypeStruct((1,) + tuple(sample_shape), jnp.float32))
    out = []
    for fl in feats:
        _n, h, wd, c = fl.shape
        out.append(float(h * wd) * (127.0 + 0.5 * float(c) ** 0.5) ** 2)
    return out


def lpips_embed_parts_fn(params: dict, weight: float = 0.2,
                         dtype=jnp.float32, compute_dtype=None):
    """Closure form of :func:`lpips_embed_parts` for
    ``ops/distance.make_embed_parts_fn``. Carries ``part_bound_fn`` (per-
    part elementwise magnitude bounds) and ``part_int_dot_bound_fn`` (int8
    accumulator safety) for the quantized engine."""
    def embed(x: Array) -> list[Array]:
        return lpips_embed_parts(params, x, weight=weight, dtype=dtype,
                                 compute_dtype=compute_dtype)
    embed.part_bound_fn = lambda sample_shape: lpips_part_bounds(
        params, sample_shape, weight)
    embed.part_int_dot_bound_fn = lambda sample_shape:         lpips_part_int_dot_bounds(params, sample_shape)
    return embed


def reference_lin_weights(net: str = "vgg") -> list[np.ndarray]:
    """The real v0.1 linear-head weights, converted once from the 7 KB
    ``pretrained_models/v0.1/vgg.pth`` artifact the reference ships
    (``dist_model.py:69-75``) and bundled here as npz."""
    path = os.path.join(os.path.dirname(__file__), "weights",
                        f"{net}_lin.npz")
    z = np.load(path)
    return [z[f"lin{i}"] for i in range(len(z.files))]


def default_lpips_params(net: str = "vgg", seed: int = 0) -> dict:
    """Best available LPIPS params without external files: real lin heads
    (bundled) + surrogate backbone. Pass a converted npz through
    ``load_lpips_params`` for the pretrained backbone instead."""
    try:
        lins = reference_lin_weights(net)
    except FileNotFoundError:
        lins = None
    return init_lpips_params(seed, net, lin_weights=lins)


class PerceptualLoss:
    """Facade mirroring the reference API
    (``lpips_pytorch/__init__.py:9-32``): ``forward(pred, target,
    normalize)`` where ``normalize=True`` means inputs are in [0, 1] and get
    mapped to [-1, 1] first."""

    def __init__(self, net: str = "vgg", weights: str | None = None,
                 seed: int = 0):
        self.params = (load_lpips_params(weights) if weights
                       else default_lpips_params(net, seed))

    def forward(self, pred, target, normalize: bool = False):
        if normalize:
            pred = 2 * pred - 1
            target = 2 * target - 1
        return lpips_pair(self.params, target, pred)

    __call__ = forward


def embed_dim(params: dict, resolution: int) -> int:
    """Total embedding width at a given input resolution (for planning)."""
    x = jnp.zeros((1, resolution, resolution, 3))
    return int(lpips_embed(params, x).shape[1])
