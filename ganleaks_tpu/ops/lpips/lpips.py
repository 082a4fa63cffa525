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

from ganleaks_tpu.utils.env import env_flag
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
        parts.append(_pack_lanes(phi.astype(dtype).reshape(n, h * wd, c)))
    return parts


def _pack_mode() -> str:
    """Lane-packing permutation for narrow taps, fixed per process:

    * 'halves' whenever the Pallas epilogue kernel is enabled (opt-in,
      ``GANLEAKS_PALLAS_EPILOGUE=1``) — row p carries positions p and
      HW/2 + p; contiguous half-slices are expressible inside the kernel
      (a sublane-strided pairs gather is not), and the XLA path MUST
      match it so a mid-search kernel fallback never mixes packings
      within one cache/stream.
    * 'pairs' otherwise (the production default) — the plain
      (HW, C) -> (HW/2, 2C) reshape, which XLA relayouts
      ~14 ms/2048-block faster than the halves concat (measured v5e).

    Per-part squared distances are invariant under any fixed element
    permutation shared by both sides of the fold, so the two modes are
    interchangeable BETWEEN runs — never within one."""
    try:
        from ganleaks_tpu.ops.lpips.epilogue_pallas import _enabled
    except Exception:
        return "pairs"
    return "halves" if _enabled() else "pairs"


def _pack_lanes(x: Array, mode: str | None = None) -> Array:
    """Pack a narrow-channel (N, HW, C) tap to full 128-element lanes: a
    (HW, 64) tap would store lane-padded to (HW, 128) physically — 2x the
    HBM bytes in the query cache and every distance-fold read. Permutation
    per :func:`_pack_mode`."""
    mode = mode or _pack_mode()
    if mode == "pairs":
        n, rows, cols = x.shape
        while cols < 128 and rows % 2 == 0:
            cols *= 2
            rows //= 2
        return x.reshape(n, rows, cols)
    while x.shape[-1] < 128 and x.shape[1] % 2 == 0:
        rows = x.shape[1] // 2
        x = jnp.concatenate([x[:, :rows, :], x[:, rows:, :]], axis=-1)
    return x


def _unpack_lanes(x: Array, c: int, mode: str | None = None) -> Array:
    """Inverse of :func:`_pack_lanes`: recover the (N, HW, C) tower-native
    layout from a lane-packed part (tests/debugging; the engines never
    need it — distances are permutation-invariant)."""
    mode = mode or _pack_mode()
    if mode == "pairs":
        return x.reshape(x.shape[0], -1, c)
    while x.shape[-1] > c:
        cols = x.shape[-1] // 2
        x = jnp.concatenate([x[..., :cols], x[..., cols:]], axis=1)
    return x


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


def lpips_fast_parts_norms(params: dict, weight: float, dtype,
                           compute_dtype, cdtype, bounds=None):
    """``blk -> ([tap parts], f32 row norms)`` with the single-pass Pallas
    tap epilogue (``ops/lpips/epilogue_pallas``) replacing the XLA
    normalize/scale/cast/pack/norm chain. OPT-IN via
    ``GANLEAKS_PALLAS_EPILOGUE=1``: the chip measurement showed the
    kernel value-correct but ~10% slower end-to-end than the XLA path
    (see the kernel module docstring). Returns None when the kernel is
    gated off (the default; non-TPU backend; ``GANLEAKS_NO_PALLAS_EPILOGUE``); taps
    whose shape falls outside the kernel envelope use the XLA math inline
    (same values, same packing). ``bounds`` switches the outputs to int8
    quantization exactly as ``ops/knn._fused_parts_norms_q``."""
    # the kill-switch must work even when the kernel module cannot
    # import (pallas namespaces move across jax releases) — check the
    # env and guard the import BEFORE touching epilogue_pallas
    if env_flag("GANLEAKS_NO_PALLAS_EPILOGUE"):
        return None
    try:
        from ganleaks_tpu.ops.lpips.epilogue_pallas import (
            _enabled, tap_epilogue)
    except Exception as e:
        print(f"[lpips] pallas epilogue unavailable at import "
              f"({type(e).__name__}); using the XLA featurize path")
        return None
    mode = _enabled()
    if mode is None:
        return None
    interpret = mode == "interpret"
    from ganleaks_tpu.ops.distance import quantize_int8

    def fast(x: Array):
        feats = _features(params, x, compute_dtype)
        parts, r = [], None
        for idx, (fl, w) in enumerate(zip(feats, params["lins"])):
            n, h, wd, c = fl.shape
            # scale in f32 with the same op order as lpips_embed_parts
            sc = np.sqrt(np.maximum(np.asarray(w, np.float32), 0)
                         * np.float32(weight / (h * wd)), dtype=np.float32)
            qb = bounds[idx] if bounds is not None else None
            res = tap_epilogue(fl.reshape(n, h * wd, c), sc,
                               embed_dtype=dtype, out_dtype=cdtype,
                               quant_bound=qb, interpret=interpret)
            if res is None:  # outside the kernel envelope: XLA inline
                phi = normalize_tensor(fl.astype(jnp.float32)) \
                    * jnp.asarray(sc)
                b = _pack_lanes(phi.astype(dtype).reshape(n, h * wd, c),
                                mode="halves")  # kernel taps are halves
                rl = jnp.sum(jnp.square(b.astype(jnp.float32)),
                             axis=(1, 2))
                out = quantize_int8(b, qb) if qb is not None \
                    else b.astype(cdtype)
            else:
                out, rl = res
            parts.append(out)
            r = rl if r is None else r + rl
        return parts, r

    return fast


def lpips_embed_parts_fn(params: dict, weight: float = 0.2,
                         dtype=jnp.float32, compute_dtype=None):
    """Closure form of :func:`lpips_embed_parts` for
    ``ops/distance.make_embed_parts_fn``. Carries ``part_bound_fn`` (per-
    part elementwise magnitude bounds), ``part_int_dot_bound_fn`` (int8
    accumulator safety) for the quantized engine, and
    ``make_fast_parts_norms`` (the fused Pallas tap epilogue)."""
    def embed(x: Array) -> list[Array]:
        return lpips_embed_parts(params, x, weight=weight, dtype=dtype,
                                 compute_dtype=compute_dtype)
    embed.part_bound_fn = lambda sample_shape: lpips_part_bounds(
        params, sample_shape, weight)
    embed.part_int_dot_bound_fn = lambda sample_shape:         lpips_part_int_dot_bounds(params, sample_shape)
    embed.make_fast_parts_norms = lambda cdtype, bounds=None: \
        lpips_fast_parts_norms(params, weight, dtype, compute_dtype,
                               cdtype, bounds)
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
