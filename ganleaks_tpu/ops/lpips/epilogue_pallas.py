"""Single-pass Pallas epilogue for the LPIPS featurize stage.

After the conv tower, each tap goes through: f32 upcast -> per-position
channel-unit normalization (``normalize_tensor``) -> lin-weight scale ->
embed-dtype cast (-> optional int8 quantization) -> 128-lane packing,
plus an f32 row-norm reduction over the rounded values (the ``rq``/``rs``
of the distance fold). XLA schedules this as two full read passes over
the taps (one producing the channel norms, one consuming them) plus the
relayout — measured 10.5 ms standalone / 14.7 ms fused for a 2048-image
block on v5e whose read+write bandwidth bound is ~5 ms. This kernel does
the whole epilogue in ONE read and ONE write per element: the channel
reduction, divide, scale, cast/quantize, lane-packing, and the row-norm
accumulation all happen in VMEM.

Semantics are bit-faithful to the XLA path by construction (same op
order: ``x / (sqrt(sum x^2) + eps) * scale``, cast to the embed dtype,
norms and quantization computed FROM the rounded values), and the narrow-
tap lane packing is the same halves permutation
(``ops/lpips/lpips._pack_lanes``) — so the XLA path remains a drop-in
fallback mid-search (``ops/knn._fused_parts_norms``).

STATUS (2026-08-18 chip measurement): value-correct at every block size
(validated N=256 and N=2048, `tools/validate_epilogue.py`) but SLOWER
than the XLA composition it replaces — 25.2 ms vs 10.5-14.7 ms summed
over the 64x64 taps at N=2048, ~10% slower end-to-end on bench. The one-
read-one-write bandwidth argument loses to two VPU realities: the C=64
tap computes on half-empty (64 of 128) lanes with a cross-lane channel
reduction, and the small taps pay ~2 us per grid step at one image per
step. The kernel is therefore OPT-IN (``GANLEAKS_PALLAS_EPILOGUE=1`` on
TPU; ``GANLEAKS_PALLAS_EPILOGUE_INTERPRET=1`` forces the interpret-mode
path for CPU tests; ``GANLEAKS_NO_PALLAS_EPILOGUE=1`` kills it outright)
and the XLA epilogue is the production default. Kept because the
dispatch/fallback machinery it exercises (``ops/knn._fast_slow_dispatch``
+ driver retry) is the template for future kernels, and the validation
tooling pins its correctness. No reference counterpart: the reference
computes LPIPS per image pair with no featurize stage at all
(``fbb.py:73-88``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ganleaks_tpu.utils.env import env_flag

Array = jax.Array

_EPS_NORM = 1e-10  # must match lpips.normalize_tensor


def _quant(b: Array, bound: float) -> Array:
    """THE engine quantization rule (``ops/distance.quantize_int8``)."""
    from ganleaks_tpu.ops.distance import quantize_int8
    return quantize_int8(b, bound)


def _epilogue_math(x: Array, scale: Array, embed_dtype, out_dtype,
                   quant_bound: float | None) -> tuple[Array, Array]:
    """Shared in-kernel math on one (rows, C) tile of RAW tap values.
    Returns (rounded-and-packed tile, f32 sum of squared rounded values).
    ``scale`` broadcasts over rows (shape (1, C) or (C,))."""
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    phi = x / (norm + _EPS_NORM) * scale
    b = phi.astype(embed_dtype)
    rn = jnp.sum(jnp.square(b.astype(jnp.float32)))
    out = _quant(b, quant_bound) if quant_bound is not None \
        else b.astype(out_dtype)
    return out, rn


def _kern_wide(x_ref, scale_ref, out_ref, rn_ref, *, embed_dtype,
               out_dtype, quant_bound):
    """C >= 128 taps: no packing. Grid (N, P/bp); rn accumulates over the
    sequential P-tile dimension into a lane-broadcast (1, 128) VMEM block
    that stays resident across the inner grid dimension (all 128 lanes
    carry the same per-image scalar; an SMEM (N, 1) array pads each row
    to a 512-byte lane group — 1 MB at N=2048, over the SMEM budget)."""
    p_i = pl.program_id(1)
    out, rn = _epilogue_math(x_ref[0], scale_ref[0], embed_dtype,
                             out_dtype, quant_bound)
    out_ref[0] = out

    @pl.when(p_i == 0)
    def _():
        rn_ref[...] = jnp.zeros_like(rn_ref)
    rn_ref[...] += rn


def _kern_halves(xa_ref, xb_ref, scale_ref, out_ref, rn_ref, *,
                 embed_dtype, out_dtype, quant_bound):
    """C == 64 taps, packed to 128 lanes by the halves permutation: the
    two contiguous position halves of the tap arrive as two input refs
    into the SAME array and leave lane-concatenated."""
    p_i = pl.program_id(1)
    sc = scale_ref[0, :64]  # both halves carry the same 64-channel scale
    out_a, rn_a = _epilogue_math(xa_ref[0], sc, embed_dtype, out_dtype,
                                 quant_bound)
    out_b, rn_b = _epilogue_math(xb_ref[0], sc, embed_dtype, out_dtype,
                                 quant_bound)
    out_ref[0] = jnp.concatenate([out_a, out_b], axis=-1)

    @pl.when(p_i == 0)
    def _():
        rn_ref[...] = jnp.zeros_like(rn_ref)
    rn_ref[...] += rn_a + rn_b


def tap_epilogue(fl: Array, scale: np.ndarray, *, embed_dtype, out_dtype,
                 quant_bound: float | None = None,
                 interpret: bool = False) -> tuple[Array, Array] | None:
    """Fused epilogue for one raw tap ``fl`` of shape (N, P, C).

    Returns ``(packed_part, row_norms (N,) f32)`` or None when the tap
    shape is outside the kernel's envelope (the caller then uses the XLA
    path): C must be 64 (one halves-doubling to 128 lanes) or a multiple
    of 128, matching ``_pack_lanes``'s output for every shipped backbone
    at practical resolutions.
    """
    n, p, c = fl.shape
    if c == 64:
        if p % 2:
            return None
        p_out, cols, halves = p // 2, 128, True
    elif c % 128 == 0:
        p_out, cols, halves = p, c, False
    else:
        return None

    # P tiling keeps f32 temps in a few MB of VMEM at any resolution
    # (bp always divides p_out: it starts there and only halves evenly)
    bp = p_out
    while bp * cols * 4 * (3 if halves else 2) > (8 << 20) and bp % 2 == 0:
        bp //= 2
    n_p = p_out // bp

    sc = np.asarray(scale, np.float32).reshape(1, c)
    if halves:
        sc = np.concatenate([sc, sc], axis=1)  # (1, 128)
    kern = _kern_halves if halves else _kern_wide
    kern = partial(kern, embed_dtype=jnp.dtype(embed_dtype),
                   out_dtype=jnp.dtype(out_dtype), quant_bound=quant_bound)
    res_dtype = jnp.int8 if quant_bound is not None else jnp.dtype(out_dtype)

    if halves:
        in_specs = [
            pl.BlockSpec((1, bp, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bp, c), lambda i, j, _n=n_p: (i, _n + j, 0)),
        ]
        args = (fl, fl)
    else:
        in_specs = [pl.BlockSpec((1, bp, c), lambda i, j: (i, j, 0))]
        args = (fl,)
    in_specs.append(pl.BlockSpec((1, sc.shape[1]), lambda i, j: (0, 0)))

    out, rn = pl.pallas_call(
        kern,
        grid=(n, n_p),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bp, cols), lambda i, j: (i, j, 0)),
            # per-image scalar accumulator, broadcast over one (8, 128)
            # VMEM tile that stays resident across the inner P grid dim
            # (an SMEM (N, 1) array pads rows to 512-byte lane groups —
            # 1 MB at N=2048, over the SMEM budget; blocks narrower than
            # a full (8, 128) tile are rejected by the Mosaic lowering)
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p_out, cols), res_dtype),
            jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*args, jnp.asarray(sc))
    return out, rn[:, 0, 0]


def _env_set(name: str) -> bool:
    """'' and '0' count as unset so ``VAR=0`` means what it says
    (package-wide convention: ``utils/env.py``)."""
    return env_flag(name)


def _enabled() -> str | None:
    """'tpu' for the compiled kernel, 'interpret' for the CPU test mode,
    None when the XLA path should be used.

    OPT-IN (``GANLEAKS_PALLAS_EPILOGUE=1``) since the 2026-08-18 chip
    measurement: the kernel is value-correct at every block size but
    SLOWER than the XLA composition it replaces (25.2 ms vs 10.5-14.7 ms
    summed over the 64x64 taps at N=2048 — the C=64 tap computes on
    half-empty lanes and the small taps pay per-grid-step overhead), and
    costs ~10% end-to-end on bench (43.0M vs 47.6M pairs/s back-to-back).
    ``GANLEAKS_NO_PALLAS_EPILOGUE=1`` still wins over everything."""
    if _env_set("GANLEAKS_NO_PALLAS_EPILOGUE"):
        return None
    if _env_set("GANLEAKS_PALLAS_EPILOGUE_INTERPRET"):
        return "interpret"
    if _env_set("GANLEAKS_PALLAS_EPILOGUE"):
        return "tpu" if jax.default_backend() == "tpu" else None
    return None
