"""Attack distance functions as squared-Euclidean embeddings.

The reference's ``Loss`` (``attack_models/utils.py:153-177``) computes, per
query/candidate pair,

    d(x, y) = mean_{CHW}((y - x)^2) + 0.2 * LPIPS(x, y)        ('l2-lpips')
    d(x, y) = mean_{CHW}((y - x)^2)                            ('l2')

and evaluates it once for EVERY (query, synthetic) pair — two full VGG
towers per pair inside the O(N_q * N_s) loop nest of ``fbb.py:73-88``.

Both terms are quadratic forms, so each image can be *featurized once* into
a vector phi with

    d(x, y) = || phi(x) - phi(y) ||^2

* pixel term: phi_pix(x) = flatten(x) / sqrt(D), D = C*H*W;
* LPIPS term: for layer l with unit-normalized features f_l (the
  ``normalize_tensor`` of ``util/util.py:70-73``) and non-negative lin-head
  weights w_l (``networks_basic.py:170-174``),
  phi_l(x) = flatten(f_l(x) * sqrt(0.2 * w_l / (H_l * W_l))).

The full distance matrix is then one MXU matmul (see ``ops/knn.py``): the
attack drops from O(N_q * N_s) network forwards to O(N_q + N_s).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.utils.env import env_flag

Array = jax.Array

# f32(f64(2*(x/255) - 1)) for every byte value: the exact value the host
# readers produce (read_image computes in float64, utils.py:82, then
# load_image_dir casts to f32). No compiled f32 arithmetic reproduces
# these bits: naive x/127.5-1 loses up to 127 ULPs to cancellation near
# x=127, and even the well-conditioned (2x-255)/255 gets its division
# rewritten to a reciprocal-multiply by XLA's algebraic simplifier UNDER
# JIT (measured: 126/256 bytes off by 1 ULP, on CPU and TPU alike) —
# hence a table for exactness, arithmetic for speed.
_U8_UNIT_TABLE = (2.0 * (np.arange(256, dtype=np.float64) / 255.0)
                  - 1.0).astype(np.float32)

_U8_STRICT_ENV = "GANLEAKS_U8_LUT"


def images_unit_range(x: Array) -> Array:
    """uint8 [0, 255] image storage -> the [-1, 1] float32 the host
    readers produce. Floats pass through unchanged.

    Why uint8 residency exists: PNG pixels are natively 8-bit, so
    holding the device-resident query/synthetic sets as uint8 preserves
    them (exactly, or to 1 ULP — below) at 1/4 the f32 HBM footprint
    and 1/4 the host->device transfer. At the 100k x 20k north-star
    config the f32 image sets alone are 5.9 GB — which cannot coexist
    with the 8 GB query-embedding cache on a 16 GB chip — while the
    uint8 sets are 1.5 GB, making the real-data attack fit at full
    cache (fewer synthetic featurize sweeps; cache bytes set the sweep
    count, ``ops/knn._stream_search``). The conversion runs inside the
    fused featurize jits, so no full-size f32 copy of the image sets
    ever materializes in HBM; block featurize speed measures at parity
    with f32 images (41.5 vs 42.0 ms per 2048-image bf16 block on
    v5e).

    Exactness is backend-split:

    * **CPU** (where every golden/parity suite runs, and where gathers
      are cheap): the 256-entry LUT — bit-identical to the host f64
      pipeline by construction.
    * **TPU** (where a small-table gather is a slow scalar path:
      311 vs 41 ms per 2048-image block measured): ``(2x - 255)/255``
      — exact integer numerator, one division. XLA lowers the divide
      to a reciprocal-multiply, off by 1 ULP of the pixel value for
      126/256 bytes (~6e-8 absolute) — five orders below the bf16
      tower wobble (~4e-3) and below the TPU f32 matmul's own bf16
      cross-term error (DIVERGENCES.md), so every engine's error model
      absorbs it unchanged. ``GANLEAKS_U8_LUT=1`` forces the bit-exact
      LUT on TPU too (strict-parity runs; pay the gather).
    """
    if x.dtype != jnp.uint8:
        return x
    strict = env_flag(_U8_STRICT_ENV)
    if strict or _dequant_platform() != "tpu":
        return jnp.take(jnp.asarray(_U8_UNIT_TABLE), x, axis=0)
    return (2.0 * x.astype(jnp.float32) - 255.0) / 255.0


def _dequant_platform() -> str:
    """Platform the dequant will most plausibly execute on, readable at
    TRACE time (inside jit the operand is an abstract tracer with no
    device): an active ``jax.default_device(...)`` scope wins — so
    CPU-placed cross-checks inside a TPU-default process still get the
    bit-exact LUT — else the process default backend."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev))
    return jax.default_backend()


def quantize_int8(x: Array, bound: float) -> Array:
    """Round-to-nearest int8 quantization at a static rigorous scale —
    THE quantization rule of the 'taps-int8' engine, shared by every
    producer (XLA fold ``ops/knn._fused_parts_norms_q``, the Pallas
    epilogue kernel, and the inline fallbacks) because the two-pass
    certificate's absolute-error bound (``ops/knn._quant_abs_err``) is
    derived from exactly this expression. |x| <= bound by construction;
    the clip only guards float round-off at the boundary."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / bound)),
                    -127, 127).astype(jnp.int8)


def pixel_embedding(x: Array) -> Array:
    """phi for the mean-square pixel distance (``utils.py:163``).

    x: (N, H, W, C) in [-1, 1]  ->  (N, H*W*C).
    mean((y-x)^2 over CHW) == ||phi(x)-phi(y)||^2 with phi = flat(x)/sqrt(D).
    (Flatten order is irrelevant — both sides use the same one.)
    """
    n = x.shape[0]
    flat = x.reshape(n, -1)
    d = flat.shape[1]
    return flat * (1.0 / jnp.sqrt(jnp.asarray(d, flat.dtype)))


def l2_pair(x_hat: Array, x_gt: Array) -> Array:
    """Reference ``loss_l2_fn`` verbatim: mean over CHW of (y - x)^2 for a
    batch against a single broadcast query (``utils.py:163``)."""
    diff = x_gt - x_hat
    return jnp.mean(jnp.square(diff), axis=tuple(range(1, diff.ndim)))


def make_embed_fn(distance: str, lpips_embed: Callable | None = None,
                  dtype=jnp.float32) -> Callable[[Array], Array]:
    """Featurizer for the configured distance.

    distance='l2'        -> pixel embedding only.
    distance='l2-lpips'  -> concat(pixel embedding, LPIPS embedding); the
                            0.2 weight (``utils.py:176``) is folded into the
                            LPIPS embedding scale by the lpips module.
    """
    if distance == "l2":
        def embed_l2(x: Array) -> Array:
            return pixel_embedding(images_unit_range(x)).astype(dtype)
        return embed_l2
    if distance == "l2-lpips":
        if lpips_embed is None:
            raise ValueError("l2-lpips requires an LPIPS embed function")

        def embed(x: Array) -> Array:
            x = images_unit_range(x)
            return jnp.concatenate(
                [pixel_embedding(x).astype(dtype),
                 lpips_embed(x).astype(dtype)], axis=1)
        return embed
    raise ValueError(f"unknown distance {distance!r}")


def make_embed_parts_fn(distance: str, lpips_parts: Callable | None = None,
                        dtype=jnp.float32
                        ) -> Callable[[Array], list[Array]]:
    """Structured variant of :func:`make_embed_fn`: the featurizer returns
    a LIST of parts with ``d(x, y) = sum_l ||part_l(x) - part_l(y)||^2``.

    Part 0 is the flat pixel embedding; LPIPS taps keep their tower-native
    (N, H_l*W_l, C_l) layout so no flat relayout/concat is paid (see
    ``ops/lpips.lpips_embed_parts``). Consumed by the 'taps' kNN engine.

    The returned closure carries ``part_bound_fn(sample_shape) ->
    [max|phi_l|]`` — rigorous per-part elementwise magnitude bounds
    (images in [-1, 1] give ``|phi_pix| <= 1/sqrt(D)``) used as static
    scales by the int8 quantized engine (``ops/knn`` ``quantize=True``).
    """
    def pix_bound(sample_shape):
        d = 1
        for dim in sample_shape:
            d *= dim
        return 1.0 / float(d) ** 0.5

    def pix_dot_bound(sample_shape):
        d = 1
        for dim in sample_shape:
            d *= dim
        # every pixel element can saturate to +-127(+rounding)
        return float(d) * 127.5 ** 2

    if distance == "l2":
        def embed(x: Array) -> list[Array]:
            return [pixel_embedding(images_unit_range(x)).astype(dtype)]
        embed.part_bound_fn = lambda shape: [pix_bound(shape)]
        embed.part_int_dot_bound_fn = lambda shape: [pix_dot_bound(shape)]
        return embed
    if distance == "l2-lpips":
        if lpips_parts is None:
            raise ValueError("l2-lpips requires an LPIPS parts function")

        def embed(x: Array) -> list[Array]:
            x = images_unit_range(x)
            return [pixel_embedding(x).astype(dtype)] + lpips_parts(x)
        if hasattr(lpips_parts, "part_bound_fn"):
            embed.part_bound_fn = lambda shape: (
                [pix_bound(shape)] + lpips_parts.part_bound_fn(shape))
        if hasattr(lpips_parts, "part_int_dot_bound_fn"):
            embed.part_int_dot_bound_fn = lambda shape: (
                [pix_dot_bound(shape)]
                + lpips_parts.part_int_dot_bound_fn(shape))
        if hasattr(lpips_parts, "make_fast_parts_norms"):
            def make_fast(cdtype, bounds=None):
                """Fused featurize+norms with the Pallas tap epilogue
                (consumed by ``ops/knn._fused_parts_norms(_q)``): the
                pixel part keeps its cheap XLA math, the LPIPS taps run
                the single-pass kernel. Norm/cast/quantization order is
                identical to the XLA path (embed-dtype rounding first),
                so a mid-search fallback cannot change results."""
                lp_fast = lpips_parts.make_fast_parts_norms(
                    cdtype, None if bounds is None else tuple(bounds[1:]))
                if lp_fast is None:
                    return None
                pix_qb = None if bounds is None else bounds[0]

                def fused(blk):
                    x = images_unit_range(blk)
                    pix = pixel_embedding(x).astype(dtype)
                    rpix = jnp.sum(
                        jnp.square(pix.astype(jnp.float32)), axis=1)
                    pix_out = quantize_int8(pix, pix_qb) \
                        if pix_qb is not None else pix.astype(cdtype)
                    parts, rlp = lp_fast(x)
                    return [pix_out] + parts, rpix + rlp
                return fused
            embed.make_fast_parts_norms = make_fast
        return embed
    raise ValueError(f"unknown distance {distance!r}")


def rows_embedding(x: Array) -> Array:
    """Tabular rows (medGAN path): treat (N, D) records directly as
    embeddings of the *sum*-of-squares distance; divide by sqrt(D) for the
    mean-square convention used on images."""
    if x.ndim != 2:
        x = x.reshape(x.shape[0], -1)
    return x * (1.0 / jnp.sqrt(jnp.asarray(x.shape[1], x.dtype)))
