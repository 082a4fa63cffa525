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

Array = jax.Array


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
        return lambda x: pixel_embedding(x).astype(dtype)
    if distance == "l2-lpips":
        if lpips_embed is None:
            raise ValueError("l2-lpips requires an LPIPS embed function")

        def embed(x: Array) -> Array:
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
        embed = lambda x: [pixel_embedding(x).astype(dtype)]
        embed.part_bound_fn = lambda shape: [pix_bound(shape)]
        embed.part_int_dot_bound_fn = lambda shape: [pix_dot_bound(shape)]
        return embed
    if distance == "l2-lpips":
        if lpips_parts is None:
            raise ValueError("l2-lpips requires an LPIPS parts function")

        def embed(x: Array) -> list[Array]:
            return [pixel_embedding(x).astype(dtype)] + lpips_parts(x)
        if hasattr(lpips_parts, "part_bound_fn"):
            embed.part_bound_fn = lambda shape: (
                [pix_bound(shape)] + lpips_parts.part_bound_fn(shape))
        if hasattr(lpips_parts, "part_int_dot_bound_fn"):
            embed.part_int_dot_bound_fn = lambda shape: (
                [pix_dot_bound(shape)]
                + lpips_parts.part_int_dot_bound_fn(shape))
        return embed
    raise ValueError(f"unknown distance {distance!r}")


def rows_embedding(x: Array) -> Array:
    """Tabular rows (medGAN path): treat (N, D) records directly as
    embeddings of the *sum*-of-squares distance; divide by sqrt(D) for the
    mean-square convention used on images."""
    if x.ndim != 2:
        x = x.reshape(x.shape[0], -1)
    return x * (1.0 / jnp.sqrt(jnp.asarray(x.shape[1], x.dtype)))
