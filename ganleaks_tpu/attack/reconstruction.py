"""Encoder-seeded reconstruction attack (VAE-GAN) and the tabular fbb path.

BASELINE.json config #3: for a victim with an encoder (VAE-GAN), the
membership score of a query x is the negated reconstruction distance
``d(x, G(E(x)))`` — the encoder gives a one-shot latent "optimization",
making this the cheap analog of the reference paper's partial-black-box
attack for encoder-equipped victims. Distances reuse the fbb metric
('l2' or 'l2-lpips').

BASELINE.json config #4: medGAN's tabular records go through the SAME kNN
engine — embeddings are just scaled rows (``ops/distance.rows_embedding``),
exercising the engine's rank-agnosticism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.ops.distance import l2_pair, rows_embedding
from ganleaks_tpu.ops.knn import knn_argmin

Array = jax.Array


def reconstruction_scores(encoder_apply, generator_apply, queries: Array,
                          key: Array, lpips_pair_fn=None,
                          lpips_weight: float = 0.2,
                          batch: int = 256) -> np.ndarray:
    """Per-query reconstruction losses d(x, G(E(x))) (smaller => member).

    encoder_apply(x, rng) -> z; generator_apply(z) -> image in [-1, 1].
    ``lpips_pair_fn(x, y)`` optionally adds the perceptual term with the
    fbb attack's 0.2 weight (``attack_models/utils.py:176``).
    """
    n = queries.shape[0]

    @jax.jit
    def one(x, k):
        z = encoder_apply(x, k)
        rec = generator_apply(z)
        d = l2_pair(rec, x)
        if lpips_pair_fn is not None:
            d = d + lpips_weight * lpips_pair_fn(rec, x)
        return d

    out = []
    for i in range(0, n, batch):
        blk = queries[i:i + batch]
        out.append(np.asarray(one(blk, jax.random.fold_in(key, i))))
    return np.concatenate(out)


def fbb_tabular(syn_rows: np.ndarray, pos_rows: np.ndarray,
                neg_rows: np.ndarray, *, engine: str = "gemm",
                s_block: int = 8192) -> dict:
    """fbb attack on (N, D) tabular records (medGAN path): 1-NN distance
    under the mean-square-feature metric."""
    emb_s = rows_embedding(jnp.asarray(syn_rows, jnp.float32))
    out = {}
    for name, rows in (("pos", pos_rows), ("neg", neg_rows)):
        emb_q = rows_embedding(jnp.asarray(rows, jnp.float32))
        d, i = knn_argmin(emb_q, emb_s, engine=engine, s_block=s_block)
        out[f"{name}_loss"] = np.asarray(d, np.float64)
        out[f"{name}_nn_idx"] = np.asarray(i)
    return out
