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


def _load_variables(path: str) -> dict:
    """Weights from either the trainer's msgpack dicts
    (``train/vaegan.py`` netG/netE) or the converter's npz
    (``tools/convert_victim.py``)."""
    if path.endswith(".npz"):
        from ganleaks_tpu.utils.checkpoint import load_params_npz
        return load_params_npz(path)
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def run_reconstruction_attack(cfg) -> dict:
    """Full reconstruction-attack pipeline (BASELINE config #3).

    Loads pos/neg query dirs, reconstructs each query through the VAE-GAN
    encoder+generator, and writes fbb-layout artifacts
    (``pos_loss.npy``/``neg_loss.npy`` (N,1) float64, sequential-counter
    ``pos_idx``/``neg_idx`` — the reference's quirk, ``fbb.py:162,171`` —
    plus ``params.txt``/``params.pkl`` and query|reconstruction pair PNGs)
    so ``eval_roc`` consumes the run exactly like an fbb run.
    """
    import os

    import PIL.Image

    from ganleaks_tpu.io.artifacts import check_folder, dump_params, save_files
    from ganleaks_tpu.io.images import (
        load_image_dir, read_image, read_image_center_crop, to_uint8)
    from ganleaks_tpu.models.vaegan import Encoder, Generator

    save_dir = check_folder(os.path.join(os.getcwd(), cfg.save_root,
                                         cfg.exp_name))
    dump_params(save_dir, cfg)

    reader = (read_image_center_crop if cfg.reader == "center_crop"
              else read_image)
    pos = load_image_dir(cfg.pos_data_dir, cfg.resolution,
                         limit=cfg.data_num, reader=reader)
    neg = load_image_dir(cfg.neg_data_dir, cfg.resolution,
                         limit=cfg.data_num, reader=reader)

    enc = Encoder(z_dim=cfg.z_dim, d=cfg.d)
    gen = Generator(z_dim=cfg.z_dim, d=cfg.d)
    vars_e = _load_variables(cfg.netE)
    vars_g = _load_variables(cfg.netG)

    def encoder_apply(x, rng):
        return enc.apply(vars_e, x, rng, train=False)

    def generator_apply(z):
        return gen.apply(vars_g, z, train=False)

    lpips_pair_fn = None
    if cfg.distance == "l2-lpips":
        from ganleaks_tpu.ops.lpips import (
            default_lpips_params, load_lpips_params, lpips_pair)
        lp = (load_lpips_params(cfg.lpips_weights) if cfg.lpips_weights
              else default_lpips_params(cfg.lpips_net))
        lpips_pair_fn = lambda a, b: lpips_pair(lp, a, b)

    key = jax.random.key(cfg.seed)
    out = {}
    n_pos = len(pos)
    for name, queries, sub in (("pos", pos, 0), ("neg", neg, 1)):
        losses = reconstruction_scores(
            encoder_apply, generator_apply, jnp.asarray(queries),
            jax.random.fold_in(key, sub), lpips_pair_fn=lpips_pair_fn,
            batch=cfg.batch)
        # fbb artifact layout: (N, 1) float64 losses; idx = sequential
        # counters, and the NEG file reuses len(pos_loss) — the reference
        # quirk (fbb.py:171) that attack/fbb.py and attack/tabular.py
        # also replicate, so all fbb-layout writers agree byte-for-byte
        save_files(save_dir,
                   [f"{name}_loss", f"{name}_idx"],
                   [losses.astype(np.float64).reshape(-1, 1),
                    np.arange(n_pos).reshape(-1, 1)])
        if cfg.save_plots:  # query | G(E(query)) pairs, fbb.py:91-106 style
            recon = generator_apply(encoder_apply(
                jnp.asarray(queries[:20]),
                jax.random.fold_in(key, 10 + sub)))
            for i in range(min(20, len(queries))):
                pair = np.concatenate(
                    [queries[i], np.asarray(recon[i])], axis=1)
                PIL.Image.fromarray(to_uint8(pair, drange=(-1, 1))).save(
                    os.path.join(save_dir, f"{i}{name}.png"))
        out[f"{name}_loss"] = losses
    out["save_dir"] = save_dir
    return out


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
