"""int8-quantized 'taps-int8' engine: rigorous error bounds, argmin
agreement on separated data, certified exactness through the two-pass,
the part_bound_fn contracts it relies on, and single-chip/mesh
equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganleaks_tpu.ops.distance import make_embed_fn, make_embed_parts_fn
from ganleaks_tpu.ops.knn import (
    _part_bounds_for,
    _quant_abs_err,
    knn_argmin_streamed,
    knn_argmin_streamed_parts,
    knn_argmin_two_pass,
)


def _sets(rng, n_q=9, n_s=37, hw=8):
    q = rng.uniform(-1, 1, (n_q, hw, hw, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, (n_s, hw, hw, 3)).astype(np.float32)
    return q, s


def test_part_bounds_are_elementwise_bounds(rng):
    """The static quantization scales must genuinely bound |phi|: for the
    l2 embedding on [-1,1] images and for the LPIPS parts (unit-normalized
    feature components <= 1 times the per-channel scale)."""
    from ganleaks_tpu.ops.lpips import default_lpips_params, lpips_embed_parts_fn

    q, _ = _sets(rng, hw=16)
    flat = make_embed_parts_fn("l2")
    bounds = _part_bounds_for(flat, jnp.asarray(q))
    phi = flat(jnp.asarray(q))
    assert float(jnp.max(jnp.abs(phi[0]))) <= bounds[0] * (1 + 1e-6)

    params = default_lpips_params("vgg")
    emb = make_embed_parts_fn(
        "l2-lpips", lpips_embed_parts_fn(params, weight=0.2), )
    bounds = _part_bounds_for(emb, jnp.asarray(q))
    parts = emb(jnp.asarray(q))
    assert len(bounds) == len(parts)
    for p, b in zip(parts, bounds):
        assert float(jnp.max(jnp.abs(p))) <= b * (1 + 1e-5)


def test_quantized_distance_error_within_rigorous_bound(rng):
    """|d_int8 - d_f32| <= A*(2S+A) with A = 2*E (quantization only, f32
    tower on CPU), E = _quant_abs_err — the certificate's error model,
    checked against brute force."""
    q, s = _sets(rng)
    emb = make_embed_parts_fn("l2")
    d8, i8 = knn_argmin_streamed_parts(emb, jnp.asarray(q), jnp.asarray(s),
                                       q_block=4, s_block=8, quantize=True)
    d_f, i_f = knn_argmin_streamed(make_embed_fn("l2"), jnp.asarray(q),
                                   jnp.asarray(s), q_block=4, s_block=8)
    bounds = _part_bounds_for(emb, jnp.asarray(q))
    probe = jax.eval_shape(emb, jax.ShapeDtypeStruct((1,) + q.shape[1:],
                                                     jnp.float32))
    e_abs = _quant_abs_err(tuple(bounds),
                           [tuple(p.shape[1:]) for p in probe])
    phi_q = np.asarray(make_embed_fn("l2")(jnp.asarray(q)))
    phi_s = np.asarray(make_embed_fn("l2")(jnp.asarray(s)))
    s_bound = (np.sqrt(np.sum(phi_q ** 2, axis=1))
               + np.sqrt(np.max(np.sum(phi_s ** 2, axis=1))))
    a = 2.0 * e_abs
    eps = a * (2.0 * s_bound + a)
    # the reported distance must be within eps of the exact distance to
    # whichever (possibly near-tied) row the int8 argmin picked
    exact8 = np.sum((phi_q - phi_s[np.asarray(i8)]) ** 2, axis=1)
    err8 = np.abs(np.asarray(d8) - exact8)
    assert (err8 <= eps + 1e-9).all()
    # and it can never beat the true minimum by more than eps
    exact_min = np.sum((phi_q - phi_s[np.asarray(i_f)]) ** 2, axis=1)
    assert (np.asarray(d8) >= exact_min - eps - 1e-9).all()


def test_quantized_argmin_agrees_on_separated_data(rng):
    """With distances separated by more than the quantization bound, the
    int8 argmin must equal the exact one."""
    n_s, d_feats = 24, 12
    s = np.zeros((n_s, d_feats), np.float32)
    for j in range(n_s):
        s[j, j % d_feats] = 0.3 + 0.05 * j  # all pairwise gaps >> eps
    q = s[5:9] + 0.01
    emb = make_embed_parts_fn("l2")
    d8, i8 = knn_argmin_streamed_parts(emb, jnp.asarray(q), jnp.asarray(s),
                                       q_block=4, s_block=8, quantize=True)
    d0, i0 = knn_argmin_streamed(make_embed_fn("l2"), jnp.asarray(q),
                                 jnp.asarray(s), q_block=4, s_block=8)
    np.testing.assert_array_equal(np.asarray(i8), np.asarray(i0))


def test_two_pass_int8_exact_results(rng):
    """engine='taps-int8' through the certified two-pass returns exact
    f32 indices/distances (certificate + fallback close any quantization
    miss)."""
    q, s = _sets(rng, n_q=7, n_s=29)
    emb8 = make_embed_parts_fn("l2")
    flat = make_embed_fn("l2")
    d0, i0 = knn_argmin_streamed(flat, jnp.asarray(q), jnp.asarray(s),
                                 q_block=4, s_block=8,
                                 precision="highest")
    d, i, cert, n_fb = knn_argmin_two_pass(
        emb8, flat, jnp.asarray(q), jnp.asarray(s), k=3,
        engine="taps-int8", q_block=4, s_block=8, return_cert=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d0), rtol=1e-6)


def test_attack_driver_taps_int8(rng):
    from ganleaks_tpu.attack.fbb import attack_arrays
    from ganleaks_tpu.config import AttackConfig

    syn = rng.uniform(-1, 1, (16, 16, 16, 3)).astype(np.float32)
    pos = syn[:4] + rng.normal(0, 0.01, (4, 16, 16, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    cfg = AttackConfig(distance="l2", engine="taps-int8", query_block=8,
                       syn_block=8, resolution=16)
    out = attack_arrays(cfg, syn, pos, neg)
    # members are near-copies: their 1-NN must be the source rows
    np.testing.assert_array_equal(out["pos_nn_idx"], np.arange(4))
    assert out["pos_loss"].mean() < out["neg_loss"].mean()

    # same engine on the 8-device mesh: identical results
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("syn",))
    out_m = attack_arrays(cfg, syn, pos, neg, mesh=mesh)
    np.testing.assert_array_equal(out["pos_nn_idx"], out_m["pos_nn_idx"])
    np.testing.assert_allclose(out["pos_loss"], out_m["pos_loss"],
                               rtol=1e-5)


def test_quantize_requires_part_bounds():
    def bare_embed(x):
        return [jnp.asarray(x).reshape(x.shape[0], -1)]

    q = jnp.zeros((4, 8)); s = jnp.zeros((8, 8))
    with pytest.raises(ValueError, match="part_bound_fn"):
        knn_argmin_streamed_parts(bare_embed, q, s, quantize=True)


def test_int8_refuses_when_int32_accumulator_could_wrap():
    """Pixel part at >=256x256: 127^2 * H*W*C exceeds int32 — the engine
    must refuse loudly instead of silently wrapping distances."""
    emb = make_embed_parts_fn("l2")
    q = jnp.zeros((2, 256, 256, 3))
    s = jnp.zeros((4, 256, 256, 3))
    with pytest.raises(ValueError, match="int32"):
        knn_argmin_streamed_parts(emb, q, s, quantize=True)
    # 64x64 (the attack's resolution) stays comfortably safe
    assert _part_bounds_for(emb, jnp.zeros((1, 64, 64, 3)))


def test_two_pass_default_eta_counts_native_bf16_as_reduced(rng,
                                                            monkeypatch):
    """Certificate-soundness regression: embed_lo built natively in bf16
    (what attack/fbb and bench construct) must select the demoted
    (2e-2) default eta, not the 1e-6 f32 one — keying on the streamer's
    demotion alone under-estimated eps ~1000x and wrongly certified
    bf16-error near-ties."""
    import ganleaks_tpu.ops.knn as knn

    seen = {}
    orig = knn._default_cert_eta

    def spy(demoted):
        seen["demoted"] = demoted
        return orig(demoted)

    monkeypatch.setattr(knn, "_default_cert_eta", spy)
    q, s = _sets(rng, n_q=3, n_s=9)

    def embed_lo(x):
        return jnp.asarray(x).reshape(x.shape[0], -1).astype(jnp.bfloat16)

    def embed_hi(x):
        return jnp.asarray(x).reshape(x.shape[0], -1)

    knn.knn_argmin_two_pass(embed_lo, embed_hi, jnp.asarray(q),
                            jnp.asarray(s), k=2, engine="gemm",
                            q_block=4, s_block=4)
    assert seen["demoted"] is True

    # f32 embed_lo keeps the tight default off-TPU
    seen.clear()
    knn.knn_argmin_two_pass(embed_hi, embed_hi, jnp.asarray(q),
                            jnp.asarray(s), k=2, engine="gemm",
                            q_block=4, s_block=4)
    assert seen["demoted"] is False
