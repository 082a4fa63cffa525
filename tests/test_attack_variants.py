"""Reconstruction attack (VAE-GAN) + tabular fbb (medGAN) + profiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganleaks_tpu.attack.eval_roc import evaluate
from ganleaks_tpu.attack.reconstruction import fbb_tabular, reconstruction_scores
from ganleaks_tpu.config import EvalConfig, VAEGANConfig
from ganleaks_tpu.models.vaegan import Encoder, Generator
from ganleaks_tpu.utils.profiling import trace_stage


def test_fbb_tabular_detects_membership(rng):
    """medGAN path: members planted near synthetic rows score higher."""
    syn = (rng.random((64, 30)) > 0.5).astype(np.float32)
    pos = syn[:16].copy()
    flips = rng.random(pos.shape) < 0.05          # members: 5% bit noise
    pos = np.abs(pos - flips.astype(np.float32))
    neg = (rng.random((16, 30)) > 0.5).astype(np.float32)

    out = fbb_tabular(syn, pos, neg, s_block=16)
    assert out["pos_loss"].shape == (16,)
    res = evaluate(EvalConfig(), pos_loss=out["pos_loss"],
                   neg_loss=out["neg_loss"])
    assert res["auc"] > 0.9

    # distances are mean-square over features: exact check for row 0
    d0 = ((syn - pos[0]) ** 2).mean(axis=1).min()
    np.testing.assert_allclose(out["pos_loss"][0], d0, rtol=1e-5,
                               atol=1e-7)


def test_reconstruction_scores_vaegan(rng):
    cfg = VAEGANConfig(z_dim=16, d=8)
    enc = Encoder(z_dim=16, d=8)
    gen = Generator(z_dim=16, d=8)
    img = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    ev = enc.init(jax.random.key(0), img, jax.random.key(1), train=True)
    gv = gen.init(jax.random.key(2), jnp.zeros((1, 16)), train=True)

    enc_apply = lambda x, k: enc.apply(ev, x, k, train=False)
    gen_apply = lambda z: gen.apply(gv, z, train=False)
    scores = reconstruction_scores(enc_apply, gen_apply,
                                   np.asarray(img), jax.random.key(3),
                                   batch=2)
    assert scores.shape == (4,)
    assert np.isfinite(scores).all() and (scores >= 0).all()


def test_checkify_guard(rng):
    """utils.profiling.checked: NaN raises instead of propagating."""
    import jax.numpy as jnp

    from ganleaks_tpu.utils.profiling import checked

    f = checked(lambda x: jnp.log(x))
    assert float(f(jnp.array([1.0]))[0]) == 0.0
    import pytest as _pytest
    with _pytest.raises(Exception):
        f(jnp.array([-1.0]))


def test_trace_stage_meters():
    meters = {}
    with trace_stage("featurize", meters, items=100):
        jnp.zeros((8, 8)).block_until_ready()
    assert meters["featurize_seconds"] > 0
    assert meters["featurize_items_per_sec"] > 0


def test_attack_modes_agree(rng):
    """attack_arrays must return identical NN indices across engines and
    the two-pass exact mode (CPU: everything is true f32, so equality is
    exact; the single-sweep pos+neg concat must not change results)."""
    from ganleaks_tpu.attack.fbb import attack_arrays
    from ganleaks_tpu.config import AttackConfig

    syn = rng.uniform(-1, 1, (60, 8, 8, 3)).astype(np.float32)
    pos = syn[:10] + rng.normal(0, 0.05, (10, 8, 8, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (10, 8, 8, 3)).astype(np.float32)

    base = AttackConfig(distance="l2", syn_block=16, query_block=8,
                        save_plots=False)
    ref = attack_arrays(base, syn, pos, neg)
    for cfg in (base.__class__(**{**base.__dict__, "engine": "pallas"}),
                base.__class__(**{**base.__dict__, "two_pass": True}),
                base.__class__(**{**base.__dict__, "engine": "exact"})):
        out = attack_arrays(cfg, syn, pos, neg)
        np.testing.assert_array_equal(out["pos_nn_idx"],
                                      ref["pos_nn_idx"])
        np.testing.assert_array_equal(out["neg_nn_idx"],
                                      ref["neg_nn_idx"])
        np.testing.assert_allclose(out["pos_loss"], ref["pos_loss"],
                                   rtol=1e-5, atol=1e-6)


def test_engine_auto_resolution(rng, monkeypatch):
    """engine='auto' resolves per backend: reference-parity gemm on CPU,
    the taps-int8 + bf16 throughput recipe on TPU; explicit engines pass
    through untouched, and the E2E result equals the gemm run."""
    from ganleaks_tpu.attack.fbb import attack_arrays, resolve_auto_engine
    from ganleaks_tpu.config import AttackConfig

    auto = AttackConfig(distance="l2", engine="auto", syn_block=16,
                        query_block=8, save_plots=False)
    r = resolve_auto_engine(auto)  # CPU test env
    assert (r.engine, r.dtype) == ("gemm", "float32")
    assert resolve_auto_engine(
        AttackConfig(engine="exact")).engine == "exact"

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    t = resolve_auto_engine(auto)
    assert (t.engine, t.dtype, t.lpips_compute_dtype) == \
        ("taps-int8", "bfloat16", "bfloat16")
    monkeypatch.undo()

    syn = rng.uniform(-1, 1, (40, 8, 8, 3)).astype(np.float32)
    pos = syn[:8] + rng.normal(0, 0.05, (8, 8, 8, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (8, 8, 8, 3)).astype(np.float32)
    out = attack_arrays(auto, syn, pos, neg)
    ref = attack_arrays(
        AttackConfig(**{**auto.__dict__, "engine": "gemm"}), syn, pos, neg)
    np.testing.assert_array_equal(out["pos_nn_idx"], ref["pos_nn_idx"])
    np.testing.assert_allclose(out["neg_loss"], ref["neg_loss"], rtol=1e-6)


def test_run_attack_params_dump_records_resolved_engine(rng, tmp_path):
    """Provenance: the params.txt/pkl artifact must record the engine that
    actually ran (engine='auto' resolved per backend), or a reproduction
    from the dump on another backend silently runs a different search."""
    import os
    import pickle

    from ganleaks_tpu.attack.fbb import run_attack
    from ganleaks_tpu.config import AttackConfig
    from ganleaks_tpu.io import save_png

    dirs = {}
    for name, n in [("syn", 16), ("pos", 3), ("neg", 3)]:
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            img = rng.integers(0, 256, (8, 8, 3))
            save_png(img.astype(np.float64) / 255.0, str(d / f"{i}.png"))
        dirs[name] = str(d)

    cfg = AttackConfig(
        exp_name="prov", syn_data_path=dirs["syn"],
        pos_data_dir=dirs["pos"], neg_data_dir=dirs["neg"],
        data_num=3, resolution=8, distance="l2", engine="auto",
        query_block=2, syn_block=8,
        save_root=str(tmp_path / "out"), save_plots=False)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_attack(cfg)
    finally:
        os.chdir(cwd)
    exp = str(tmp_path / "out" / "prov")  # save_root/exp_name
    with open(os.path.join(exp, "params.pkl"), "rb") as f:
        params = pickle.load(f)
    assert params["engine"] == "gemm"  # resolved for this (CPU) backend
    txt = open(os.path.join(exp, "params.txt")).read()
    assert "engine:gemm" in txt and "engine:auto" not in txt
    # the metrics stream keeps its engine_resolved record too
    metrics = open(os.path.join(exp, "metrics.jsonl")).read()
    assert '"engine_resolved": "gemm"' in metrics


def test_engine_auto_degrades_int8_at_infeasible_resolution(monkeypatch):
    """At resolutions where a part's s8xs8->s32 cross dot can reach 2^31
    (pixel part at >=256x256), 'auto' must degrade to the bf16 taps
    recipe instead of picking taps-int8 and dying after data load."""
    from ganleaks_tpu.attack.fbb import resolve_auto_engine
    from ganleaks_tpu.config import AttackConfig

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    big = resolve_auto_engine(AttackConfig(distance="l2", engine="auto",
                                           resolution=256))
    assert (big.engine, big.dtype) == ("taps", "bfloat16")
    ok = resolve_auto_engine(AttackConfig(distance="l2", engine="auto",
                                          resolution=64))
    assert ok.engine == "taps-int8"


def test_pinned_host_stream_on_mesh_raises():
    """host_stream=true is documented as a pin: a mesh run must refuse
    it loudly, not silently decode+device-place the sets."""
    from ganleaks_tpu.attack.fbb import host_stream_enabled
    from ganleaks_tpu.config import AttackConfig

    with pytest.raises(ValueError, match="single-chip only"):
        host_stream_enabled(AttackConfig(host_stream=True, n_chips=2))
    # 'auto' quietly resolves off on a mesh (no pin to betray)
    assert host_stream_enabled(
        AttackConfig(host_stream="auto", n_chips=2)) is False
    assert host_stream_enabled(
        AttackConfig(host_stream=True, n_chips=1)) is True


def test_unknown_shard_layout_rejected(rng):
    """A shard_layout typo must fail loudly, not silently run the
    'sharded' layout while params.txt records the bogus string."""
    from ganleaks_tpu.attack.fbb import attack_arrays
    from ganleaks_tpu.config import AttackConfig

    syn = rng.uniform(-1, 1, (8, 8, 8, 3)).astype(np.float32)
    q = syn[:2]
    with pytest.raises(ValueError, match="shard_layout"):
        attack_arrays(AttackConfig(distance="l2", shard_layout="Ring"),
                      syn, q, q)
