"""Attack-metric invariance across engines: the throughput modes (bf16
taps, int8 taps) may wobble individual distances, but the attack's
OUTPUT — AUROC over member/non-member scores — must match the f32 parity
engine on a structured fixture (members = near-duplicates of synthetic
rows, the regime the attack exists for)."""

import numpy as np
import pytest

from ganleaks_tpu.attack.fbb import attack_arrays
from ganleaks_tpu.config import AttackConfig
from ganleaks_tpu.ops.roc import roc_curve_auc


def _auroc(out) -> float:
    r = roc_curve_auc(-np.asarray(out["pos_loss"], np.float32),
                      -np.asarray(out["neg_loss"], np.float32))
    return float(r.auc)


@pytest.fixture(scope="module")
def fixture_sets():
    rng = np.random.default_rng(7)
    syn = rng.uniform(-1, 1, (48, 16, 16, 3)).astype(np.float32)
    pos = (syn[rng.integers(0, 48, 24)]
           + rng.normal(0, 0.05, (24, 16, 16, 3))).astype(np.float32)
    pos = np.clip(pos, -1, 1)
    neg = rng.uniform(-1, 1, (24, 16, 16, 3)).astype(np.float32)
    return syn, pos, neg


@pytest.mark.parametrize("engine,dtype", [
    ("taps", "bfloat16"),
    ("taps-int8", "bfloat16"),
    ("pallas", "float32"),
])
def test_engine_auroc_matches_f32_parity(fixture_sets, engine, dtype):
    syn, pos, neg = fixture_sets
    ref_cfg = AttackConfig(distance="l2", engine="gemm", dtype="float32",
                           query_block=16, syn_block=16, resolution=16)
    ref = attack_arrays(ref_cfg, syn, pos, neg)
    cfg = AttackConfig(distance="l2", engine=engine, dtype=dtype,
                       query_block=16, syn_block=16, resolution=16)
    out = attack_arrays(cfg, syn, pos, neg)
    a_ref, a = _auroc(ref), _auroc(out)
    assert a_ref > 0.9  # the fixture must actually be separable
    # BASELINE.md bar: AUROC delta < 1e-3
    assert abs(a - a_ref) < 1e-3, (engine, a, a_ref)
    # and the member NN indices (the attack's qualitative output) agree
    agree = np.mean(out["pos_nn_idx"] == ref["pos_nn_idx"])
    assert agree == 1.0


def test_lpips_engine_auroc_invariance(fixture_sets):
    """Same bar with the full l2-lpips distance (bf16 tower + int8
    streams vs the f32 parity tower)."""
    syn, pos, neg = fixture_sets
    base = dict(distance="l2-lpips", query_block=16, syn_block=16,
                resolution=16)
    ref = attack_arrays(AttackConfig(engine="gemm", dtype="float32",
                                     **base), syn, pos, neg)
    out = attack_arrays(AttackConfig(engine="taps-int8", dtype="bfloat16",
                                     lpips_compute_dtype="bfloat16",
                                     **base), syn, pos, neg)
    a_ref, a = _auroc(ref), _auroc(out)
    assert a_ref > 0.9
    assert abs(a - a_ref) < 1e-3
    assert np.mean(out["pos_nn_idx"] == ref["pos_nn_idx"]) == 1.0
