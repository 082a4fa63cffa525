"""The static HBM stream planner (``ops/knn._auto_stream_plan``).

The expectations below are CHIP-CALIBRATED, not invented: on the 16 GiB
v5e, the 20000x100000 uint8 north star measured one-sweep-fits at
(cache 10 GiB, s_block 1024) -> 204.3M pairs/s, and OOM'd at
(cache 10 GiB, s_block 2048). The planner's accounting must reproduce
exactly that accept/reject boundary. (No reference counterpart: the
reference requires the whole set to fit one GPU, fbb.py:133-145.)
"""
import numpy as np
import pytest

import ganleaks_tpu.ops.knn as knn_mod
from ganleaks_tpu.ops.knn import _auto_stream_plan

GIB = 1 << 30
ROW = 512 * 1024  # taps-int8 lane-padded row bytes at 64x64 (measured)


def north_star_arrays():
    """DEVICE-backed (the production default: attack_arrays jnp.asarray's
    the sets) — the planner charges device arrays as resident and
    host-backed ones as free (test_host_backed_inputs_charge_no_residency)."""
    import jax.numpy as jnp

    q = jnp.zeros((20000, 64, 64, 3), jnp.uint8)
    s = jnp.zeros((100000, 64, 64, 3), jnp.uint8)
    return q, s


@pytest.fixture
def v5e(monkeypatch):
    monkeypatch.setattr(knn_mod, "_device_hbm_bytes", lambda: 16 * GIB)


def test_north_star_upgrades_to_one_sweep(v5e):
    """8 GiB requested (two sweeps) -> one-sweep cache at a shrunk
    s_block, reproducing the measured 204M pairs/s configuration."""
    q, s = north_star_arrays()
    cache, sb, _ = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                                  cache_bytes=8 * GIB)
    assert cache >= 20480 * ROW, "cache holds every padded query row"
    assert sb == 1024, "s_block shrunk so the one-sweep cache fits"


def test_north_star_rejects_the_measured_oom_config(v5e):
    """The one-sweep cache + s_block=2048 stream measured OOM on chip;
    the planner must not pick that combination."""
    q, s = north_star_arrays()
    cache, sb, _ = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                                  cache_bytes=10 * GIB)
    assert not (cache >= 20480 * ROW and sb == 2048)


def test_driver_default_syn_block_8192_reaches_one_sweep(v5e):
    """AttackConfig's syn_block default is 8192; the halving walk must
    reach the fitting 1024, not stop early and strand the cache."""
    q, s = north_star_arrays()
    cache, sb, _ = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=8192,
                                  cache_bytes=8 * GIB)
    assert cache >= 20480 * ROW and sb == 1024


def test_small_config_unchanged(v5e):
    """The default bench shape (2000x20000) fits with headroom: the plan
    must not perturb it (same cache budget, same s_block)."""
    q = np.zeros((2000, 64, 64, 3), np.uint8)
    s = np.zeros((20000, 64, 64, 3), np.uint8)
    cache, sb, _ = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                                  cache_bytes=8 * GIB)
    assert (cache, sb) == (8 * GIB, 2048)


def test_unknown_hbm_is_inert(monkeypatch):
    monkeypatch.setattr(knn_mod, "_device_hbm_bytes", lambda: None)
    q, s = north_star_arrays()
    cache, sb, _ = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                                  cache_bytes=8 * GIB)
    assert (cache, sb) == (8 * GIB, 2048)


def test_env_killswitch(v5e, monkeypatch):
    monkeypatch.setenv("GANLEAKS_NO_AUTO_PLAN", "1")
    q, s = north_star_arrays()
    cache, sb, _ = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                                  cache_bytes=8 * GIB)
    assert (cache, sb) == (8 * GIB, 2048)


def test_overambitious_cache_capped_before_allocation(v5e):
    """A 14 GiB request on a 16 GiB chip can never fit next to the
    stream: the plan caps it (the alloc-OOM resume would otherwise be
    the first line of defense — and on the tunneled backend a device
    OOM can leave the runtime sticky)."""
    q, s = north_star_arrays()
    # huge rows so one sweep is unreachable: 20480 rows x 4 MiB = 80 GiB
    big_row = 4 * (1 << 20)
    cache, sb, qb = _auto_stream_plan(q, s, big_row, q_block=2048,
                                      s_block=2048, cache_bytes=14 * GIB)
    assert cache < 14 * GIB
    # floor: one chunk at the PLANNED q_block — the planner may shrink
    # the block itself when 2048 wide rows cannot fit (round-5 fix; the
    # old contract returned a floor bigger than the budget)
    assert cache >= qb * big_row, "floor: one planned-q_block of rows"


def test_cpu_backend_reports_unknown_hbm():
    """On the CPU test host the real _device_hbm_bytes must be None —
    the planner stays out of every CPU suite's exact block schedules."""
    assert knn_mod._device_hbm_bytes() is None


def test_wide_f32_rows_charge_extra_stream_block(v5e):
    """f32 streams (2 MB/row at 64x64) measured an OOM at a boundary the
    2-block charge accepted (engine='exact', 2026-08-18): XLA fold temps
    on the fat blocks ate the margin. Rows wider than 1 MB charge one
    extra in-flight block; the int8/bf16 calibration keeps 2."""
    import jax.numpy as jnp

    q = jnp.zeros((2048, 64, 64, 3), jnp.uint8)
    s = jnp.zeros((100000, 64, 64, 3), jnp.uint8)
    row_f32 = 2 << 20
    # budget ~14.5 GiB; need_one = 2048 * 2 MiB = 4 GiB, act = 2 GiB.
    # 2 blocks @ sb=2048: 4+2+8 = 14.0 <= budget (old model accepted);
    # 3 blocks: 4+2+12 = 18 > budget -> must walk sb down
    cache, sb, _ = _auto_stream_plan(q, s, row_f32, q_block=2048,
                                  s_block=2048, cache_bytes=4 * GIB)
    assert sb < 2048, "wide rows must not keep the 2-block-optimistic sb"


def test_host_backed_inputs_charge_no_residency(v5e):
    """numpy / HostImageSet inputs are sliced per block and shipped
    transiently — they never occupy HBM for the whole search, so the
    planner must not charge them as resident (a 4x-inflated synthetic
    set would otherwise wrongly refuse the one-sweep schedule)."""
    import jax.numpy as jnp

    q = np.zeros((20000, 64, 64, 3), np.uint8)
    s = np.zeros((400000, 64, 64, 3), np.uint8)  # 4.6 GiB if resident
    host = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                             cache_bytes=8 * GIB)
    assert host[0] >= 20480 * ROW, "host-backed sets: one sweep fits"
    dev = _auto_stream_plan(jnp.asarray(q[:1]), jnp.asarray(s[:64]), ROW,
                            q_block=2048, s_block=2048,
                            cache_bytes=8 * GIB,
                            resident_bytes=q.nbytes + s.nbytes)
    assert dev[0] < 20480 * ROW, "same sets device-resident: no one-sweep"


def test_feat_rows_models_per_chip_featurize(v5e):
    """The mesh driver batch-shards query featurize n_dev ways: each chip
    runs q_block/n_dev rows through the tower, so the activation charge
    must use the per-chip share. Charging the GLOBAL q_block (the old
    behavior) overcharges up to n_dev-fold and refuses one-sweep
    schedules the per-chip plan exists to enable."""
    q, s = north_star_arrays()
    resident = int(2.3 * GIB)  # per-chip: synthetic shard + query block
    full = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                             cache_bytes=8 * GIB, resident_bytes=resident)
    chip = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                             cache_bytes=8 * GIB, resident_bytes=resident,
                             feat_rows=2048 // 8)
    assert full[0] < 20480 * ROW, \
        "global-q_block activation charge refuses the one-sweep plan"
    assert chip[0] >= 20480 * ROW, \
        "per-chip activation charge accepts the one-sweep plan"


def test_resident_override_models_per_chip_budget(v5e):
    """The mesh driver passes per-chip residency (one synthetic shard +
    one query block) instead of the full sets: with the synthetic set
    sharded 8 ways the one-sweep replicated cache must fit chips where
    the single-chip accounting would refuse it."""
    q, s = north_star_arrays()
    full = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                             cache_bytes=8 * GIB,
                             resident_bytes=q.nbytes + 4 * s.nbytes)
    shard = _auto_stream_plan(q, s, ROW, q_block=2048, s_block=2048,
                              cache_bytes=8 * GIB,
                              resident_bytes=s.nbytes // 8 + 2048 * 12288)
    assert full[0] < 20480 * ROW, "4x-synthetic residency: no one-sweep"
    assert shard[0] >= 20480 * ROW, "per-shard residency: one sweep fits"


def test_wide_row_256px_shrinks_blocks_to_fit(v5e):
    """Round-5 chip failure: at 256px (row ~8 MiB, tower activations
    ~16.8 MiB/row) ONE 2048-row chunk + its featurize block exceed the
    whole chip, and the old planner returned the unreachable q_block
    floor as the 'cap' — guaranteeing an unrecoverable alloc OOM. The
    planner must shrink the BLOCKS (q_block included) until one chunk
    plus its activations actually fit the budget."""
    import jax.numpy as jnp

    row_256 = 8 << 20
    q = jnp.zeros((2048, 256, 256, 3), jnp.uint8)
    s = jnp.zeros((4096, 256, 256, 3), jnp.uint8)
    cache, sb, qb = _auto_stream_plan(q, s, row_256, q_block=2048,
                                      s_block=4096, cache_bytes=8 * GIB)
    assert qb < 2048, "q_block must shrink in the wide-row regime"
    assert cache >= qb * row_256, "cap below one chunk is unallocatable"
    # the returned plan actually fits: one chunk + 3 in-flight stream
    # blocks + the per-block tower activations inside 92% of HBM
    act = 256 * 256 * 64 * 2 * 2
    budget = int(16 * GIB * 0.92) - int(q.nbytes + s.nbytes) \
        - (2048 + (-2048) % qb) * 8
    assert cache + 3 * sb * row_256 + max(qb, sb) * act <= budget
