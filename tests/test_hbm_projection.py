"""Static HBM projection tool (tools/hbm_projection.py): consistency of
the sizing arithmetic with the engines' accounting."""

from tools.hbm_projection import project  # repo root on path via conftest

NS = dict(n_q=20000, n_syn=100000, resolution=64, q_block=2048,
          s_block=2048, hbm_gb=16.0)


def test_north_star_fits_and_f32_degrades():
    u8 = project(engine="taps-int8", dtype="bfloat16", store="uint8",
                 cache_gb=8.0, **NS)
    assert u8["fits"]  # the measured configuration
    # the live planner upgrades uint8 residency to the one-sweep cache
    # (the measured 9.78 s schedule)
    assert u8["sweeps"] == 1 and u8["planned_cache"] >= 8 << 30
    # f32 residency cannot hold the requested cache: the planner CAPS it
    # (more sweeps — what the engine actually does) instead of OOMing;
    # this degradation is why uint8 residency exists (BASELINE.md)
    f32 = project(engine="gemm", dtype="float32", store="float32",
                  cache_gb=12.0, **NS)
    assert f32["planned_cache"] < 12 << 30
    assert f32["sweeps"] > u8["sweeps"]


def test_projection_scaling_relations():
    base = project(engine="taps", dtype="bfloat16", store="bfloat16",
                   cache_gb=8.0, **NS)
    i8 = project(engine="taps-int8", dtype="bfloat16", store="bfloat16",
                 cache_gb=8.0, **NS)
    assert i8["row_bytes"] * 2 == base["row_bytes"]  # int8 = half of bf16
    half_cache = project(engine="taps", dtype="bfloat16", store="bfloat16",
                         cache_gb=4.0, **NS)
    assert half_cache["sweeps"] >= base["sweeps"]
    assert half_cache["chunk_rows"] <= base["chunk_rows"]
    u8 = project(engine="taps", dtype="bfloat16", store="uint8",
                 cache_gb=8.0, **NS)
    assert u8["images"] * 4 == project(
        engine="taps", dtype="bfloat16", store="float32",
        cache_gb=8.0, **NS)["images"]
