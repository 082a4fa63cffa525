"""CLI config plumbing: YAML + key=value overrides, type coercion, the
shipped reference-mirroring configs parse."""

import pytest

from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import AttackConfig, DCGANConfig, PGGANConfig


def test_parse_yaml_plus_overrides(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("exp_name: fromyaml\nBATCH_SIZE: 32\n")
    cfg = parse_config(AttackConfig,
                       ["--local_config", str(y), "BATCH_SIZE=64",
                        "drop_remainder=true", "data_num=5"])
    assert cfg.exp_name == "fromyaml"
    assert cfg.BATCH_SIZE == 64          # override beats YAML
    assert cfg.drop_remainder is True    # string -> bool
    assert cfg.data_num == 5


def test_parse_rejects_unknown_key():
    with pytest.raises(KeyError):
        parse_config(AttackConfig, ["not_a_key=1"])


def test_parse_rejects_malformed_override():
    with pytest.raises(SystemExit):
        parse_config(AttackConfig, ["oops"])


def test_shipped_configs_parse():
    cfg = parse_config(AttackConfig,
                       ["--local_config", "configs/config_attack_fbb.yaml"])
    assert cfg.distance == "l2-lpips" and cfg.K == 1
    dcfg = parse_config(DCGANConfig,
                        ["--local_config", "configs/dcgan_config.yaml"])
    assert dcfg.num_epochs == 100 and dcfg.num_generated == 2040
    pcfg = parse_config(PGGANConfig,
                        ["--local_config", "configs/pggan_config.yaml"])
    assert pcfg.nz == 512 and pcfg.batch_sizes == (32,) * 5


def test_every_cli_imports_and_parses_help():
    """All 13 CLI entry points (one per reference entry script, plus the
    tabular fbb CLI) must import and wire an argument parser — catches
    broken imports or argparse regressions without running any
    training."""
    import importlib
    import pkgutil

    import pytest

    import ganleaks_tpu.cli as cli_pkg

    mains = []
    for m in pkgutil.iter_modules(cli_pkg.__path__):
        if m.name == "common":
            continue
        mod = importlib.import_module(f"ganleaks_tpu.cli.{m.name}")
        assert callable(getattr(mod, "main", None)), m.name
        mains.append(mod.main)
    assert len(mains) == 14  # reference entry scripts + tabular fbb + lpips_scores
    for main in mains:
        with pytest.raises(SystemExit) as exc:
            main(["--help"])
        assert exc.value.code == 0


def test_bench_default_is_the_north_star():
    """The driver records BENCH artifacts from a plain `python bench.py`;
    its full default must stay pinned to the BASELINE north-star
    configuration (100k x 20k, uint8 real-data residency, one-sweep
    10 GB cache budget) and explicit sizes must keep the pre-r3
    behavior (store follows --dtype, 8 GB cache)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    full = bench.resolve_defaults(
        quick=False, n_q=None, n_syn=None, q_block=None, s_block=None,
        cache_gb=None, store=None, two_pass=False, dtype="bfloat16")
    assert full == (20000, 100000, 2048, 2048, 10.0, "uint8")

    # explicit sizes: pre-r3 defaults (dtype-following store, 8 GB cache)
    n_q, n_syn, _, _, cache_gb, store = bench.resolve_defaults(
        quick=False, n_q=2000, n_syn=20000, q_block=None, s_block=None,
        cache_gb=None, store=None, two_pass=False, dtype="bfloat16")
    assert (n_q, n_syn, cache_gb, store) == (2000, 20000, 8.0, None)

    # two_pass / f32 parity runs never silently pick uint8 pixels
    *_, store = bench.resolve_defaults(
        quick=False, n_q=None, n_syn=None, q_block=None, s_block=None,
        cache_gb=None, store=None, two_pass=True, dtype="bfloat16")
    assert store is None
    *_, store = bench.resolve_defaults(
        quick=False, n_q=None, n_syn=None, q_block=None, s_block=None,
        cache_gb=None, store=None, two_pass=False, dtype="float32")
    assert store is None

    # user overrides pass through untouched
    out = bench.resolve_defaults(
        quick=False, n_q=None, n_syn=None, q_block=1024, s_block=512,
        cache_gb=4.0, store="float32", two_pass=False, dtype="bfloat16")
    assert out == (20000, 100000, 1024, 512, 4.0, "float32")


def test_bench_partial_sizes_keep_pre_r3_shape():
    """`--n_q 2000` alone must keep meaning 2000x20000 (the pre-r3 bench
    shape), never a 5-10x hybrid with the north-star defaults."""
    import bench

    n_q, n_syn, *_ = bench.resolve_defaults(
        quick=False, n_q=2000, n_syn=None, q_block=None, s_block=None,
        cache_gb=None, store=None, two_pass=False, dtype="bfloat16")
    assert (n_q, n_syn) == (2000, 20000)
    n_q, n_syn, *_ = bench.resolve_defaults(
        quick=False, n_q=None, n_syn=50000, q_block=None, s_block=None,
        cache_gb=None, store=None, two_pass=False, dtype="bfloat16")
    assert (n_q, n_syn) == (2000, 50000)


def test_bench_halve_cache_retry_argv():
    """The fresh-process OOM retry must actually shrink the plan: halve
    (or inject half the RESOLVED default) --cache_gb AND disable the
    static planner, which would otherwise re-upgrade the request to the
    exact one-sweep size that just OOM'd."""
    import bench

    # explicit flag (split and = forms) halves with a floor of 1
    out = bench._halve_cache(["bench.py", "--cache_gb", "8.0"])
    assert out[out.index("--cache_gb") + 1] == "4.0"
    assert "--no_auto_plan" in out
    out = bench._halve_cache(["bench.py", "--cache_gb=1.5"])
    assert "--cache_gb=1.0" in out
    # no flag: half the RESOLVED default (10 for the full north star,
    # 8 for explicit shapes / --quick)
    out = bench._halve_cache(["bench.py"])
    assert out[out.index("--cache_gb") + 1] == "5.0"
    out = bench._halve_cache(["bench.py", "--n_q", "2000"])
    assert out[out.index("--cache_gb") + 1] == "4.0"
    out = bench._halve_cache(["bench.py", "--quick"])
    assert out[out.index("--cache_gb") + 1] == "4.0"
    # idempotent planner flag
    out2 = bench._halve_cache(out)
    assert out2.count("--no_auto_plan") == 1


def test_bench_stale_emission(tmp_path, capsys, monkeypatch):
    """When every fresh-process retry hit an unresponsive device (a
    tunnel outage, round 3's failure mode), the default invocation must
    emit the last driver-verified measurement labeled ``stale`` with the
    error text, and exit 0 — and must keep the non-zero rc when there is
    no last-good record to fall back to."""
    import json

    import bench

    good = {"metric": "fbb LPIPS kNN query-pairs/sec (tpu, taps-int8, "
                      "20000x100000 @64x64)",
            "value": 204600000.0, "unit": "query-pairs/sec",
            "vs_baseline": 13640000.0, "measured_at": "2026-08-18"}
    p = tmp_path / "bench_last_good.json"
    p.write_text(json.dumps(good))
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(p))

    with pytest.raises(SystemExit) as exc:
        bench._emit_stale_and_exit(3, attempts_made=7)
    assert exc.value.code == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stale"] is True
    assert out["value"] == good["value"]
    assert "tunnel outage" in out["error"]
    assert "NOT from this run" in out["error"]

    # no last-good file: the outage rc must survive
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH",
                        str(tmp_path / "missing.json"))
    with pytest.raises(SystemExit) as exc:
        bench._emit_stale_and_exit(3, attempts_made=7)
    assert exc.value.code == 3


def test_bench_last_good_seed_is_valid():
    """The committed seed record (builder-logged round-3 measurement)
    must stay parseable with the keys the stale emission copies."""
    import json
    import pathlib

    p = pathlib.Path(__file__).parent.parent / "bench_last_good.json"
    rec = json.loads(p.read_text())
    for key in ("metric", "value", "unit", "vs_baseline", "measured_at"):
        assert key in rec, key
    assert rec["value"] > 0


def test_tuple_field_coercion_from_raw_strings():
    """Raw CLI strings for sequence-typed fields must parse as YAML, not
    iterate characters (regression: mesh_shape=16 became (1, 6))."""
    from ganleaks_tpu.config import DCGANConfig, apply_overrides

    assert apply_overrides(DCGANConfig(),
                           {"mesh_shape": "16"}).mesh_shape == (16,)
    assert apply_overrides(DCGANConfig(),
                           {"mesh_shape": "[4, 2]"}).mesh_shape == (4, 2)
    assert apply_overrides(DCGANConfig(),
                           {"mesh_shape": 8}).mesh_shape == (8,)
    assert apply_overrides(DCGANConfig(),
                           {"mesh_shape": [2, 2]}).mesh_shape == (2, 2)


def test_forked_cache_write_lands_entries(tmp_path):
    """harden_cache_writes (conftest wires it) must still land cache
    entries — the fork isolation exists because jaxlib's write path
    segfaulted the full suite; losing ALL writes would silently disable
    the cache the 1-core host depends on."""
    import jax
    import jax.numpy as jnp
    from jax._src import compilation_cache as cc

    from ganleaks_tpu.cli.common import harden_cache_writes

    harden_cache_writes()
    harden_cache_writes()  # idempotent: no double-wrap
    assert getattr(cc.put_executable_and_time, "_ganleaks_forked", False)

    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_compilation_cache_dir", str(tmp_path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        cc.reset_cache()
        f = jax.jit(lambda x: jnp.sin(x) * 2.5 + jnp.cos(x) * 0.5)
        f(jnp.arange(23.0)).block_until_ready()
        assert any(tmp_path.iterdir()), "forked write landed no entry"
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min)
        cc.reset_cache()


def test_baseline_measured_section_is_rendered(tmp_path, monkeypatch):
    """BASELINE.md's measured region is generated from the measurement
    artifacts (VERDICT r4 weak #2: unfilled %placeholders% shipped as
    'measured'). Pin: no template placeholders survive in BASELINE.md,
    and the renderer round-trips real rows into the marked region."""
    import json

    repo_baseline = open("BASELINE.md").read()
    assert "%VG_" not in repo_baseline and "%PG_" not in repo_baseline \
        and "%PRIV" not in repo_baseline

    import tools.render_baseline as rb

    rows = tmp_path / "rows.jsonl"
    with open(rows, "w") as f:
        f.write(json.dumps({
            "config": "medgan_tabular",
            "scale": {"rows": 10000, "features": 1071, "epochs": 1000,
                      "batch": 2000, "generated": 10000, "queries": 2000},
            "stages_s": {"train_1000ep": 491.2, "generate_10000": 9.9,
                         "tabular_attack": 5.0},
            "query_pairs_per_sec": 4.03e6, "auroc": 0.5026}) + "\n")
        # smoke + error rows must be ignored, never rendered
        f.write(json.dumps({"config": "dcgan_lifecycle", "smoke": True,
                            "scale": {}, "stages_s": {}}) + "\n")
        f.write(json.dumps({"config": "wgangp_lpips_alex",
                            "error": "boom"}) + "\n")
    md = tmp_path / "B.md"
    md.write_text(repo_baseline)
    monkeypatch.setattr(rb, "BASELINE", str(md))
    monkeypatch.setattr(rb, "RESULTS", str(rows))

    import sys
    monkeypatch.setattr(sys, "argv", ["render_baseline.py"])
    rc = rb.main()
    out = md.read_text()
    assert "0.5026" in out and "4.03M query-pairs/s" in out
    assert "not measured" in out  # missing configs are EXPLICIT
    assert rc == 1  # and the tool reports the gap
