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
    assert len(mains) == 13  # one per reference entry script + tabular fbb
    for main in mains:
        with pytest.raises(SystemExit) as exc:
            main(["--help"])
        assert exc.value.code == 0
