"""privPGGAN training CLI (reference entry point:
``gan_models/pggan/privPGGAN.py``) with the grid sweep
(``privPGGAN.py:248-266``)."""

import argparse

import yaml

from ganleaks_tpu.config import (
    PGGANConfig,
    PrivGANConfig,
    apply_overrides,
    expand_grid,
    load_config,
    sweep_tag,
)
from ganleaks_tpu.train import priv


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="privPGGAN victim training")
    ap.add_argument("--local_config", default=None)
    ap.add_argument("--grid", default=None)
    ap.add_argument("overrides", nargs="*")
    ns = ap.parse_args(argv)
    over = dict(item.split("=", 1) for item in ns.overrides)

    cfg = load_config(PGGANConfig, ns.local_config,
                      {k: v for k, v in over.items()
                       if k in PGGANConfig.__dataclass_fields__})
    base_priv = load_config(PrivGANConfig, None,
                            {k: v for k, v in over.items()
                             if k in PrivGANConfig.__dataclass_fields__})

    experiments = [{}]
    if ns.grid:
        with open(ns.grid) as f:
            experiments = list(expand_grid(yaml.safe_load(f)))

    for exp in experiments:
        pcfg = apply_overrides(base_priv, exp) if exp else base_priv
        tag = sweep_tag(exp) if exp else ("", "")
        print(f"=== privPGGAN {tag} {pcfg} ===")
        state = priv.train_privpggan(cfg, pcfg)
        if cfg.generate:
            run_dir = "/".join(t for t in tag if t) or None
            dirs = priv.generate_privpggan(cfg, pcfg, state, run_dir)
            print(f"synthetic data: {dirs['png_images']}")


if __name__ == "__main__":
    main()
