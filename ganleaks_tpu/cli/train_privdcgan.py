"""privDCGAN training CLI (reference entry point:
``gan_models/dcgan/privDCGAN.py``), including the hyperparameter grid sweep
(``--grid <yaml>`` of list-valued privGAN params, ``privDCGAN.py:73-92``)."""

import argparse

import yaml

from ganleaks_tpu.config import (
    DCGANConfig,
    PrivGANConfig,
    apply_overrides,
    expand_grid,
    load_config,
    sweep_tag,
)
from ganleaks_tpu.train import priv


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="privDCGAN victim training")
    ap.add_argument("--local_config", default=None)
    ap.add_argument("--grid", default=None,
                    help="YAML of list-valued privGAN params to sweep")
    ap.add_argument("overrides", nargs="*")
    ns = ap.parse_args(argv)
    over = dict(item.split("=", 1) for item in ns.overrides)

    cfg = load_config(DCGANConfig, ns.local_config,
                      {k: v for k, v in over.items()
                       if k in DCGANConfig.__dataclass_fields__})
    base_priv = load_config(PrivGANConfig, None,
                            {k: v for k, v in over.items()
                             if k in PrivGANConfig.__dataclass_fields__})

    experiments = [{}]
    if ns.grid:
        with open(ns.grid) as f:
            grid = yaml.safe_load(f)
        experiments = list(expand_grid(grid))

    for exp in experiments:
        pcfg = apply_overrides(base_priv, exp) if exp else base_priv
        tag = sweep_tag(exp) if exp else ("", "")
        print(f"=== privDCGAN {tag} {pcfg} ===")
        state = priv.train_privdcgan(cfg, pcfg)
        if cfg.generate:
            run_dir = "/".join(t for t in tag if t) or None
            dirs = priv.generate_privdcgan(cfg, pcfg, state, run_dir)
            print(f"synthetic data: {dirs['png_images']}")


if __name__ == "__main__":
    main()
