"""fbb attack CLI (reference entry point: ``attack_models/fbb.py``).

    python -m ganleaks_tpu.cli.fbb --local_config config_attack_fbb.yaml \
        syn_data_path=syn/png_images/run1 distance=l2-lpips
"""

from ganleaks_tpu.attack.fbb import run_attack
from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import AttackConfig


def main(argv=None) -> None:
    cfg = parse_config(AttackConfig, argv, "full-black-box MI attack")
    results = run_attack(cfg)
    for r in results:
        print(f"saved {r['save_dir']}  "
              f"({r['query_pairs_per_sec']:.3g} query-pairs/sec)")


if __name__ == "__main__":
    main()
