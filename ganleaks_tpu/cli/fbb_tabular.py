"""Tabular fbb attack CLI (medGAN path; BASELINE config #4).

No reference entry point exists for attacking medGAN's ``synthetic.npy``
(``gan_models/medgan/train.py:247-318``); this mirrors ``cli.fbb`` and
writes the same artifact layout so ``cli.eval_roc`` runs unchanged:

    python -m ganleaks_tpu.cli.fbb_tabular \
        syn_data_path=syn_data/medgan/run1/synthetic.npy \
        dataset_csv=data/MIMIC_III/mimic.csv
    python -m ganleaks_tpu.cli.eval_roc \
        result_load_dir=fbb_attack/fbb_tabular_debug
"""

from ganleaks_tpu.attack.tabular import run_tabular_attack
from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import TabularAttackConfig


def main(argv=None) -> None:
    cfg = parse_config(TabularAttackConfig, argv,
                       "full-black-box MI attack on tabular records")
    out = run_tabular_attack(cfg)
    print(f"saved {out['save_dir']}  "
          f"({out['query_pairs_per_sec']:.3g} query-pairs/sec)")


if __name__ == "__main__":
    main()
