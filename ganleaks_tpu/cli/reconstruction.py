"""Reconstruction-attack CLI (BASELINE config #3; no reference entry
script exists — artifact layout mirrors ``attack_models/fbb.py`` so
``cli.eval_roc`` evaluates the run unchanged).

    python -m ganleaks_tpu.cli.reconstruction --local_config recon.yaml \
        netE=runs/vaegan/netE.msgpack netG=runs/vaegan/netG.msgpack
"""

from ganleaks_tpu.attack.reconstruction import run_reconstruction_attack
from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import ReconstructionConfig


def main(argv=None) -> None:
    cfg = parse_config(ReconstructionConfig, argv,
                       "encoder-seeded reconstruction MI attack")
    out = run_reconstruction_attack(cfg)
    print(f"saved {out['save_dir']}")


if __name__ == "__main__":
    main()
