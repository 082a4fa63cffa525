"""medGAN training CLI (reference entry point:
``gan_models/medgan/train.py``)."""

from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import MedGANConfig
from ganleaks_tpu.train import medgan


def main(argv=None) -> None:
    cfg = parse_config(MedGANConfig, argv, "medGAN victim training")
    state = None
    if cfg.training:
        # reference asserts training and generation are exclusive
        # (medgan/train.py:123,249); we allow train-then-generate in one run
        state = medgan.train(cfg)
    if cfg.generate and state is not None:
        medgan.generate(cfg, state)
        print(f"synthetic data: {cfg.PATH}/synthetic.npy")


if __name__ == "__main__":
    main()
