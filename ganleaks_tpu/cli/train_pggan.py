"""PGGAN training CLI (reference entry point:
``gan_models/pggan/train.py``)."""

from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import PGGANConfig
from ganleaks_tpu.train import pggan


def main(argv=None) -> None:
    cfg = parse_config(PGGANConfig, argv, "Progressive GAN victim training")
    state = pggan.train(cfg) if cfg.training else None
    if cfg.generate and state is not None:
        dirs = pggan.generate(cfg, state)
        print(f"synthetic data: {dirs['png_images']}")


if __name__ == "__main__":
    main()
