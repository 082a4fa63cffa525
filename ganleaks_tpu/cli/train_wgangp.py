"""WGAN-GP training CLI (reference entry point:
``gan_models/wgangp/train.py``)."""

from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import WGANGPConfig
from ganleaks_tpu.train import wgangp


def main(argv=None) -> None:
    cfg = parse_config(WGANGPConfig, argv, "WGAN-GP victim training")
    state = wgangp.train(cfg) if cfg.training else None
    if cfg.generate and state is not None:
        dirs = wgangp.generate(cfg, state)
        print(f"synthetic data: {dirs['png_images']}")


if __name__ == "__main__":
    main()
