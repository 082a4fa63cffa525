"""DCGAN training CLI (reference entry point:
``gan_models/dcgan/train_torch.py``).

    python -m ganleaks_tpu.cli.train_dcgan --local_config dcgan.yaml \
        data_path=data/train num_epochs=100
"""

from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import DCGANConfig
from ganleaks_tpu.train import dcgan


def main(argv=None) -> None:
    cfg = parse_config(DCGANConfig, argv, "DCGAN victim training")
    state = None
    if cfg.training:
        state = dcgan.train(cfg)
    if cfg.generate:
        dirs = dcgan.generate(cfg, state)
        print(f"synthetic data: {dirs['png_images']}")


if __name__ == "__main__":
    main()
