"""VAE-GAN training CLI (reference entry points:
``gan_models/vaegan/train.py`` and ``sample.py``)."""

from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import VAEGANConfig
from ganleaks_tpu.train import vaegan


def main(argv=None) -> None:
    cfg = parse_config(VAEGANConfig, argv, "VAE-GAN victim training")
    state = vaegan.train(cfg)
    if cfg.generate:
        out = vaegan.sample(cfg, state, f"results/{cfg.exp_name}/samples")
        print(f"samples: {out['out_dir']}/generated.npz")


if __name__ == "__main__":
    main()
