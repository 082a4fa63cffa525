"""Dataset splitter CLI (reference entry point: ``z_split.py``)."""

from ganleaks_tpu.cli.common import parse_config
from ganleaks_tpu.config import SplitConfig
from ganleaks_tpu.tools.z_split import run_split


def main(argv=None) -> None:
    cfg = parse_config(SplitConfig, argv, "CelebA member/non-member split")
    counts = run_split(cfg)
    print(f"members: {counts['members']}  "
          f"non-members: {counts['non_members']}")


if __name__ == "__main__":
    main()
