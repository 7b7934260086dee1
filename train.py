"""Training CLI (parity: /root/reference/train.py:8-17).

Usage: python train.py --configs configs/expr/synthetic_nerf.yaml [--a.b.c v]
"""

import sys

from arcnerf_tpu.trainer import ArcNerfTrainer
from arcnerf_tpu.utils.cfgs import get_value_from_cfgs_field, parse_configs


def main():
    cfgs = parse_configs(sys.argv[1:])
    if get_value_from_cfgs_field(cfgs, "viewer", False):
        from arcnerf_tpu.trainer.viewer_trainer import ArcNerfViewerTrainer

        trainer = ArcNerfViewerTrainer(cfgs)
    else:
        trainer = ArcNerfTrainer(cfgs)
    trainer.train()


if __name__ == "__main__":
    main()
