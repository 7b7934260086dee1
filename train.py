"""Training CLI (parity: /root/reference/train.py:8-17).

Usage: python train.py --configs configs/expr/synthetic_nerf.yaml [--a.b.c v]
"""

import sys

from arcnerf_tpu.trainer import ArcNerfTrainer
from arcnerf_tpu.utils.cfgs import parse_configs


def main():
    cfgs = parse_configs(sys.argv[1:])
    trainer = ArcNerfTrainer(cfgs)
    trainer.train()


if __name__ == "__main__":
    main()
