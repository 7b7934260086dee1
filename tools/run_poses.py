"""COLMAP pose estimation driver (reference tools/run_poses.py).

Usage: python tools/run_poses.py --configs configs/datasets/capture.yaml
   or: python tools/run_poses.py --scene_dir data/Capture/scene
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcnerf_tpu.colmap import estimate_poses
from arcnerf_tpu.utils.logger import Logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene_dir", default=None)
    parser.add_argument("--configs", default=None)
    parser.add_argument("--match_type", default="sequential_matcher")
    parser.add_argument("--dense", action="store_true")
    args = parser.parse_args()

    scene_dir = args.scene_dir
    if scene_dir is None and args.configs:
        from arcnerf_tpu.utils.cfgs import load_configs

        cfgs = load_configs(args.configs)
        scene_dir = os.path.join(cfgs.dir.data_dir, "Capture", cfgs.data.scene_name)
    assert scene_dir, "give --scene_dir or --configs"
    estimate_poses(scene_dir, args.match_type, args.dense, Logger())


if __name__ == "__main__":
    main()
