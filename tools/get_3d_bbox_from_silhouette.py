"""Visual-hull bounding box from masks (reference
tools/get_3d_bbox_from_silhouette.py): carve a voxel grid by projecting it
into every camera and testing mask membership; report the tight bbox of the
surviving voxels.

Usage: python tools/get_3d_bbox_from_silhouette.py --configs <expr.yaml> [--n_grid 128] [--side 4.0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def visual_hull_bbox(dataset, n_grid=128, side=4.0, thres=0.9):
    import jax.numpy as jnp

    from arcnerf_tpu.geometry.volume import Volume

    vol = Volume(n_grid=n_grid, side=side)
    pts = np.asarray(vol.get_volume_pts())  # (n^3, 3)
    votes = np.zeros(pts.shape[0])
    n_cams = 0
    for i in range(len(dataset)):
        sample = dataset[i]
        if "mask" not in sample:
            continue
        cam = dataset.cameras[i]
        pix = np.asarray(cam.proj_world_to_pixel(jnp.asarray(pts)))  # (n^3, 2)
        h, w = dataset.H, dataset.W
        mask = np.asarray(sample["mask"]).reshape(h, w)
        xi = np.clip(np.round(pix[:, 0]).astype(int), 0, w - 1)
        yi = np.clip(np.round(pix[:, 1]).astype(int), 0, h - 1)
        inside_img = (pix[:, 0] >= 0) & (pix[:, 0] < w) & (pix[:, 1] >= 0) & (pix[:, 1] < h)
        votes += np.where(inside_img, mask[yi, xi] > 0.5, 0.0)
        n_cams += 1
    keep = votes >= thres * max(n_cams, 1)
    if not keep.any():
        return None
    kept = pts[keep]
    return np.stack([kept.min(0), kept.max(0)], axis=-1)  # (3, 2)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", required=True)
    parser.add_argument("--n_grid", type=int, default=128)
    parser.add_argument("--side", type=float, default=4.0)
    args = parser.parse_args()

    from arcnerf_tpu.datasets import get_dataset
    from arcnerf_tpu.utils.cfgs import get_value_from_cfgs_field, load_configs
    from arcnerf_tpu.utils.logger import Logger

    cfgs = load_configs(args.configs)
    data_dir = get_value_from_cfgs_field(cfgs.dir, "data_dir", "data")
    dataset = get_dataset(cfgs.dataset, data_dir, "train", None, Logger())
    bbox = visual_hull_bbox(dataset, args.n_grid, args.side)
    print("visual hull bbox (xyz min/max):\n", bbox)


if __name__ == "__main__":
    main()
