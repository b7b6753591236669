"""Export ground-truth depths for an eval split -> gt_depths.npz.

(reference: movedepth/export_gt_depth.py:11-53)
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from movedepth_tpu.data.kitti import readlines
from movedepth_tpu.data.kitti_utils import generate_depth_map


def export_gt_depths(data_path: str, split_dir: str, split: str) -> str:
    """Build ``<split_dir>/gt_depths.npz`` for 'eigen' or 'eigen_benchmark'."""
    if split not in ("eigen", "eigen_benchmark"):
        raise ValueError("split must be eigen or eigen_benchmark")
    lines = readlines(os.path.join(split_dir, "test_files.txt"))
    gt_depths = []
    for line in lines:
        folder, frame_id, _ = line.split()
        frame_id = int(frame_id)
        if split == "eigen":
            calib_dir = os.path.join(data_path, folder.split("/")[0])
            velo = os.path.join(data_path, folder, "velodyne_points/data",
                                f"{frame_id:010d}.bin")
            gt = generate_depth_map(calib_dir, velo, 2, vel_depth=True)
        else:
            png = os.path.join(data_path, folder, "proj_depth", "groundtruth",
                               "image_02", f"{frame_id:010d}.png")
            gt = np.asarray(Image.open(png), dtype=np.float32) / 256.0
        gt_depths.append(gt.astype(np.float32))
    out = os.path.join(split_dir, "gt_depths.npz")
    # force a 1-D object array even when all GTs share a shape (a plain
    # np.array(..., dtype=object) would build a 3-D array of scalars)
    arr = np.empty(len(gt_depths), dtype=object)
    for i, g in enumerate(gt_depths):
        arr[i] = g
    np.savez_compressed(out, data=arr)
    return out
