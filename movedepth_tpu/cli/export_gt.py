"""GT export entry point (reference: movedepth/export_gt_depth.py).

  python -m movedepth_tpu.cli.export_gt --data_path /kitti_raw \
      --splits_dir /path/to/splits --split eigen
"""

from __future__ import annotations

import argparse
import os

from movedepth_tpu.eval.export_gt import export_gt_depths


def main(argv=None):
    parser = argparse.ArgumentParser(description="export GT depths")
    parser.add_argument("--data_path", type=str, required=True)
    default_splits = os.path.join(os.path.dirname(__file__), "..", "splits")
    parser.add_argument("--splits_dir", type=str, default=default_splits,
                        help="defaults to the bundled split lists")
    parser.add_argument("--split", type=str, required=True,
                        choices=["eigen", "eigen_benchmark"])
    args = parser.parse_args(argv)
    out = export_gt_depths(args.data_path,
                           os.path.join(args.splits_dir, args.split),
                           args.split)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
