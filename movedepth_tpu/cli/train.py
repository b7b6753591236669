"""Training entry point.

Usage (reference launch: train_movedepth.sh):
  python -m movedepth_tpu.cli.train --data_path /path/to/kitti_raw \
      --log_dir log/exp --model_name mdp --split eigen_zhou \
      --png --batch_size 24 --learning_rate 2e-4 \
      --splits_dir /path/to/splits

Multi-chip: no torch.distributed.launch equivalent is needed -- all local
devices form a 1-D data mesh automatically; multi-host runs call
jax.distributed.initialize first (see parallel/mesh.py).
"""

from __future__ import annotations

import argparse

import jax

from movedepth_tpu.cli.options import add_config_args, config_from_args
from movedepth_tpu.parallel import mesh as M
from movedepth_tpu.train.trainer import Trainer


def main(argv=None):
    parser = argparse.ArgumentParser(description="MoveDepth-TPU training")
    add_config_args(parser)
    parser.add_argument("--splits_dir", type=str, default=None,
                        help="directory containing <split>/train_files.txt")
    parser.add_argument("--multichip", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="shard the batch over all local devices")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler trace of N early steps")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    mesh = None
    if args.multichip and len(jax.devices()) > 1:
        mesh = M.make_mesh()
        assert cfg.batch_size % mesh.shape["data"] == 0, (
            "batch_size must divide evenly over the data mesh axis")

    split_dir = (f"{args.splits_dir}/{cfg.split}" if args.splits_dir else None)
    with M.activate_mesh(mesh):
        trainer = Trainer(cfg, split_dir=split_dir, mesh=mesh,
                          profile_steps=args.profile_steps)
        trainer.train()


if __name__ == "__main__":
    main()
