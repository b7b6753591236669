"""Evaluation entry point (reference launch: test_movedepth.sh).

  python -m movedepth_tpu.cli.evaluate --data_path /path/to/kitti_raw \
      --load_weights_folder log/exp/mdp/models/last \
      --eval_split eigen --splits_dir /path/to/splits --png

``load_weights_folder`` accepts either an Orbax checkpoint directory or a
reference folder of per-model torch .pth files (converted on the fly).
"""

from __future__ import annotations

import argparse
import os

import jax

from movedepth_tpu.cli.options import add_config_args, config_from_args
from movedepth_tpu.eval.evaluate import evaluate
from movedepth_tpu.models import build_models
from movedepth_tpu.train import state as S
from movedepth_tpu.train import checkpoints as C
from movedepth_tpu.train.torch_import import load_reference_checkpoint


def load_variables(cfg):
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    folder = cfg.load_weights_folder
    if folder is None:
        raise SystemExit("--load_weights_folder is required")
    if any(f.endswith(".pth") for f in os.listdir(folder)):
        for name, v in load_reference_checkpoint(folder, cfg).items():
            variables[name] = v
    else:
        params, stats = S.split_variables(variables)
        tx = S.create_optimizer(cfg, 1, params)
        template = S.TrainState(step=0, params=params, batch_stats=stats,
                                opt_state=tx.init(params))
        state = C.restore_checkpoint(folder, template)
        variables = S.combine_variables(state.params, state.batch_stats)
    return variables


def main(argv=None):
    parser = argparse.ArgumentParser(description="MoveDepth-TPU evaluation")
    add_config_args(parser)
    default_splits = os.path.join(os.path.dirname(__file__), "..", "splits")
    parser.add_argument("--splits_dir", type=str, default=default_splits,
                        help="defaults to the bundled split lists")
    parser.add_argument("--gt_path", type=str, default=None)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    variables = load_variables(cfg)
    split_dir = os.path.join(args.splits_dir, cfg.eval_split)
    evaluate(variables, cfg, cfg.data_path, split_dir, gt_path=args.gt_path,
             batch_size=cfg.batch_size, limit=args.limit)


if __name__ == "__main__":
    main()
