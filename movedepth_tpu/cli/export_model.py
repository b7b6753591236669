"""Serialize the inference graph for serving (jax.export / StableHLO).

Produces a self-contained serialized artifact of the jitted full-MVS (or
mono-only) forward with the trained weights baked in as constants -- the
TPU-world analog of a TorchScript/ONNX export (the reference has no
serving path at all). The artifact is loadable without the model code:

  from jax import export
  fn = export.deserialize(open("movedepth.bin", "rb").read())
  out = fn.call(color, K, inv_K)   # -> (disp_mono, depth)  /  MVS tuple

Usage:
  python -m movedepth_tpu.cli.export_model \
      --load_weights_folder log/exp/models/last \
      --out movedepth.bin [--mono] [--batch 1] [--platform tpu]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import export

from movedepth_tpu.cli.evaluate import load_variables
from movedepth_tpu.cli.options import add_config_args, config_from_args
from movedepth_tpu.models import build_models
from movedepth_tpu import pipeline as P


def build_export(cfg, variables, mono: bool, batch: int,
                 platforms=("tpu", "cpu")):
    """jax.export the inference fn; weights are closed-over constants."""
    models = build_models(cfg)
    h, w = cfg.height, cfg.width
    nf = 1 if mono else len(cfg.matching_ids)

    if mono:
        def fn(color, K, inv_K):
            out = P.forward_mono_infer(
                models, variables, {"color": color, "K": K, "inv_K": inv_K},
                cfg)
            return out["disp_mono"], out["depth_mono"]
    else:
        def fn(color, K, inv_K):
            out = P.forward_infer(
                models, variables, {"color": color, "K": K, "inv_K": inv_K},
                cfg)
            return out["disp_mono"], out["disp_mvs"], out["depth_mvs"]

    args = (
        jax.ShapeDtypeStruct((batch, nf, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch, 4, 4), jnp.float32),
    )
    return export.export(jax.jit(fn), platforms=platforms)(*args)


def main(argv=None):
    parser = argparse.ArgumentParser(description="MoveDepth-TPU export")
    add_config_args(parser)
    parser.add_argument("--out", type=str, default="movedepth.bin")
    parser.add_argument("--mono", action="store_true")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--platform", type=str, default="tpu,cpu",
                        help="comma-separated lowering targets")
    parser.add_argument("--check", action="store_true",
                        help="deserialize and run once on random input")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    variables = load_variables(cfg)
    exp = build_export(cfg, variables, args.mono, args.batch,
                       tuple(args.platform.split(",")))
    data = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB, "
          f"platforms={exp.platforms}", flush=True)

    if args.check:
        fn = export.deserialize(data)
        h, w = cfg.height, cfg.width
        nf = 1 if args.mono else len(cfg.matching_ids)
        rng = np.random.default_rng(0)
        color = jnp.asarray(
            rng.uniform(0, 1, (args.batch, nf, h, w, 3)).astype(np.float32))
        K = np.array([[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
        Kb = jnp.asarray(np.tile(K, (args.batch, 1, 1)))
        out = fn.call(color, Kb, jnp.linalg.inv(Kb))
        shapes = [tuple(o.shape) for o in out]
        print(f"roundtrip ok: outputs {shapes}", flush=True)


if __name__ == "__main__":
    main()
