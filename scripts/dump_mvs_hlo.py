"""Dump compiled HLO for the composed MVS trunk to find layout copies.

Compares the composed chain (coords -> sweep_warp_corr -> fuse -> reg3d)
against isolated reg3d; prints every fusion/copy/transpose/bitcast whose
operand exceeds 10 MB, to attribute the +18 ms composition overhead seen
by scripts/profile_mvs.py.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu import pipeline as P
from movedepth_tpu.train import state as S
from movedepth_tpu.ops.costvolume import (
    fuse_frames,
    schedule_depth_bins_z,
    sweep_grid,
)
from movedepth_tpu.ops.geometry import disp_to_depth
from movedepth_tpu.ops.pallas.sweep_warp import grid_to_pixel, sweep_warp_corr


def big_ops(txt, min_mb=10.0):
    """Yield (kind, shape, est MB) for big copy-like HLO ops."""
    pat = re.compile(
        r"^\s*%?([\w.-]+) = (\w+\[[\d,]+\]\{[\d,]+\}) (copy|transpose|"
        r"bitcast|fusion|custom-call)\(", re.M)
    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "f16": 2, "pred": 1,
                "u32": 4, "s8": 1, "u8": 1}
    for m in pat.finditer(txt):
        shape = m.group(2)
        kind = m.group(3)
        dm = re.match(r"(\w+)\[([\d,]+)\]", shape)
        if not dm:
            continue
        dt = dm.group(1)
        n = 1
        for x in dm.group(2).split(","):
            n *= int(x)
        mb = n * dt_bytes.get(dt, 4) / 1e6
        if mb >= min_mb:
            yield kind, shape, mb, m.group(1)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = Config()
    c2 = cfg.replace(frame_ids=cfg.matching_ids)
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    b = jax.tree.map(jnp.asarray, make_batch(cfg, batch))

    @jax.jit
    def prefix(v, b):
        f = models["mono_encoder"].apply(v["mono_encoder"], b["color"][:, 0],
                                         False)
        d = models["mono_depth"].apply(v["mono_depth"], f)
        eb = dict(b)
        eb["color_aug"] = b["color"]
        _, rel, _ = P.predict_poses(models, v, eb, c2, train=False)
        bsz = b["color"].shape[0]
        m = len(c2.matching_ids)
        stacked = b["color"][:, :m].reshape((bsz * m,) + b["color"].shape[2:])
        mt, _ = models["mvs_encoder"].apply(v["mvs_encoder"], stacked, False)
        mt = mt.reshape((bsz, m) + mt.shape[1:])
        disp_prior = d[("disp", c2.prior_scale)][..., 0]
        _, depth_prior = disp_to_depth(disp_prior, c2.min_depth, c2.max_depth)
        z = c2.z_scale * rel[:, 0, 2, 3]
        bins = schedule_depth_bins_z(depth_prior, c2.num_depth_bins,
                                     c2.depth_bin_fac, z[:, None, None],
                                     c2.schedule_type)
        K_p = P.scale_intrinsics(b["K"], c2.prior_scale)
        invK_p = jnp.linalg.inv(K_p)
        g = sweep_grid(bins, K_p, invK_p, rel[:, 0])
        h, w = bins.shape[-2], bins.shape[-1]
        sx, sy = grid_to_pixel(g, h, w)
        cor = sweep_warp_corr(mt[:, 1], mt[:, 0], sx, sy, c2.reg3d_c)
        return mt, rel, bins, K_p, invK_p, cor

    mt, rel, bins, K_p, invK_p, cor = jax.block_until_ready(
        prefix(variables, b))
    h, w = bins.shape[-2], bins.shape[-1]

    def cum_reg(v, mt, bins, K_p, invK_p, rel):
        g = sweep_grid(bins, K_p, invK_p, rel[:, 0])
        sx, sy = grid_to_pixel(g, h, w)
        out = sweep_warp_corr(mt[:, 1], mt[:, 0], sx, sy, cfg.reg3d_c)
        c = fuse_frames([out], weight_axis="depth")
        return models["reg3d"].apply(v["reg3d"], c, False)

    def reg_only(v, cor):
        return models["reg3d"].apply(v["reg3d"], cor, False)

    for name, fn, args in [
        ("cum_reg", cum_reg, (variables, mt, bins, K_p, invK_p, rel)),
        ("reg_only", reg_only, (variables, cor)),
    ]:
        txt = jax.jit(fn).lower(*args).compile().as_text()
        print(f"==== {name}: big copy-like ops ====", flush=True)
        tot = {}
        for kind, shape, mb, nm in big_ops(txt):
            print(f"  {kind:12s} {mb:9.1f} MB  {shape}  %{nm}")
            tot[kind] = tot.get(kind, 0.0) + mb
        print("  totals:", {k: round(v) for k, v in tot.items()})


if __name__ == "__main__":
    main()
