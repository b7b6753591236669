"""Fine-grained timing of the MVS trunk stages on the real TPU.

PROFILE.md's coarse table shows cv+reg3d+localmax ~= 169 ms at batch 128
while the standalone sweep kernel is ~61 ms and reg3d ~11 ms -- this
script isolates each stage with precomputed inputs so the gap can be
attributed. Same long/short lax.scan differencing as bench.py.

Usage: python scripts/profile_mvs.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu import pipeline as P
from movedepth_tpu.train import state as S
from movedepth_tpu.ops.costvolume import (
    localmax,
    schedule_depth_bins_z,
    sweep_grid,
)
from movedepth_tpu.ops.geometry import disp_to_depth
from movedepth_tpu.ops.pallas.sweep_warp import grid_to_pixel, sweep_warp_corr


def timed(fn, *args):
    jf = jax.jit(fn)
    float(jf(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(jf(*args))
        best = min(best, time.time() - t0)
    return best


def scan_ms(body, args, n_long=10, n_short=2):
    """body(*args, eps) -> scalar; eps makes iterations data-dependent."""

    def make(n):
        def fn(*args):
            def inner(carry, _):
                return body(*args, carry * 1e-20), ()

            f, _ = lax.scan(inner, jnp.float32(0), None, length=n)
            return f

        return fn

    ts = timed(make(n_short), *args)
    tl = timed(make(n_long), *args)
    return (tl - ts) / (n_long - n_short) * 1000.0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = Config()
    c2 = cfg.replace(frame_ids=cfg.matching_ids)
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    b = jax.tree.map(jnp.asarray, make_batch(cfg, batch))

    # ---- precompute every stage input once (host side, jitted)
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
        grid = sweep_grid(bins, K_p, invK_p, rel[:, 0])
        h, w = bins.shape[-2], bins.shape[-1]
        sx, sy = grid_to_pixel(grid, h, w)
        cor = sweep_warp_corr(mt[:, 1], mt[:, 0], sx, sy, c2.reg3d_c)
        return mt, rel, bins, K_p, invK_p, sx, sy, cor

    mt, rel, bins, K_p, invK_p, sx, sy, cor = jax.block_until_ready(
        prefix(variables, b))
    v3 = variables["reg3d"]
    h, w = bins.shape[-2], bins.shape[-1]

    def s(x):
        return jnp.mean(x).astype(jnp.float32)

    # ---- isolated stages
    def coords(bins, K_p, invK_p, rel, eps):
        g = sweep_grid(bins + eps, K_p, invK_p, rel[:, 0])
        sx, sy = grid_to_pixel(g, h, w)
        return s(sx) + s(sy)

    def kernel_only(mt, sx, sy, eps):
        out = sweep_warp_corr(mt[:, 1], mt[:, 0], sx + eps, sy,
                              cfg.reg3d_c)
        return s(out)

    def reg(v3, cor, eps):
        logits = models["reg3d"].apply(v3, cor + eps, False)
        return s(logits)

    def reg_softmax_localmax(v3, cor, bins, eps):
        logits = models["reg3d"].apply(v3, cor + eps, False)
        prob = jax.nn.softmax(logits, axis=1)
        d = localmax(prob, cfg.norm_radius, cfg.num_depth_bins,
                     1.0 / bins[:, -1], 1.0 / bins[:, 0])
        return s(d)

    def whole_trunk(v, mt, bins, K_p, invK_p, rel, eps):
        dm, prob, _ = P.mvs_depth_from_features(
            models, v, mt[:, 0] + eps, [mt[:, 1]], bins, K_p, invK_p, rel,
            c2, train=False, weight_axis="depth")
        return s(dm) + s(prob)

    from movedepth_tpu.ops.costvolume import fuse_frames

    def fuse_only(cor, eps):
        return s(fuse_frames([cor + eps], weight_axis="depth"))

    def softmax_localmax(cor, bins, eps):
        prob = jax.nn.softmax((cor + eps).mean(-1), axis=1)
        d = localmax(prob, cfg.norm_radius, cfg.num_depth_bins,
                     1.0 / bins[:, -1], 1.0 / bins[:, 0])
        return s(d)

    # ---- cumulative prefixes: localize composition overhead (layout
    # copies / lost fusion) that the isolated stages above cannot see
    def cum_kernel(mt, bins, K_p, invK_p, rel, eps):
        g = sweep_grid(bins + eps, K_p, invK_p, rel[:, 0])
        sx, sy = grid_to_pixel(g, h, w)
        out = sweep_warp_corr(mt[:, 1], mt[:, 0], sx, sy, cfg.reg3d_c)
        return s(out)

    def cum_fuse(mt, bins, K_p, invK_p, rel, eps):
        g = sweep_grid(bins + eps, K_p, invK_p, rel[:, 0])
        sx, sy = grid_to_pixel(g, h, w)
        out = sweep_warp_corr(mt[:, 1], mt[:, 0], sx, sy, cfg.reg3d_c)
        return s(fuse_frames([out], weight_axis="depth"))

    def cum_reg(v, mt, bins, K_p, invK_p, rel, eps):
        g = sweep_grid(bins + eps, K_p, invK_p, rel[:, 0])
        sx, sy = grid_to_pixel(g, h, w)
        out = sweep_warp_corr(mt[:, 1], mt[:, 0], sx, sy, cfg.reg3d_c)
        cor = fuse_frames([out], weight_axis="depth")
        logits = models["reg3d"].apply(v["reg3d"], cor, False)
        return s(logits)

    stages = [
        ("coords (sweep_grid+to_pixel)", coords, (bins, K_p, invK_p, rel)),
        ("sweep_warp_corr kernel", kernel_only, (mt, sx, sy)),
        ("fuse_frames(single)", fuse_only, (cor,)),
        ("softmax+localmax", softmax_localmax, (cor, bins)),
        ("reg3d", reg, (v3, cor)),
        ("reg3d+softmax+localmax", reg_softmax_localmax, (v3, cor, bins)),
        ("cum: coords+kernel", cum_kernel, (mt, bins, K_p, invK_p, rel)),
        ("cum: +fuse", cum_fuse, (mt, bins, K_p, invK_p, rel)),
        ("cum: +reg3d", cum_reg, (variables, mt, bins, K_p, invK_p, rel)),
        ("mvs_depth_from_features", whole_trunk,
         (variables, mt, bins, K_p, invK_p, rel)),
    ]
    for name, fn, args in stages:
        ms = scan_ms(fn, args)
        print(f"{name}: {ms:.2f} ms @ batch {batch}", flush=True)


if __name__ == "__main__":
    main()
