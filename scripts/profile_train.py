"""Train-step stage attribution: fwd+bwd cost of each pipeline stage.

The axon TPU tunnel cannot export jax.profiler device traces, so the
backward pass is attributed the same way bench.py times the forward:
each stage runs standalone as value_and_grad inside a long/short
on-device lax.scan pair (differencing cancels host round trips), with
its inputs precomputed once by a stripped forward pass. The stage sum
approximates the full train step (optimizer + BN bookkeeping is the
remainder). Feeds PROFILE.md (round-1 VERDICT item 9).

Usage: python scripts/profile_train.py [batch_size ...]  (default: 8 16)
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _perturb(tree, carry):
    """Data-depend every float leaf on the scan carry (no hoisting)."""
    return jax.tree.map(
        lambda x: x + carry.astype(x.dtype) * 1e-20
        if jnp.issubdtype(x.dtype, jnp.inexact) else x, tree)


def scan_time(fn, *args, n_long=6, n_short=2):
    """ms/iter of fn(*args)->scalar, long/short scan differenced.
    EVERY float input is perturbed by the carry each iteration so XLA
    cannot hoist any loop-invariant subcomputation out of the scan
    (e.g. the trunk stage's sweep warp depends only on the feature
    inputs -- perturbing just the weights would let it hoist)."""

    def make(n):
        def outer(*args):
            def body(carry, _):
                out = fn(*(_perturb(a, carry) for a in args))
                return out.astype(jnp.float32), ()

            f, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return f

        return outer

    def timed(f):
        jf = jax.jit(f)
        float(jf(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jf(*args))
            best = min(best, time.time() - t0)
        return best

    ts = timed(make(n_short))
    tl = timed(make(n_long))
    return (tl - ts) / (n_long - n_short) * 1000.0


def stage_inputs(models, variables, batch, cfg):
    """Intermediates every stage needs (steps 1-9 of forward_train)."""

    def fn(variables, batch):
        rng = jax.random.PRNGKey(7)
        h, w = cfg.height, cfg.width
        fid_to_idx = {f: i for i, f in enumerate(cfg.frame_ids)}
        color_aug = batch["color_aug"]
        cam_T_cam, rel, _ = P.predict_poses(models, variables, batch, cfg,
                                            train=True)
        (ref_match, ref_ctx), _ = P._apply(models, variables, "mvs_encoder",
                                           color_aug[:, 0], train=True)
        src_matches = [
            P._apply(models, variables, "mvs_encoder",
                     color_aug[:, fid_to_idx[f]], train=True)[0][0]
            for f in cfg.matching_ids[1:]
        ]
        feats, _ = P._apply(models, variables, "mono_encoder",
                            color_aug[:, 0], train=True)
        disps, _ = P._apply(models, variables, "mono_depth", feats)
        from movedepth_tpu.ops.geometry import disp_to_depth
        disp0_full = P.resize_bilinear(disps[("disp", 0)], (h, w),
                                       align_corners=False)
        _, mono_depth0 = disp_to_depth(disp0_full[..., 0], cfg.min_depth,
                                       cfg.max_depth)
        disp_prior = lax.stop_gradient(
            disps[("disp", cfg.prior_scale)][..., 0])
        bins = P.compute_depth_bins(disp_prior, rel, jnp.asarray(True), cfg)
        K_p = P.scale_intrinsics(batch["K"], cfg.prior_scale)
        invK_p = jnp.linalg.inv(K_p)
        rng, sub = jax.random.split(rng)
        masked_img, _ = P.random_image_mask(sub, color_aug[:, 0],
                                            (h // 3, w // 3))
        (ref_aug, _), _ = P._apply(models, variables, "mvs_encoder",
                                   masked_img, train=True)
        depth_mvs, cost_prob, _, _ = P.mvs_depth_two_pass(
            models, variables, ref_match, ref_aug, src_matches, bins, K_p,
            invK_p, rel, cfg, train=True, remat=False)
        if cfg.convex_up:
            up_mask, _ = P._apply(models, variables, "up", ref_ctx)
            from movedepth_tpu.ops.upsample import convex_upsample
            depth_mvs_full = convex_upsample(depth_mvs, up_mask,
                                             cfg.prior_scale)
        else:
            depth_mvs_full = P.resize_bilinear(depth_mvs, (h, w),
                                               align_corners=True)
        ent = P.entropy(cost_prob, axis=1, keepdims=True)
        trust_mono, _ = P._apply(models, variables, "mask_cnn",
                                 jnp.transpose(ent, (0, 2, 3, 1)),
                                 train=True)
        trust_full = P.resize_bilinear(trust_mono, (h, w),
                                       align_corners=True)
        fused = ((1.0 - trust_full[..., 0])
                 * lax.stop_gradient(depth_mvs_full)
                 + trust_full[..., 0] * lax.stop_gradient(mono_depth0))
        return dict(cam_T_cam=cam_T_cam, rel=rel, ref_match=ref_match,
                    ref_aug=ref_aug, src_matches=src_matches, bins=bins,
                    K_p=K_p, invK_p=invK_p, disps=disps,
                    depth_mvs_full=depth_mvs_full, fused=fused,
                    masked_img=masked_img)

    return jax.jit(fn)(variables, batch)


def profile(batch_size):
    cfg = Config(batch_size=batch_size)
    heavy = batch_size > cfg.remat_batch_threshold
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size))
    log(f"== batch {batch_size} (heavy remat: {heavy}) -- computing "
        f"stage inputs")
    si = stage_inputs(models, variables, batch, cfg)

    def s(x):
        return jnp.mean(x.astype(jnp.float32))

    rows = []

    def add(name, fn, *args):
        ms = scan_time(fn, *args)
        rows.append((name, ms))
        log(f"{name}: {ms:.1f} ms")

    # -- stage fwd+bwd, matching the real step's remat choice
    def poses_loss(variables, batch):
        _, rel, _ = P.predict_poses(models, variables, batch, cfg,
                                    train=True, remat=heavy)
        return s(rel)

    add("poses fwd+bwd", lambda v, b: jax.value_and_grad(poses_loss)(
        v, b)[0], variables, batch)

    def enc_loss(variables, batch):
        color_aug = batch["color_aug"]
        fid_to_idx = {f: i for i, f in enumerate(cfg.frame_ids)}
        t = 0.0
        for img in ([color_aug[:, 0]]
                    + [color_aug[:, fid_to_idx[f]]
                       for f in cfg.matching_ids[1:]]
                    + [si["masked_img"]]):
            (m, c), _ = P._apply(models, variables, "mvs_encoder", img,
                                 train=True, remat=heavy)
            t = t + s(m) + s(c)
        feats, _ = P._apply(models, variables, "mono_encoder",
                            color_aug[:, 0], train=True, remat=heavy)
        disps, _ = P._apply(models, variables, "mono_depth", feats)
        return t + s(disps[("disp", 0)])

    add("encoders (mvs x4 + mono enc+dec) fwd+bwd",
        lambda v, b: jax.value_and_grad(enc_loss)(v, b)[0], variables,
        batch)

    def trunk_loss(variables, ref_match, ref_aug, src_matches):
        depth_mvs, cost_prob, depth_aug, _ = P.mvs_depth_two_pass(
            models, variables, ref_match, ref_aug, src_matches,
            si["bins"], si["K_p"], si["invK_p"], si["rel"], cfg,
            train=True, remat=heavy)
        return s(depth_mvs) + s(cost_prob) + s(depth_aug)

    add("mvs trunk (2-pass cv+reg3d) fwd+bwd",
        lambda v, rm, ra, sm: jax.value_and_grad(
            trunk_loss, argnums=(0, 1, 2, 3))(v, rm, ra, sm)[0],
        variables, si["ref_match"], si["ref_aug"], si["src_matches"])

    def photo_loss(disps, depth_mvs_full, fused, cam_T_cam):
        losses, _ = P.photometric_losses(
            disps, depth_mvs_full, fused, batch, cam_T_cam, cfg,
            jax.random.PRNGKey(9), mvs_mask=None, remat=heavy)
        return (losses["mono_loss"] + losses["mvs_loss"]
                + losses["fuse_reproj_loss"])

    add("photometric losses fwd+bwd",
        lambda d, dm, f, c: jax.value_and_grad(
            photo_loss, argnums=(0, 1, 2, 3))(d, dm, f, c)[0],
        si["disps"], si["depth_mvs_full"], si["fused"], si["cam_T_cam"])

    # -- whole-step reference points
    def fwd_only(variables, batch):
        total, _ = P.forward_train(models, variables, batch, cfg,
                                   jax.random.PRNGKey(3),
                                   use_z_bins=jnp.asarray(True))
        return total

    add("forward_train fwd only", fwd_only, variables, batch)

    state, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0),
                                     steps_per_epoch=100)
    step = S.make_train_step(models, cfg, tx)

    def full_step(state, batch):
        st2, losses, _ = step(state, batch, jax.random.PRNGKey(3),
                              jnp.asarray(True))
        # touch EVERY updated leaf (params + opt state): touching only a
        # few lets XLA DCE the other leaves' grad-correlation + Adam
        # update work, under-measuring the step by up to ~2x at batch 24
        touch = sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                    for l in jax.tree.leaves((st2.params, st2.opt_state)))
        return losses["loss"].astype(jnp.float32) + touch

    add("FULL train step", full_step, state, batch)

    print(f"\nbatch {batch_size} (heavy={heavy}):")
    for name, ms in rows:
        print(f"  {name:45s} {ms:8.1f} ms")
    stage_sum = sum(ms for name, ms in rows[:4])
    print(f"  {'stage sum (a-d)':45s} {stage_sum:8.1f} ms")
    return rows


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [8, 16]
    for bs in sizes:
        profile(bs)
