"""The MoveDepth forward/loss pipeline as pure functions.

Functional re-design of the reference's Trainer.process_batch and the eval
inference loop (reference: movedepth/trainer.py:297-442,445-468,491-724;
movedepth/evaluate_depth.py:181-253). One jitted call contains the pose
nets, mono path, both plane-sweep cost-volume passes, the fusion head and
every loss -- XLA sees the whole step and fuses across module boundaries.

Batch layout (NHWC, frames stacked on axis 1 in ``cfg.frame_ids`` order):
  color      (B, F, H, W, 3)   raw frames at full resolution
  color_aug  (B, F, H, W, 3)   jittered frames (== color at eval)
  color_pyr_s (B, H/2^s, W/2^s, 3) frame-0 pyramid for smooth loss, s=1..3
  K, inv_K   (B, 4, 4)         full-resolution intrinsics
  relative_pose (B, F-1, 4, 4) optional: precomputed poses (load_pose mode)

Scale-s intrinsics are derived in-graph (rows 0-1 divided by 2^s), matching
the host-side per-scale K of the reference dataset
(reference: datasets/mono_dataset.py:208-218).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from movedepth_tpu.config import Config
from movedepth_tpu.ops.geometry import (
    backproject,
    disp_to_depth,
    project,
    project_pixel,
    transformation_from_parameters,
)
from movedepth_tpu.ops.sampling import (
    _sample_one,
    resize_bilinear,
    stack_corners,
)
from movedepth_tpu.ops.layout import fold_image, unfold_image
from movedepth_tpu.ops.losses import (
    entropy,
    masked_mean,
    min_reprojection_with_automask,
    min_reprojection_with_automask_planar,
    reprojection_loss,
    reprojection_loss_folded,
    smooth_loss,
    smooth_loss_planar,
    ssim,
)
from movedepth_tpu.ops.costvolume import (
    fuse_frames,
    localmax,
    plane_sweep_costvol,
    reduce_cost_groups,
    schedule_depth_bins,
    schedule_depth_bins_z,
)
from movedepth_tpu.ops.upsample import convex_upsample
from movedepth_tpu.ops.masking import random_image_mask
from movedepth_tpu.parallel.mesh import constrain


# ----------------------------------------------------------------- utilities

def scale_intrinsics(K, scale: int):
    """K at pyramid level ``scale``: focal/principal rows divided by 2^s."""
    if scale == 0:
        return K
    s = 1.0 / (2 ** scale)
    return K.at[..., 0:2, :].multiply(s)


def _apply(models, variables, name, *args, train=False, remat=False):
    """Run one sub-model; returns (outputs, batch_stats_updates or None).

    ``remat=True`` rematerializes the sub-model in the backward pass
    (jax.checkpoint): used for the encoders, whose conv activations
    otherwise dominate the train-step HBM footprint (XLA lane-pads the
    small-channel FPN/cost-volume tensors 4-8x).
    """
    if remat and train:
        inner = lambda v, *a: _apply(models, {name: v}, name, *a,
                                     train=train)
        return jax.checkpoint(inner)(variables[name], *args)
    model = models[name]
    v = variables[name]
    if train and "batch_stats" in v:
        out, updates = model.apply(v, *args, True, mutable=["batch_stats"])
        return out, updates["batch_stats"]
    if _takes_train_flag(name):
        return model.apply(v, *args, False), None
    return model.apply(v, *args), None


_NO_TRAIN_FLAG = {"mono_depth", "pose", "up"}


def _takes_train_flag(name: str) -> bool:
    return name not in _NO_TRAIN_FLAG


# -------------------------------------------------------------------- poses

def predict_poses(models, variables, batch, cfg: Config, train: bool,
                  remat: bool = False):
    """Pairwise pose prediction (reference: movedepth/trainer.py:445-468).

    Returns ({frame_id: cam_T_cam (B,4,4)}, relative_poses (B, M, 4, 4),
    batch_stats updates). relative_poses are stop-gradiented copies for the
    matching frames, like the reference's detached ``relative_pose`` inputs.
    """
    updates = {}
    color_aug = batch["color_aug"]
    fid_to_idx = {f: i for i, f in enumerate(cfg.frame_ids)}
    cam_T_cam = {}
    for f_i in cfg.frame_ids[1:]:
        if f_i < 0:
            pair = jnp.concatenate(
                [color_aug[:, fid_to_idx[f_i]], color_aug[:, 0]], axis=-1)
        else:
            pair = jnp.concatenate(
                [color_aug[:, 0], color_aug[:, fid_to_idx[f_i]]], axis=-1)
        feats, bs1 = _apply(models, variables, "pose_encoder", pair,
                            train=train, remat=remat)
        (aa, tr), _ = _apply(models, variables, "pose", [feats], train=train)
        cam_T_cam[f_i] = transformation_from_parameters(
            aa[:, 0, 0], tr[:, 0, 0], invert=(f_i < 0))
        if bs1 is not None:
            updates["pose_encoder"] = bs1
    rel = jnp.stack(
        [lax.stop_gradient(cam_T_cam[f]) for f in cfg.matching_ids[1:]],
        axis=1,
    )
    return cam_T_cam, rel, updates


def poses_from_batch(batch, cfg: Config):
    """load_pose mode: poses come from the dataset (DVSO), not PoseNet."""
    rel_all = batch["relative_pose"]  # (B, F-1, 4, 4) in frame_ids[1:] order
    cam_T_cam = {f: rel_all[:, i] for i, f in enumerate(cfg.frame_ids[1:])}
    midx = [cfg.frame_ids[1:].index(f) for f in cfg.matching_ids[1:]]
    rel = jnp.stack([rel_all[:, i] for i in midx], axis=1)
    return cam_T_cam, rel, {}


# ---------------------------------------------------------------- MVS branch

def _constrain_volume(cor, cfg: Config):
    """Shard the (B, D, H, W, G) cost volume over the mesh: batch on
    'data', plus the cfg.model_shard_axis dimension on 'model' (tensor
    parallelism the reference cannot express; no-op without an active
    mesh / with model=1). Axis choice audited by
    scripts/dump_sharded_hlo.py -- see config.model_shard_axis."""
    spec = {
        "height": ("data", None, "model"),
        "depth": ("data", "model"),
        "groups": ("data", None, None, None, "model"),
        "none": ("data",),
    }[cfg.model_shard_axis]
    return constrain(cor, *spec)


def _use_pallas_warp(cfg: Config, train: bool) -> bool:
    """The fused Pallas warp serves both paths on TPU (custom VJP supplies
    the src-feature gradient as transposed one-hot matmuls)."""
    del train
    return cfg.pallas_warp and jax.default_backend() == "tpu"


def mvs_depth_from_features(models, variables, ref_match_feat,
                            src_match_feats, depth_bins, K_p, invK_p, rel,
                            cfg: Config, train: bool,
                            weight_axis: str = "group"):
    """Cost volume -> regularizer -> softmax prob -> localmax depth.

    (reference: movedepth/trainer.py:349-371 / evaluate_depth.py:225-245)
    Returns (depth_mvs (B,h,w), cost_prob (B,D,h,w), batch_stats updates).
    """
    use_pallas = _use_pallas_warp(cfg, train)
    if use_pallas:
        from movedepth_tpu.ops.costvolume import sweep_grid
        from movedepth_tpu.ops.pallas.sweep_warp import (
            grid_to_pixel,
            sweep_warp,
            sweep_warp_corr,
        )
    rw = cfg.sweep_row_window or None
    cw = cfg.sweep_col_window or None
    k_per_g = ref_match_feat.shape[-1] // cfg.reg3d_c
    can_fuse = not train and k_per_g & (k_per_g - 1) == 0
    costs = []
    for f_idx in range(len(cfg.matching_ids) - 1):
        if use_pallas:
            h, w = depth_bins.shape[-2], depth_bins.shape[-1]
            grid = sweep_grid(depth_bins, K_p, invK_p, rel[:, f_idx])
            sx, sy = grid_to_pixel(grid, h, w)
            if can_fuse:
                # inference: warp+correlate+group-reduce in ONE kernel
                costs.append(sweep_warp_corr(
                    src_match_feats[f_idx], ref_match_feat, sx, sy,
                    cfg.reg3d_c, row_window=rw, col_window=cw))
                continue
            warped = sweep_warp(src_match_feats[f_idx], sx, sy,
                                row_window=rw, col_window=cw)
            cv = warped * ref_match_feat[:, None]
        else:
            cv = plane_sweep_costvol(
                ref_match_feat, src_match_feats[f_idx], K_p, invK_p,
                depth_bins, rel[:, f_idx],
            )
        costs.append(reduce_cost_groups(cv, cfg.reg3d_c))
    cor = fuse_frames(costs, weight_axis=weight_axis)  # (B, D, h, w, G)
    cor = _constrain_volume(cor, cfg)

    logits, bs = _apply(models, variables, "reg3d", cor, train=train)
    cost_prob = jax.nn.softmax(logits, axis=1)  # (B, D, h, w)
    depth_mvs = localmax(
        cost_prob, cfg.norm_radius, cfg.num_depth_bins,
        1.0 / depth_bins[:, -1], 1.0 / depth_bins[:, 0],
    )
    updates = {"reg3d": bs} if bs is not None else {}
    return depth_mvs, cost_prob, updates


def mvs_depth_two_pass(models, variables, ref_a, ref_b, src_match_feats,
                       depth_bins, K_p, invK_p, rel, cfg: Config,
                       train: bool, remat: bool = True):
    """Main + masked-augmentation cost volumes sharing ONE sweep warp.

    The reference recomputes the full plane-sweep for the masked pass
    (movedepth/trainer.py:374-403), but the warp depends only on the
    SOURCE features and the coordinates -- the reference feature enters
    as a per-pixel multiply. So: warp once (the expensive part), correlate
    with both refs, and regularize each volume separately (keeping the
    reference's per-pass BN normalization semantics).

    With ``remat`` the whole trunk is rematerialized (jax.checkpoint):
    its backward activations are ~10 cost-volume-sized reg3d tensors that
    XLA lane-pads 4x (~5 GB at batch 32, the round-1 OOM wall), while
    recomputing the trunk costs only ~2 sweep-kernel launches + 2 reg3d
    applies. Returns (depth_a, cost_prob_a, depth_b, batch_stats updates).
    """
    use_pallas = _use_pallas_warp(cfg, train)

    def trunk(variables, ref_a, ref_b, src_match_feats, depth_bins, K_p,
              invK_p, rel):
        if use_pallas:
            from movedepth_tpu.ops.costvolume import sweep_grid
            from movedepth_tpu.ops.pallas.sweep_warp import (
                grid_to_pixel,
                sweep_warp,
            )
        rw = cfg.sweep_row_window or None
        cw = cfg.sweep_col_window or None
        costs_a = []
        costs_b = []
        for f_idx in range(len(cfg.matching_ids) - 1):
            if use_pallas:
                h, w = depth_bins.shape[-2], depth_bins.shape[-1]
                grid = sweep_grid(depth_bins, K_p, invK_p, rel[:, f_idx])
                sx, sy = grid_to_pixel(grid, h, w)
                warped = sweep_warp(src_match_feats[f_idx], sx, sy,
                                    row_window=rw, col_window=cw)
            else:
                from movedepth_tpu.ops.costvolume import plane_sweep_warp
                warped = plane_sweep_warp(src_match_feats[f_idx], K_p,
                                          invK_p, depth_bins, rel[:, f_idx])
            costs_a.append(reduce_cost_groups(warped * ref_a[:, None],
                                              cfg.reg3d_c))
            costs_b.append(reduce_cost_groups(warped * ref_b[:, None],
                                              cfg.reg3d_c))
        updates = {}
        out = []
        for cor in (fuse_frames(costs_a), fuse_frames(costs_b)):
            cor = _constrain_volume(cor, cfg)
            logits, bs = _apply(models, variables, "reg3d", cor,
                                train=train)
            cost_prob = jax.nn.softmax(logits, axis=1)  # (B, D, h, w)
            depth = localmax(
                cost_prob, cfg.norm_radius, cfg.num_depth_bins,
                1.0 / depth_bins[:, -1], 1.0 / depth_bins[:, 0],
            )
            out.append((depth, cost_prob))
            if bs is not None:
                updates["reg3d"] = bs  # last write wins, like the
                # reference's second sequential pass (see PARITY.md)
        return out[0][0], out[0][1], out[1][0], updates

    if remat:
        trunk = jax.checkpoint(trunk)
    return trunk(variables, ref_a, ref_b, src_match_feats, depth_bins,
                 K_p, invK_p, rel)


def compute_depth_bins(disp_prior, rel, use_z_bins, cfg: Config):
    """Epoch-gated bin scheduler (reference: movedepth/trainer.py:333-346).

    ``use_z_bins`` is a traced boolean (epoch > ztrans_start_epc); both
    schedules are cheap elementwise math so we compute both and select,
    keeping the train step retrace-free across epochs.
    """
    _, depth_prior = disp_to_depth(disp_prior, cfg.min_depth, cfg.max_depth)
    plain = schedule_depth_bins(
        depth_prior, cfg.num_depth_bins, cfg.depth_bin_fac, cfg.schedule_type)
    z = cfg.z_scale * rel[:, 0, 2, 3]  # (B,) z-translation, first match frame
    zbins = schedule_depth_bins_z(
        depth_prior, cfg.num_depth_bins, cfg.depth_bin_fac,
        z[:, None, None], cfg.schedule_type)
    return jnp.where(use_z_bins, zbins, plain)


# ----------------------------------------------------------------- loss core

def _multi_warp(src, grid, use_pallas=False, col_window=384, folded=False,
                target=None):
    """Warp one source image stack with K grids each: (B, K, H, W, 3),
    or -- with ``folded`` -- the kernel-native folded-planar layout
    (B, K, H*4, W) (ops/layout.py; cp=4, pad channel zero).

    On TPU (``use_pallas``) this is the one-hot MXU kernel with a custom
    coordinate VJP (ops/pallas/image_warp.py) -- the depth/pose training
    signal flows through the grid here, unlike the cost-volume sweep.
    With ``target`` (Pallas path only) the kernel's L1 epilogue also
    returns the per-pixel photometric L1 map (B, K, H, W) (cfg.kernel_l1).

    XLA fallback: chunked over the batch so each gather op stays under
    ~6M rows: XLA's TPU gather lowering degrades ~3x beyond that (measured
    cliff between 8 and 16 effective batch at 6 x 192x640), so large
    batches run as a lax.map over fixed-size chunks -- restores linear
    batch scaling.
    """
    if use_pallas:
        from movedepth_tpu.ops.pallas.image_warp import warp_images_border
        from movedepth_tpu.ops.pallas.sweep_warp import grid_to_pixel
        h, w = src.shape[1], src.shape[2]
        sx, sy = grid_to_pixel(grid, h, w)
        return warp_images_border(src, sx, sy, col_window=col_window,
                                  fold_out=folded, target=target)
    assert target is None, "kernel L1 epilogue requires the Pallas warp"
    if folded:
        from movedepth_tpu.ops.layout import fold_image
        return fold_image(
            _multi_warp(src, grid, use_pallas=False,
                        col_window=col_window), 4)
    b = src.shape[0]
    chunk = max(d for d in range(1, min(8, b) + 1) if b % d == 0)

    def one(args):
        s_, g_ = args
        corners = jax.vmap(stack_corners)(s_)

        def samp(im, co, g):
            return jax.vmap(
                lambda gg: _sample_one(im, gg[..., 0], gg[..., 1], "border",
                                       True, co))(g)

        return jax.vmap(samp)(s_, corners, g_)

    if chunk == b:
        return one((src, grid))
    sc = src.reshape(b // chunk, chunk, *src.shape[1:])
    gc = grid.reshape(b // chunk, chunk, *grid.shape[1:])
    out = lax.map(one, (sc, gc))
    return out.reshape(b, *out.shape[2:])

def photometric_losses(disps, depth_mvs_full, fused_depth, batch, cam_T_cam,
                       cfg: Config, rng, mvs_mask=None, remat: bool = False):
    """All reprojection losses in one fused multi-warp per source frame.

    Semantically identical to the reference's three loss passes
    (mono per-scale min-reprojection + automask + smoothness,
    trainer.py:675-724; MVS reprojection, :621-673; pure-L1 fuse,
    :569-612) but restructured TPU-first: the K = num_scales + 2 depth
    maps (mono scales, MVS, fused) are backprojected and warped with ONE
    gather per source frame (shared corner table), and SSIM/L1 run over
    the folded (B*K) batch, cutting kernel count ~6x.

    With ``cfg.planar_losses`` (a tested OPTION; default False -- the
    chip A/B measured the NHWC form 4-19% faster because XLA already
    fuses the SSIM/L1 chain into the warp epilogue and the fold adds
    reshape traffic on the backward, PROFILE.md 2026-08-19) the whole
    SSIM/L1/automask/smoothness chain instead runs on the folded-planar
    layout (ops/layout.py): channels in sublanes, W in lanes. Identical
    math (parity test:
    tests/test_pipeline.py::test_photometric_losses_planar_parity).

    Pose gradients: live T for the mono scales, detached T for MVS/fused
    (reference: trainer.py:499,573). ``mvs_mask`` optionally applies the
    conf/dist/geo masks (reference: trainer.py:649-657).
    Returns (losses dict, warped scale-0 images per frame for logging).
    """
    if cfg.planar_losses:
        return _photometric_losses_planar(disps, depth_mvs_full,
                                          fused_depth, batch, cam_T_cam,
                                          cfg, rng, mvs_mask, remat)
    color = batch["color"]
    target = color[:, 0]
    b, h, w = target.shape[0], target.shape[1], target.shape[2]
    K0 = batch["K"]
    invK0 = batch["inv_K"]
    fid_to_idx = {f: i for i, f in enumerate(cfg.frame_ids)}
    nsc = cfg.num_scales
    k_all = nsc + 2

    # full-res depth per mono scale (bilinear, align_corners=False;
    # reference trainer.py:512)
    depth_scales = []
    for sc in cfg.scales:
        dfull = resize_bilinear(disps[("disp", sc)], (h, w),
                                align_corners=False)
        _, d = disp_to_depth(dfull[..., 0], cfg.min_depth, cfg.max_depth)
        depth_scales.append(d)
    depth_all = jnp.stack(depth_scales + [depth_mvs_full, fused_depth],
                          axis=1)  # (B, K, H, W)

    # With ``remat`` the whole per-frame backproject -> project -> warp ->
    # SSIM/L1 chain is rematerialized: its intermediates (homogeneous
    # points 4x, the projection grids -- which the warp VJP would
    # otherwise keep as ~5x-lane-padded residuals -- the warped stacks and
    # the SSIM temporaries) are ~2 GB of the backward footprint at batch
    # 32, while recomputing the chain is one extra warp-kernel launch per
    # frame; residuals shrink to depth_all + the pose matrices. Without
    # it, only the cheap gather-free SSIM tail is rematerialized.
    use_pl = _use_pallas_warp(cfg, False)

    def _reproj(wf, tf):
        l1 = jnp.mean(jnp.abs(tf - wf), axis=-1, keepdims=True)
        if cfg.no_ssim:
            return l1, l1
        sm = jnp.mean(ssim(wf, tf), axis=-1, keepdims=True)
        return cfg.ssim_lw * sm + (1.0 - cfg.ssim_lw) * l1, l1

    def _frame_block(depth_all, T_all, K0, invK0, src, target):
        pts = backproject(depth_all, invK0[:, None])  # (B, K, 4, HW)
        grid = project(pts, K0[:, None], T_all, h, w)  # (B, K, H, W, 2)
        # These full-res warps are the train step's hottest op. The XLA
        # gather formulation is ROW-RATE-bound on TPU (~127M rows/s), so
        # on TPU they run as the border-mode one-hot MXU kernel with a
        # custom coordinate VJP (ops/pallas/image_warp.py).
        #
        # FOLDED checkpoint boundary: the warp returns the kernel's own
        # dense folded-planar buffer (B, K, H*4, W) and the NHWC
        # transpose + SSIM/L1 tail is rematerialized from it -- so the
        # residual XLA saves for the backward is that dense buffer, not
        # the 5.3-7.1x-padded NHWC copy it used to lay batch-minor at
        # this boundary (the top train-step residual, PROFILE.md
        # 2026-08-19; the earlier FLAT rank-2 boundary attempt lost
        # because un-flattening rebuilt the padded layout -- the folded
        # form unfolds with one plain transpose XLA fuses into the tail).
        # cfg.kernel_l1: the warp kernel's epilogue emits the L1 map too
        # (the warped stack is not re-read from HBM for the L1 tail, and
        # d l1/d coords rides the same VJP launch); the SSIM part of the
        # reprojection still reads the warped stack.
        k_l1 = None
        if cfg.kernel_l1 and use_pl:
            warped_f, k_l1 = _multi_warp(src, grid, use_pallas=True,
                                         col_window=cfg.warp_col_window,
                                         folded=True, target=target)
        else:
            warped_f = _multi_warp(src, grid, use_pallas=use_pl,
                                   col_window=cfg.warp_col_window,
                                   folded=True)

        def _tail(warped_f, target, k_l1):
            from movedepth_tpu.ops.layout import unfold_image
            warped = unfold_image(warped_f, 3)  # (B, K, H, W, 3)
            wf = warped.reshape(b * k_all, h, w, 3)
            tf = jnp.broadcast_to(target[:, None],
                                  (b, k_all, h, w, 3)).reshape(wf.shape)
            if k_l1 is None:
                rp, l1 = _reproj(wf, tf)
            else:
                l1 = k_l1.reshape(b * k_all, h, w, 1)
                if cfg.no_ssim:
                    rp = l1
                else:
                    sm = jnp.mean(ssim(wf, tf), axis=-1, keepdims=True)
                    rp = cfg.ssim_lw * sm + (1.0 - cfg.ssim_lw) * l1
            return (rp.reshape(b, k_all, h, w, 1),
                    l1.reshape(b, k_all, h, w, 1), warped[:, 0])

        if remat:  # the whole block is already rematerialized outside
            return _tail(warped_f, target, k_l1)
        return jax.checkpoint(_tail)(warped_f, target, k_l1)

    if remat:
        _frame_block = jax.checkpoint(_frame_block)

    mono_reproj = []  # per frame: (B, nsc, H, W, 1)
    mvs_reproj = []
    fuse_reproj = []
    warped_log = {}
    for f in cfg.frame_ids[1:]:
        T_live = cam_T_cam[f]
        T_det = lax.stop_gradient(T_live)
        T_all = jnp.stack([T_live] * nsc + [T_det, T_det], axis=1)
        src = color[:, fid_to_idx[f]]
        rp, l1, w0 = _frame_block(depth_all, T_all, K0, invK0, src, target)
        warped_log[f] = w0
        mono_reproj.append(rp[:, :nsc])
        mvs_reproj.append(rp[:, nsc])
        fuse_reproj.append(l1[:, nsc + 1])  # fuse uses ssim_lw=0 == pure L1

    losses: Dict[str, Any] = {}

    # ---- mono: per-scale min-reprojection + automask + smoothness
    ident = jnp.concatenate(
        [
            reprojection_loss(color[:, fid_to_idx[f]], target, cfg.ssim_lw,
                              not cfg.no_ssim)
            for f in cfg.frame_ids[1:]
        ],
        axis=-1,
    )
    # monodepth2 --avg_reprojection: mean over source frames instead of
    # the per-pixel min (the automask then compares the two averages).
    # Declared-but-dead in the reference (options.py:150); live here.
    if cfg.avg_reprojection:
        ident = jnp.mean(ident, axis=-1, keepdims=True)
    total = 0.0
    for k, sc in enumerate(cfg.scales):
        reprojs = jnp.concatenate([m[:, k] for m in mono_reproj], axis=-1)
        if cfg.avg_reprojection:
            reprojs = jnp.mean(reprojs, axis=-1, keepdims=True)
        if not cfg.disable_automasking:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, ident.shape[:-1] + (1,))
            reproj, mask = min_reprojection_with_automask(reprojs, ident,
                                                          noise)
        else:
            reproj = jnp.min(reprojs, axis=-1, keepdims=True)
            mask = jnp.ones_like(reproj)
        rl = masked_mean(reproj, mask)

        disp = disps[("disp", sc)]
        color_s = target if sc == 0 else batch[f"color_pyr_{sc}"]
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        sl = smooth_loss(disp / (mean_disp + 1e-7), color_s)
        losses[f"mono_smooth_loss/{sc}"] = sl
        scale_loss = rl + cfg.disparity_smoothness * sl / (2 ** sc)
        losses[f"loss/{sc}"] = scale_loss
        total = total + scale_loss
    losses["mono_loss"] = total / nsc

    # ---- MVS: min over frames; optional conf/dist/geo masks. The
    # reference's mvs automask is computed then overwritten with ones
    # (trainer.py:641-647), so it is intentionally not computed here.
    reproj = jnp.min(jnp.concatenate(mvs_reproj, axis=-1), axis=-1,
                     keepdims=True)
    mask = jnp.ones_like(reproj) if mvs_mask is None else mvs_mask
    losses["mvs_reproj_loss"] = masked_mean(reproj, mask)
    mvs_total = losses["mvs_reproj_loss"]
    if cfg.mvs_smooth_loss:
        d = depth_mvs_full[..., None]
        mean_d = jnp.mean(d, axis=(1, 2), keepdims=True)
        sl = smooth_loss(d / (mean_d + 1e-7), target)
        losses["mvs_smooth_loss/0"] = sl
        mvs_total = mvs_total + cfg.disparity_smoothness * sl
    losses["mvs_loss"] = mvs_total

    # ---- fuse: pure L1, optional automask (reference trainer.py:592-604)
    fuse_stack = jnp.concatenate(fuse_reproj, axis=-1)
    if cfg.mask_mvs_auto:
        ident_l1 = jnp.concatenate(
            [
                reprojection_loss(color[:, fid_to_idx[f]], target,
                                  ssim_lw=0.0, use_ssim=not cfg.no_ssim)
                for f in cfg.frame_ids[1:]
            ],
            axis=-1,
        )
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, ident_l1.shape[:-1] + (1,))
        reproj, mask = min_reprojection_with_automask(fuse_stack, ident_l1,
                                                      noise)
    else:
        reproj = jnp.min(fuse_stack, axis=-1, keepdims=True)
        mask = jnp.ones_like(reproj)
    losses["fuse_reproj_loss"] = masked_mean(reproj, mask)
    return losses, warped_log


def _photometric_losses_planar(disps, depth_mvs_full, fused_depth, batch,
                               cam_T_cam, cfg: Config, rng, mvs_mask,
                               remat: bool):
    """Folded-planar implementation of :func:`photometric_losses`.

    Same structure and math as the NHWC body above; every image/loss map
    is held channel-folded ((B, H*cp, W), ops/layout.py) or dense
    ((B, H, W)), and the frame axis stacks on axis 1 instead of the
    minor dim. RNG draw order/shapes match the NHWC path exactly.
    """
    color = batch["color"]
    target = color[:, 0]
    b, h, w = target.shape[0], target.shape[1], target.shape[2]
    K0 = batch["K"]
    invK0 = batch["inv_K"]
    fid_to_idx = {f: i for i, f in enumerate(cfg.frame_ids)}
    nsc = cfg.num_scales
    k_all = nsc + 2
    use_pl = _use_pallas_warp(cfg, False)
    cp = 4  # fold of both warp_images_border(fold_out) and fold_image
    use_ssim = not cfg.no_ssim

    depth_scales = []
    for sc in cfg.scales:
        dfull = resize_bilinear(disps[("disp", sc)][..., 0], (h, w),
                                align_corners=False)
        _, d = disp_to_depth(dfull, cfg.min_depth, cfg.max_depth)
        depth_scales.append(d)
    depth_all = jnp.stack(depth_scales + [depth_mvs_full, fused_depth],
                          axis=1)  # (B, K, H, W)

    color_f = fold_image(color, cp)  # (B, F, H*cp, W)
    target_f = color_f[:, 0]

    def _frame_block(depth_all, T_all, K0, invK0, src, target_f):
        pts = backproject(depth_all, invK0[:, None])
        if use_pl:
            from movedepth_tpu.ops.pallas.image_warp import (
                warp_images_border,
            )
            # direct dense pixel coords: no [-1,1] round trip, no
            # 2-lane-minor (B, K, H, W, 2) stack
            sx, sy = project_pixel(pts, K0[:, None], T_all, h, w)
            warped_f = warp_images_border(src, sx, sy, fold_out=True,
                                          col_window=cfg.warp_col_window)
        else:
            grid = project(pts, K0[:, None], T_all, h, w)
            warped_f = fold_image(_multi_warp(src, grid), cp)
        wf = warped_f.reshape(b * k_all, h * cp, w)
        tf = jnp.broadcast_to(target_f[:, None],
                              (b, k_all, h * cp, w)).reshape(wf.shape)
        fn = lambda a, t: reprojection_loss_folded(a, t, 3, cp, cfg.ssim_lw,
                                                   use_ssim)
        rp, l1 = fn(wf, tf) if remat else jax.checkpoint(fn)(wf, tf)
        return (rp.reshape(b, k_all, h, w), l1.reshape(b, k_all, h, w),
                unfold_image(warped_f[:, 0], 3, cp))

    if remat:
        _frame_block = jax.checkpoint(_frame_block)

    mono_reproj = []  # per frame: (B, nsc, H, W)
    mvs_reproj = []
    fuse_reproj = []
    warped_log = {}
    for f in cfg.frame_ids[1:]:
        T_live = cam_T_cam[f]
        T_det = lax.stop_gradient(T_live)
        T_all = jnp.stack([T_live] * nsc + [T_det, T_det], axis=1)
        src = color[:, fid_to_idx[f]]
        rp, l1, w0 = _frame_block(depth_all, T_all, K0, invK0, src,
                                  target_f)
        warped_log[f] = w0
        mono_reproj.append(rp[:, :nsc])
        mvs_reproj.append(rp[:, nsc])
        fuse_reproj.append(l1[:, nsc + 1])  # fuse: ssim_lw=0 == pure L1

    losses: Dict[str, Any] = {}

    # ---- mono: per-scale min-reprojection + automask + smoothness
    ident = jnp.stack(
        [
            reprojection_loss_folded(color_f[:, fid_to_idx[f]], target_f,
                                     3, cp, cfg.ssim_lw, use_ssim)[0]
            for f in cfg.frame_ids[1:]
        ],
        axis=1,
    )  # (B, F-1, H, W)
    # monodepth2 --avg_reprojection (see the NHWC branch above): frame
    # means feed the same automask/min path as singleton frame stacks.
    if cfg.avg_reprojection:
        ident = jnp.mean(ident, axis=1, keepdims=True)
    total = 0.0
    for k, sc in enumerate(cfg.scales):
        reprojs = jnp.stack([m[:, k] for m in mono_reproj], axis=1)
        if cfg.avg_reprojection:
            reprojs = jnp.mean(reprojs, axis=1, keepdims=True)
        if not cfg.disable_automasking:
            rng, sub = jax.random.split(rng)
            # same draw shape as the NHWC path (RNG parity), then dense
            noise = jax.random.normal(sub, (b, h, w, 1))[..., 0]
            reproj, mask = min_reprojection_with_automask_planar(
                reprojs, ident, noise)
        else:
            reproj = jnp.min(reprojs, axis=1)
            mask = jnp.ones_like(reproj)
        rl = masked_mean(reproj, mask)

        disp = disps[("disp", sc)][..., 0]
        color_sf = target_f if sc == 0 else fold_image(
            batch[f"color_pyr_{sc}"], cp)
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        sl = smooth_loss_planar(disp / (mean_disp + 1e-7), color_sf, 3, cp)
        losses[f"mono_smooth_loss/{sc}"] = sl
        scale_loss = rl + cfg.disparity_smoothness * sl / (2 ** sc)
        losses[f"loss/{sc}"] = scale_loss
        total = total + scale_loss
    losses["mono_loss"] = total / nsc

    # ---- MVS: min over frames; optional conf/dist/geo masks
    reproj = jnp.min(jnp.stack(mvs_reproj, axis=1), axis=1)  # (B, H, W)
    mask = jnp.ones_like(reproj) if mvs_mask is None else mvs_mask[..., 0]
    losses["mvs_reproj_loss"] = masked_mean(reproj, mask)
    mvs_total = losses["mvs_reproj_loss"]
    if cfg.mvs_smooth_loss:
        d = depth_mvs_full
        mean_d = jnp.mean(d, axis=(1, 2), keepdims=True)
        sl = smooth_loss_planar(d / (mean_d + 1e-7), target_f, 3, cp)
        losses["mvs_smooth_loss/0"] = sl
        mvs_total = mvs_total + cfg.disparity_smoothness * sl
    losses["mvs_loss"] = mvs_total

    # ---- fuse: pure L1, optional automask (reference trainer.py:592-604)
    fuse_stack = jnp.stack(fuse_reproj, axis=1)  # (B, F-1, H, W)
    if cfg.mask_mvs_auto:
        ident_l1 = jnp.stack(
            [
                reprojection_loss_folded(color_f[:, fid_to_idx[f]],
                                         target_f, 3, cp, 0.0,
                                         use_ssim)[1]
                for f in cfg.frame_ids[1:]
            ],
            axis=1,
        )
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, (b, h, w, 1))[..., 0]
        reproj, mask = min_reprojection_with_automask_planar(
            fuse_stack, ident_l1, noise)
    else:
        reproj = jnp.min(fuse_stack, axis=1)
        mask = jnp.ones_like(reproj)
    losses["fuse_reproj_loss"] = masked_mean(reproj, mask)
    return losses, warped_log


def compute_mvs_masks(cost_prob, disp0, batch, cam_T_cam, depth_mvs_full,
                      cfg: Config):
    """Optional MVS-loss masks (reference: trainer.py:419-426,649-657).

    conf: max softmax prob (trilinear-upsampled) > photo_conf;
    dist: full-res mono disparity (dense (B, H, W)) > dist_thres;
    geo:  forward-backward reprojection consistency per source frame.
    Returns (B, H, W, 1) float mask or None when all flags are off.
    """
    if not (cfg.mask_mvs_conf or cfg.mask_mvs_dist or cfg.mask_mvs_geo):
        return None
    h, w = cfg.height, cfg.width
    mask = jnp.ones((batch["color"].shape[0], h, w, 1))
    if cfg.mask_mvs_conf:
        # Trilinear-upsample the prob volume to (D, H, W) FIRST, then max
        # over D (reference: trainer.py:420-421). D is unchanged so the
        # trilinear resize is a per-depth-slice bilinear; max and
        # interpolation don't commute, so the order matters.
        up = jax.vmap(lambda p: resize_bilinear(p, (h, w),
                                                align_corners=True),
                      in_axes=1, out_axes=1)(cost_prob)  # (B, D, H, W)
        prob_max = jnp.max(up, axis=1)
        mask = mask * (prob_max[..., None] > cfg.photo_conf)
    if cfg.mask_mvs_dist:
        mask = mask * (disp0[..., None] > cfg.dist_thres)
    if cfg.mask_mvs_geo:
        from movedepth_tpu.ops.masking import geometric_consistency_mask
        fid_to_idx = {f: i for i, f in enumerate(cfg.frame_ids)}
        for f in cfg.frame_ids[1:]:
            geo = geometric_consistency_mask(
                depth_mvs_full, batch["K"],
                lax.stop_gradient(cam_T_cam[f]), depth_mvs_full, batch["K"],
                cfg.pixel_thres, cfg.depth_thres)
            mask = mask * geo[..., None]
    return mask


# ------------------------------------------------------------- forward (train)

def forward_train(models, variables, batch, cfg: Config, rng, use_z_bins,
                  train: bool = True):
    """Full training forward: every model, both cost-volume passes, all
    losses (reference: movedepth/trainer.py:297-442).

    ``train=False`` reproduces the reference's eval-mode validation pass
    (reference: trainer.py:470-489): BN running stats, no stat updates.
    Returns (total_loss, (losses dict, outputs dict, batch_stats updates)).
    """
    updates: Dict[str, Any] = {}
    color_aug = batch["color_aug"]
    b = color_aug.shape[0]
    h, w = cfg.height, cfg.width
    fid_to_idx = {f: i for i, f in enumerate(cfg.frame_ids)}

    # Memory/speed trade (static at trace time): batches over the
    # threshold rematerialize -- without it batch 32 exceeds the 16 GB
    # HBM; with it batch <= 24 would pay recompute it does not need.
    # remat_scope picks what recomputes: "full" also remats the encoder
    # and pose convs, "mvs" only the big cost-volume/photometric blocks
    # (cheaper backward, a few GB more residuals).
    heavy = train and b > cfg.remat_batch_threshold
    heavy_enc = heavy and cfg.remat_scope == "full"

    # 1. poses
    if cfg.load_pose:
        cam_T_cam, rel, upd = poses_from_batch(batch, cfg)
    else:
        cam_T_cam, rel, upd = predict_poses(models, variables, batch, cfg,
                                            train=train, remat=heavy_enc)
    updates.update(upd)

    # 2. matching features (reference trainer.py:317-322)
    (ref_match, ref_ctx), bs = _apply(models, variables, "mvs_encoder",
                                      color_aug[:, 0], train=train,
                                      remat=heavy_enc)
    if bs is not None:
        updates["mvs_encoder"] = bs
    src_matches = []
    for f in cfg.matching_ids[1:]:
        (sm, _), bs = _apply(models, variables, "mvs_encoder",
                             color_aug[:, fid_to_idx[f]], train=train,
                             remat=heavy_enc)
        src_matches.append(sm)
        if bs is not None:
            updates["mvs_encoder"] = bs

    # 3. mono path (reference trainer.py:325-326)
    feats, bs = _apply(models, variables, "mono_encoder", color_aug[:, 0],
                       train=train, remat=heavy_enc)
    if bs is not None:
        updates["mono_encoder"] = bs
    disps, _ = _apply(models, variables, "mono_depth", feats)

    # 4. full-res scale-0 mono depth (needed for the fusion input; the
    # photometric losses recompute it identically -- XLA CSEs the pair).
    # Dense (B, H, W): the NHWC form's trailing 1 pads lanes 128x
    disp0_full = resize_bilinear(disps[("disp", 0)][..., 0], (h, w),
                                 align_corners=False)
    _, mono_depth0 = disp_to_depth(disp0_full, cfg.min_depth,
                                   cfg.max_depth)

    # 5. depth bins from the detached mono prior (trainer.py:333-346)
    disp_prior = lax.stop_gradient(disps[("disp", cfg.prior_scale)][..., 0])
    bins = compute_depth_bins(disp_prior, rel, use_z_bins, cfg)
    K_p = scale_intrinsics(batch["K"], cfg.prior_scale)
    invK_p = jnp.linalg.inv(K_p)

    # 6+7. cost volume pass 1 + masked-augmentation pass (trainer.py:
    # 349-371, 374-403) -- ONE shared sweep warp, both correlations, one
    # 2B-batched regularizer call (see mvs_depth_two_pass)
    rng, sub = jax.random.split(rng)
    masked_img, aug_mask = random_image_mask(sub, color_aug[:, 0],
                                             (h // 3, w // 3))
    (ref_aug, _), bs = _apply(models, variables, "mvs_encoder", masked_img,
                              train=train, remat=heavy_enc)
    if bs is not None:
        updates["mvs_encoder"] = bs
    depth_mvs, cost_prob, depth_mvs_aug, upd = mvs_depth_two_pass(
        models, variables, ref_match, ref_aug, src_matches, bins, K_p,
        invK_p, rel, cfg, train=train, remat=heavy)
    updates.update(upd)
    ent = entropy(cost_prob, axis=1, keepdims=True)  # (B, 1, h, w)
    trust_mono, bs = _apply(models, variables, "mask_cnn",
                            jnp.transpose(ent, (0, 2, 3, 1)), train=train)
    if bs is not None:
        updates["mask_cnn"] = bs
    hw_low = depth_mvs_aug.shape[1:3]
    low_mask = resize_bilinear(aug_mask, hw_low, align_corners=True)
    low_mask = (jnp.sum(low_mask, axis=-1) > 0).astype(depth_mvs.dtype)
    diff = jnp.abs(depth_mvs_aug - depth_mvs)
    sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    # NOTE: the reference multiplies by mask_lw twice (trainer.py:399-400),
    # so the effective weight is mask_lw**2; reproduced for parity.
    masked_loss = masked_mean(sl1, low_mask) * cfg.mask_lw ** 2

    # 8. upsample MVS depth to full res (trainer.py:406-409)
    if cfg.convex_up:
        up_mask, _ = _apply(models, variables, "up", ref_ctx)
        depth_mvs_full = convex_upsample(depth_mvs, up_mask, cfg.prior_scale)
    else:
        depth_mvs_full = resize_bilinear(depth_mvs, (h, w),
                                         align_corners=True)

    # 9. fusion (trainer.py:411-416): only mask_cnn gets gradient
    # dense (B, H, W) resize: the NHWC form's trailing 1 pads lanes 128x
    trust_full = resize_bilinear(trust_mono[..., 0], (h, w),
                                 align_corners=True)
    fused = (
        (1.0 - trust_full) * lax.stop_gradient(depth_mvs_full)
        + trust_full * lax.stop_gradient(mono_depth0)
    )

    # 10. all photometric losses in one fused multi-warp pass
    mvs_mask = compute_mvs_masks(cost_prob, disp0_full, batch, cam_T_cam,
                                 depth_mvs_full, cfg)
    rng, sub = jax.random.split(rng)
    losses, warped_log = photometric_losses(
        disps, depth_mvs_full, fused, batch, cam_T_cam, cfg, sub,
        mvs_mask=mvs_mask, remat=heavy)
    losses["masked_loss"] = masked_loss

    total = (losses["mono_loss"] + losses["masked_loss"]
             + losses["mvs_loss"] + losses["fuse_reproj_loss"])
    losses["loss"] = total

    outputs = {
        "disp_0": disps[("disp", 0)],
        "depth_mono": mono_depth0,
        "depth_mvs": depth_mvs_full,
        "trust_mono_mask": trust_full,
        "fused_depth": fused,
        "warped": warped_log,
        "cam_T_cam": cam_T_cam,
    }
    return total, (losses, outputs, updates)


# --------------------------------------------------------------- inference

def forward_infer(models, variables, batch, cfg: Config):
    """Eval-protocol inference (reference: movedepth/evaluate_depth.py:181-253).

    Uses raw (un-jittered) frames, always-z-guided bins, eval's depth-axis
    frame weighting. Returns dict with mono scaled disparity and MVS depth.
    Unlike the reference (which reads z from batch element 0 only --
    evaluate_depth.py:218, valid only for batch_size 1), z is per-sample.

    The eval batch carries only the matching frames
    (reference: evaluate_depth.py:92 ``frames_to_load = opt.matching_ids``),
    so all frame indexing below runs over matching_ids.
    """
    cfg = cfg.replace(frame_ids=cfg.matching_ids)
    color = batch["color"]
    fid_to_idx = {f: i for i, f in enumerate(cfg.frame_ids)}

    feats, _ = _apply(models, variables, "mono_encoder", color[:, 0])
    disps, _ = _apply(models, variables, "mono_depth", feats)

    if cfg.load_pose or "relative_pose" in batch:
        cam_T_cam, rel, _ = poses_from_batch(batch, cfg)
    else:
        eval_batch = dict(batch)
        eval_batch["color_aug"] = color
        cam_T_cam, rel, _ = predict_poses(models, variables, eval_batch, cfg,
                                          train=False)

    # one FPN call over all frames (exact at inference: BN running stats)
    b = color.shape[0]
    m = len(cfg.matching_ids)
    stacked = color[:, [fid_to_idx[f] for f in cfg.matching_ids]]
    stacked = stacked.reshape((b * m,) + color.shape[2:])
    (match_all, ctx_all), _ = _apply(models, variables, "mvs_encoder",
                                     stacked)
    match_all = match_all.reshape((b, m) + match_all.shape[1:])
    ref_match = match_all[:, 0]
    ref_ctx = ctx_all.reshape((b, m) + ctx_all.shape[1:])[:, 0]
    src_matches = [match_all[:, i] for i in range(1, m)]

    disp_prior = disps[("disp", cfg.prior_scale)][..., 0]
    _, depth_prior = disp_to_depth(disp_prior, cfg.min_depth, cfg.max_depth)
    z = cfg.z_scale * rel[:, 0, 2, 3]
    bins = schedule_depth_bins_z(
        depth_prior, cfg.num_depth_bins, cfg.depth_bin_fac, z[:, None, None],
        cfg.schedule_type)

    K_p = scale_intrinsics(batch["K"], cfg.prior_scale)
    invK_p = jnp.linalg.inv(K_p)
    depth_mvs, cost_prob, _ = mvs_depth_from_features(
        models, variables, ref_match, src_matches, bins, K_p, invK_p, rel,
        cfg, train=False, weight_axis="depth")

    if cfg.convex_up:
        up_mask, _ = _apply(models, variables, "up", ref_ctx)
        depth_mvs = convex_upsample(depth_mvs, up_mask, cfg.prior_scale)
    scaled_disp_mono, _ = disp_to_depth(disps[("disp", 0)][..., 0],
                                        cfg.min_depth, cfg.max_depth)
    return {
        "disp_mono": scaled_disp_mono,       # (B, H, W) scaled disparity
        "disp_mvs": 1.0 / depth_mvs,         # (B, H, W) or low-res if no up
        "depth_mvs": depth_mvs,
        "cost_prob": cost_prob,
    }


def forward_infer_fused(models, variables, batch, cfg: Config):
    """Fused-depth inference (BASELINE.json config 3): mono + MVS depth
    blended by the learned cost-volume uncertainty head.

    The reference LOADS mask_cnn at eval but never calls it
    (reference: movedepth/evaluate_depth.py:170-174) -- its eval "fuse"
    table is an oracle best-of-two. This surfaces the fusion users
    actually train: the train-time chain entropy -> mask_cnn -> trust map
    -> blend (forward_train steps 9, mirroring trainer.py:366-370,411-416)
    without the stop-gradients (inference has no gradients to isolate).

    Returns forward_infer's dict plus trust_mono (B, H, W),
    depth_fused / disp_fused at full resolution.
    """
    out = forward_infer(models, variables, batch, cfg)
    h, w = batch["color"].shape[2], batch["color"].shape[3]

    ent = entropy(out["cost_prob"], axis=1, keepdims=True)  # (B, 1, h, w)
    trust, _ = _apply(models, variables, "mask_cnn",
                      jnp.transpose(ent, (0, 2, 3, 1)))
    trust_full = resize_bilinear(trust[..., 0], (h, w), align_corners=True)

    depth_mvs = out["depth_mvs"]
    if depth_mvs.shape[-2:] != (h, w):  # convex_up off: bilinear, like train
        depth_mvs = resize_bilinear(depth_mvs, (h, w), align_corners=True)
    mono_depth0 = 1.0 / out["disp_mono"]  # disp_to_depth's depth
    fused = (1.0 - trust_full) * depth_mvs + trust_full * mono_depth0
    return dict(out, trust_mono=trust_full, depth_fused=fused,
                disp_fused=1.0 / fused)


def kernel_rung_report(models, variables, batch, cfg: Config):
    """Name the Pallas ladder rungs this batch's coordinates dispatch to.

    Diagnostic (eager, runs the coordinate-producing prefix of
    forward_infer once): the sweep and image-warp kernels pick their
    epipolar window rung per call from value-dependent coverage checks
    inside lax.cond, which is invisible in profiles; this surfaces the
    decision so benchmarks can report WHICH kernel they actually timed.
    Returns {name: rung string}.
    """
    from movedepth_tpu.ops.costvolume import sweep_grid
    from movedepth_tpu.ops.pallas import image_warp as IW
    from movedepth_tpu.ops.pallas import sweep_warp as SW

    cfg = cfg.replace(frame_ids=cfg.matching_ids)
    color = batch["color"]
    fid_to_idx = {f: i for i, f in enumerate(cfg.frame_ids)}
    feats, _ = _apply(models, variables, "mono_encoder", color[:, 0])
    disps, _ = _apply(models, variables, "mono_depth", feats)
    if cfg.load_pose or "relative_pose" in batch:
        cam_T_cam, rel, _ = poses_from_batch(batch, cfg)
    else:
        eval_batch = dict(batch)
        eval_batch["color_aug"] = color
        cam_T_cam, rel, _ = predict_poses(models, variables, eval_batch,
                                          cfg, train=False)

    disp_prior = disps[("disp", cfg.prior_scale)][..., 0]
    _, depth_prior = disp_to_depth(disp_prior, cfg.min_depth, cfg.max_depth)
    z = cfg.z_scale * rel[:, 0, 2, 3]
    bins = schedule_depth_bins_z(
        depth_prior, cfg.num_depth_bins, cfg.depth_bin_fac, z[:, None, None],
        cfg.schedule_type)
    K_p = scale_intrinsics(batch["K"], cfg.prior_scale)
    invK_p = jnp.linalg.inv(K_p)

    (match0, _), _ = _apply(models, variables, "mvs_encoder", color[:, 0])
    c_match = match0.shape[-1]
    h, w = bins.shape[-2], bins.shape[-1]
    report = {}
    for f_idx, f in enumerate(cfg.matching_ids[1:]):
        grid = sweep_grid(bins, K_p, invK_p, rel[:, f_idx])
        sx, sy = SW.grid_to_pixel(grid, h, w)
        report[f"sweep[frame {f}]"] = SW.rung_report(
            sx, sy, h, c_match,
            row_window=cfg.sweep_row_window or None,
            col_window=cfg.sweep_col_window or None)

    # The train path's full-res photometric warp. Probe with the SAME
    # K-stacked (B, K=num_scales+2, H, W) depth layout photometric_losses'
    # _frame_block warps in one call (db=K) -- the rung coverage check
    # runs over the whole stacked axis, so a d=1 probe could name a
    # narrower rung than the train step actually takes. The MVS and fused
    # slots are approximated by the scale-0 mono depth (both are
    # refinements of it; this is a train-path probe, bench.py times
    # INFERENCE where this warp never runs).
    hf, wf = color.shape[2], color.shape[3]
    depth_scales = []
    for sc in cfg.scales:
        dfull = resize_bilinear(disps[("disp", sc)], (hf, wf),
                                align_corners=False)
        _, dsc = disp_to_depth(dfull[..., 0], cfg.min_depth, cfg.max_depth)
        depth_scales.append(dsc)
    depth_all = jnp.stack(depth_scales + [depth_scales[0]] * 2, axis=1)
    k_all = depth_all.shape[1]
    f = cfg.matching_ids[1]
    pts = backproject(depth_all, batch["inv_K"][:, None])
    grid = project(pts, batch["K"][:, None], cam_T_cam[f][:, None], hf, wf)
    sx, sy = SW.grid_to_pixel(grid, hf, wf)
    report[f"image_warp[frame {f}, train-path K={k_all}]"] = (
        IW.warp_rung_report(color[:, fid_to_idx[f]], sx, sy,
                            col_window=cfg.warp_col_window))
    return report


def forward_mono_infer(models, variables, batch, cfg: Config):
    """Single-frame mono inference (BASELINE.json config 1)."""
    feats, _ = _apply(models, variables, "mono_encoder", batch["color"][:, 0])
    disps, _ = _apply(models, variables, "mono_depth", feats)
    scaled_disp, depth = disp_to_depth(disps[("disp", 0)][..., 0],
                                       cfg.min_depth, cfg.max_depth)
    return {"disp_mono": scaled_disp, "depth_mono": depth}
