"""End-to-end torch-oracle parity: the COMPOSED pipeline vs the reference.

Component goldens (test_torch_import / test_costvolume / test_geometry /
test_losses) pin each op and each converted model in isolation; this module
pins the composition. A test-only torch-CPU re-statement of the reference's
eval forward (reference: movedepth/evaluate_depth.py:181-253) and training
``process_batch`` (reference: movedepth/trainer.py:297-442,491-724) is
driven with the SAME weights (random torch init -> our converter, the exact
path a released checkpoint takes) and the SAME synthetic batch, and our
``forward_infer`` depth maps / ``forward_train`` loss dict must match to
f32 tolerance. Composition bugs -- loss-merge weights, detach placement,
bin ordering, weight-axis choice, K-scaling -- are exactly what the
per-component goldens cannot catch.

Randomness is controlled, not disabled: the automask randn tiebreaks and
the masked-augmentation box are re-derived from our pipeline's exact
``jax.random`` split chain (forward_train's draw order) and injected into
the torch oracle, so both sides see identical noise.

Documented intentional deviations exercised here:
  * eval z-translation is per-sample; the reference reads batch element 0
    only (evaluate_depth.py:218, correct only at batch_size 1). The oracle
    uses per-sample z so the rest of the composition is pinned exactly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu.ops.masking import random_image_mask
from movedepth_tpu import pipeline as P
from movedepth_tpu.train import torch_import as TI

from test_torch_import import (
    TorchResNet18Encoder,
    TorchResNet50Encoder,
    TorchDepthDecoderFull,
    TorchPoseDecoder,
    TorchFPN4,
    TorchReg3D,
    TorchUncertNet,
    TorchConvexUpHead,
    _np_state,
    _randomize_bn,
)
from test_costvolume import (
    torch_generate_costvol,
    torch_localmax,
    torch_schedule_v2,
    torch_schedule_zv2,
)
from test_geometry import torch_transformation

B, H, W = 2, 64, 96
CFG = Config(height=H, width=W, batch_size=B, compute_dtype="float32",
             pallas_warp=False)


# --------------------------------------------------------- torch oracle ops

def t_disp_to_depth(disp, min_depth, max_depth):
    """reference: movedepth/layers.py:400-409."""
    scaled = 1.0 / max_depth + disp * (1.0 / min_depth - 1.0 / max_depth)
    return scaled, 1.0 / scaled


def t_project_grid(depth, inv_K, K, T, eps=1e-7):
    """BackprojectDepth + Project3D at one scale
    (reference: movedepth/layers.py:556-621). depth: (B,1,H,W) or (B,H,W);
    returns the [-1,1] grid (B,H,W,2)."""
    if depth.dim() == 3:
        depth = depth.unsqueeze(1)
    b, _, h, w = depth.shape
    xs, ys = np.meshgrid(range(w), range(h), indexing="xy")
    pix = torch.from_numpy(
        np.stack([xs.ravel(), ys.ravel(), np.ones(h * w)], 0)
        .astype(np.float32))
    cam = torch.matmul(inv_K[:, :3, :3], pix[None])  # B,3,HW
    cam = depth.view(b, 1, -1) * cam
    ones = torch.ones(b, 1, h * w)
    points = torch.cat([cam, ones], 1)  # B,4,HW
    P = torch.matmul(K, T)[:, :3, :]
    cp = torch.matmul(P, points)  # B,3,HW
    pix_coords = cp[:, :2, :] / (cp[:, 2:3, :] + eps)
    pix_coords = pix_coords.view(b, 2, h, w).permute(0, 2, 3, 1)
    pix_coords = pix_coords / torch.tensor([w - 1.0, h - 1.0])
    return (pix_coords - 0.5) * 2


def t_warp(src, grid):
    """reference warp of color images (trainer.py:505-529): border padding,
    align_corners=True."""
    return F.grid_sample(src, grid, padding_mode="border",
                         align_corners=True)


def t_ssim(x, y):
    """reference: movedepth/layers.py:646-677."""
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def t_reproj_loss(pred, target, ssim_lw):
    """reference: trainer.py:535-550."""
    l1 = torch.abs(target - pred).mean(1, True)
    ssim_loss = t_ssim(pred, target).mean(1, True)
    return ssim_lw * ssim_loss + (1 - ssim_lw) * l1


def t_smooth_loss(disp, img):
    """reference: movedepth/layers.py:630-643."""
    gx = torch.abs(disp[:, :, :, :-1] - disp[:, :, :, 1:])
    gy = torch.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    ix = torch.mean(torch.abs(img[:, :, :, :-1] - img[:, :, :, 1:]), 1, True)
    iy = torch.mean(torch.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), 1, True)
    return (gx * torch.exp(-ix)).mean() + (gy * torch.exp(-iy)).mean()


def t_entropy(vol):
    """reference: movedepth/layers.py:862-863 (dim=1, keepdim)."""
    return torch.sum(-vol * vol.clamp(1e-9, 1.0).log(), dim=1, keepdim=True)


def t_convex_upsample(depth, mask, scale=2):
    """reference: movedepth/layers.py:200-214."""
    b, h, w = depth.shape
    depth = depth.unsqueeze(1)
    s = 2 ** scale
    mask = mask.view(b, 9, s, s, h, w)
    mask = torch.softmax(mask, dim=1)
    up = F.unfold(depth, [3, 3], padding=1).view(b, 9, 1, 1, h, w)
    up = torch.sum(mask * up, dim=1)  # B,s,s,h,w
    up = up.permute(0, 3, 1, 4, 2)
    return up.reshape(b, s * h, s * w)


def t_costvol_pass(ref_feat, src_feats, K2, invK2, bins, rel, cfg,
                   weight_axis):
    """One cost-volume + frame-fusion pass
    (reference: trainer.py:349-363 weight over groups;
    evaluate_depth.py:227-242 weight over depth)."""
    wsum, feats = 1e-8, 0
    for f_idx in range(len(cfg.matching_ids) - 1):
        cv = torch_generate_costvol(ref_feat, src_feats[f_idx], K2, invK2,
                                    bins, rel[:, f_idx:f_idx + 1],
                                    cfg.num_depth_bins)  # B,D,C,H,W
        b, d, c, h, w = cv.shape
        cv = cv.reshape(b, d, -1, cfg.reg3d_c, h, w).mean(2)  # B,D,G,H,W
        if weight_axis == "group":
            wt = torch.softmax(cv.mean(1), dim=1).max(1)[0]  # B,H,W
        else:
            wt = torch.softmax(cv.mean(2), dim=1).max(1)[0]  # B,H,W
        wsum = wsum + wt
        feats = feats + wt.unsqueeze(1).unsqueeze(1) * cv
    return feats / wsum.unsqueeze(1).unsqueeze(1)


def t_masked_mean(x, mask):
    """reference: trainer.py:708-709."""
    return (x * mask).sum() / (mask.sum() + 1e-7)


def t_compute_loss_masks(reproj, ident):
    """reference: trainer.py:553-567 (ties keep the pixel: argmin==0)."""
    idxs = torch.argmin(torch.cat([reproj, ident], dim=1), dim=1,
                        keepdim=True)
    return (idxs == 0).float()


# ----------------------------------------------------------- oracle forwards

def oracle_eval_forward(tm, inputs, cfg, rel_override=None):
    """reference: movedepth/evaluate_depth.py:181-253 (per-sample z, see
    module docstring). ``rel_override`` (B,M,4,4) skips the pose nets --
    the load_pose branch (precomputed DVSO poses; reference:
    datasets/mono_dataset.py:90-101,188-191)."""
    with torch.no_grad():
        color0 = inputs[("color", 0, 0)]
        disps = tm["mono_depth"](tm["mono_encoder"](color0))

        if rel_override is not None:
            rel = rel_override
        else:
            rel = []
            for fi in cfg.matching_ids[1:]:
                if fi < 0:
                    pair = [inputs[("color", fi, 0)], color0]
                else:
                    pair = [color0, inputs[("color", fi, 0)]]
                aa, tr = tm["pose"](
                    tm["pose_encoder"](torch.cat(pair, 1))[-1])
                rel.append(torch_transformation(aa[:, 0], tr[:, 0],
                                                invert=fi < 0))
            rel = torch.stack(rel, 1)  # B,M,4,4

        ref_match, ref_ctx = tm["mvs_encoder"](color0)
        src_matches = [tm["mvs_encoder"](inputs[("color", fi, 0)])[0]
                       for fi in cfg.matching_ids[1:]]

        disp_prior = disps[cfg.prior_scale]
        _, depth_prior = t_disp_to_depth(disp_prior, cfg.min_depth,
                                         cfg.max_depth)
        z = cfg.z_scale * rel[:, 0, 2, 3]  # (B,) per-sample
        bins = torch_schedule_zv2(depth_prior, cfg.num_depth_bins,
                                  cfg.depth_bin_fac,
                                  z.view(-1, 1, 1, 1))  # B,D,h,w

        cor = t_costvol_pass(ref_match, src_matches, inputs[("K", 2)],
                             inputs[("inv_K", 2)], bins, rel, cfg,
                             weight_axis="depth")
        cost_prob = torch.softmax(tm["reg3d"](cor), 1)
        depth_mvs = torch_localmax(cost_prob, cfg.norm_radius,
                                   cfg.num_depth_bins,
                                   1 / bins[:, -1], 1 / bins[:, 0])
        if cfg.convex_up:
            depth_mvs = t_convex_upsample(depth_mvs, tm["up"](ref_ctx),
                                          cfg.prior_scale)
        disp_mono, _ = t_disp_to_depth(disps[0], cfg.min_depth,
                                       cfg.max_depth)
        return {
            "disp_mvs": 1.0 / depth_mvs,
            "disp_mono": disp_mono[:, 0],
            "cost_prob": cost_prob,
        }


def oracle_process_batch(tm, inputs, cfg, use_z, noises, masked_img,
                         aug_mask):
    """reference: movedepth/trainer.py:297-442 with the shipped defaults,
    randn tiebreaks / box mask injected (values only; run under no_grad)."""
    with torch.no_grad():
        losses = {}
        # --- poses (reference: trainer.py:445-468)
        cam_T_cam = {}
        for fi in cfg.frame_ids[1:]:
            if fi < 0:
                pair = [inputs[("color_aug", fi, 0)],
                        inputs[("color_aug", 0, 0)]]
            else:
                pair = [inputs[("color_aug", 0, 0)],
                        inputs[("color_aug", fi, 0)]]
            aa, tr = tm["pose"](tm["pose_encoder"](torch.cat(pair, 1))[-1])
            cam_T_cam[fi] = torch_transformation(aa[:, 0], tr[:, 0],
                                                 invert=fi < 0)
        rel = torch.stack([cam_T_cam[fi] for fi in cfg.matching_ids[1:]], 1)

        # --- mvs + mono features (trainer.py:317-326)
        ref_match, ref_ctx = tm["mvs_encoder"](inputs[("color_aug", 0, 0)])
        src_matches = [tm["mvs_encoder"](inputs[("color_aug", fi, 0)])[0]
                       for fi in cfg.matching_ids[1:]]
        disps = tm["mono_depth"](tm["mono_encoder"](
            inputs[("color_aug", 0, 0)]))

        # --- mono warps + losses (trainer.py:491-533, 675-724)
        target = inputs[("color", 0, 0)]
        K0, invK0 = inputs[("K", 0)], inputs[("inv_K", 0)]
        ident_losses = torch.cat(
            [t_reproj_loss(inputs[("color", fi, 0)], target, cfg.ssim_lw)
             for fi in cfg.frame_ids[1:]], 1)
        total = 0.0
        for k, scale in enumerate(cfg.scales):
            disp = disps[scale]
            disp_full = F.interpolate(disp, [cfg.height, cfg.width],
                                      mode="bilinear", align_corners=False)
            _, depth = t_disp_to_depth(disp_full, cfg.min_depth,
                                       cfg.max_depth)
            reproj = []
            for fi in cfg.frame_ids[1:]:
                grid = t_project_grid(depth, invK0, K0, cam_T_cam[fi])
                pred = t_warp(inputs[("color", fi, 0)], grid)
                reproj.append(t_reproj_loss(pred, target, cfg.ssim_lw))
            reproj = torch.cat(reproj, 1)
            ident = ident_losses.min(1, keepdim=True)[0] + noises[k] * 1e-5
            rmin = reproj.min(1, keepdim=True)[0]
            mask = t_compute_loss_masks(rmin, ident)
            rl = t_masked_mean(rmin, mask)

            mean_disp = disp.mean(2, True).mean(3, True)
            sl = t_smooth_loss(disp / (mean_disp + 1e-7),
                               inputs[("color", 0, scale)])
            losses[f"mono_smooth_loss/{scale}"] = sl
            scale_loss = rl + cfg.disparity_smoothness * sl / (2 ** scale)
            losses[f"loss/{scale}"] = scale_loss
            total = total + scale_loss
        mono_loss = total / len(cfg.scales)

        # --- depth bins from the detached prior (trainer.py:333-346)
        _, depth_prior = t_disp_to_depth(disps[cfg.prior_scale],
                                         cfg.min_depth, cfg.max_depth)
        if use_z:
            bins = torch_schedule_zv2(depth_prior, cfg.num_depth_bins,
                                      cfg.depth_bin_fac,
                                      cfg.z_scale * rel[:, :, 2:3, -1:])
        else:
            bins = torch_schedule_v2(depth_prior, cfg.num_depth_bins,
                                     cfg.depth_bin_fac, cfg.schedule_type)

        # --- cost volume pass 1 (trainer.py:349-371)
        K2, invK2 = inputs[("K", 2)], inputs[("inv_K", 2)]
        cor = t_costvol_pass(ref_match, src_matches, K2, invK2, bins, rel,
                             cfg, weight_axis="group")
        cost_prob = torch.softmax(tm["reg3d"](cor), 1)
        trust = tm["mask_cnn"](t_entropy(cost_prob))
        depth_mvs = torch_localmax(cost_prob, cfg.norm_radius,
                                   cfg.num_depth_bins,
                                   1 / bins[:, -1], 1 / bins[:, 0])

        # --- masked-augmentation pass (trainer.py:374-403)
        ref_aug, _ = tm["mvs_encoder"](masked_img)
        cor_a = t_costvol_pass(ref_aug, src_matches, K2, invK2, bins, rel,
                               cfg, weight_axis="group")
        prob_a = torch.softmax(tm["reg3d"](cor_a), 1)
        depth_mvs_aug = torch_localmax(prob_a, cfg.norm_radius,
                                       cfg.num_depth_bins,
                                       1 / bins[:, -1], 1 / bins[:, 0])
        low = F.interpolate(aug_mask,
                            [depth_mvs_aug.shape[1], depth_mvs_aug.shape[2]],
                            mode="bilinear", align_corners=True)
        low = low.sum(1).to(torch.bool)
        masked_loss = F.smooth_l1_loss(depth_mvs_aug[low], depth_mvs[low],
                                       reduction="mean") * cfg.mask_lw
        losses["masked_loss"] = masked_loss * cfg.mask_lw  # mask_lw**2 total

        # --- upsample + fuse (trainer.py:406-416)
        if cfg.convex_up:
            depth_mvs = t_convex_upsample(depth_mvs, tm["up"](ref_ctx),
                                          cfg.prior_scale)
        else:
            depth_mvs = F.interpolate(depth_mvs.unsqueeze(1),
                                      [cfg.height, cfg.width],
                                      mode="bilinear",
                                      align_corners=True)[:, 0]
        _, mono_depth = t_disp_to_depth(disps[0], cfg.min_depth,
                                        cfg.max_depth)
        trust = F.interpolate(trust, [cfg.height, cfg.width],
                              mode="bilinear", align_corners=True)
        fused = (1 - trust) * depth_mvs[:, None] + trust * mono_depth

        # --- fuse losses: pure L1 (trainer.py:569-612)
        fuse_reproj = []
        for fi in cfg.frame_ids[1:]:
            grid = t_project_grid(fused, invK0, K0, cam_T_cam[fi])
            pred = t_warp(inputs[("color", fi, 0)], grid)
            fuse_reproj.append(t_reproj_loss(pred, target, ssim_lw=0.0))
        fuse_min = torch.cat(fuse_reproj, 1).min(1, keepdim=True)[0]
        losses["fuse_reproj_loss"] = t_masked_mean(
            fuse_min, torch.ones_like(fuse_min))

        # --- mvs reprojection loss (trainer.py:621-673)
        mvs_reproj = []
        for fi in cfg.frame_ids[1:]:
            grid = t_project_grid(depth_mvs, invK0, K0, cam_T_cam[fi])
            pred = t_warp(inputs[("color", fi, 0)], grid)
            mvs_reproj.append(t_reproj_loss(pred, target, cfg.ssim_lw))
        mvs_min = torch.cat(mvs_reproj, 1).min(1, keepdim=True)[0]
        losses["mvs_reproj_loss"] = t_masked_mean(
            mvs_min, torch.ones_like(mvs_min))
        mvs_loss = losses["mvs_reproj_loss"]

        # --- merge (trainer.py:429-441)
        losses["mono_loss"] = mono_loss
        losses["mvs_loss"] = mvs_loss
        losses["loss"] = (mono_loss + losses["masked_loss"] + mvs_loss
                          + losses["fuse_reproj_loss"])
        outputs = {"depth_mvs": depth_mvs, "fused_depth": fused[:, 0],
                   "trust_mono_mask": trust[:, 0],
                   "depth_mono": mono_depth[:, 0]}
        return losses, outputs


# ------------------------------------------------------------------ fixtures

def _nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(42)
    state_dicts = {}
    mods = {
        "mono_encoder": TorchResNet18Encoder(),
        "mono_depth": TorchDepthDecoderFull([64, 64, 128, 256, 512]),
        "pose_encoder": TorchResNet18Encoder(num_input_images=2),
        "pose": TorchPoseDecoder(),
        "mvs_encoder": TorchFPN4(),
        "reg3d": TorchReg3D(16),
        "mask_cnn": TorchUncertNet(),
        "up": TorchConvexUpHead(),
    }
    for name, m in mods.items():
        _randomize_bn(m)
        state_dicts[name] = _np_state(m)

    # Conditioning: at random init the pose head's 0.01-scaled output is
    # ~1e-3, the warp is ~identity, and reproj == ident to within f32 SSIM
    # noise EVERYWHERE -- the automask then flips on ~7% of pixels from
    # numerical noise alone and the comparison is meaningless. Boosting the
    # final pose conv gives a few-pixel real motion, so reproj-ident gaps
    # dominate f32 noise and only genuine near-ties (~0.1%) can flip.
    for k in list(state_dicts["pose"]):
        if k.startswith("net.3."):
            state_dicts["pose"][k] = state_dicts["pose"][k] * 40.0

    variables = {name: TI.convert_state_dict(name, sd)
                 for name, sd in state_dicts.items()}
    models = build_models(CFG)
    batch = make_batch(CFG, B, seed=11)

    def fresh_torch_models():
        for name, m in mods.items():
            m.load_state_dict({k: torch.from_numpy(v.copy())
                               for k, v in state_dicts[name].items()})
        return mods

    fid_to_idx = {f: i for i, f in enumerate(CFG.frame_ids)}
    inputs = {}
    for f in CFG.frame_ids:
        inputs[("color", f, 0)] = _nchw(batch["color"][:, fid_to_idx[f]])
        inputs[("color_aug", f, 0)] = _nchw(
            batch["color_aug"][:, fid_to_idx[f]])
    for s in range(1, 4):
        inputs[("color", 0, s)] = _nchw(batch[f"color_pyr_{s}"])
    K0 = torch.from_numpy(batch["K"].copy())
    inputs[("K", 0)] = K0
    inputs[("inv_K", 0)] = torch.from_numpy(batch["inv_K"].copy())
    K2 = K0.clone()
    K2[:, :2, :] /= 4.0
    inputs[("K", 2)] = K2
    inputs[("inv_K", 2)] = torch.linalg.inv(K2)
    return models, variables, batch, inputs, fresh_torch_models


# --------------------------------------------------------------------- tests

def test_eval_forward_parity(setup):
    """forward_infer (the eval protocol's network forward) vs the torch
    oracle: mono scaled disparity, MVS inverse depth, cost probabilities."""
    models, variables, batch, inputs, fresh = setup
    tm = fresh()
    for m in tm.values():
        m.eval()

    # eval uses raw frames only (color_aug == color at eval time)
    eval_inputs = dict(inputs)
    for f in CFG.frame_ids:
        eval_inputs[("color", f, 0)] = inputs[("color", f, 0)]
    ref = oracle_eval_forward(tm, eval_inputs, CFG)

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("color_aug",)}
    jbatch["color"] = jnp.asarray(batch["color"])
    ours = jax.jit(
        lambda v, b: P.forward_infer(models, v, b, CFG))(variables, jbatch)

    np.testing.assert_allclose(np.asarray(ours["disp_mono"]),
                               ref["disp_mono"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["cost_prob"]),
                               ref["cost_prob"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["disp_mvs"]),
                               ref["disp_mvs"].numpy(), atol=1e-4)


def test_eval_forward_parity_load_pose(setup):
    """The load_pose branch (poses from the dataset instead of PoseNet;
    reference: datasets/mono_dataset.py:90-101, trainer predict_poses'
    relative_pose path) -- identical precomputed poses injected on both
    sides, pinning the rest of the composition under that branch."""
    models, variables, batch, inputs, fresh = setup
    tm = fresh()
    for m in tm.values():
        m.eval()

    # realistic near-identity forward motion per matching frame
    rng = np.random.default_rng(21)
    m_frames = len(CFG.matching_ids) - 1
    aa = rng.normal(0, 5e-3, (B, m_frames, 3)).astype(np.float32)
    tr = rng.normal(0, 3e-2, (B, m_frames, 3)).astype(np.float32)
    tr[:, :, 2] -= 0.1  # dominant z-translation, KITTI-style
    rel = torch.stack(
        [torch_transformation(torch.from_numpy(aa[:, i:i + 1]),
                              torch.from_numpy(tr[:, i:i + 1]),
                              invert=False)
         for i in range(m_frames)], 1)

    ref = oracle_eval_forward(tm, inputs, CFG, rel_override=rel)

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("color_aug",)}
    jbatch["color"] = jnp.asarray(batch["color"])
    # frame_ids == matching_ids inside forward_infer, so relative_pose is
    # keyed in matching_ids[1:] order
    jbatch["relative_pose"] = jnp.asarray(rel.numpy())
    ours = jax.jit(lambda v, b: P.forward_infer(
        models, v, b, CFG.replace(load_pose=True)))(variables, jbatch)

    np.testing.assert_allclose(np.asarray(ours["disp_mono"]),
                               ref["disp_mono"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["cost_prob"]),
                               ref["cost_prob"].numpy(), atol=1e-4)
    # disp_mvs is O(70) here (the injected near-identity z-motion collapses
    # the z-scaled bins toward min_depth), so tolerance is relative
    np.testing.assert_allclose(np.asarray(ours["disp_mvs"]),
                               ref["disp_mvs"].numpy(), rtol=1e-5,
                               atol=1e-4)


def test_eval_fused_forward_parity(setup):
    """forward_infer_fused (BASELINE config 3: the learned mask_cnn blend
    at inference) vs the torch oracle. The reference has no such surface
    (mask_cnn loaded-but-unused at eval, evaluate_depth.py:170-174); the
    oracle applies the TRAIN-time fusion chain (trainer.py:366-370,
    411-416) to the eval forward's cost volume, which is exactly what
    forward_infer_fused implements."""
    models, variables, batch, inputs, fresh = setup
    tm = fresh()
    for m in tm.values():
        m.eval()
    ref = oracle_eval_forward(tm, inputs, CFG)
    with torch.no_grad():
        trust = tm["mask_cnn"](t_entropy(ref["cost_prob"]))
        trust = F.interpolate(trust, [CFG.height, CFG.width],
                              mode="bilinear", align_corners=True)[:, 0]
        depth_mvs = 1.0 / ref["disp_mvs"]
        mono_depth = 1.0 / ref["disp_mono"]
        fused = (1 - trust) * depth_mvs + trust * mono_depth

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("color_aug",)}
    jbatch["color"] = jnp.asarray(batch["color"])
    ours = jax.jit(
        lambda v, b: P.forward_infer_fused(models, v, b, CFG))(variables,
                                                               jbatch)
    np.testing.assert_allclose(np.asarray(ours["trust_mono"]),
                               trust.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["depth_fused"]),
                               fused.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["disp_fused"]),
                               (1.0 / fused).numpy(), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_eval_fused_forward_parity_res50(setup):
    """BASELINE config 3 with the ResNet50 encoder, load-bearing (VERDICT
    r4 missing #2): the torch Bottleneck weights go through the SAME
    converter path a released res50 checkpoint takes
    (reference: networks/resnet_encoder.py:95-108), then the composed
    forward_infer_fused must match the torch oracle end to end."""
    _, _, batch, inputs, _ = setup
    torch.manual_seed(7)
    from movedepth_tpu.models import encoder_channels

    cfg50 = CFG.replace(res_arch=50)
    mods = {
        "mono_encoder": TorchResNet50Encoder(),
        "mono_depth": TorchDepthDecoderFull(list(encoder_channels(50))),
        "pose_encoder": TorchResNet50Encoder(num_input_images=2),
        "pose": TorchPoseDecoder(cin=encoder_channels(50)[-1]),
        "mvs_encoder": TorchFPN4(),
        "reg3d": TorchReg3D(16),
        "mask_cnn": TorchUncertNet(),
        "up": TorchConvexUpHead(),
    }
    for m in mods.values():
        _randomize_bn(m)
        m.eval()
    # same conditioning as the module fixture: give the pose head real
    # (few-pixel) motion so the z-scaled bins are non-degenerate
    with torch.no_grad():
        for p in mods["pose"].net[3].parameters():
            p.mul_(40.0)
    variables = {name: TI.convert_state_dict(name, _np_state(m))
                 for name, m in mods.items()}

    ref = oracle_eval_forward(mods, inputs, cfg50)
    with torch.no_grad():
        trust = mods["mask_cnn"](t_entropy(ref["cost_prob"]))
        trust = F.interpolate(trust, [cfg50.height, cfg50.width],
                              mode="bilinear", align_corners=True)[:, 0]
        fused = ((1 - trust) / ref["disp_mvs"]
                 + trust / ref["disp_mono"])

    models50 = build_models(cfg50)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("color_aug",)}
    jbatch["color"] = jnp.asarray(batch["color"])
    ours = jax.jit(lambda v, b: P.forward_infer_fused(
        models50, v, b, cfg50))(variables, jbatch)
    np.testing.assert_allclose(np.asarray(ours["disp_mono"]),
                               ref["disp_mono"].numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ours["trust_mono"]),
                               trust.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours["depth_fused"]),
                               fused.numpy(), rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("use_z", [False, True])
@pytest.mark.parametrize("planar", [True, False])
def test_train_forward_parity(setup, use_z, planar):
    """forward_train's full loss dict + key outputs vs the torch oracle's
    process_batch, same weights, same batch, same injected randomness."""
    models, variables, batch, inputs, fresh = setup
    cfg = CFG.replace(planar_losses=planar)
    tm = fresh()
    for m in tm.values():
        m.train()  # reference trains with batch-stat BN (set_train)

    # Re-derive forward_train's exact jax.random draw chain (pipeline.py):
    # split 1 -> masked-aug box, split 2 -> photometric noise key, then one
    # split per mono scale inside photometric_losses.
    rng0 = jax.random.PRNGKey(123)
    rng, sub_mask = jax.random.split(rng0)
    color_aug0 = jnp.asarray(batch["color_aug"][:, 0])
    masked_img, aug_mask = random_image_mask(
        sub_mask, color_aug0, (cfg.height // 3, cfg.width // 3))
    rng, sub_photo = jax.random.split(rng)
    noises = []
    r = sub_photo
    for _ in cfg.scales:
        r, s = jax.random.split(r)
        noises.append(torch.from_numpy(np.asarray(
            jax.random.normal(s, (B, cfg.height, cfg.width, 1))
        ).transpose(0, 3, 1, 2).copy()))

    ref_losses, ref_out = oracle_process_batch(
        tm, inputs, cfg, use_z, noises, _nchw(masked_img), _nchw(aug_mask))

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    fwd = jax.jit(lambda v, b, rng, z: P.forward_train(
        models, v, b, cfg, rng, z, train=True))
    total, (losses, outputs, _) = fwd(variables, jbatch, rng0,
                                      jnp.asarray(use_z))

    np.testing.assert_allclose(np.asarray(outputs["depth_mvs"]),
                               ref_out["depth_mvs"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(outputs["trust_mono_mask"]),
                               ref_out["trust_mono_mask"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(outputs["fused_depth"]),
                               ref_out["fused_depth"].numpy(), atol=1e-4)

    # The mono keys pass through the identity automask, whose decisions on
    # genuine near-tie pixels (reproj within f32-SSIM noise of ident,
    # ~0.1% of pixels after the pose-boost conditioning in the fixture)
    # legitimately differ between backends; each flip moves the masked
    # mean by ~rmin/N ~ 6e-5. Everything downstream of a ones-mask or the
    # deterministic box mask is held to the tight tolerance.
    for key in ("loss/0", "loss/1", "loss/2", "loss/3",
                "mono_smooth_loss/0", "mono_smooth_loss/3", "mono_loss",
                "masked_loss", "mvs_reproj_loss", "mvs_loss",
                "fuse_reproj_loss", "loss"):
        rtol = 1e-3 if key.startswith(("loss/", "mono_loss", "loss")) \
            else 2e-4
        np.testing.assert_allclose(
            float(losses[key]), float(ref_losses[key]),
            rtol=rtol, atol=2e-6, err_msg=f"loss key {key!r} diverges")
    np.testing.assert_allclose(float(total), float(ref_losses["loss"]),
                               rtol=1e-3, atol=2e-6)
