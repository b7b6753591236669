"""Golden tests for the MVS core: depth-bin scheduling, plane-sweep cost
volume, group reduction, frame fusion, and localmax -- each against the
reference math rebuilt in torch/numpy (from movedepth/layers.py and
movedepth/trainer.py)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp
import pytest

from movedepth_tpu.ops import costvolume as CV
from movedepth_tpu.ops import geometry as G


# ---------------------------------------------------------------- torch refs

def torch_schedule_v2(prior_depth, ndepth, scale_fac, type="inverse"):
    """reference: movedepth/layers.py:256-284 (prior is B,1,H,W)."""
    B, _, H, W = prior_depth.shape
    lo = prior_depth / (1 + scale_fac)
    hi = prior_depth * (1 + scale_fac)
    if type == "inverse":
        itv = torch.arange(ndepth).reshape(1, -1, 1, 1).float() / (ndepth - 1)
        inv = 1 / hi + (1 / lo - 1 / hi) * itv
        return 1 / inv
    elif type == "linear":
        itv = torch.arange(ndepth).reshape(1, -1, 1, 1).float() / (ndepth - 1)
        return lo + (hi - lo) * itv
    elif type == "log":
        itv = [
            torch.exp(torch.log(torch.tensor(0.1)) +
                      torch.log(torch.tensor(10.0)) * k / (ndepth - 1))
            for k in range(ndepth)
        ]
        itv = torch.tensor(itv).reshape(1, -1, 1, 1)
        return lo + (hi - lo) * itv


def torch_schedule_zv2(prior_depth, ndepth, scale_fac, z_trans):
    """reference: movedepth/layers.py:370-398 (inverse only)."""
    lo = prior_depth / (1 + scale_fac * z_trans)
    hi = prior_depth * (1 + scale_fac * z_trans)
    itv = torch.arange(ndepth).reshape(1, -1, 1, 1).float() / (ndepth - 1)
    inv = 1 / hi + (1 / lo - 1 / hi) * itv
    return 1 / inv


def torch_generate_costvol(ref, src, K, invK, depth_priors, pose, nbins):
    """reference: movedepth/layers.py:778-794 with bins-as-batch
    Backproject/Project modules inlined (layers.py:556-621)."""
    B, C, H, W = ref.shape
    ys, xs = np.meshgrid(range(H), range(W), indexing="ij")
    pix = torch.from_numpy(
        np.stack([xs.ravel(), ys.ravel(), np.ones(H * W)], 0).astype(np.float32)
    )
    cost_vols = []
    for bi in range(B):
        rays = invK[bi, :3, :3] @ pix  # 3,HW
        cam = depth_priors[bi].reshape(nbins, 1, -1) * rays[None]  # D,3,HW
        ones = torch.ones(nbins, 1, H * W)
        points = torch.cat([cam, ones], 1)  # D,4,HW
        P = (K[bi] @ pose[bi, 0])[:3, :]  # 3,4
        cp = P[None] @ points  # D,3,HW
        xy = cp[:, :2] / (cp[:, 2:3] + 1e-7)
        gx = (xy[:, 0] / (W - 1) - 0.5) * 2
        gy = (xy[:, 1] / (H - 1) - 0.5) * 2
        grid = torch.stack([gx, gy], -1).reshape(nbins, H, W, 2)
        src_rep = src[bi:bi + 1].repeat(nbins, 1, 1, 1)
        warped = F.grid_sample(src_rep, grid, padding_mode="zeros",
                               mode="bilinear", align_corners=True)
        cost_vols.append(warped * ref[bi:bi + 1])
    return torch.stack(cost_vols, 0)  # B,D,C,H,W


def torch_localmax(cost_prob, radius, casbin, min_inv, max_inv):
    """reference: movedepth/layers.py:796-812."""
    pred_idx = torch.argmax(cost_prob, 1, keepdim=True).float()
    pred_idx_low = pred_idx - radius
    pred_idx = torch.arange(0, 2 * radius + 1).reshape(1, -1, 1, 1).float()
    pred_idx = (pred_idx + pred_idx_low).clamp(0, casbin - 1).long()
    regress_index = 0
    cost_prob_sum = 1e-6
    for i in range(2 * radius + 1):
        cp = torch.gather(cost_prob, 1, pred_idx[:, i:i + 1])
        regress_index = regress_index + pred_idx[:, i:i + 1] * cp
        cost_prob_sum = cost_prob_sum + cp
    regress_index = regress_index / cost_prob_sum
    norm = regress_index / (casbin - 1)
    return 1 / (min_inv + norm[:, 0] * (max_inv - min_inv))


# --------------------------------------------------------------------- tests

@pytest.mark.parametrize("stype", ["inverse", "linear", "log"])
def test_schedule_depth_bins(rng, stype):
    prior = rng.uniform(1, 60, (2, 1, 6, 8)).astype(np.float32)
    ref = torch_schedule_v2(torch.from_numpy(prior), 16, 0.3, stype).numpy()
    ours = np.asarray(
        CV.schedule_depth_bins(jnp.asarray(prior[:, 0]), 16, 0.3, stype)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_schedule_depth_bins_z(rng):
    prior = rng.uniform(1, 60, (2, 1, 6, 8)).astype(np.float32)
    z = rng.uniform(-0.02, 0.05, (2, 1, 1, 1)).astype(np.float32) * 30
    ref = torch_schedule_zv2(torch.from_numpy(prior), 16, 0.3,
                             torch.from_numpy(z)).numpy()
    ours = np.asarray(
        CV.schedule_depth_bins_z(jnp.asarray(prior[:, 0]), 16, 0.3,
                                 jnp.asarray(z[:, 0]))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_plane_sweep_costvol_matches_reference(rng):
    b, c, h, w, d = 2, 8, 12, 20, 4
    ref_feat = rng.normal(0, 1, (b, c, h, w)).astype(np.float32)
    src_feat = rng.normal(0, 1, (b, c, h, w)).astype(np.float32)
    K = np.tile(
        np.array([[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
        (b, 1, 1),
    )
    invK = np.linalg.pinv(K)
    bins = rng.uniform(5, 60, (b, d, h, w)).astype(np.float32)
    aa = rng.normal(0, 0.05, (b, 3)).astype(np.float32)
    tr = rng.normal(0, 0.3, (b, 3)).astype(np.float32)
    T = np.asarray(
        G.transformation_from_parameters(jnp.asarray(aa), jnp.asarray(tr))
    )
    ref_out = torch_generate_costvol(
        torch.from_numpy(ref_feat), torch.from_numpy(src_feat),
        torch.from_numpy(K), torch.from_numpy(invK),
        torch.from_numpy(bins), torch.from_numpy(T[:, None]), d,
    ).numpy()  # B,D,C,H,W
    ours = np.asarray(
        CV.plane_sweep_costvol(
            jnp.asarray(ref_feat.transpose(0, 2, 3, 1)),
            jnp.asarray(src_feat.transpose(0, 2, 3, 1)),
            jnp.asarray(K), jnp.asarray(invK), jnp.asarray(bins), jnp.asarray(T),
        )
    ).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4)


def test_reduce_cost_groups_matches_reference(rng):
    b, d, c, h, w, g = 2, 4, 32, 5, 6, 16
    cost = rng.normal(0, 1, (b, d, c, h, w)).astype(np.float32)
    ref = torch.from_numpy(cost).reshape(b, d, -1, g, h, w).mean(2).numpy()
    ours = np.asarray(
        CV.reduce_cost_groups(jnp.asarray(cost.transpose(0, 1, 3, 4, 2)), g)
    ).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_fuse_frames_single_frame_is_identity(rng):
    """With one matching frame the weights cancel after normalization
    (SURVEY.md section 7, reference quirk)."""
    cost = rng.normal(0, 1, (1, 4, 5, 6, 16)).astype(np.float32)
    for axis in ("group", "depth"):
        out = np.asarray(CV.fuse_frames([jnp.asarray(cost)], weight_axis=axis))
        np.testing.assert_allclose(out, cost, rtol=1e-4, atol=1e-6)


def test_fuse_frames_two_frames_matches_reference(rng):
    """Two-frame weighting vs the reference accumulation
    (movedepth/trainer.py:349-363)."""
    b, d, h, w, g = 1, 4, 5, 6, 8
    costs = [rng.normal(0, 1, (b, d, g, h, w)).astype(np.float32) for _ in range(2)]
    wsum = 1e-8
    acc = 0.0
    for cv in costs:
        t = torch.from_numpy(cv)
        wgt = torch.softmax(t.mean(1), dim=1).max(1)[0]  # B,H,W
        wsum = wsum + wgt
        acc = acc + wgt.unsqueeze(1).unsqueeze(1) * t
    ref = (acc / wsum.unsqueeze(1).unsqueeze(1)).numpy()
    ours = np.asarray(
        CV.fuse_frames(
            [jnp.asarray(c.transpose(0, 1, 3, 4, 2)) for c in costs],
            weight_axis="group",
        )
    ).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_localmax_matches_reference(rng):
    b, d, h, w = 2, 16, 6, 8
    logits = rng.normal(0, 1, (b, d, h, w)).astype(np.float32)
    prob = torch.softmax(torch.from_numpy(logits), 1)
    bins = torch_schedule_v2(
        torch.from_numpy(rng.uniform(2, 50, (b, 1, h, w)).astype(np.float32)),
        d, 0.3,
    )
    min_inv = 1 / bins[:, -1]
    max_inv = 1 / bins[:, 0]
    ref = torch_localmax(prob, 1, d, min_inv, max_inv).numpy()
    ours = np.asarray(
        CV.localmax(jnp.asarray(prob.numpy()), 1, d,
                    jnp.asarray(min_inv.numpy()), jnp.asarray(max_inv.numpy()))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
