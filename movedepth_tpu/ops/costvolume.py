"""Velocity-guided plane-sweep cost volume -- the MVS core, TPU-first.

Replaces the reference's per-batch-item Python loop + bins-as-batch modules
(reference: movedepth/layers.py:778-794 generate_costvol; trainer.py:349-363)
with a single vmapped computation: the projection math for all D depth
hypotheses is one batched matmul, the warp is one gather+lerp, and the
correlation fuses into the gather epilogue under XLA. Depth-bin scheduling
(reference: layers.py:256-284 schedule_depth_rangev2, :370-398
schedule_depth_range_zv2) and the soft-argmax decode (reference:
layers.py:796-812 localmax) are pure functions of the prior.

Layouts: features NHWC; cost volumes (B, D, H, W, G) with depth hypotheses
D as a leading batch-like axis and groups G innermost (lane dimension).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from movedepth_tpu.ops.geometry import pixel_grid
from movedepth_tpu.ops.sampling import _sample_one, stack_corners


def _bin_positions(ndepth, schedule_type, dtype=jnp.float32):
    """Interpolation positions itv in [0, 1] for D bins (1-D array)."""
    if schedule_type in ("inverse", "linear"):
        return jnp.arange(ndepth, dtype=dtype) / (ndepth - 1)
    if schedule_type == "log":
        # exp(log 0.1 + log 10 * k/(D-1)): geometric 0.1 -> 1.0
        k = jnp.arange(ndepth, dtype=dtype)
        return jnp.exp(
            jnp.log(jnp.asarray(0.1, dtype))
            + jnp.log(jnp.asarray(10.0, dtype)) * k / (ndepth - 1)
        )
    raise ValueError(f"unknown schedule_type {schedule_type!r}")


def _spread_bins(lo, hi, ndepth, schedule_type):
    """Expand per-pixel [lo, hi] depth ranges into D hypotheses.

    lo/hi: (B, H, W) -> (B, D, H, W). 'inverse' places bins uniformly in
    inverse depth from hi down to lo (bin 0 == hi == farthest), 'linear'
    and 'log' interpolate in depth space from lo to hi
    (reference: movedepth/layers.py:263-282).
    """
    itv = _bin_positions(ndepth, schedule_type, lo.dtype)[None, :, None, None]
    lo = lo[:, None]
    hi = hi[:, None]
    if schedule_type == "inverse":
        inv = 1.0 / hi + (1.0 / lo - 1.0 / hi) * itv
        return 1.0 / inv
    return lo + (hi - lo) * itv


def schedule_depth_bins_v1(disp, ndepth, scale_fac, min_depth, max_depth,
                           schedule_type="inverse", is_depth=False,
                           geo_mask=None, damper=1.0, z_trans=None):
    """v1 depth-range scheduler family, superseded by the v2 functions below
    but kept for capability parity (reference: movedepth/layers.py:217-254
    schedule_depth_range, :286-327 _geo, :330-367 _z).

    Builds a band of width ``itv * fac * D`` around the disp-derived center
    where itv = (per-image max - min) / 96, clamped into [min, max]; the
    geo variant damps the band where ``geo_mask`` holds, the z variant
    scales it by ``z_trans`` (B,).
    """
    disp = lax.stop_gradient(disp)
    if not is_depth:
        scaled = 1.0 / max_depth + disp * (1.0 / min_depth - 1.0 / max_depth)
        center = 1.0 / scaled
    else:
        center = disp
    b = center.shape[0]
    flat = center.reshape(b, -1)
    dmax = flat.max(axis=1)[:, None, None]
    dmin = flat.min(axis=1)[:, None, None]
    itv = (dmax - dmin) / 96.0  # reference hardcodes 96 (layers.py:228)
    fac = jnp.asarray(scale_fac, center.dtype)
    fac = jnp.broadcast_to(fac, center.shape)
    if geo_mask is not None:
        fac = jnp.where(geo_mask, fac / damper, fac)
    half = itv * fac * ndepth / 2.0
    if z_trans is not None:
        half = half * z_trans[:, None, None]
    lo = jnp.maximum(center - half, dmin)
    hi = jnp.minimum(center + half, dmax)
    return _spread_bins(lo, hi, ndepth, schedule_type)


def schedule_depth_bins(prior_depth, ndepth, scale_fac, schedule_type="inverse"):
    """Depth candidates around the mono prior: [prior/(1+fac), prior*(1+fac)].

    prior_depth: (B, H, W) -> (B, D, H, W). No gradient flows to the prior
    (the reference computes this under no_grad,
    movedepth/layers.py:256-284).
    """
    prior_depth = lax.stop_gradient(prior_depth)
    lo = prior_depth / (1.0 + scale_fac)
    hi = prior_depth * (1.0 + scale_fac)
    return _spread_bins(lo, hi, ndepth, schedule_type)


def schedule_depth_bins_z(prior_depth, ndepth, scale_fac, z_trans,
                          schedule_type="inverse"):
    """Velocity-guided candidates: the band scales with the z-translation.

    ``z_trans`` is the (pre-scaled) camera z-translation, broadcastable to
    (B, H, W) -- typically (B, 1, 1) from ``z_scale * T[:, 2, 3]``
    (reference: movedepth/layers.py:370-398; call sites trainer.py:336-341,
    evaluate_depth.py:218-223).
    """
    prior_depth = lax.stop_gradient(prior_depth)
    z_trans = lax.stop_gradient(jnp.broadcast_to(z_trans, prior_depth.shape))
    lo = prior_depth / (1.0 + scale_fac * z_trans)
    hi = prior_depth * (1.0 + scale_fac * z_trans)
    return _spread_bins(lo, hi, ndepth, schedule_type)


def sweep_grid(depth_bins, K, inv_K, T, eps=1e-7):
    """Normalized sampling grid for all depth hypotheses.

    depth_bins: (B, D, H, W); K/inv_K/T: (B, 4, 4).
    Returns (B, D, H, W, 2) in [-1, 1] (align_corners=True convention).
    Pure function of detached inputs; gradients are stopped as in the
    reference's no_grad block (movedepth/layers.py:784-790).
    """
    b, d, h, w = depth_bins.shape
    pix = pixel_grid(h, w, depth_bins.dtype)  # (3, HW)
    rays = inv_K[:, :3, :3] @ pix  # (B, 3, HW)
    pts = depth_bins.reshape(b, d, 1, h * w) * rays[:, None]  # (B, D, 3, HW)
    P = (K @ T)[:, :3, :]  # (B, 3, 4)
    cam = jnp.einsum("bij,bdjp->bdip", P[:, :, :3], pts) + P[:, :, 3:4][:, None]
    xy = cam[:, :, :2, :] / (cam[:, :, 2:3, :] + eps)  # (B, D, 2, HW)
    gx = (xy[:, :, 0, :] / (w - 1) - 0.5) * 2.0
    gy = (xy[:, :, 1, :] / (h - 1) - 0.5) * 2.0
    grid = jnp.stack([gx, gy], axis=-1).reshape(b, d, h, w, 2)
    return lax.stop_gradient(grid)


def plane_sweep_warp(src_feat, K, inv_K, depth_bins, T):
    """Warp src features over D depth hypotheses (XLA gather path).

    src_feat: (B, H, W, C); K/inv_K/T: (B, 4, 4); depth_bins: (B, D, H, W).
    Returns (B, D, H, W, C) zeros-padded bilinear warps -- the warp half of
    the reference's generate_costvol (movedepth/layers.py:778-792), exposed
    separately so the masked-augmentation pass can reuse ONE warp for both
    correlations (the reference recomputes it, trainer.py:374-403).
    """
    grid = sweep_grid(depth_bins, K, inv_K, T)  # (B, D, H, W, 2)

    def one(src, g):  # src: (H, W, C); g: (D, H, W, 2)
        corners = stack_corners(src)  # built once, reused by all D bins
        return jax.vmap(
            lambda gg: _sample_one(src, gg[..., 0], gg[..., 1], "zeros", True,
                                   corners=corners)
        )(g)

    return jax.vmap(one)(src_feat, grid)  # (B, D, H, W, C)


def plane_sweep_costvol(ref_feat, src_feat, K, inv_K, depth_bins, T):
    """Warp src features over D depth hypotheses and correlate with ref.

    ref_feat/src_feat: (B, H, W, C); K/inv_K/T: (B, 4, 4);
    depth_bins: (B, D, H, W). Returns (B, D, H, W, C) = warped * ref.
    Equivalent to the reference's generate_costvol
    (movedepth/layers.py:778-794: zeros padding, align_corners=True,
    bilinear) but with the batch loop vmapped away and the D hypotheses
    handled as a vectorized axis instead of a fake batch.
    """
    warped = plane_sweep_warp(src_feat, K, inv_K, depth_bins, T)
    return warped * ref_feat[:, None]


def reduce_cost_groups(cost, num_groups):
    """Channel-group mean: (B, D, H, W, C) -> (B, D, H, W, G).

    Views C as (C//G, G) and averages the leading factor, exactly matching
    the reference's ``reshape(B, D, -1, G, H, W).mean(2)``
    (movedepth/trainer.py:359).
    """
    b, d, h, w, c = cost.shape
    return cost.reshape(b, d, h, w, c // num_groups, num_groups).mean(-2)


def fuse_frames(cost_list, weight_axis="group"):
    """Confidence-weighted fusion of per-source-frame cost volumes.

    cost_list: list of (B, D, H, W, G). Each frame's weight is
    ``softmax(mean_over_D, axis)` max-reduced``; the accumulator starts at
    1e-8 exactly as the reference does.
    weight_axis='group' reproduces training (softmax over G,
    movedepth/trainer.py:360-363); 'depth' reproduces eval (softmax over D
    after a further group-mean, movedepth/evaluate_depth.py:235-242). The
    two agree after normalization for a single matching frame (the shipped
    config), see SURVEY.md section 7.
    """
    if len(cost_list) == 1 and cost_list[0].dtype == jnp.bfloat16:
        # Single-frame fusion is identity to below-bf16-ulp accuracy:
        # the weight factor w / (1e-8 + w) with w = max softmax prob
        # >= 1/D differs from 1 by < 1e-7, far under the ~4e-3 bf16
        # resolution, so the reference arithmetic would round back to
        # ``cost`` anyway -- minus ~4.7 ms of full-volume passes at
        # batch 128 (measured, scripts/profile_mvs.py). The f32 and
        # multi-frame paths keep the reference arithmetic exactly.
        return cost_list[0]
    wsum = 1e-8
    acc = 0.0
    for cost in cost_list:
        if weight_axis == "group":
            m = cost.mean(axis=1)  # (B, H, W, G)
            w = jax.nn.softmax(m, axis=-1).max(axis=-1)  # (B, H, W)
        elif weight_axis == "depth":
            m = cost.mean(axis=-1)  # (B, D, H, W)
            w = jax.nn.softmax(m, axis=1).max(axis=1)  # (B, H, W)
        else:
            raise ValueError(weight_axis)
        wsum = wsum + w
        acc = acc + w[:, None, :, :, None] * cost
    return acc / wsum[:, None, :, :, None]


def localmax(cost_prob, radius, ndepth, inv_depth_min, inv_depth_max):
    """Windowed soft-argmax over depth bins -> depth map.

    cost_prob: (B, D, H, W) softmax probabilities; window of +-radius bins
    around the argmax is prob-weight regressed to a normalized index, which
    is decoded by inverse-depth interpolation:
    ``depth = 1 / (inv_depth_min + norm * (inv_depth_max - inv_depth_min))``.

    NOTE (behavioral parity): the reference call sites pass
    ``inv_depth_min = 1/bins[:, -1]`` (the *nearest* hypothesis) and
    ``inv_depth_max = 1/bins[:, 0]`` (the *farthest*), so the decode is
    flipped relative to the bin ordering -- index 0 decodes to the nearest
    depth although bin 0 holds the farthest hypothesis. The regularizer is
    trained end-to-end against this decode, so checkpoint parity requires
    reproducing it exactly (reference: movedepth/layers.py:796-812; call
    sites trainer.py:371,396, evaluate_depth.py:245).

    inv_depth_min / inv_depth_max: (B, H, W).

    TPU note: the obvious ``take_along_axis(cost_prob, window)`` is a
    row-rate-bound gather (B*(2r+1)*H*W rows); instead each bin's window
    multiplicity c_d = #{offsets o: clip(argmax+o) == d} is built by
    (2r+1) broadcast comparisons over the small D axis -- pure elementwise
    math that XLA fuses, mathematically identical (window slots that clip
    onto an edge bin count that bin multiple times, exactly like the
    clipped gather).
    """
    idx0 = jnp.argmax(cost_prob, axis=1)[:, None]  # (B, 1, H, W)
    d_iota = jnp.arange(ndepth)[None, :, None, None]
    cnt = 0
    for o in range(-radius, radius + 1):
        cnt = cnt + (d_iota == jnp.clip(idx0 + o, 0, ndepth - 1))
    wprob = cost_prob * cnt.astype(cost_prob.dtype)  # (B, D, H, W)
    num = jnp.sum(d_iota.astype(cost_prob.dtype) * wprob, axis=1)
    den = 1e-6 + jnp.sum(wprob, axis=1)
    norm = (num / den) / (ndepth - 1)  # (B, H, W)
    return 1.0 / (inv_depth_min + norm * (inv_depth_max - inv_depth_min))
