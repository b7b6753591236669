"""Depth error metrics (reference: movedepth/layers.py:718-736 and
movedepth/evaluate_depth.py:22-64)."""

from __future__ import annotations

import jax.numpy as jnp

METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def compute_depth_errors(gt, pred, mask=None):
    """The 7 standard KITTI depth metrics.

    gt / pred: same-shape arrays of positive depths. ``mask`` (optional,
    same shape, float or bool) restricts the statistics to valid pixels in
    a jit-friendly way (the reference boolean-indexes instead, which would
    be a dynamic shape under XLA).
    Returns dict of scalars keyed by METRIC_NAMES.
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if mask is None:
        w = jnp.ones_like(gt)
    else:
        w = mask.astype(jnp.float32)
        # keep ratios finite on masked-out pixels
        gt = jnp.where(w > 0, gt, 1.0)
        pred = jnp.where(w > 0, pred, 1.0)
    n = jnp.sum(w) + 1e-12

    def wmean(x):
        return jnp.sum(x * w) / n

    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = wmean((thresh < 1.25).astype(jnp.float32))
    a2 = wmean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = wmean((thresh < 1.25 ** 3).astype(jnp.float32))

    rmse = jnp.sqrt(wmean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(wmean((jnp.log(gt) - jnp.log(pred)) ** 2))
    abs_rel = wmean(jnp.abs(gt - pred) / gt)
    sq_rel = wmean((gt - pred) ** 2 / gt)

    return dict(
        abs_rel=abs_rel, sq_rel=sq_rel, rmse=rmse, rmse_log=rmse_log,
        a1=a1, a2=a2, a3=a3,
    )


def oracle_fuse_errors(gt, pred_mono, pred_mvs):
    """Oracle per-pixel best-of-two "upbound" metric
    (reference: movedepth/evaluate_depth.py:42-64)."""
    use_mono = jnp.abs(gt - pred_mono) < jnp.abs(pred_mvs - gt)
    pred = jnp.where(use_mono, pred_mono, pred_mvs)
    return compute_depth_errors(gt, pred)
