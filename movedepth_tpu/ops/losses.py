"""Self-supervised photometric losses as pure JAX functions.

Covers the reference's SSIM / reprojection / edge-aware smoothness /
smooth-L1 / entropy ops (reference: movedepth/layers.py:630-677,862-863;
trainer.py:535-550,399). All elementwise+window math fuses into a handful
of XLA ops on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _avg_pool3(x):
    """3x3 stride-1 VALID mean pool over NHWC.

    Written as 9 shifted slices + adds instead of lax.reduce_window: slices
    and adds fuse into ONE elementwise XLA loop (and so do the five pools
    of SSIM plus their surrounding arithmetic), where reduce_window stays a
    separate pass per pool -- ~5x less HBM traffic for the SSIM chain.
    """
    h, w = x.shape[1], x.shape[2]
    out = None
    for dy in range(3):
        for dx in range(3):
            part = x[:, dy:dy + h - 2, dx:dx + w - 2, :]
            out = part if out is None else out + part
    return out / 9.0


def ssim(x, y):
    """Structural dissimilarity map, clamp((1 - SSIM)/2, 0, 1).

    x, y: NHWC in [0, 1]. Reflection-pads by 1 then uses 3x3 mean pooling,
    matching the reference exactly (reference: movedepth/layers.py:646-677).
    """
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3(xp)
    mu_y = _avg_pool3(yp)
    sigma_x = _avg_pool3(xp * xp) - mu_x * mu_x
    sigma_y = _avg_pool3(yp * yp) - mu_y * mu_y
    sigma_xy = _avg_pool3(xp * yp) - mu_x * mu_y

    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)


def reprojection_loss(pred, target, ssim_lw=0.85, use_ssim=True):
    """Per-pixel photometric loss, (B, H, W, 1).

    ``ssim_lw * SSIM + (1 - ssim_lw) * L1``, both mean-reduced over channels
    (reference: movedepth/trainer.py:535-550). ``ssim_lw=0`` reproduces the
    fuse branch's pure-L1 configuration (reference: trainer.py:588).
    """
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    if not use_ssim:
        return l1
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return ssim_lw * s + (1.0 - ssim_lw) * l1


def smooth_loss(disp, img):
    """Edge-aware first-order smoothness, scalar.

    disp: (B, H, W, 1); img: (B, H, W, C).
    (reference: movedepth/layers.py:630-643)
    """
    dx = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    dy = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])
    ix = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), -1, keepdims=True)
    iy = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), -1, keepdims=True)
    dx = dx * jnp.exp(-ix)
    dy = dy * jnp.exp(-iy)
    return jnp.mean(dx) + jnp.mean(dy)


def smooth_l1_loss(pred, target, beta=1.0):
    """Elementwise Huber/smooth-L1 (torch F.smooth_l1_loss semantics,
    mean reduction). Used by the masked-augmentation consistency loss
    (reference: movedepth/trainer.py:399)."""
    d = jnp.abs(pred - target)
    out = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.mean(out)


def entropy(volume, axis, keepdims=False):
    """Shannon entropy of a probability volume along ``axis``.

    (reference: movedepth/layers.py:862-863)
    """
    clamped = jnp.clip(volume, 1e-9, 1.0)
    return jnp.sum(-volume * jnp.log(clamped), axis=axis, keepdims=keepdims)


# ------------------------------------------------------------ folded planar
#
# TPU-dense variants of the photometric ops above, operating on the
# folded-planar layout of ops/layout.py: images as (..., H*cp, W) with
# channels packed into sublanes (NHWC's C=3 lane dim pads 42x on TPU).
# Same math -- a vertical shift of one image row is a folded shift of
# ``cp`` rows, and zero pad channels contribute exact zeros to both L1
# (|0-0|) and SSIM dissimilarity ((1 - c1*c2/(c1*c2))/2).


def _reflect_pad1_folded(x, cp):
    """Reflection-pad a folded image by one pixel on H and W."""
    top = x[..., cp:2 * cp, :]
    bot = x[..., -2 * cp:-cp, :]
    x = jnp.concatenate([top, x, bot], axis=-2)
    pad = [(0, 0)] * (x.ndim - 1) + [(1, 1)]
    return jnp.pad(x, pad, mode="reflect")


def _avg_pool3_folded(x, cp):
    """VALID 3x3 per-channel mean pool of a folded image (..., A, W):
    nine aligned slices, one fused elementwise loop (like _avg_pool3)."""
    a, w = x.shape[-2], x.shape[-1]
    hout, wout = a // cp - 2, w - 2
    out = None
    for dy in range(3):
        for dx in range(3):
            part = x[..., dy * cp:(dy + hout) * cp, dx:dx + wout]
            out = part if out is None else out + part
    return out / 9.0


def ssim_folded(x, y, cp=4):
    """:func:`ssim` on folded-planar images (..., H*cp, W).

    Zero pad channels yield exact-zero dissimilarity, so a channel SUM
    over the fold equals the sum over the real channels.
    """
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    xp = _reflect_pad1_folded(x, cp)
    yp = _reflect_pad1_folded(y, cp)
    mu_x = _avg_pool3_folded(xp, cp)
    mu_y = _avg_pool3_folded(yp, cp)
    sigma_x = _avg_pool3_folded(xp * xp, cp) - mu_x * mu_x
    sigma_y = _avg_pool3_folded(yp * yp, cp) - mu_y * mu_y
    sigma_xy = _avg_pool3_folded(xp * yp, cp) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)


def reprojection_loss_folded(pred, target, c=3, cp=4, ssim_lw=0.85,
                             use_ssim=True):
    """:func:`reprojection_loss` on folded-planar images -> (..., H, W)."""
    from movedepth_tpu.ops.layout import channel_mean_folded
    l1 = channel_mean_folded(jnp.abs(target - pred), c, cp)
    if not use_ssim:
        return l1, l1
    s = channel_mean_folded(ssim_folded(pred, target, cp), c, cp)
    return ssim_lw * s + (1.0 - ssim_lw) * l1, l1


def smooth_loss_planar(disp, img_folded, c=3, cp=4):
    """:func:`smooth_loss` with a dense (B, H, W) disparity and a
    folded-planar image -- no lane-padded single-channel maps."""
    from movedepth_tpu.ops.layout import channel_mean_folded
    dx = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    dy = jnp.abs(disp[:, :-1, :] - disp[:, 1:, :])
    ix = channel_mean_folded(
        jnp.abs(img_folded[..., :-1] - img_folded[..., 1:]), c, cp)
    iy = channel_mean_folded(
        jnp.abs(img_folded[..., :-cp, :] - img_folded[..., cp:, :]), c, cp)
    dx = dx * jnp.exp(-ix)
    dy = dy * jnp.exp(-iy)
    return jnp.mean(dx) + jnp.mean(dy)


def min_reprojection_with_automask_planar(reproj_losses, identity_losses,
                                          noise):
    """:func:`min_reprojection_with_automask` on frame-stacked dense maps:
    reproj/identity (B, F, H, W), noise (B, H, W) -> ((B,H,W), (B,H,W))."""
    reproj = jnp.min(reproj_losses, axis=1)
    ident = jnp.min(identity_losses, axis=1) + noise * 1e-5
    mask = (reproj <= ident).astype(reproj.dtype)
    return reproj, mask


def min_reprojection_with_automask(reproj_losses, identity_losses, noise):
    """monodepth2 min-reprojection + identity automasking.

    reproj_losses / identity_losses: (B, H, W, N) per source frame;
    noise: randn tiebreak matching the reference's
    ``+ randn * 1e-5`` (reference: movedepth/trainer.py:689-702).
    Returns (min_reproj (B,H,W,1), mask (B,H,W,1)) where mask=1 keeps the
    pixel (reprojection beats identity).
    """
    reproj = jnp.min(reproj_losses, axis=-1, keepdims=True)
    ident = jnp.min(identity_losses, axis=-1, keepdims=True)
    ident = ident + noise * 1e-5
    mask = (reproj <= ident).astype(reproj.dtype)
    return reproj, mask


def masked_mean(x, mask, eps=1e-7):
    """sum(x * mask) / (sum(mask) + eps) (reference: trainer.py:708-709)."""
    return jnp.sum(x * mask) / (jnp.sum(mask) + eps)


def mvs_ssim(x, y, mask):
    """Masked SSIM without reflection padding (VALID 3x3 windows).

    Returns (masked dissimilarity map, pooled mask), both (B, H-2, W-2, C)/
    (B, H-2, W-2, 1)-shaped like the reference's MVS_SSIM
    (reference: movedepth/layers.py:679-715; experimental surface, unused
    by the shipped training path).
    """
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    ssim_mask = _avg_pool3(mask.astype(x.dtype))
    return ssim_mask * jnp.clip((1 - n / d) / 2, 0.0, 1.0), ssim_mask
