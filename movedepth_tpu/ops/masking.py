"""Stochastic and geometric masks, jit-safe.

* random_image_mask -- the masked-augmentation box mask
  (reference: movedepth/layers.py:52-69). The reference draws the box
  position with host numpy RNG; here it is jax.random with an explicit key
  and the box is realized with iota comparisons so the shape stays static
  under jit.
* geometric_consistency_mask -- forward-backward reprojection check
  (reference: movedepth/layers.py:814-860), used by the optional
  ``mask_mvs_geo`` flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from movedepth_tpu.ops.geometry import pixel_grid
from movedepth_tpu.ops.sampling import grid_sample


def random_image_mask(key, img, filter_size):
    """Zero out one random (fh, fw) box, shared across the batch.

    img: (B, H, W, C). Returns (masked_img, mask) where mask is 1 outside
    the box and 0 inside, like the reference's filter_mask
    (movedepth/layers.py:62-69).
    """
    fh, fw = filter_size
    b, h, w, c = img.shape
    if fh == h and fw == w:
        return img, None
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (), 0, w - fw)
    y0 = jax.random.randint(ky, (), 0, h - fh)
    ys = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (ys >= y0) & (ys < y0 + fh) & (xs >= x0) & (xs < x0 + fw)
    mask = jnp.where(inside, 0.0, 1.0).astype(img.dtype)[None, :, :, None]
    mask = jnp.broadcast_to(mask, img.shape)
    return img * mask, mask


def geometric_consistency_mask(depth_ref, K_ref, T_ref2src, depth_src, K_src,
                               pixel_thres=1.0, depth_thres=0.1, eps=1e-10):
    """Forward-backward reprojection consistency mask.

    depth_ref/depth_src: (B, H, W); K_*: (B, 4, 4) (only the 3x3 intrinsics
    block is used); T_ref2src: (B, 4, 4). Returns bool (B, H, W): pixels
    whose reprojected position error < pixel_thres AND relative depth error
    < depth_thres (reference: movedepth/layers.py:814-860; border-padded,
    align_corners=True sampling of the source depth).
    """
    b, h, w = depth_ref.shape
    K3_ref = K_ref[:, :3, :3]
    K3_src = K_src[:, :3, :3]
    pix = pixel_grid(h, w, depth_ref.dtype)  # (3, HW), rows (x, y, 1)

    # ref pixels -> ref 3D -> src 3D -> src pixels
    xyz_ref = jnp.linalg.inv(K3_ref) @ (pix[None] * depth_ref.reshape(b, 1, -1))
    ones = jnp.ones((b, 1, h * w), depth_ref.dtype)
    xyz_src = (T_ref2src @ jnp.concatenate([xyz_ref, ones], 1))[:, :3]
    k_xyz_src = K3_src @ xyz_src
    xy_src = k_xyz_src[:, :2] / (k_xyz_src[:, 2:3] + eps)  # (B, 2, HW)

    gx = xy_src[:, 0] / ((w - 1) / 2.0) - 1.0
    gy = xy_src[:, 1] / ((h - 1) / 2.0) - 1.0
    grid = jnp.stack([gx, gy], -1).reshape(b, h, w, 2)
    sampled = grid_sample(depth_src[..., None], grid, padding="border",
                          align_corners=True)  # (B, H, W, 1)

    # src pixels (+ sampled src depth) -> back to ref
    xyz_src2 = jnp.linalg.inv(K3_src) @ (
        jnp.concatenate([xy_src, ones], 1) * sampled.reshape(b, 1, -1)
    )
    xyz_rep = (
        jnp.linalg.inv(T_ref2src) @ jnp.concatenate([xyz_src2, ones], 1)
    )[:, :3]
    depth_rep = xyz_rep[:, 2].reshape(b, h, w)
    k_xyz_rep = K3_ref @ xyz_rep
    xy_rep = k_xyz_rep[:, :2] / (k_xyz_rep[:, 2:3] + eps)
    x_rep = xy_rep[:, 0].reshape(b, h, w)
    y_rep = xy_rep[:, 1].reshape(b, h, w)

    x0 = pix[0].reshape(h, w)
    y0 = pix[1].reshape(h, w)
    dist = jnp.sqrt((x_rep - x0) ** 2 + (y_rep - y0) ** 2)
    rel_diff = jnp.abs(depth_rep - depth_ref) / depth_ref
    return (dist < pixel_thres) & (rel_diff < depth_thres)
