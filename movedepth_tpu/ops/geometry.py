"""Pinhole camera geometry as pure JAX functions.

Functional re-design of the reference's stateful geometry modules
(reference: movedepth/layers.py:400-621 -- BackprojectDepth, Project3D,
rot_from_axisangle, get_translation_matrix, transformation_from_parameters,
disp_to_depth). The reference caches meshgrid/ones buffers inside nn.Modules
constructed per (batch, scale); here everything is shape-driven and traced
once under jit, so XLA constant-folds the pixel grid and fuses the small
matmuls into surrounding work.

Conventions:
  * images are NHWC; pixel coordinate order is (x, y);
  * intrinsics K and rigid transforms T are 4x4 (homogeneous), batched as
    leading dims;
  * normalized sampling grids are in [-1, 1] with align_corners=True
    semantics, matching the reference's Project3D output
    (reference: movedepth/layers.py:618-621).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def disp_to_depth(disp, min_depth, max_depth):
    """Sigmoid disparity -> (scaled_disp, depth).

    depth = 1 / (1/max_depth + disp * (1/min_depth - 1/max_depth)).
    (reference: movedepth/layers.py:400-409)
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec):
    """Axis-angle (..., 3) -> homogeneous rotation matrix (..., 4, 4).

    Rodrigues formula (reference: movedepth/layers.py:479-518). Written with
    stacked elementwise math instead of scatter-writes so it vectorizes on
    the VPU and differentiates cleanly.
    """
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (..., 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    c1 = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xc, yc, zc = x * c1, y * c1, z * c1
    xyc, yzc, zxc = x * yc, y * zc, z * xc

    zero = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)
    rot = jnp.stack(
        [
            x * xc + ca, xyc - zs, zxc + ys, zero,
            xyc + zs, y * yc + ca, yzc - xs, zero,
            zxc - ys, yzc + xs, z * zc + ca, zero,
            zero, zero, zero, one,
        ],
        axis=-1,
    )
    return rot.reshape(rot.shape[:-1] + (4, 4))


def get_translation_matrix(t):
    """Translation vector (..., 3) -> homogeneous matrix (..., 4, 4).

    (reference: movedepth/layers.py:464-477)
    """
    eye = jnp.eye(4, dtype=t.dtype)
    eye = jnp.broadcast_to(eye, t.shape[:-1] + (4, 4))
    return eye.at[..., :3, 3].set(t)


def transformation_from_parameters(axisangle, translation, invert=False):
    """(axis-angle, translation) -> 4x4 camera-to-camera transform.

    With ``invert``: R <- R^T, t <- -t, M = R @ T; else M = T @ R
    (reference: movedepth/layers.py:412-429). ``axisangle``/``translation``
    are (..., 3); any reference-style (..., 1, 3) inputs should be squeezed
    by the caller.
    """
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, -1, -2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return R @ T
    return T @ R


def transformation_from_parameters_v2(axisangle, translation, invert=False):
    """Per-pixel transform variant: translation is a dense (B, H, W, 3)
    field (axisangle stays global), -> (B, H, W, 4, 4).

    Capability parity with the reference's experimental per-pixel T
    (reference: movedepth/layers.py:431-461; pairs with project_per_pixel).
    """
    R = rot_from_axisangle(axisangle)[:, None, None]  # (B, 1, 1, 4, 4)
    t = translation
    if invert:
        R = jnp.swapaxes(R, -1, -2)
        t = -t
    T = get_translation_matrix(t)  # (B, H, W, 4, 4)
    if invert:
        return R @ T
    return T @ R


def project_per_pixel(points, K, T, eps=1e-7):
    """Project with per-pixel transforms T (B, H, W, 4, 4).

    points: (B, 4, H*W); K: (B, 4, 4). Returns normalized (B, H, W, 2),
    matching Project3D's 5-D branch (reference: movedepth/layers.py:601-621).
    """
    b, h, w = T.shape[0], T.shape[1], T.shape[2]
    P = (K[:, None, None] @ T)[..., :3, :]  # (B, H, W, 3, 4)
    pts = jnp.swapaxes(points, -1, -2).reshape(b, h, w, 4, 1)
    cam = (P @ pts)[..., 0]  # (B, H, W, 3)
    xy = cam[..., :2] / (cam[..., 2:3] + eps)
    x = xy[..., 0] / (w - 1)
    y = xy[..., 1] / (h - 1)
    return (jnp.stack([x, y], axis=-1) - 0.5) * 2.0


def pixel_grid(height, width, dtype=jnp.float32):
    """Homogeneous pixel grid (3, H*W) with rows (x, y, 1).

    Functional replacement for the buffers cached by BackprojectDepth
    (reference: movedepth/layers.py:567-579); constant-folded by XLA.
    """
    ys, xs = jnp.mgrid[0:height, 0:width]
    ones = jnp.ones_like(xs)
    return jnp.stack(
        [xs.reshape(-1), ys.reshape(-1), ones.reshape(-1)], axis=0
    ).astype(dtype)


def backproject(depth, inv_K):
    """Depth map -> homogeneous camera-frame points.

    depth: (..., H, W); inv_K: (..., 4, 4) broadcastable against depth's
    batch dims. Returns (..., 4, H*W):
    points = depth * (K^-1 @ pix), then append ones.
    (reference: movedepth/layers.py:581-586)
    """
    h, w = depth.shape[-2], depth.shape[-1]
    pix = pixel_grid(h, w, depth.dtype)  # (3, HW)
    rays = inv_K[..., :3, :3] @ pix  # (..., 3, HW)
    cam = depth.reshape(depth.shape[:-2] + (1, h * w)) * rays
    ones = jnp.ones(cam.shape[:-2] + (1, h * w), cam.dtype)
    return jnp.concatenate([cam, ones], axis=-2)


def project_pixel(points, K, T, height, width, eps=1e-7):
    """:func:`project` returning raw PIXEL coordinates as two dense maps.

    points: (..., 4, H*W); K, T: (..., 4, 4). Returns (sx, sy), each
    (..., H, W) in align_corners=True pixel space -- the same values
    ``grid_to_pixel(project(...))`` produces, without the normalize/
    denormalize round trip or the 2-lane-minor (..., H, W, 2) stack
    (which pads the lane dim 64x on TPU). Used by the folded-planar
    photometric path, whose warp kernel takes pixel coords directly.
    """
    P = (K @ T)[..., :3, :]  # (..., 3, 4)
    cam = P @ points  # (..., 3, HW)
    xy = cam[..., :2, :] / (cam[..., 2:3, :] + eps)
    shape = xy.shape[:-2] + (height, width)
    return xy[..., 0, :].reshape(shape), xy[..., 1, :].reshape(shape)


def project(points, K, T, height, width, eps=1e-7):
    """Project homogeneous points into a camera -> normalized grid coords.

    points: (..., 4, H*W); K, T: (..., 4, 4). Returns (..., H, W, 2) in
    [-1, 1], align_corners=True convention:
    pix = (K @ T)[:3] @ points; xy = pix[:2]/(pix[2]+eps);
    out = (xy / (size-1) - 0.5) * 2.
    (reference: movedepth/layers.py:601-621)
    """
    P = (K @ T)[..., :3, :]  # (..., 3, 4)
    cam = P @ points  # (..., 3, HW)
    xy = cam[..., :2, :] / (cam[..., 2:3, :] + eps)  # (..., 2, HW)
    x = xy[..., 0, :] / (width - 1)
    y = xy[..., 1, :] / (height - 1)
    grid = jnp.stack([x, y], axis=-1)  # (..., HW, 2)
    grid = (grid - 0.5) * 2.0
    return grid.reshape(grid.shape[:-2] + (height, width, 2))
