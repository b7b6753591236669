"""Fused plane-sweep warp as a Pallas TPU kernel.

Replaces the gather-based bilinear warp of the MVS cost volume
(reference hot op: F.grid_sample at movedepth/layers.py:791) with a
TPU-native formulation: bilinear sampling of a whole output row is two
ONE-HOT CONTRACTIONS that run on the MXU instead of per-element gathers
(the TPU has no vector gather unit):

  warp[x, c] = sum_q H[x, q] * sum_r V[x, r] * src[r, q, c]

with H/V the (2-nonzero) horizontal/vertical bilinear selection matrices,
built in-kernel by lane-iota comparison. Built from *unclamped* floor
indices, the one-hots vanish for out-of-frame taps, which reproduces torch
grid_sample's zeros-padding semantics exactly.

Per grid step (one image row x one block of depth bins), for each bin:
  hi   = H1 @ srcT                (MXU: (W, W) @ (W, R*C))
  warp = (hi * Vexp) @ S          (MXU: (W, R*C) @ (R*C, C); S sums over r)

The transposed source feature map stays resident in VMEM across all
(row, depth) grid steps of a batch element; HBM traffic is O(output)
instead of the gather's 4-taps-per-point random access. Coordinates are
fed pre-transposed as (..., W, depth_block) so each bin's coordinate
vector is a natural sublane column (Mosaic cannot relayout lanes into
sublanes in-kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(sx_ref, sy_ref, srcT_ref, out_ref, *, R, C):
    w, db = sx_ref.shape[-2], sx_ref.shape[-1]
    srcT = srcT_ref[0]  # (W, R*C)
    dt = srcT.dtype
    # MXU default precision is bf16 multiplies; f32 inputs need the 3-pass
    # mode to match the f32 gather path (bf16 features use the fast path)
    prec = (lax.Precision.HIGHEST if dt == jnp.float32
            else lax.Precision.DEFAULT)

    q = lax.broadcasted_iota(jnp.int32, (w, w), 1)
    rid = lax.broadcasted_iota(jnp.int32, (w, R * C), 1) // C
    rc = lax.broadcasted_iota(jnp.int32, (R * C, C), 0) % C
    cc = lax.broadcasted_iota(jnp.int32, (R * C, C), 1)
    s = (rc == cc).astype(dt)

    sx_all = sx_ref[0, 0, 0]  # (W, db)
    sy_all = sy_ref[0, 0, 0]
    for d in range(db):
        # clip guards int32 overflow; anything past [-1, size] contributes 0
        sx = jnp.clip(sx_all[:, d:d + 1], -2.0, w + 1.0)  # (W, 1)
        sy = jnp.clip(sy_all[:, d:d + 1], -2.0, R + 1.0)
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        h1 = (jnp.where(q == x0i, 1.0 - fx, 0.0)
              + jnp.where(q == x0i + 1, fx, 0.0))  # (W, Wsrc)
        hi = jnp.dot(h1.astype(dt), srcT, precision=prec,
                     preferred_element_type=jnp.float32)  # (W, R*C)
        vexp = (jnp.where(rid == y0i, 1.0 - fy, 0.0)
                + jnp.where(rid == y0i + 1, fy, 0.0))
        warp = jnp.dot((hi * vexp).astype(dt), s, precision=prec,
                       preferred_element_type=jnp.float32)  # (W, C)
        out_ref[0, d] = warp.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("d_block", "interpret"))
def sweep_warp(src_feat, sx, sy, d_block: int = 8, interpret: bool = False):
    """Warp src features over all depth hypotheses (zeros padding, bilinear).

    src_feat: (B, R, W, C) NHWC source features;
    sx, sy:   (B, D, H, W) unnormalized pixel coordinates into src.
    Returns (B, D, H, W, C), numerically matching
    ops.sampling.grid_sample(..., padding='zeros') on the same coords.
    """
    b, r, wsrc, c = src_feat.shape
    _, d, h, w = sx.shape
    assert wsrc == w, "source/output widths must match at the prior scale"
    db = min(d_block, d)
    assert d % db == 0
    nd = d // db

    # (B, W, R*C): contraction layout for the horizontal one-hot matmul
    srcT = jnp.transpose(src_feat, (0, 2, 1, 3)).reshape(b, w, r * c)
    # coords -> (B, H, nd, W, db): per-bin coordinate columns
    def prep(a):
        a = jnp.transpose(a, (0, 2, 1, 3)).reshape(b, h, nd, db, w)
        return jnp.transpose(a, (0, 1, 2, 4, 3))

    sx_t = prep(sx)
    sy_t = prep(sy)

    kernel = functools.partial(_warp_kernel, R=r, C=c)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h * d, w, c), src_feat.dtype),
        grid=(b, h, nd),
        in_specs=[
            pl.BlockSpec((1, 1, 1, w, db),
                         lambda bi, hi, di: (bi, hi, di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, db),
                         lambda bi, hi, di: (bi, hi, di, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, r * c),
                         lambda bi, hi, di: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, db, w, c),
                               lambda bi, hi, di: (bi, hi * nd + di, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sx_t, sy_t, srcT)
    return jnp.transpose(out.reshape(b, h, d, w, c), (0, 2, 1, 3, 4))


def grid_to_pixel(grid, height, width):
    """Normalized [-1,1] grid (align_corners=True) -> pixel coords."""
    sx = (grid[..., 0] + 1.0) * 0.5 * (width - 1)
    sy = (grid[..., 1] + 1.0) * 0.5 * (height - 1)
    return sx, sy
