"""Folded-planar image layout for TPU-dense elementwise chains.

XLA tiles the two minor dims of every array onto (8 sublanes x 128
lanes). NHWC images with C=3 therefore pad the lane dim 42x, and
single-channel loss maps with a trailing 1 pad it 128x -- every
elementwise pass over them runs at a few percent of VPU speed. The
folded-planar form packs channels into the SUBLANE dim instead:

    (..., H, W, C)  ->  (..., H*cp, W)      with C zero-padded to cp

so W (>= 128 at training resolutions) fills the lanes and the folded
H*cp rows fill the sublanes densely. A vertical image shift of one row
is a folded shift of ``cp`` rows, so separable window ops (SSIM pooling,
smoothness gradients) stay pure aligned slices. Pad channels are ZERO;
the loss math maps zeros to exact-zero contributions (|0-0| = 0 for L1,
dissim(0, 0) = 0 for SSIM), so channel SUMS over the fold are exact --
divide by the real channel count, never by cp.

Used by the photometric-loss path (pipeline.photometric_losses) and the
Pallas image-warp kernel, whose native output layout is already folded
(ops/pallas/image_warp.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def fold_image(x, cp: int = 4):
    """NHWC ``(..., H, W, C)`` -> folded planar ``(..., H*cp, W)``.

    Channels are zero-padded to ``cp`` so the fold divides the sublane
    tile (cp in {4, 8} keeps every row-shift slice 8-aligned in pairs).
    """
    c = x.shape[-1]
    if c > cp:
        raise ValueError(f"C={c} > fold {cp}")
    if c < cp:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, cp - c),))
    xt = jnp.moveaxis(x, -1, -2)  # (..., H, cp, W)
    return xt.reshape(*x.shape[:-3], x.shape[-3] * cp, x.shape[-2])


def unfold_image(xf, c: int, cp: int = 4):
    """Folded planar ``(..., H*cp, W)`` -> NHWC ``(..., H, W, c)``."""
    a, w = xf.shape[-2], xf.shape[-1]
    x = xf.reshape(*xf.shape[:-2], a // cp, cp, w)
    return jnp.moveaxis(x, -2, -1)[..., :c]


def channel_mean_folded(x, c: int, cp: int = 4):
    """Per-pixel channel mean of a folded map: ``(..., H*cp, W)`` ->
    ``(..., H, W)``. Sums the fold (pad channels are zero) and divides
    by the REAL channel count ``c``."""
    a, w = x.shape[-2], x.shape[-1]
    xs = x.reshape(*x.shape[:-2], a // cp, cp, w)
    return jnp.sum(xs, axis=-2) / c
