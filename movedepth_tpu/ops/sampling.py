"""Bilinear image sampling/resizing with reference-exact semantics.

The reference leans on ATen CUDA kernels (``F.grid_sample`` at
movedepth/layers.py:791, movedepth/trainer.py:504,526,577 and
``F.interpolate`` in several modes). On TPU these become gather+lerp
expressed in XLA (a fused Pallas variant for the cost-volume hot path lives
in ops/pallas/). Bit-level boundary behavior matters for checkpoint-parity
(SURVEY.md section 7 "hard parts" #1), so both align_corners conventions and
both padding modes are implemented to match torch:

  * align_corners=True:  x_pix = (x+1)/2 * (W-1)
  * align_corners=False: x_pix = ((x+1)*W - 1) / 2
  * padding 'border': clamp coordinates into [0, size-1]
  * padding 'zeros': each of the 4 corner taps is zero when that corner
    index falls outside the image
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stack_corners(img):
    """Precompute the gather table for :func:`_sample_one`.

    img: (H, W, C) -> (H+1, W+1, 4C): zero-pad by one on every side, then
    stack the 2x2 neighborhood of each padded position on the channel axis.
    One 4C-wide gather then fetches all four bilinear taps at once -- on
    TPU this turns four narrow (lane-wasting) gathers into a single gather
    with full lanes, ~3x faster for the C=32 cost-volume features. The
    table is built once per image and amortized over all depth hypotheses.
    """
    h, w, c = img.shape
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=-1
    )  # (H+1, W+1, 4C)


def _sample_one(img, gx, gy, padding, align_corners, corners=None):
    """Bilinear sample one image. img: (H, W, C); gx/gy: (...,) in [-1, 1].

    ``corners`` optionally carries a precomputed :func:`stack_corners`
    table (for amortizing across many grids over the same image).
    Exactness: interior taps come straight from the table; boundary taps
    are handled by the zero padding plus per-corner validity masks
    ('zeros' mode) or by pre-clamped coordinates ('border' mode), matching
    torch bit-for-bit (see tests/test_sampling.py).
    """
    h, w, c = img.shape
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5

    if padding == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)
    elif padding != "zeros":
        raise ValueError(f"unknown padding mode {padding!r}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(img.dtype)
    fy = (y - y0).astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if corners is None:
        corners = stack_corners(img)
    # padded-table base index; +1 compensates the zero-pad offset
    by = jnp.clip(y0i + 1, 0, h)
    bx = jnp.clip(x0i + 1, 0, w)
    flat = corners.reshape((h + 1) * (w + 1), 4 * c)
    v = jnp.take(flat, by * (w + 1) + bx, axis=0)  # (..., 4C)
    v00, v01, v10, v11 = v[..., :c], v[..., c:2 * c], v[..., 2 * c:3 * c], \
        v[..., 3 * c:]

    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]

    if padding == "zeros":
        def inb(iy, ix):
            return ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))[
                ..., None
            ].astype(img.dtype)

        # per-corner validity; also kills the clamped-base junk when the
        # whole 2x2 stencil is out of frame
        w00 = w00 * inb(y0i, x0i)
        w01 = w01 * inb(y0i, x0i + 1)
        w10 = w10 * inb(y0i + 1, x0i)
        w11 = w11 * inb(y0i + 1, x0i + 1)

    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def grid_sample(img, grid, padding="border", align_corners=True):
    """torch.nn.functional.grid_sample (bilinear) for NHWC images.

    img: (B, H, W, C); grid: (B, Ho, Wo, 2) with (x, y) in [-1, 1].
    Returns (B, Ho, Wo, C). Matches torch bilinear semantics for both
    ``padding`` in {'zeros','border'} and both align_corners settings
    (reference call sites: movedepth/layers.py:791, trainer.py:504-529).
    """
    fn = lambda im, g: _sample_one(im, g[..., 0], g[..., 1], padding, align_corners)
    return jax.vmap(fn)(img, grid)


def sample_pix(img, x, y, padding="border"):
    """Bilinear sample at unnormalized pixel coords. img: (H, W, C)."""
    h, w = img.shape[0], img.shape[1]
    gx = x / (w - 1) * 2.0 - 1.0
    gy = y / (h - 1) * 2.0 - 1.0
    return _sample_one(img, gx, gy, padding, align_corners=True)


def resize_bilinear(img, out_hw, align_corners=False):
    """torch F.interpolate(mode='bilinear') for NHWC (and NHW) images.

    Matches torch's coordinate mapping for both align_corners settings,
    including edge clamping (reference interpolations:
    movedepth/trainer.py:407,412,420,512,736; layers.py:375-379).
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[..., None]
    b, h, w, c = img.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        out = img
    else:
        if align_corners:
            ys = jnp.linspace(0.0, h - 1.0, oh) if oh > 1 else jnp.zeros((1,))
            xs = jnp.linspace(0.0, w - 1.0, ow) if ow > 1 else jnp.zeros((1,))
        else:
            sy, sx = h / oh, w / ow
            ys = (jnp.arange(oh) + 0.5) * sy - 0.5
            xs = (jnp.arange(ow) + 0.5) * sx - 0.5
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)
        # Separable interpolation: rows then cols (two small gathers).
        y0 = jnp.floor(ys).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        fy = (ys - y0.astype(ys.dtype))[None, :, None, None].astype(img.dtype)
        rows = jnp.take(img, y0, axis=1) * (1 - fy) + jnp.take(img, y1, axis=1) * fy
        x0 = jnp.floor(xs).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        fx = (xs - x0.astype(xs.dtype))[None, None, :, None].astype(img.dtype)
        out = jnp.take(rows, x0, axis=2) * (1 - fx) + jnp.take(rows, x1, axis=2) * fx
    return out[..., 0] if squeeze else out


def upsample_nearest_2x(img):
    """torch F.interpolate(scale_factor=2, mode='nearest') for NHWC.

    (reference: movedepth/layers.py:624-627)
    """
    img = jnp.repeat(img, 2, axis=1)
    return jnp.repeat(img, 2, axis=2)
