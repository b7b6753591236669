"""Full-resolution photometric image warp as a Pallas TPU kernel.

The train step's hottest op is the full-res border-mode bilinear warp of
the source images by the K = num_scales + 2 depth maps (reference:
F.grid_sample at movedepth/trainer.py:504,526,577). The XLA gather
formulation is row-rate-bound (~127M rows/s); this module reuses the
one-hot MXU contraction of ops/pallas/sweep_warp.py instead:

  * border padding == clamping the coordinates into the frame BEFORE the
    kernel (outside, in XLA) -- every tap then lands in-frame, so the
    zeros-padding kernel computes exactly the border-mode warp, and the
    clamp's own VJP masks the coordinate gradient at the borders exactly
    like the gather formulation's.
  * unlike the cost-volume sweep, the depth/pose training signal flows
    through the grid here, so the op carries a CUSTOM COORDINATE VJP: a
    second Pallas kernel contracts the one-hot *derivatives* (dH/dsx is
    the +-1 two-hot at the taps) against the same resident source:
        dL/dsx[x] = sum_lanes (dH1 @ srcT) * V * tile(g)
        dL/dsy[x] = sum_lanes (H1 @ srcT) * dV * tile(g)
    The source images are training DATA -- they carry no gradient.
  * images are f32 in [0, 1]; the MXU runs bf16. The default mode splits
    the source into bf16 hi + lo halves stacked on the channel axis
    (warp is linear in the source, so warp(src) = warp(hi) + warp(lo)),
    recovering ~f32 source precision for two cheap bf16 passes; the
    remaining error is the bf16 rounding of the bilinear weights
    (<= 2^-9 absolute on [0,1] images). ``precise=True`` runs a single
    f32 HIGHEST-precision pass instead (slower; used by parity tests).
  * windows that cannot cover their taps fall back to the exact XLA
    gather path via lax.cond (the full-row contraction at 192 source rows
    would not fit VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from movedepth_tpu.ops.pallas.sweep_warp import (
    _coord_specs,
    _coverage_ok,
    _effective_window,
    _prep_coords,
    _stack_group,
    _warp_rows_call,
    _window_base,
)


def _coord_bwd_kernel(sx_ref, sy_ref, srcT_ref, g_ref, dref, *, R, C, RW,
                      WHICH):
    """One coordinate-gradient component (WHICH = 'x' or 'y') per launch.

    Computing dsx and dsy in a single kernel keeps ~10 (M, RW*C) f32
    temporaries live (Mosaic does not reuse stack slots across the
    unrolled construction) and blows the 16 MB scoped-VMEM limit at the
    full 640x192 training resolution; two launches halve the live set.
    The backward runs once per train step -- the extra matmul is noise.
    """
    w, db = sx_ref.shape[-2], sx_ref.shape[-1]
    dt = srcT_ref.dtype
    prec = (lax.Precision.HIGHEST if dt == jnp.float32
            else lax.Precision.DEFAULT)

    q = lax.broadcasted_iota(jnp.int32, (w, w), 1)
    lane_r = lax.broadcasted_iota(jnp.int32, (w, RW * C), 1) // C

    sx_all = jnp.clip(sx_ref[0, 0, 0], -2.0, w + 1.0)  # (W, db)
    sy_all = jnp.clip(sy_ref[0, 0, 0], -2.0, R + 1.0)
    x0 = jnp.floor(sx_all)
    y0 = jnp.floor(sy_all)
    fx_all = sx_all - x0
    fy_all = sy_all - y0
    x0_all = x0.astype(jnp.int32)
    y0_all = y0.astype(jnp.int32)

    if RW == R:
        r0 = 0
        src_w = srcT_ref[0]
    else:
        r0 = _window_base(y0_all, R, RW, C)
        src_w = srcT_ref[0, :, pl.ds(pl.multiple_of(r0 * C, 128), RW * C)]

    one = jnp.float32(1.0)
    sg = _stack_group(db, 1, w)
    for g in range(0, db, sg):
        sg = min(sg, db - g)
        m_parts, e_parts, g_parts = [], [], []
        for d in range(g, g + sg):
            fx = fx_all[:, d:d + 1]
            fy = fy_all[:, d:d + 1]
            x0i = x0_all[:, d:d + 1]
            rel = y0_all[:, d:d + 1] - r0
            if WHICH == "x":
                # matmul one-hot: dH; elementwise mask: V
                m_parts.append(jnp.where(q == x0i + 1, one, 0.0)
                               - jnp.where(q == x0i, one, 0.0))
                e_parts.append(jnp.where(lane_r == rel, 1.0 - fy, 0.0)
                               + jnp.where(lane_r == rel + 1, fy, 0.0))
            else:
                # matmul one-hot: H; elementwise mask: dV
                m_parts.append(jnp.where(q == x0i, 1.0 - fx, 0.0)
                               + jnp.where(q == x0i + 1, fx, 0.0))
                e_parts.append(jnp.where(lane_r == rel + 1, one, 0.0)
                               - jnp.where(lane_r == rel, one, 0.0))
            g_parts.append(pltpu.repeat(g_ref[0, d, 0].astype(jnp.float32),
                                        RW, axis=1))  # (W, RW*C)
        m_all = jnp.concatenate(m_parts, axis=0).astype(dt)
        e_all = jnp.concatenate(e_parts, axis=0)
        g_all = jnp.concatenate(g_parts, axis=0)
        mi = jnp.dot(m_all, src_w, precision=prec,
                     preferred_element_type=jnp.float32)
        col = jnp.sum(mi * e_all * g_all, axis=1, keepdims=True)
        for i in range(sg):
            d = g + i
            dref[0, 0, 0, :, d:d + 1] = col[i * w:(i + 1) * w]


def _coord_bwd_call(src_feat, sx_t, sy_t, g, rw, interpret):
    b, r, w, c = src_feat.shape
    _, h, nd, _, db = sx_t.shape
    srcT = jnp.transpose(src_feat, (0, 2, 1, 3)).reshape(b, w, r * c)
    coord_out = jax.ShapeDtypeStruct((b, h, nd, w, db), jnp.float32)
    coord_spec = pl.BlockSpec((1, 1, 1, w, db),
                              lambda bi, hi, di: (bi, hi, di, 0, 0),
                              memory_space=pltpu.VMEM)

    def launch(which):
        kernel = functools.partial(_coord_bwd_kernel, R=r, C=c, RW=rw,
                                   WHICH=which)
        return pl.pallas_call(
            kernel,
            out_shape=coord_out,
            grid=(b, h, nd),
            in_specs=_coord_specs(w, db, 1) + [
                pl.BlockSpec((1, w, c * r), lambda bi, hi, di: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, db, 1, w, c),
                             lambda bi, hi, di: (bi, di, hi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=coord_spec,
            interpret=interpret,
        )(sx_t, sy_t, srcT, g)

    return launch("x"), launch("y")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _warp_rows_cdiff(src_feat, sx_t, sy_t, r, c, rw, interpret=False):
    """Windowed warp, differentiable wrt the COORDINATES (src is data)."""
    return _warp_rows_call(src_feat, sx_t, sy_t, rw, 1, interpret)


def _warp_rows_cdiff_fwd(src_feat, sx_t, sy_t, r, c, rw, interpret=False):
    out = _warp_rows_call(src_feat, sx_t, sy_t, rw, 1, interpret)
    return out, (src_feat, sx_t, sy_t)


def _warp_rows_cdiff_bwd(r, c, rw, interpret, res, g):
    src_feat, sx_t, sy_t = res
    dsx_t, dsy_t = _coord_bwd_call(src_feat, sx_t, sy_t, g, rw, interpret)
    return jnp.zeros_like(src_feat), dsx_t, dsy_t


_warp_rows_cdiff.defvjp(_warp_rows_cdiff_fwd, _warp_rows_cdiff_bwd)


def _pad_channels(x, mult):
    c = x.shape[-1]
    pad = (-c) % mult
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))


def _gather_warp(src, sx, sy):
    """Exact XLA gather fallback (border, align_corners pixel coords)."""
    from movedepth_tpu.ops.sampling import _sample_one, stack_corners
    r, w = src.shape[1], src.shape[2]
    gx = sx / (w - 1) * 2.0 - 1.0
    gy = sy / (r - 1) * 2.0 - 1.0

    def one(im, gxx, gyy):
        corners = stack_corners(im)
        return jax.vmap(lambda a, b: _sample_one(im, a, b, "border", True,
                                                 corners))(gxx, gyy)

    return jax.vmap(one)(src, gx, gy)


@functools.partial(jax.jit, static_argnames=("row_window", "precise",
                                             "interpret"))
def warp_images_border(src, sx, sy, row_window: int = 32,
                       precise: bool = False, interpret: bool = False):
    """Border-mode bilinear warp of images over D coordinate maps.

    src: (B, R, W, C) f32 images; sx, sy: (B, D, R, W) unnormalized pixel
    coordinates (align_corners=True pixel space). Returns (B, D, R, W, C)
    f32, matching ``grid_sample(src, grid, padding='border')`` on the same
    coordinates. Differentiable wrt sx/sy (custom Pallas coordinate VJP
    composed with the border clamp); ``src`` carries NO gradient (the
    photometric targets/sources are data, reference trainer.py:504-529).
    """
    b, r, wsrc, c = src.shape
    _, d, h, w = sx.shape
    assert (h, w) == (r, wsrc), "full-res warp: output grid == image grid"

    # border padding == pre-clamped coordinates; the clamp VJP masks the
    # coordinate gradient outside the frame exactly like the gather path
    sxc = jnp.clip(sx, 0.0, w - 1.0)
    syc = jnp.clip(sy, 0.0, r - 1.0)

    if precise:
        srcp = _pad_channels(src.astype(jnp.float32), 4)
    else:
        hi16 = src.astype(jnp.bfloat16)
        lo16 = (src - hi16.astype(jnp.float32)).astype(jnp.bfloat16)
        srcp = jnp.concatenate(
            [_pad_channels(hi16, 4), _pad_channels(lo16, 4)], axis=-1)
    cp = srcp.shape[-1]
    c4 = cp if precise else cp // 2

    db = d  # K warp maps per source frame: one block
    sx_t = _prep_coords(sxc, db)
    sy_t = _prep_coords(syc, db)

    rw = _effective_window(row_window, r, cp)

    def pallas_path(width):
        out = _warp_rows_cdiff(srcp, sx_t, sy_t, r, cp, width, interpret)
        out = out.astype(jnp.float32)  # (B, D, H, W, Cp)
        if not precise:
            out = out[..., :c4] + out[..., c4:]
        return out[..., :c]

    if rw is None:
        return _gather_warp(src, sxc, syc)
    ladder = [rw]
    rw2 = _effective_window(2 * rw, r, cp)
    if rw2 is not None:
        ladder.append(rw2)
    out = lambda: _gather_warp(src, sxc, syc)
    for width in reversed(ladder):
        ok = _coverage_ok(sy_t, r, width, cp, 1)
        out = (lambda ok=ok, width=width, nxt=out:
               lax.cond(ok, lambda: pallas_path(width), nxt))
    return out()
