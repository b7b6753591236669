"""Full-resolution photometric image warp as a Pallas TPU kernel.

The train step's hottest op is the full-res border-mode bilinear warp of
the source images by the K = num_scales + 2 depth maps (reference:
F.grid_sample at movedepth/trainer.py:504,526,577). The XLA gather
formulation is row-rate-bound (~127M rows/s); this module uses one-hot
MXU contractions instead (see ops/pallas/sweep_warp.py for the idea).

PLANAR "CW" LAYOUT -- the part that makes it trainable: Pallas constrains
custom-call operands/results to dense row-major, and XLA tiles the two
minor dims (8, 128). A (B, K, H, W, 3) result therefore pads its 3-lane
minor dim to 128 (42x memory blowup -- 2.8 GB per temp at 640x192 train
resolution, which OOMs HBM at batch 8). Every tensor crossing the kernel
boundary here is laid out with W as the MINOR dim instead:

    coords  (B, H, 1, K, W)        src  (B, R*C, W)
    output  (B, K, H, C, W)        coord grads like coords

so nothing pads more than ~2x. The one-hot math is written transposed to
match -- selection matrices are built from coordinate ROW vectors with
sublane iota, the bilinear taps become

    outT[c, x] = sum_r V^T[r*C+c, x] * (srcT @ H^T)[r*C+c, x]

and the row-window reduction is aligned sublane halving. No in-kernel
transposes or unaligned slices anywhere. The thin XLA transpose back to
NHWC after the kernel is plain HLO -- XLA picks efficient layouts for it.

Other design points:

  * border padding == clamping the coordinates into the frame BEFORE the
    kernel (outside, in XLA) -- every tap then lands in-frame, so the
    zeros-padding math computes exactly the border-mode warp, and the
    clamp's own VJP masks the coordinate gradient at the borders exactly
    like the gather formulation's.
  * unlike the cost-volume sweep, the depth/pose training signal flows
    through the grid here, so the op carries a CUSTOM COORDINATE VJP:
    one Pallas launch per component (dsx, dsy) contracts the one-hot
    *derivatives* against the same resident source (two launches keep
    the f32 temporaries inside the 16 MB scoped-VMEM limit).
    The source images are training DATA -- they carry no gradient.
  * images are f32 in [0, 1]; the MXU runs bf16. The default mode splits
    the source into bf16 hi + lo halves stacked on the channel axis
    (warp is linear in the source, so warp(src) = warp(hi) + warp(lo)),
    recovering ~f32 source precision for two cheap bf16 passes; the
    remaining error is the bf16 rounding of the bilinear weights
    (<= 2^-9 absolute on [0,1] images). ``precise=True`` runs a single
    f32 HIGHEST-precision pass instead (slower; used by parity tests).
  * windows that cannot cover their taps fall back to the exact XLA
    gather path via lax.cond (the full-row contraction at 192 source
    rows would not fit VMEM).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_align_cw(c: int) -> int:
    """Window bases must put the sublane offset r0*C on a 16 boundary
    (the stricter bf16 sublane tile; f32 needs only 8)."""
    return max(1, 16 // math.gcd(c, 16))


def _effective_window_cw(rw, r, c):
    if rw is None:
        return None
    align = _row_align_cw(c)
    rw = max(rw, 2 * align)
    rw = 1 << (rw - 1).bit_length()
    return None if rw >= r else rw


def _window_base_cw(y0i, R, RW, C):
    """Aligned window base from the floor'd vertical coords of one block.
    Must stay in lockstep with `_coverage_ok_cw`."""
    valid = (y0i >= -1) & (y0i <= R - 1)
    mn = jnp.min(jnp.where(valid, jnp.maximum(y0i, 0), R - 1))
    align = _row_align_cw(C)
    hi = (R - RW) - (R - RW) % align
    return jnp.clip(mn - mn % align, 0, hi)


def _coverage_ok_cw(sy, R, RW, C, db):
    """Host-side replica of `_window_base_cw` over every (h, nd) block.
    sy: natural (B, D, H, W); one window per (b, h, d-block) grid step.
    Pure axis reductions -- no materialized transpose."""
    b, d, h, w = sy.shape
    blocks = sy.reshape(b, d // db, db, h, w)
    y0 = jnp.floor(jnp.clip(blocks, -2.0, R + 1.0)).astype(jnp.int32)
    valid = (y0 >= -1) & (y0 <= R - 1)
    mn = jnp.min(jnp.where(valid, jnp.maximum(y0, 0), R - 1), axis=(2, 4))
    mx = jnp.max(jnp.where(valid, jnp.minimum(y0 + 1, R - 1), 0),
                 axis=(2, 4))
    align = _row_align_cw(C)
    hi = (R - RW) - (R - RW) % align
    r0 = jnp.clip(mn - mn % align, 0, hi)
    return jnp.all(mx <= r0 + RW - 1)


_LANE_ALIGN = 128  # dynamic lane-dim slices must sit on a 128 boundary


def _effective_col_window_cw(cw, w):
    """Source-column window actually used for a requested ``cw``.

    Rounded up to a multiple of the 128-lane tile; the 128-aligned base
    can sit up to 127 columns below the leftmost tap, so the minimum
    useful window is 2 tiles. At >= W the windowing is a no-op."""
    if not cw:
        return None
    cw = ((max(cw, 2 * _LANE_ALIGN) + 127) // 128) * 128
    return None if cw >= w else cw


def _x_chunk_cw(w: int, cw: int) -> int:
    """Output columns per chunk: the largest divisor of w <= 3/8 of the
    window, leaving >= half the window for the base's 128-alignment loss
    plus the epipolar disparity band."""
    xb = max(1, cw * 3 // 8)
    while w % xb:
        xb -= 1
    return xb


def _col_base_cw(x0i, W, CW):
    """128-aligned column-window base from the floor'd horizontal coords
    of one (d-block x x-chunk). Lockstep with `_coverage_x_ok_cw`."""
    valid = (x0i >= -1) & (x0i <= W - 1)
    mn = jnp.min(jnp.where(valid, jnp.maximum(x0i, 0), W - 1))
    hi = (W - CW) - (W - CW) % _LANE_ALIGN
    return jnp.clip(mn - mn % _LANE_ALIGN, 0, hi)


def _coverage_x_ok_cw(sx, W, CW, XB, db):
    """Host-side replica of `_col_base_cw` over every (b, h, d-block,
    x-chunk): true iff each chunk's CW-column window covers its in-frame
    horizontal taps. sx: natural (B, D, H, W)."""
    b, d, h, w = sx.shape
    blocks = sx.reshape(b, d // db, db, h, w // XB, XB)
    x0 = jnp.floor(jnp.clip(blocks, -2.0, W + 1.0)).astype(jnp.int32)
    valid = (x0 >= -1) & (x0 <= W - 1)
    mn = jnp.min(jnp.where(valid, jnp.maximum(x0, 0), W - 1), axis=(2, 5))
    mx = jnp.max(jnp.where(valid, jnp.minimum(x0 + 1, W - 1), 0),
                 axis=(2, 5))
    hi = (W - CW) - (W - CW) % _LANE_ALIGN
    c0 = jnp.clip(mn - mn % _LANE_ALIGN, 0, hi)
    return jnp.all(mx <= c0 + CW - 1)


def _chunk_sum_rows(x, c):
    """Sum an (n*c, W) array over its n sublane chunks -> (c, W).

    Halving adds while the chunk count is even (aligned sublane slices),
    then a short linear tail for an odd remainder.
    """
    height = x.shape[0]
    while height > c and (height // c) % 2 == 0:
        half = height // 2
        x = x[:half] + x[half:height]
        height = half
    if height > c:
        acc = x[0:c]
        for off in range(c, height, c):
            acc = acc + x[off:off + c]
        x = acc
    return x


def _coord_specs_cw(w, db):
    """Blocks sliced from the (B, D, H, 1, W) view of the natural coords
    -- W is already the minor dim, so no host-side transpose (a
    materialized coords transpose costs a ~5x-padded half-GB copy at
    train size). The singleton dim satisfies Mosaic's block rule (the
    last two block dims must divide (8, 128) or equal the array dims)."""
    spec = pl.BlockSpec((1, db, 1, 1, w),
                        lambda bi, hi, di: (bi, di, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    return [spec, spec]


def _stack_n(db: int, w: int) -> int:
    """Bins stacked along the matmul N dim, bounding N = sg*W.

    Mosaic keeps every unrolled (Wsrc, N) / (RW*C, N) temporary live, so
    the budget is conservative: N <= 1280 keeps the ~6 live copies well
    inside the 16 MB scoped-VMEM limit at RW*C = 256."""
    return min(db, 4, max(1, 1280 // w))


def _cw_onehots(sx_row, sy_row, R, C, RW, kw, xw, r0, c0, dt, derivative):
    """Transposed selection matrices for one bin.

    sx_row/sy_row: (1, xw) coordinate rows (natural coords -- ``c0``
    makes the horizontal taps window-relative; integer f32 subtraction is
    exact). Returns (HT (kw, xw) cast to dt, VT (RW*C, xw) f32);
    ``derivative`` picks d/dsx resp. d/dsy forms.
    """
    if c0 is not None:
        sx_row = sx_row - c0
    qT = lax.broadcasted_iota(jnp.int32, (kw, xw), 0)  # [q, x] = q
    rT = lax.broadcasted_iota(jnp.int32, (RW * C, xw), 0) // C

    if derivative is None and dt != jnp.float32:
        # bf16 production forward: bilinear HAT build, 3 VPU ops/element
        # vs the where-form's 5 (see sweep_warp._sweep_body; <= 1-2 f32
        # ulp reassociation difference, below this path's bf16 rounding).
        # The derivative forms and the f32 parity path keep the exact
        # compare/select construction.
        ht = jnp.maximum(0.0, 1.0 - jnp.abs(qT.astype(jnp.float32)
                                            - sx_row))
        vt = jnp.maximum(0.0, 1.0 - jnp.abs(rT.astype(jnp.float32)
                                            - (sy_row - r0)))
        return ht.astype(dt), vt

    x0 = jnp.floor(sx_row)
    y0 = jnp.floor(sy_row)
    fx = sx_row - x0
    fy = sy_row - y0
    x0i = x0.astype(jnp.int32)
    rel = y0.astype(jnp.int32) - r0
    one = jnp.float32(1.0)
    if derivative == "x":
        ht = (jnp.where(qT == x0i + 1, one, 0.0)
              - jnp.where(qT == x0i, one, 0.0))
    else:
        ht = (jnp.where(qT == x0i, 1.0 - fx, 0.0)
              + jnp.where(qT == x0i + 1, fx, 0.0))
    if derivative == "y":
        vt = (jnp.where(rT == rel + 1, one, 0.0)
              - jnp.where(rT == rel, one, 0.0))
    else:
        vt = (jnp.where(rT == rel, 1.0 - fy, 0.0)
              + jnp.where(rT == rel + 1, fy, 0.0))
    return ht.astype(dt), vt


def _src_window(srcT_ref, r0, rw_c, c0, CW, R, C):
    """One VMEM load of the (row x column)-windowed source block."""
    rsl = (slice(None) if rw_c is None
           else pl.ds(pl.multiple_of(r0 * C, 8), rw_c))
    if c0 is None:
        return srcT_ref[0, rsl]
    return srcT_ref[0, rsl, pl.ds(pl.multiple_of(c0, _LANE_ALIGN), CW)]


def _warp_cw_kernel(sx_ref, sy_ref, srcT_ref, *refs, R, C, RW, CW, XB,
                    NC=0):
    """Forward: outT[c, x] = sum_r VT[r*C+c, x] * (srcW @ HT)[r*C+c, x].

    With CW set, output columns run in XB-wide chunks whose horizontal
    taps sit in an epipolar disparity band: the H contraction reads a
    CW-column source window (K drops W -> CW) and the one-hot builds
    shrink from (W, W) to (CW, XB) per chunk.

    With NC > 0 (the L1 epilogue), an extra target input ``tgtT_ref``
    precedes the outputs and a second output ``l1_ref`` follows: the
    per-pixel photometric L1 mean over the NC real channels,
    |warp(src) - target| -- computed from the STORE-dtype warped values
    (hi+lo recombined for the bf16 split path), so it equals the XLA tail
    computed from the kernel's output bit for bit."""
    if NC:
        tgt_ref, out_ref, l1_ref = refs
    else:
        (out_ref,) = refs
    db, w = sx_ref.shape[1], sx_ref.shape[4]
    dt = srcT_ref.dtype
    prec = (lax.Precision.HIGHEST if dt == jnp.float32
            else lax.Precision.DEFAULT)

    sx_all = jnp.clip(sx_ref[0, :, 0, 0], -2.0, w + 1.0)  # (db, W)
    sy_all = jnp.clip(sy_ref[0, :, 0, 0], -2.0, R + 1.0)

    rw_c = None if RW == R else RW * C
    r0 = 0
    if rw_c is not None:
        y0i = jnp.floor(sy_all).astype(jnp.int32)
        r0 = _window_base_cw(y0i, R, RW, C)

    nxc = 1 if CW is None else w // XB
    xw = w if CW is None else XB
    kw = w if CW is None else CW
    sg0 = _stack_n(db, xw)
    for xc in range(nxc):
        if CW is None:
            xsl = slice(None)
            c0 = c0f = None
        else:
            xsl = slice(xc * XB, (xc + 1) * XB)
            x0_blk = jnp.floor(sx_all[:, xsl]).astype(jnp.int32)
            c0 = _col_base_cw(x0_blk, w, CW)
            c0f = c0.astype(jnp.float32)
        src_x = _src_window(srcT_ref, r0, rw_c, c0, CW, R, C)
        for g in range(0, db, sg0):
            sg = min(sg0, db - g)
            hts = []
            vts = []
            for d in range(g, g + sg):
                ht, vt = _cw_onehots(sx_all[d:d + 1, xsl],
                                     sy_all[d:d + 1, xsl], R, C, RW, kw,
                                     xw, r0, c0f, dt, None)
                hts.append(ht)
                vts.append(vt)
            ht_all = jnp.concatenate(hts, axis=1)  # (kw, sg*xw)
            hi = jnp.dot(src_x, ht_all, precision=prec,
                         preferred_element_type=jnp.float32)
            for i in range(sg):
                hv = _chunk_sum_rows(hi[:, i * xw:(i + 1) * xw] * vts[i], C)
                hvs = hv.astype(out_ref.dtype)
                if CW is None:
                    out_ref[0, g + i, 0] = hvs
                else:
                    out_ref[0, g + i, 0, :, xsl] = hvs
                if NC:
                    # recombine exactly like the XLA tail: cast-then-sum
                    wf = hvs.astype(jnp.float32)
                    c4 = C if dt == jnp.float32 else C // 2
                    wsum = wf[:NC] if c4 == C else wf[:NC] + wf[c4:c4 + NC]
                    diff = jnp.abs(wsum - tgt_ref[0, 0, :NC, xsl])
                    # true division: bit-matches jnp.mean's reduce+div
                    l1 = (sum(diff[c:c + 1] for c in range(NC))
                          / jnp.float32(NC))
                    if CW is None:
                        l1_ref[0, g + i, 0] = l1
                    else:
                        l1_ref[0, g + i, 0, :, xsl] = l1


def _warp_cw_call(srcT, sx, sy, r, c, rw, db, cw, interpret, tgtT=None,
                  nc=0):
    b = srcT.shape[0]
    _, d, h, w = sx.shape
    nd = d // db
    sx5 = sx.reshape(b, d, h, 1, w)  # free: metadata-only singleton
    sy5 = sy.reshape(b, d, h, 1, w)
    kernel = functools.partial(_warp_cw_kernel, R=r, C=c, RW=rw, CW=cw,
                               XB=None if cw is None else _x_chunk_cw(w, cw),
                               NC=0 if tgtT is None else nc)
    in_specs = _coord_specs_cw(w, db) + [
        pl.BlockSpec((1, r * c, w), lambda bi, hi, di: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = jax.ShapeDtypeStruct((b, d, h, c, w), srcT.dtype)
    out_spec = pl.BlockSpec((1, db, 1, c, w),
                            lambda bi, hi, di: (bi, di, hi, 0, 0),
                            memory_space=pltpu.VMEM)
    args = (sx5, sy5, srcT)
    if tgtT is not None:
        in_specs = in_specs + [
            pl.BlockSpec((1, 1, tgtT.shape[2], w),
                         lambda bi, hi, di: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, d, h, 1, w), jnp.float32))
        out_spec = (out_spec,
                    pl.BlockSpec((1, db, 1, 1, w),
                                 lambda bi, hi, di: (bi, di, hi, 0, 0),
                                 memory_space=pltpu.VMEM))
        args = args + (tgtT,)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b, h, nd),
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(*args)


def _coord_bwd_cw_kernel(sx_ref, sy_ref, srcT_ref, g_ref, dref,
                         *, R, C, RW, CW, XB, WHICH):
    """One coordinate-gradient component (WHICH = 'x' or 'y') per launch.

    Computing dsx and dsy in one kernel keeps ~10 (RW*C, N) f32
    temporaries live (Mosaic does not reuse stack slots across unrolled
    constructions) and blows the 16 MB scoped-VMEM limit at the full
    640x192 training resolution; two launches halve the live set. The
    backward runs once per train step -- the extra matmul is noise.
    Column windowing (CW/XB) chunks exactly like the forward.
    """
    db, w = sx_ref.shape[1], sx_ref.shape[4]
    dt = srcT_ref.dtype
    prec = (lax.Precision.HIGHEST if dt == jnp.float32
            else lax.Precision.DEFAULT)

    sx_all = jnp.clip(sx_ref[0, :, 0, 0], -2.0, w + 1.0)
    sy_all = jnp.clip(sy_ref[0, :, 0, 0], -2.0, R + 1.0)

    rw_c = None if RW == R else RW * C
    r0 = 0
    if rw_c is not None:
        y0i = jnp.floor(sy_all).astype(jnp.int32)
        r0 = _window_base_cw(y0i, R, RW, C)

    nxc = 1 if CW is None else w // XB
    xw = w if CW is None else XB
    kw = w if CW is None else CW
    sg0 = _stack_n(db, xw)
    for xc in range(nxc):
        if CW is None:
            xsl = slice(None)
            c0 = c0f = None
        else:
            xsl = slice(xc * XB, (xc + 1) * XB)
            x0_blk = jnp.floor(sx_all[:, xsl]).astype(jnp.int32)
            c0 = _col_base_cw(x0_blk, w, CW)
            c0f = c0.astype(jnp.float32)
        src_x = _src_window(srcT_ref, r0, rw_c, c0, CW, R, C)
        for g in range(0, db, sg0):
            sg = min(sg0, db - g)
            hts = []
            vts = []
            for d in range(g, g + sg):
                ht, vt = _cw_onehots(sx_all[d:d + 1, xsl],
                                     sy_all[d:d + 1, xsl], R, C, RW, kw,
                                     xw, r0, c0f, dt, WHICH)
                hts.append(ht)
                vts.append(vt)
            ht_all = jnp.concatenate(hts, axis=1)
            mi = jnp.dot(src_x, ht_all, precision=prec,
                         preferred_element_type=jnp.float32)
            for i in range(sg):
                d = g + i
                gexp = pltpu.repeat(
                    g_ref[0, d, 0][:, xsl].astype(jnp.float32), RW,
                    axis=0)  # (RW*C, xw): row r*C+c = g[c]
                col = jnp.sum(mi[:, i * xw:(i + 1) * xw] * vts[i] * gexp,
                              axis=0, keepdims=True)  # (1, xw)
                if CW is None:
                    dref[0, d, 0] = col
                else:
                    dref[0, d, 0, :, xsl] = col


def _coord_bwd_cw_call(srcT, sx, sy, g, r, c, rw, db, cw, interpret):
    b = srcT.shape[0]
    _, d, h, w = sx.shape
    nd = d // db
    sx5 = sx.reshape(b, d, h, 1, w)
    sy5 = sy.reshape(b, d, h, 1, w)
    coord_out = jax.ShapeDtypeStruct((b, d, h, 1, w), jnp.float32)
    coord_spec = pl.BlockSpec((1, db, 1, 1, w),
                              lambda bi, hi, di: (bi, di, hi, 0, 0),
                              memory_space=pltpu.VMEM)

    def launch(which):
        kernel = functools.partial(
            _coord_bwd_cw_kernel, R=r, C=c, RW=rw, CW=cw,
            XB=None if cw is None else _x_chunk_cw(w, cw), WHICH=which)
        return pl.pallas_call(
            kernel,
            out_shape=coord_out,
            grid=(b, h, nd),
            in_specs=_coord_specs_cw(w, db) + [
                pl.BlockSpec((1, r * c, w), lambda bi, hi, di: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, db, 1, c, w),
                             lambda bi, hi, di: (bi, di, hi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=coord_spec,
            interpret=interpret,
        )(sx5, sy5, srcT, g)

    return (launch("x").reshape(b, d, h, w),
            launch("y").reshape(b, d, h, w))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _warp_cw_cdiff(srcT, sx, sy, r, c, rw, db, cw=None, interpret=False):
    """Windowed CW warp, differentiable wrt the COORDINATES (src is data)."""
    return _warp_cw_call(srcT, sx, sy, r, c, rw, db, cw, interpret)


def _warp_cw_cdiff_fwd(srcT, sx, sy, r, c, rw, db, cw=None,
                       interpret=False):
    out = _warp_cw_call(srcT, sx, sy, r, c, rw, db, cw, interpret)
    return out, (srcT, sx, sy)


def _warp_cw_cdiff_bwd(r, c, rw, db, cw, interpret, res, g):
    srcT, sx, sy = res
    dsx, dsy = _coord_bwd_cw_call(srcT, sx, sy, g, r, c, rw, db, cw,
                                  interpret)
    return jnp.zeros_like(srcT), dsx, dsy


_warp_cw_cdiff.defvjp(_warp_cw_cdiff_fwd, _warp_cw_cdiff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _warp_cw_l1_cdiff(srcT, tgtT, sx, sy, r, c, rw, db, cw, nc,
                      interpret=False):
    """Windowed CW warp + in-kernel photometric L1 epilogue.

    Returns (outT, l1) with l1 = mean_c |warp(src) - target| over the nc
    real channels, computed inside the warp kernel from the store-dtype
    values (no HBM round-trip of the warped stack for the L1 tail).
    Differentiable wrt the coordinates only; the L1 cotangent folds into
    the warp-output cotangent (d l1/d w_c = sign(w_c - t_c)/nc on both
    the hi and lo channel slots) so the SAME coordinate-VJP kernel
    serves both outputs.
    """
    return _warp_cw_call(srcT, sx, sy, r, c, rw, db, cw, interpret,
                         tgtT, nc)


def _warp_cw_l1_cdiff_fwd(srcT, tgtT, sx, sy, r, c, rw, db, cw, nc,
                          interpret=False):
    out, l1 = _warp_cw_call(srcT, sx, sy, r, c, rw, db, cw, interpret,
                            tgtT, nc)
    return (out, l1), (srcT, tgtT, sx, sy, out)


def _warp_cw_l1_cdiff_bwd(r, c, rw, db, cw, nc, interpret, res, g):
    srcT, tgtT, sx, sy, out = res
    g_out, g_l1 = g
    c4 = c if srcT.dtype == jnp.float32 else c // 2
    wf = out.astype(jnp.float32)  # (B, D, H, C, W)
    wsum = (wf[:, :, :, :nc] if c4 == c
            else wf[:, :, :, :nc] + wf[:, :, :, c4:c4 + nc])
    # sign from the stored values == the forward's cast-then-sum values
    sgn = jnp.sign(wsum - tgtT[:, None, :, :nc])
    add = jnp.pad(sgn * (g_l1.astype(jnp.float32) / nc),
                  ((0, 0), (0, 0), (0, 0), (0, c4 - nc), (0, 0)))
    if c4 != c:
        add = jnp.concatenate([add, add], axis=3)
    g_eff = g_out.astype(jnp.float32) + add
    dsx, dsy = _coord_bwd_cw_call(srcT, sx, sy, g_eff, r, c, rw, db, cw,
                                  interpret)
    return jnp.zeros_like(srcT), jnp.zeros_like(tgtT), dsx, dsy


_warp_cw_l1_cdiff.defvjp(_warp_cw_l1_cdiff_fwd, _warp_cw_l1_cdiff_bwd)


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


def warp_folded_cp(precise: bool = False) -> int:
    """Channel fold of the ``fold_out=True`` result (ops/layout.py)."""
    return 8 if precise else 4


@functools.partial(jax.jit, static_argnames=("row_window", "col_window",
                                             "precise", "interpret",
                                             "fold_out"))
def warp_images_border(src, sx, sy, row_window: int = 32,
                       col_window: int = 384, precise: bool = False,
                       interpret: bool = False, fold_out: bool = False,
                       target=None):
    """Border-mode bilinear warp of images over D coordinate maps.

    src: (B, R, W, C) f32 images; sx, sy: (B, D, R, W) unnormalized pixel
    coordinates (align_corners=True pixel space). Returns (B, D, R, W, C)
    f32, matching ``grid_sample(src, grid, padding='border')`` on the same
    coordinates. Differentiable wrt sx/sy (custom Pallas coordinate VJP
    composed with the border clamp); ``src`` carries NO gradient (the
    photometric targets/sources are data, reference trainer.py:504-529).

    ``fold_out=True`` returns the folded-planar layout instead --
    (B, D, R*cp, W) with cp = :func:`warp_folded_cp` and zero pad
    channels (see ops/layout.py) -- skipping the NHWC transpose so the
    photometric-loss chain stays sublane/lane dense end to end.

    ``col_window`` adds an epipolar column-windowed rung to the dispatch
    ladder (narrowest first): when every XB-wide output chunk's
    horizontal taps fit a CW-column source window, the H contraction's
    K drops from W to CW and the one-hot builds shrink (W, W) ->
    (CW, XB) per chunk. 0 disables; a host-side coverage check falls
    back to the row-only rung when the disparity band overflows.

    ``target`` (B, R, W, C) f32 switches on the in-kernel photometric L1
    epilogue: the return becomes ``(warped, l1)`` with l1 (B, D, R, W)
    f32 equal to ``mean_c |warped - target|`` computed from the kernel's
    store-dtype values (bit-identical to the XLA tail on the Pallas
    rungs; exact f32 on the gather fallback, same rung-precision
    contract as the warp itself). This replaces the reference's separate
    L1 pass over the warped stacks (movedepth/trainer.py:535-550).
    """
    b, r, wsrc, c = src.shape
    _, d, h, w = sx.shape
    assert (h, w) == (r, wsrc), "full-res warp: output grid == image grid"

    # border padding == pre-clamped coordinates; the clamp VJP masks the
    # coordinate gradient outside the frame exactly like the gather path
    sxc = jnp.clip(sx, 0.0, w - 1.0)
    syc = jnp.clip(sy, 0.0, r - 1.0)

    if precise:
        srcp = _pad_channels(src.astype(jnp.float32), 8)
    else:
        hi16 = src.astype(jnp.bfloat16)
        lo16 = (src - hi16.astype(jnp.float32)).astype(jnp.bfloat16)
        # hi/lo stacked on channels: [hi(4), lo(4)] per pixel; the halves
        # are summed outside the kernel on CW tensors (cheap ~2x-padded
        # sublane slices)
        srcp = jnp.concatenate(
            [_pad_channels(hi16, 4), _pad_channels(lo16, 4)], axis=-1)
    cp = srcp.shape[-1]
    c4 = cp if precise else cp // 2
    # planar CW: (B, R*Cp, W) -- W minor, zero tile padding
    srcT = jnp.transpose(srcp, (0, 1, 3, 2)).reshape(b, r * cp, w)

    db = d  # K warp maps per source frame: one block
    rw = _effective_window_cw(row_window, r, cp)

    tgtT = None
    if target is not None:
        # planar CW target rows, padded to 4 sublanes (zero pad channel)
        tgtT = jnp.transpose(_pad_channels(target.astype(jnp.float32), 4),
                             (0, 1, 3, 2))  # (B, H, 4, W)

    def _post(out):
        out = out.astype(jnp.float32)  # (B, D, H, Cp, W)
        if not precise:
            out = out[:, :, :, :c4] + out[:, :, :, c4:]
        if fold_out:
            # the kernel layout IS folded planar (pad channels zero by
            # construction: warp of zero-padded src channels is zero)
            return out.reshape(b, d, r * c4, w)
        # back to NHWC -- plain HLO, XLA picks the layouts
        return jnp.transpose(out[:, :, :, :c], (0, 1, 2, 4, 3))

    def pallas_path(width, cw):
        if tgtT is None:
            return _post(_warp_cw_cdiff(srcT, sxc, syc, r, cp, width, db,
                                        cw, interpret))
        out, l1 = _warp_cw_l1_cdiff(srcT, tgtT, sxc, syc, r, cp, width,
                                    db, cw, c, interpret)
        return _post(out), l1.reshape(b, d, r, w)

    def gather_path():
        # chunk the batch through lax.map: this branch is the (rarely
        # taken) exact fallback, but XLA schedules its buffers anyway --
        # the f32 stacked-corner temporaries were the LARGEST single
        # allocations in the compiled train step (540 MB each at batch
        # 16, artifacts/hlo_sched_diff.md); per-chunk temps are 4x
        # smaller, identical math (the corner stack is per-item)
        bsz = src.shape[0]
        chunk = max(d for d in range(1, min(4, bsz) + 1) if bsz % d == 0)
        if chunk == bsz:
            g = _gather_warp(src, sxc, syc)
        else:
            sc = src.reshape(bsz // chunk, chunk, *src.shape[1:])
            xc2 = sxc.reshape(bsz // chunk, chunk, *sxc.shape[1:])
            yc2 = syc.reshape(bsz // chunk, chunk, *syc.shape[1:])
            g = lax.map(lambda a: _gather_warp(*a), (sc, xc2, yc2))
            g = g.reshape(bsz, *g.shape[2:])
        if fold_out:
            from movedepth_tpu.ops.layout import fold_image
            gout = fold_image(g, c4)
        else:
            gout = g
        if tgtT is None:
            return gout
        l1 = jnp.mean(jnp.abs(g - target[:, None]), axis=-1)
        return gout, l1

    if rw is None:
        return gather_path()
    out = gather_path
    for width, cw in reversed(_warp_rungs(rw, r, w, cp, col_window)):
        ok = _coverage_ok_cw(syc, r, width, cp, db)
        if cw is not None:
            ok = ok & _coverage_x_ok_cw(sxc, w, cw, _x_chunk_cw(w, cw), db)
        out = (lambda ok=ok, width=width, cw=cw, nxt=out:
               lax.cond(ok, lambda: pallas_path(width, cw), nxt))
    return out()


def _warp_rungs(rw, r, w, cp, col_window):
    """Dispatch ladder, narrowest first: column-windowed -> row-only ->
    wider row; the exact gather path catches everything below."""
    rungs = []
    cwin = _effective_col_window_cw(col_window, w)
    if cwin is not None and _x_chunk_cw(w, cwin) % _LANE_ALIGN == 0:
        # chunked out-ref stores need 128-aligned lane offsets
        rungs.append((rw, cwin))
    rungs.append((rw, None))
    rw2 = _effective_window_cw(2 * rw, r, cp)
    if rw2 is not None:
        rungs.append((rw2, None))
    return rungs


def warp_rung_report(src, sx, sy, row_window: int = 32,
                     col_window: int = 384, precise: bool = False) -> str:
    """Name the rung `warp_images_border` takes for these concrete inputs.

    Diagnostic only (eager): evaluates the same coverage predicates the
    dispatch ladder branches on. See sweep_warp.rung_report.
    """
    b, r, wsrc, c = src.shape
    _, d, h, w = sx.shape
    sxc = jnp.clip(sx, 0.0, w - 1.0)
    syc = jnp.clip(sy, 0.0, r - 1.0)
    cp = ((-c) % 8 + c) if precise else 2 * (c + (-c) % 4)
    db = d
    rw = _effective_window_cw(row_window, r, cp)
    if rw is None:
        return "exact gather (row windowing disabled)"
    rungs = _warp_rungs(rw, r, w, cp, col_window)
    for width, cw in rungs:
        ok = bool(_coverage_ok_cw(syc, r, width, cp, db))
        if cw is not None:
            ok = ok and bool(_coverage_x_ok_cw(sxc, w, cw,
                                               _x_chunk_cw(w, cw), db))
        if ok:
            tag = f"rw={width}" + (f" cw={cw}" if cw is not None else "")
            return f"{tag} (ladder {rungs})"
    return f"exact gather fallback (ladder {rungs} all missed)"
