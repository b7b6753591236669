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

EPIPOLAR ROW WINDOWING (the v2 speedup): the vertical taps of one output
row at one depth hypothesis span only a few source rows, so the horizontal
contraction only needs a narrow row window of the source:

  hi   = H1 @ srcT[:, r0*C : (r0+RW)*C]   (MXU: (W, W) @ (W, RW*C))
  warp = sum_r (hi * V)[:, r*C:(r+1)*C]   (VPU lane-slice adds over RW)

The per-block window base r0 is computed IN-KERNEL from the block's own
vertical coordinates (min over the block, aligned so the lane offset is a
multiple of 128) -- no scalar prefetch needed. A host-side replica of the
same window computation checks coverage; if any block's window cannot
cover its in-frame taps (large rotations), `lax.cond` falls back through a
widening ladder to the exact full-row kernel (RW = R).

EPIPOLAR COLUMN WINDOWING (the v4 speedup): the horizontal taps of an
output x-chunk sit in a narrow disparity band around x (near-identity
inter-frame motion, the KITTI regime), so on the narrowest row rung the
H contraction of each XB-wide output chunk reads only a CW-column source
window: K drops from W (2 padded MXU K-tiles at the 160-wide prior
scale) to CW = 128 (one tile). The chunk base c0 is computed in-kernel
like r0; a host-side sx coverage replica gates dispatch, falling back to
the full-row-width contraction when the band overflows.

MULTI-ROW BLOCKS (the v3 speedup): one grid step handles ``rb`` output
rows x ``db`` depth bins. The per-step MXU work at one (row, bin) is only
~1 us, so a 1-row grid is issue-overhead-bound; stacking rb rows and sg
bins into one (sg*rb*W, W) @ (W, RW*C) contraction amortizes the fixed
cost ~rb*sg-fold. Outputs are written directly in (B, D, H, W, C) order
-- no post-kernel transpose of the half-GB volume.

srcT lane layout is (r*C + c) -- row-major over the window -- so a row
window is one contiguous, 128-aligned lane slice. The transposed source
feature map stays resident in VMEM across all (row, depth) grid steps of a
batch element; HBM traffic is O(output) instead of the gather's
4-taps-per-point random access.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_align(c: int) -> int:
    """Window bases must put the lane offset r0*C on a 128 boundary."""
    return max(1, 128 // math.gcd(c, 128))


def _effective_window(rw, r, c):
    """Window width actually used for a requested ``rw``.

    The base alignment can eat up to align-1 rows of the window, so widen
    to at least 2*align (rounded up to a power of two for the halving-tree
    reduction); at >= R the windowing degenerates to the exact full kernel.
    """
    if rw is None:
        return None
    align = _row_align(c)
    rw = max(rw, 2 * align)
    rw = 1 << (rw - 1).bit_length()  # next power of two
    return None if rw >= r else rw


def _row_block(h: int, rb: int) -> int:
    """Output rows per grid step: the largest divisor of h that is <= rb."""
    while h % rb:
        rb -= 1
    return rb


_COL_ALIGN = 16  # column bases align to the sublane tile (16 covers bf16+f32)


def _effective_col_window(cw, w):
    """Source-column window actually used for a requested ``cw``.

    Rounded up to the MXU's 128 K-tile (a partial tile pads to 128 anyway);
    at >= W the column windowing is a no-op and is disabled.
    """
    if cw is None:
        return None
    cw = ((max(cw, 2 * _COL_ALIGN) + 127) // 128) * 128
    return None if cw >= w else cw


def _x_chunk(w: int, cw: int) -> int:
    """Output columns per chunk: the largest divisor of w <= 5/8 of the
    window (leaves >= 3/8 of the window as disparity + alignment slack
    while keeping the per-dot MXU stream long)."""
    xb = max(1, cw * 5 // 8)
    while w % xb:
        xb -= 1
    return xb


def _col_base(x0_blk, W, CW):
    """Column-window base from the floor'd horizontal coords of one
    (row-block x bin-block x x-chunk). Must stay in lockstep with
    `_coverage_x_ok` (the host-side replica)."""
    valid = (x0_blk >= -1) & (x0_blk <= W - 1)
    mn = jnp.min(jnp.where(valid, jnp.maximum(x0_blk, 0), W - 1))
    hi = (W - CW) - (W - CW) % _COL_ALIGN
    return jnp.clip(mn - mn % _COL_ALIGN, 0, hi)


def _coverage_x_ok(sx_t, W, CW, XB, rb):
    """True iff every (row-block, bin-block, x-chunk)'s column window
    covers its in-frame horizontal taps.

    Host-side (XLA) replica of the kernel's `_col_base`: the epipolar
    x-displacement is a narrow disparity band around x in the KITTI
    regime, so a CW-column source window per XB-column output chunk
    covers all taps and the H contraction drops from K=W to K=CW.
    sx_t: (B, H, nd, W, db)."""
    b, h, nd, w, db = sx_t.shape
    nxc = w // XB
    a = sx_t.reshape(b, h // rb, rb, nd, nxc, XB, db)
    a = jnp.transpose(a, (0, 1, 3, 4, 2, 5, 6)).reshape(
        b, (h // rb) * nd * nxc, rb * XB * db)
    x0 = jnp.floor(jnp.clip(a, -2.0, W + 1.0)).astype(jnp.int32)
    valid = (x0 >= -1) & (x0 <= W - 1)
    mn = jnp.min(jnp.where(valid, jnp.maximum(x0, 0), W - 1), axis=-1)
    mx = jnp.max(jnp.where(valid, jnp.minimum(x0 + 1, W - 1), 0), axis=-1)
    hi = (W - CW) - (W - CW) % _COL_ALIGN
    c0 = jnp.clip(mn - mn % _COL_ALIGN, 0, hi)
    return jnp.all(mx <= c0 + CW - 1)


def _stack_group(db: int, rb: int, w: int, rwc: int) -> int:
    """Bins stacked into one MXU issue, bounding M = sg*rb*W.

    The f32 temporaries (the MXU result, the V product and the narrow-V
    expansion staging, each M*RW*C*4B) must all fit the 16 MB scoped-VMEM
    limit simultaneously -- Mosaic does not reuse stack slots across
    unrolled iterations. The budget is anchored at the measured v5e
    working point M = 640 at RW*C = 512 (M = 1280 there does not compile)
    and scales inversely with the window size, so the wider fallback
    ladder rungs stack fewer bins instead of overflowing the stack."""
    return min(db, 4, max(1, (640 * 512 // rwc) // (rb * w)))


def _window_base(y0i, R, RW, C):
    """Window base from the floor'd vertical coords of one block.

    Must stay in lockstep with `_coverage_ok` (the host-side replica).
    Taps with no in-frame row are ignored; the base is the min in-frame
    tap row over the whole block, aligned down so r0*C is a 128-lane
    boundary, clamped to keep the window inside [0, R).
    """
    valid = (y0i >= -1) & (y0i <= R - 1)
    mn = jnp.min(jnp.where(valid, jnp.maximum(y0i, 0), R - 1))
    align = _row_align(C)
    hi = (R - RW) - (R - RW) % align  # aligned clamp bound
    return jnp.clip(mn - mn % align, 0, hi)


def _coverage_ok(sy_t, R, RW, C, rb):
    """True iff every block's row window covers its in-frame taps.

    Host-side (XLA) replica of the kernel's `_window_base`, reduced over
    the whole call: cheap elementwise math + reductions on the already
    materialized coordinate tensor. sy_t: (B, H, nd, W, db); one window is
    shared by all (rb rows x db bins) of a (row-block, bin-block) step.
    """
    b, h, nd, w, db = sy_t.shape
    blocks = jnp.transpose(sy_t.reshape(b, h // rb, rb, nd, w, db),
                           (0, 1, 3, 2, 4, 5)).reshape(
        b, (h // rb) * nd, rb * w * db)
    y0 = jnp.floor(jnp.clip(blocks, -2.0, R + 1.0)).astype(jnp.int32)
    valid = (y0 >= -1) & (y0 <= R - 1)
    mn = jnp.min(jnp.where(valid, jnp.maximum(y0, 0), R - 1), axis=-1)
    mx = jnp.max(jnp.where(valid, jnp.minimum(y0 + 1, R - 1), 0), axis=-1)
    align = _row_align(C)
    hi = (R - RW) - (R - RW) % align
    r0 = jnp.clip(mn - mn % align, 0, hi)
    return jnp.all(mx <= r0 + RW - 1)


def _chunk_sum(hv, c):
    """Sum an (M, n*c) array over its n lane chunks -> (M, c).

    Halving adds while the chunk count is even (mostly 128-aligned, VPU),
    then a short linear tail for an odd remainder.
    """
    width = hv.shape[1]
    while width > c and (width // c) % 2 == 0:
        half = width // 2
        hv = hv[:, :half] + hv[:, half:width]
        width = half
    if width > c:
        acc = hv[:, 0:c]
        for off in range(c, width, c):
            acc = acc + hv[:, off:off + c]
        hv = acc
    return hv


def _warp_kernel(sx_ref, sy_ref, srcT_ref, out_ref, *, R, C, RW, RB,
                 CW=None, XB=None):
    _sweep_body(sx_ref, sy_ref, srcT_ref, None, out_ref, R, C, RW, RB, None,
                CW, XB)


def _warp_corr_kernel(sx_ref, sy_ref, srcT_ref, ref_ref, out_ref,
                      *, R, C, RW, RB, G, CW=None, XB=None):
    """Warp + fused cost-volume epilogue: correlation with the reference
    rows and the channel-group mean (reference: movedepth/layers.py:792
    ``warped * ref``; movedepth/trainer.py:359 group reduce). Writes
    (db, rb, W, G) instead of (db, rb, W, C) -- halves the kernel's HBM
    output and removes two full passes over the warp volume in XLA.
    Inference-only (no VJP)."""
    _sweep_body(sx_ref, sy_ref, srcT_ref, ref_ref, out_ref, R, C, RW, RB, G,
                CW, XB)


def _sweep_body(sx_ref, sy_ref, srcT_ref, ref_ref, out_ref, R, C, RW, RB, G,
                CW=None, XB=None):
    w, db = sx_ref.shape[-2], sx_ref.shape[-1]
    dt = srcT_ref.dtype
    # MXU default precision is bf16 multiplies; f32 inputs need the 3-pass
    # mode to match the f32 gather path (bf16 features use the fast path)
    prec = (lax.Precision.HIGHEST if dt == jnp.float32
            else lax.Precision.DEFAULT)

    # On the bf16 (production) path the one-hots are built as bilinear
    # HAT functions, max(0, 1 - |index - coord|): 3 VPU ops/element vs the
    # where-form's 5 (2 int compares + 2 selects + add); the one-hot
    # builds are the kernel's dominant VPU cost. The hat taps differ from
    # the where-form by <= 1-2 f32 ulp from reassociation (1-(1-fx) vs
    # fx), which vanishes in this path's bf16 weight rounding. The f32
    # path keeps the where-form: it exists for bit-exact gather parity,
    # not speed. (A narrow (W, RW) V build + MXU one-hot expansion was
    # also tried: slower -- per-group K=16 matmuls are issue-bound and
    # 16-lane arrays waste 7/8 of every VPU register.)
    hat = dt != jnp.float32

    # clip guards int32 overflow; anything past [-1, size] contributes 0
    sx_all = jnp.clip(sx_ref[0, :, 0], -2.0, w + 1.0)  # (RB, W, db)
    sy_all = jnp.clip(sy_ref[0, :, 0], -2.0, R + 1.0)
    y0_all = jnp.floor(sy_all).astype(jnp.int32)  # window base only

    if RW == R:
        r0 = 0
        src_w = srcT_ref[0]  # (W, R*C)
    else:
        # ONE window for the whole (rb x db) block: one scalar reduce +
        # one dynamic lane slice per grid step
        r0 = _window_base(y0_all, R, RW, C)
        src_w = srcT_ref[0, :, pl.ds(pl.multiple_of(r0 * C, 128), RW * C)]

    # EPIPOLAR COLUMN WINDOWING: when CW is set, output columns are
    # processed in XB-wide chunks, each contracting only a CW-column
    # source window (the horizontal taps sit in a narrow disparity band
    # around x) -- K drops from W to CW in the H matmul. The chunk base
    # c0 comes from the block's own coords like the row base r0; the
    # host-side `_coverage_x_ok` replica gates dispatch onto this path.
    nxc = 1 if CW is None else w // XB
    xw = w if CW is None else XB  # output columns per chunk
    kw = w if CW is None else CW  # source columns contracted per chunk

    mb = RB * xw  # sublane rows of one bin
    qm = lax.broadcasted_iota(jnp.int32, (mb, kw), 1)
    lane_rm = lax.broadcasted_iota(jnp.int32, (mb, RW * C), 1) // C

    def h_of(sxc):
        if hat:
            return jnp.maximum(
                0.0, 1.0 - jnp.abs(qm.astype(jnp.float32) - sxc)
            ).astype(dt)  # (mb, Wsrc)
        x0 = jnp.floor(sxc)
        fx = sxc - x0
        x0i = x0.astype(jnp.int32)
        return (jnp.where(qm == x0i, 1.0 - fx, 0.0)
                + jnp.where(qm == x0i + 1, fx, 0.0)).astype(dt)

    def v_of(syc):
        if hat:
            return jnp.maximum(
                0.0, 1.0 - jnp.abs(lane_rm.astype(jnp.float32) - syc))
        y0 = jnp.floor(syc)
        fy = syc - y0
        rel = y0.astype(jnp.int32)  # window-relative tap row
        return (jnp.where(lane_rm == rel, 1.0 - fy, 0.0)
                + jnp.where(lane_rm == rel + 1, fy, 0.0))

    # one-hots are built per BIN (a bin's RB coordinate columns share one
    # lane offset, so their concat is legal -- Mosaic cannot concatenate
    # vectors with mixed lane offsets), then sg bins' full-width H blocks
    # stack along sublanes into one (sg*RB*W, Wsrc) @ (Wsrc, RW*C) MXU
    # issue, amortizing the per-step fixed cost. The V product and the
    # correlate/group-mean epilogue run per bin on sublane slices of the
    # matmul result. sg is bounded to keep the f32 temporaries inside
    # scoped VMEM (Mosaic does not reuse stack slots across the unrolled
    # constructions, so every (M, RW*C) temporary counts).
    sg0 = _stack_group(db, RB, xw, RW * C)
    for xc in range(nxc):
        if CW is None:
            xsl = slice(None)
            src_x = src_w
            c0f = None
        else:
            xsl = slice(xc * XB, (xc + 1) * XB)
            x0_blk = jnp.floor(sx_all[:, xsl, :]).astype(jnp.int32)
            c0 = _col_base(x0_blk, w, CW)
            c0s = pl.multiple_of(c0, _COL_ALIGN)
            if RW == R:
                src_x = srcT_ref[0, pl.ds(c0s, CW), :]
            else:
                src_x = srcT_ref[0, pl.ds(c0s, CW),
                                 pl.ds(pl.multiple_of(r0 * C, 128), RW * C)]
            # integer f32 subtraction of c0 <= W is exact, so the
            # window-relative taps match the unchunked kernel bitwise
            c0f = c0.astype(jnp.float32)
        if G is not None:
            # (RB*XW, C) f32 reference chunk, reused by every bin's epilogue
            refblk = ref_ref[0][:, xsl, :].astype(jnp.float32).reshape(mb, C)
        for g in range(0, db, sg0):
            sg = min(sg0, db - g)  # ragged tail when sg0 !| db
            sycs, h_parts = [], []
            for d in range(g, g + sg):
                sxc = jnp.concatenate(
                    [sx_all[k, xsl, d:d + 1] for k in range(RB)], axis=0)
                if c0f is not None:
                    sxc = sxc - c0f  # window-relative columns
                sycs.append(jnp.concatenate(
                    [sy_all[k, xsl, d:d + 1] for k in range(RB)],
                    axis=0) - r0)  # window-relative rows
                h_parts.append(h_of(sxc))
            h_all = (h_parts[0] if sg == 1
                     else jnp.concatenate(h_parts, axis=0))
            hi = jnp.dot(h_all, src_x, precision=prec,
                         preferred_element_type=jnp.float32)  # (sg*mb, RW*C)
            for j in range(sg):
                # sum over the window rows: halving lane adds (VPU, mostly
                # 128-aligned) instead of a (RW*C, C) one-hot matmul whose
                # N=C pads 4x on the MXU; an odd remainder is added linearly
                hv = _chunk_sum(hi[j * mb:(j + 1) * mb] * v_of(sycs[j]), C)
                if G is None:
                    out = hv.reshape(RB, xw, C).astype(out_ref.dtype)
                else:
                    # fused epilogue: correlate with the reference rows,
                    # then the channel-group mean (C = K*G, mean over K) as
                    # halving adds under the (k*G + g) channel order
                    hv = _chunk_sum(hv * refblk, G) * (G / C)
                    out = hv.reshape(RB, xw, G).astype(out_ref.dtype)
                if CW is None:
                    out_ref[0, g + j] = out
                else:
                    out_ref[0, g + j, :, xsl] = out


def _warp_bwd_kernel(sx_ref, sy_ref, g_ref, dsrcT_ref, *, R, C, RB):
    """Gradient wrt the source features: transposed one-hot contractions.

    d_srcT[q, r*C + c] = sum_{h,d,x} H1[x, q] * V[x, r] * g[x, c]
    accumulated into one VMEM-resident (W, R*C) block across all (h, d)
    grid steps of a batch element. Full-row (unwindowed): the backward
    runs once per train step and its cost is dominated elsewhere.
    """
    w, db = sx_ref.shape[-2], sx_ref.shape[-1]
    f32 = jnp.float32

    q = lax.broadcasted_iota(jnp.int32, (w, w), 1)
    lane_r = lax.broadcasted_iota(jnp.int32, (w, R * C), 1) // C

    sx_all = sx_ref[0, :, 0]  # (RB, W, db)
    sy_all = sy_ref[0, :, 0]
    acc = jnp.zeros((w, C * R), f32)
    for d in range(db):
        for k in range(RB):
            sx = jnp.clip(sx_all[k, :, d:d + 1], -2.0, w + 1.0)
            sy = jnp.clip(sy_all[k, :, d:d + 1], -2.0, R + 1.0)
            x0 = jnp.floor(sx)
            y0 = jnp.floor(sy)
            fx = sx - x0
            fy = sy - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            h1 = (jnp.where(q == x0i, 1.0 - fx, 0.0)
                  + jnp.where(q == x0i + 1, fx, 0.0))
            vexp = (jnp.where(lane_r == y0i, 1.0 - fy, 0.0)
                    + jnp.where(lane_r == y0i + 1, fy, 0.0))  # (W, R*C)
            g_d = g_ref[0, d, k].astype(f32)  # (W, C)
            # expand g over r: under (r*C + c) the expansion is a lane tile
            g_exp = pltpu.repeat(g_d, R, axis=1)  # (W, R*C)
            vg = vexp * g_exp
            # (W_src, R*C) = H1^T @ vg
            acc = acc + lax.dot_general(
                h1, vg, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)

    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        dsrcT_ref[0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        dsrcT_ref[0] += acc


def _prep_coords(a, db):
    """(B, D, H, W) -> (B, H, nd, W, db): per-bin coordinate columns."""
    b, d, h, w = a.shape
    nd = d // db
    a = jnp.transpose(a, (0, 2, 1, 3)).reshape(b, h, nd, db, w)
    return jnp.transpose(a, (0, 1, 2, 4, 3))


def _coord_specs(w, db, rb):
    return [
        pl.BlockSpec((1, rb, 1, w, db),
                     lambda bi, hi, di: (bi, hi, di, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, 1, w, db),
                     lambda bi, hi, di: (bi, hi, di, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _warp_rows_call(src_feat, sx_t, sy_t, rw, rb, cw, interpret):
    """One forward pallas_call at window width rw (rw == R: exact full).

    Output written directly in (B, D, H, W, C) order.
    """
    b, r, w, c = src_feat.shape
    _, h, nd, _, db = sx_t.shape
    d = nd * db
    # (q, r*C + c) layout: a row window is one contiguous 128-aligned
    # lane slice (see module docstring)
    srcT = jnp.transpose(src_feat, (0, 2, 1, 3)).reshape(b, w, r * c)
    kernel = functools.partial(_warp_kernel, R=r, C=c, RW=rw, RB=rb, CW=cw,
                               XB=None if cw is None else _x_chunk(w, cw))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), src_feat.dtype),
        grid=(b, h // rb, nd),
        in_specs=_coord_specs(w, db, rb) + [
            pl.BlockSpec((1, w, c * r), lambda bi, hi, di: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, db, rb, w, c),
                               lambda bi, hi, di: (bi, di, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sx_t, sy_t, srcT)


def _window_ladder(rw, r, c):
    """Window widths to try, narrowest first, ending with the full row."""
    ladder = []
    while rw is not None:
        ladder.append(rw)
        rw = _effective_window(2 * rw, r, c)
    return ladder + [r]


def _ladder_plan(h, w, r, c, rw, rb, cw):
    """The full dispatch plan: (ladder, per-rung row blocks, col window).

    SHARED between `_windowed_dispatch` (which branches a lax.cond chain
    over it) and `rung_report` (which names the taken rung) so the
    diagnostic can never drift from the dispatch heuristic.

    Per-rung row block: (a) wider rungs shrink it so M*RW*C (the
    scoped-VMEM unit of the kernel's f32 temporaries) stays at the
    anchored rw=16 x rb working point (sg bottoms out at 1, so
    _stack_group alone cannot shrink M); (b) narrow rungs shrink it for
    COVERAGE -- all rb rows share one window base, whose alignment can
    eat align-1 (<= 3) rows, so a block's taps span rb+1+3 rows and a
    width-8 rung only ever covers with rb <= 2 (_stack_group stacks more
    bins instead, keeping M constant). The exact full-row level runs at
    row_block=1: its (M, R*C) temps are the widest.
    """
    ladder = _window_ladder(rw, r, c)
    rbs = [_row_block(h, max(1, min(rb * 16 // wdt, wdt - 6)))
           for wdt in ladder]
    rbs[-1] = 1
    return ladder, rbs, _effective_col_window(cw, w)


def _windowed_dispatch(call, sx_t, sy_t, r, c, rw, rb, cw=None):
    """Run ``call(window_width, row_block, col_window)`` at the narrowest
    covering window.

    Widening-ladder fallback: rw -> 2*rw -> ... -> exact full row. Each
    step is a host-side coverage check (cheap VPU reductions) +
    lax.cond, so only one kernel executes; near-misses degrade gracefully
    instead of paying the full-row contraction. The column window (its
    own coverage check on sx) applies only at the narrowest row rung --
    the production path; every fallback rung contracts full rows.
    """
    if rw is None or rw >= r:
        return call(r, 1, None)
    h = sy_t.shape[1]
    w = sx_t.shape[3]
    ladder, rbs, cw_eff = _ladder_plan(h, w, r, c, rw, rb, cw)

    def build(i):
        if i == len(ladder) - 1:
            return lambda: call(ladder[i], rbs[i], None)
        ok = _coverage_ok(sy_t, r, ladder[i], c, rbs[i])
        nxt = build(i + 1)
        if i == 0 and cw_eff is not None:
            cok = _coverage_x_ok(sx_t, w, cw_eff, _x_chunk(w, cw_eff),
                                 rbs[i])
            return lambda: lax.cond(
                ok,
                lambda: lax.cond(
                    cok, lambda: call(ladder[i], rbs[i], cw_eff),
                    lambda: call(ladder[i], rbs[i], None)),
                nxt)
        return lambda: lax.cond(ok, lambda: call(ladder[i], rbs[i], None),
                                nxt)

    return build(0)()


def _warp_rows_impl(src_feat, sx_t, sy_t, rw, rb, cw, interpret=False):
    """Forward launch: windowed kernel with graceful full-row fallback.

    Returns (B, D, H, W, C).
    """
    r = src_feat.shape[1]
    c = src_feat.shape[3]
    return _windowed_dispatch(
        lambda width, rbw, colw: _warp_rows_call(src_feat, sx_t, sy_t,
                                                 width, rbw, colw,
                                                 interpret),
        sx_t, sy_t, r, c, rw, rb, cw)


def _warp_corr_rows_call(src_feat, ref_feat, sx_t, sy_t, rw, rb, cw, groups,
                         interpret):
    """Fused warp+correlate+group-reduce pallas_call at window width rw."""
    b, r, w, c = src_feat.shape
    _, h, nd, _, db = sx_t.shape
    d = nd * db
    srcT = jnp.transpose(src_feat, (0, 2, 1, 3)).reshape(b, w, r * c)
    kernel = functools.partial(_warp_corr_kernel, R=r, C=c, RW=rw, RB=rb,
                               G=groups, CW=cw,
                               XB=None if cw is None else _x_chunk(w, cw))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, groups),
                                       src_feat.dtype),
        grid=(b, h // rb, nd),
        in_specs=_coord_specs(w, db, rb) + [
            pl.BlockSpec((1, w, c * r), lambda bi, hi, di: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, w, c), lambda bi, hi, di: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, db, rb, w, groups),
                               lambda bi, hi, di: (bi, di, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sx_t, sy_t, srcT, ref_feat)


@functools.partial(jax.jit, static_argnames=("groups", "d_block",
                                             "row_window", "row_block",
                                             "col_window", "interpret"))
def sweep_warp_corr(src_feat, ref_feat, sx, sy, groups: int,
                    d_block: int = 8, row_window: int = 16,
                    row_block: int = 4, col_window: int = 128,
                    interpret: bool = False):
    """Plane-sweep cost volume in ONE kernel: warp, correlate, group-mean.

    src_feat/ref_feat: (B, R, W, C) NHWC features; sx, sy: (B, D, H, W)
    pixel coordinates into src (H == R at the prior scale). Returns
    (B, D, H, W, G), numerically matching
    ``reduce_cost_groups(sweep_warp(src, sx, sy) * ref[:, None], groups)``.
    Inference-only: no VJP is defined (the training path uses `sweep_warp`,
    whose custom VJP provides the src-feature gradient).
    """
    b, r, wsrc, c = src_feat.shape
    _, d, h, w = sx.shape
    assert wsrc == w, "source/output widths must match at the prior scale"
    k = c // groups
    assert c % groups == 0 and k & (k - 1) == 0, (c, groups)
    db = min(d_block, d)
    assert d % db == 0
    rw = _effective_window(row_window, r, c)
    rb = _row_block(h, row_block)

    sx_t = _prep_coords(sx, db)
    sy_t = _prep_coords(sy, db)
    return _windowed_dispatch(
        lambda width, rbw, colw: _warp_corr_rows_call(
            src_feat, ref_feat, sx_t, sy_t, width, rbw, colw, groups,
            interpret),
        sx_t, sy_t, r, c, rw, rb, col_window)


def _warp_rows_bwd_impl(g, sx_t, sy_t, r, c, rb, interpret=False):
    """Backward kernel launch. g: (B, D, H, W, C) -> d_src (B, R, W, C)."""
    b, h, nd, w, db = sx_t.shape
    kernel = functools.partial(_warp_bwd_kernel, R=r, C=c, RB=rb)
    dsrcT = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, w, c * r), jnp.float32),
        grid=(b, h // rb, nd),
        in_specs=_coord_specs(w, db, rb) + [
            pl.BlockSpec((1, db, rb, w, c),
                         lambda bi, hi, di: (bi, di, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, c * r), lambda bi, hi, di: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sx_t, sy_t, g)
    dsrc = dsrcT.reshape(b, w, r, c)  # (q, r*C + c) layout back to NHWC
    return jnp.transpose(dsrc, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _warp_rows(src_feat, sx_t, sy_t, r, c, rw, rb, cw, interpret=False):
    return _warp_rows_impl(src_feat, sx_t, sy_t, rw, rb, cw, interpret)


def _warp_rows_fwd(src_feat, sx_t, sy_t, r, c, rw, rb, cw, interpret=False):
    out = _warp_rows_impl(src_feat, sx_t, sy_t, rw, rb, cw, interpret)
    return out, (sx_t, sy_t, jnp.zeros((), src_feat.dtype))


def _warp_rows_bwd(r, c, rw, rb, cw, interpret, res, g):
    sx_t, sy_t, dtype_carrier = res
    dsrc = _warp_rows_bwd_impl(g, sx_t, sy_t, r, c, rb, interpret)
    return (dsrc.astype(dtype_carrier.dtype), jnp.zeros_like(sx_t),
            jnp.zeros_like(sy_t))


_warp_rows.defvjp(_warp_rows_fwd, _warp_rows_bwd)


@functools.partial(jax.jit,
                   static_argnames=("d_block", "row_window", "row_block",
                                    "col_window", "interpret"))
def sweep_warp(src_feat, sx, sy, d_block: int = 8, row_window: int = 16,
               row_block: int = 4, col_window: int = 128,
               interpret: bool = False):
    """Warp src features over all depth hypotheses (zeros padding, bilinear).

    src_feat: (B, R, W, C) NHWC source features;
    sx, sy:   (B, D, H, W) unnormalized pixel coordinates into src.
    Returns (B, D, H, W, C), numerically matching
    ops.sampling.grid_sample(..., padding='zeros') on the same coords.

    ``row_window`` bounds the per-block source-row window of the fast path
    (see module docstring); a host-side coverage check falls back through
    a widening ladder to the exact full-row kernel when any window can't
    cover its taps, so the result is exact for arbitrary coordinates. Pass
    None to always use the full kernel. ``row_block`` output rows share
    one grid step (and one window). ``col_window`` additionally bounds the
    source-column window per output x-chunk on the narrowest row rung
    (its own coverage check; None disables).

    Differentiable wrt src_feat (custom VJP: transposed one-hot matmuls in
    a second Pallas kernel); coordinates carry no gradient (the reference
    computes the sweep grid under no_grad, movedepth/layers.py:784-790).
    """
    b, r, wsrc, c = src_feat.shape
    _, d, h, w = sx.shape
    assert wsrc == w, "source/output widths must match at the prior scale"
    db = min(d_block, d)
    assert d % db == 0
    rw = _effective_window(row_window, r, c)
    rb = _row_block(h, row_block)

    sx_t = _prep_coords(sx, db)
    sy_t = _prep_coords(sy, db)
    return _warp_rows(src_feat, sx_t, sy_t, r, c, rw, rb, col_window,
                      interpret)


def grid_to_pixel(grid, height, width):
    """Normalized [-1,1] grid (align_corners=True) -> pixel coords."""
    sx = (grid[..., 0] + 1.0) * 0.5 * (width - 1)
    sy = (grid[..., 1] + 1.0) * 0.5 * (height - 1)
    return sx, sy


def rung_report(sx, sy, r, c, d_block: int = 8, row_window: int = 16,
                row_block: int = 4, col_window: int = 128) -> str:
    """Name the ladder rung `_windowed_dispatch` takes for these coords.

    Diagnostic only (call with concrete arrays outside jit): evaluates the
    SAME `_coverage_ok`/`_coverage_x_ok` predicates the dispatch's
    lax.cond chain branches on, so the returned string is exactly the
    kernel configuration that executes. Used by bench.py to make the
    value-dependent epipolar dispatch observable.
    """
    d = sx.shape[1]
    db = min(d_block, d)
    rw = _effective_window(row_window, r, c)
    if rw is None or rw >= r:
        return f"exact full-row (rw=R={r}, rb=1; windowing disabled)"
    sx_t = _prep_coords(sx, db)
    sy_t = _prep_coords(sy, db)
    h = sy_t.shape[1]
    w = sx_t.shape[3]
    # the exact plan _windowed_dispatch branches over (shared helper)
    ladder, rbs, cw_eff = _ladder_plan(h, w, r, c, rw,
                                       _row_block(h, row_block), col_window)
    for i, wdt in enumerate(ladder):
        if i == len(ladder) - 1:
            return (f"exact full-row fallback (rw=R={r}, rb=1; "
                    f"rung {i} of {ladder})")
        if bool(_coverage_ok(sy_t, r, wdt, c, rbs[i])):
            tag = f"rw={wdt} rb={rbs[i]} (rung {i} of {ladder}"
            if i == 0 and cw_eff is not None:
                cok = bool(_coverage_x_ok(sx_t, w, cw_eff,
                                          _x_chunk(w, cw_eff), rbs[i]))
                return tag + (f", col window cw={cw_eff})" if cok
                              else ", col window MISSED)")
            return tag + ")"
    raise AssertionError("unreachable: ladder ends with the exact level")
