"""Pallas sweep-warp kernel parity vs the gather-based grid_sample
(interpret mode on CPU; the same code compiles to Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from movedepth_tpu.ops.pallas.sweep_warp import sweep_warp, grid_to_pixel
from movedepth_tpu.ops.costvolume import (
    plane_sweep_costvol,
    schedule_depth_bins,
    sweep_grid,
)


def _setup(rng, b=2, d=16, h=16, w=32, c=8):
    src = rng.normal(0, 1, (b, h, w, c)).astype(np.float32)
    K = np.tile(
        np.array([[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (b, 1, 1))
    invK = np.linalg.pinv(K)
    prior = rng.uniform(5, 60, (b, h, w)).astype(np.float32)
    bins = schedule_depth_bins(jnp.asarray(prior), d, 0.3)
    T = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    T[:, 2, 3] = 0.05
    T[:, 0, 3] = 0.01
    return jnp.asarray(src), jnp.asarray(K), jnp.asarray(invK), bins, \
        jnp.asarray(T)


def test_sweep_warp_matches_gather_path(rng):
    src, K, invK, bins, T = _setup(rng)
    h, w = src.shape[1], src.shape[2]
    ref = jnp.ones_like(src)
    want = plane_sweep_costvol(ref, src, K, invK, bins, T)
    grid = sweep_grid(bins, K, invK, T)
    sx, sy = grid_to_pixel(grid, h, w)
    got = sweep_warp(src, sx, sy, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sweep_warp_zeros_padding_out_of_frame(rng):
    """Far out-of-frame coordinates must produce exact zeros."""
    b, d, h, w, c = 1, 8, 16, 32, 8
    src = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    sx = jnp.full((b, d, h, w), -50.0)
    sy = jnp.full((b, d, h, w), 5.0)
    out = sweep_warp(src, sx, sy, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_sweep_warp_identity(rng):
    b, d, h, w, c = 1, 8, 16, 32, 8
    src = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sx = jnp.asarray(np.broadcast_to(xs.astype(np.float32), (b, d, h, w)))
    sy = jnp.asarray(np.broadcast_to(ys.astype(np.float32), (b, d, h, w)))
    out = sweep_warp(src, sx, sy, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.asarray(src)[:, None],
                                               (b, d, h, w, c)), atol=1e-6)


def test_sweep_warp_gradient_matches_gather_path(rng):
    """Custom VJP wrt src features vs jax.grad of the gather formulation."""
    src, K, invK, bins, T = _setup(rng, b=1, d=8, h=8, w=16, c=8)
    h, w = src.shape[1], src.shape[2]
    grid = sweep_grid(bins, K, invK, T)
    sx, sy = grid_to_pixel(grid, h, w)
    ref = jnp.asarray(rng.normal(0, 1, src.shape).astype(np.float32))

    def loss_pallas(s):
        out = sweep_warp(s, sx, sy, interpret=True) * ref[:, None]
        return jnp.sum(out ** 2)

    def loss_gather(s):
        out = plane_sweep_costvol(ref, s, K, invK, bins, T)
        return jnp.sum(out ** 2)

    g_pallas = jax.grad(loss_pallas)(src)
    g_gather = jax.grad(loss_gather)(src)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_gather),
                               atol=1e-3, rtol=1e-4)


def test_sweep_warp_windowed_matches_gather_path(rng):
    """R > row_window with smooth coords: the windowed fast path is exact."""
    b, d, h, w, c = 1, 8, 48, 64, 8
    src = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    K = np.tile(
        np.array([[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (b, 1, 1))
    invK = np.linalg.pinv(K)
    yy = np.linspace(0, 1, h, dtype=np.float32)[None, :, None]
    prior = np.broadcast_to(8.0 + 40.0 * yy, (b, h, w)).astype(np.float32)
    bins = schedule_depth_bins(jnp.asarray(prior), d, 0.3)
    T = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    T[:, 2, 3] = 0.5
    T[:, 1, 3] = 0.02
    ref = jnp.ones_like(src)
    want = plane_sweep_costvol(ref, src, jnp.asarray(K), jnp.asarray(invK),
                               bins, jnp.asarray(T))
    grid = sweep_grid(bins, jnp.asarray(K), jnp.asarray(invK),
                      jnp.asarray(T))
    sx, sy = grid_to_pixel(grid, h, w)
    from movedepth_tpu.ops.pallas.sweep_warp import (
        _coverage_ok,
        _effective_window,
        _prep_coords,
        _row_block,
    )
    rw = _effective_window(16, h, c)
    rb = _row_block(h, 4)
    sy_t = _prep_coords(sy, 8)
    assert rw is not None and bool(_coverage_ok(sy_t, h, rw, c, rb))
    got = sweep_warp(src, sx, sy, row_window=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sweep_warp_window_fallback_is_exact(rng):
    """Coordinates whose taps exceed any window must fall back, exactly."""
    b, d, h, w, c = 1, 8, 48, 64, 8
    src = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    # vertical coords sweeping the whole image within one row
    sx = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.float32), (b, d, h, w))
    sy = jnp.broadcast_to(
        jnp.linspace(0.0, h - 1.0, w, dtype=jnp.float32)[None, None, None],
        (b, d, h, w))
    from movedepth_tpu.ops.pallas.sweep_warp import (
        _coverage_ok,
        _effective_window,
        _prep_coords,
        _row_block,
    )
    rw = _effective_window(16, h, c)
    rb = _row_block(h, 4)
    sy_t = _prep_coords(sy, 8)
    assert rw is not None and not bool(_coverage_ok(sy_t, h, rw, c, rb))
    want = sweep_warp(src, sx, sy, row_window=None, interpret=True)
    got = sweep_warp(src, sx, sy, row_window=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sweep_warp_rw8_rung_covers_and_is_exact(rng):
    """The width-8 fast rung (shipped default, needs C >= 32 for lane
    alignment) covers sub-pixel vertical motion and matches the exact
    full-row kernel."""
    from movedepth_tpu.ops.pallas.sweep_warp import (
        _coverage_ok,
        _effective_window,
        _prep_coords,
    )
    b, d, h, w, c = 1, 8, 48, 64, 32
    assert _effective_window(8, h, c) == 8
    src = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # sub-pixel vertical offsets varying per bin (the KITTI regime)
    sx = jnp.asarray(np.broadcast_to(
        xs.astype(np.float32), (b, d, h, w)) + 0.3)
    dy = np.linspace(-0.25, -0.09, d, dtype=np.float32)[None, :, None, None]
    sy = jnp.asarray(np.broadcast_to(
        ys.astype(np.float32)[None, None], (b, d, h, w)) + dy)
    # rung-0 (width 8) coverage at its rb <= 2 row block
    sy_t = _prep_coords(sy, 8)
    assert bool(_coverage_ok(sy_t, h, 8, c, 2))
    want = sweep_warp(src, sx, sy, row_window=None, interpret=True)
    got = sweep_warp(src, sx, sy, row_window=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sweep_warp_rw8_mid_rung_fallback_is_exact(rng):
    """Vertical motion beyond the width-8 window takes a wider ladder rung
    (not the full row) and stays exact."""
    from movedepth_tpu.ops.pallas.sweep_warp import (
        _coverage_ok,
        _prep_coords,
    )
    b, d, h, w, c = 1, 8, 48, 64, 32
    src = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sx = jnp.asarray(np.broadcast_to(xs.astype(np.float32), (b, d, h, w)))
    # per-bin vertical offsets spanning ~7 rows: past the 8-wide rung
    # (base alignment eats rows), inside the 16-wide one
    dy = np.linspace(2.0, 8.5, d, dtype=np.float32)[None, :, None, None]
    sy = jnp.asarray(np.clip(np.broadcast_to(
        ys.astype(np.float32)[None, None], (b, d, h, w)) + dy, 0, h - 1))
    sy_t = _prep_coords(sy, 8)
    assert not bool(_coverage_ok(sy_t, h, 8, c, 2))
    assert bool(_coverage_ok(sy_t, h, 16, c, 4))
    want = sweep_warp(src, sx, sy, row_window=None, interpret=True)
    got = sweep_warp(src, sx, sy, row_window=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sweep_warp_col_window_covers_and_is_exact(rng):
    """The column-windowed H contraction (disparity-band taps) covers
    small per-bin horizontal shifts and matches the exact kernel."""
    from movedepth_tpu.ops.pallas.sweep_warp import (
        _coverage_x_ok,
        _effective_col_window,
        _prep_coords,
        _x_chunk,
    )
    b, d, h, w, c = 1, 8, 48, 192, 32
    assert _effective_col_window(128, w) == 128
    assert _x_chunk(w, 128) == 64
    src = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # per-bin disparity shifts up to ~20 px (plane-sweep band)
    dx = np.linspace(-3.0, 20.0, d, dtype=np.float32)[None, :, None, None]
    sx = jnp.asarray(np.broadcast_to(
        xs.astype(np.float32)[None, None], (b, d, h, w)) + dx)
    sy = jnp.asarray(np.broadcast_to(
        ys.astype(np.float32)[None, None], (b, d, h, w)) - 0.2)
    # rung-0 (rw=8 at C=32 -> rb=2) column coverage
    assert bool(_coverage_x_ok(_prep_coords(sx, 8), w, 128, 64, 2))
    want = sweep_warp(src, sx, sy, row_window=None, interpret=True)
    got = sweep_warp(src, sx, sy, row_window=8, col_window=128,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sweep_warp_col_window_overflow_falls_back(rng):
    """Horizontal shifts past the column budget disable the column window
    (row rung still runs) and the result stays exact."""
    from movedepth_tpu.ops.pallas.sweep_warp import (
        _coverage_x_ok,
        _prep_coords,
    )
    b, d, h, w, c = 1, 8, 48, 192, 32
    src = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # ~100 px spread across bins: > 128-64-align budget
    dx = np.linspace(-50.0, 55.0, d, dtype=np.float32)[None, :, None, None]
    sx = jnp.asarray(np.clip(np.broadcast_to(
        xs.astype(np.float32)[None, None], (b, d, h, w)) + dx, 0, w - 1))
    sy = jnp.asarray(np.broadcast_to(
        ys.astype(np.float32)[None, None], (b, d, h, w)) - 0.2)
    assert not bool(_coverage_x_ok(_prep_coords(sx, 8), w, 128, 64, 2))
    want = sweep_warp(src, sx, sy, row_window=None, interpret=True)
    got = sweep_warp(src, sx, sy, row_window=8, col_window=128,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sweep_warp_corr_col_window_matches_unfused(rng):
    """Fused correlate epilogue under the column window == unfused."""
    from movedepth_tpu.ops.costvolume import reduce_cost_groups
    from movedepth_tpu.ops.pallas.sweep_warp import sweep_warp_corr

    b, d, h, w, c = 1, 8, 48, 192, 32
    src = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    ref = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dx = np.linspace(-3.0, 20.0, d, dtype=np.float32)[None, :, None, None]
    sx = jnp.asarray(np.broadcast_to(
        xs.astype(np.float32)[None, None], (b, d, h, w)) + dx)
    sy = jnp.asarray(np.broadcast_to(
        ys.astype(np.float32)[None, None], (b, d, h, w)) - 0.2)
    warped = sweep_warp(src, sx, sy, row_window=None, interpret=True)
    want = reduce_cost_groups(warped * ref[:, None], 8)
    got = sweep_warp_corr(src, ref, sx, sy, 8, row_window=8,
                          col_window=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sweep_warp_corr_matches_unfused(rng):
    """Fused warp+correlate+group-reduce == unfused composition."""
    from movedepth_tpu.ops.costvolume import reduce_cost_groups
    from movedepth_tpu.ops.pallas.sweep_warp import sweep_warp_corr

    src, K, invK, bins, T = _setup(rng, b=2, d=8, h=16, w=32, c=8)
    h, w = src.shape[1], src.shape[2]
    ref = jnp.asarray(rng.normal(0, 1, src.shape).astype(np.float32))
    grid = sweep_grid(bins, K, invK, T)
    sx, sy = grid_to_pixel(grid, h, w)
    warped = sweep_warp(src, sx, sy, interpret=True)
    want = reduce_cost_groups(warped * ref[:, None], 4)
    got = sweep_warp_corr(src, ref, sx, sy, 4, row_window=16,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sweep_warp_no_gradient_to_coords(rng):
    src, K, invK, bins, T = _setup(rng, b=1, d=8, h=8, w=16, c=8)
    h, w = src.shape[1], src.shape[2]
    grid = sweep_grid(bins, K, invK, T)
    sx, sy = grid_to_pixel(grid, h, w)
    g = jax.grad(lambda a: jnp.sum(sweep_warp(src, a, sy, interpret=True)))(sx)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
