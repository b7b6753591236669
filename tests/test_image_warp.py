"""Pallas full-res image warp: parity + coordinate-gradient tests vs the
XLA gather path (interpret mode on CPU; same code compiles to Mosaic on
TPU). Reference semantics: F.grid_sample(..., padding_mode='border',
align_corners=True) at movedepth/trainer.py:504,526,577."""

import numpy as np
import jax
import jax.numpy as jnp

from movedepth_tpu.ops.pallas.image_warp import (
    _gather_warp,
    warp_images_border,
)


def _coords(rng, b, d, r, w, off=3.0):
    ys, xs = np.meshgrid(np.arange(r), np.arange(w), indexing="ij")
    sx = (np.broadcast_to(xs, (b, d, r, w))
          + rng.uniform(-off, off, (b, d, 1, 1))).astype(np.float32)
    sy = (np.broadcast_to(ys, (b, d, r, w))
          + rng.uniform(-off, off, (b, d, 1, 1))).astype(np.float32)
    return jnp.asarray(sx), jnp.asarray(sy)


def test_image_warp_precise_matches_gather(rng):
    b, d, r, w, c = 2, 3, 64, 96, 3
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    sx, sy = _coords(rng, b, d, r, w)
    want = _gather_warp(src, jnp.clip(sx, 0, w - 1.0),
                        jnp.clip(sy, 0, r - 1.0))
    got = warp_images_border(src, sx, sy, precise=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_image_warp_bf16x2_close_to_gather(rng):
    """Production mode: bf16 hi/lo split; error bounded by the bf16
    rounding of the bilinear weights (~2^-9 on [0,1] images)."""
    b, d, r, w, c = 1, 2, 64, 96, 3
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    sx, sy = _coords(rng, b, d, r, w)
    want = _gather_warp(src, jnp.clip(sx, 0, w - 1.0),
                        jnp.clip(sy, 0, r - 1.0))
    got = warp_images_border(src, sx, sy, precise=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=8e-3)


def test_image_warp_coord_gradient_matches_gather(rng):
    b, d, r, w, c = 1, 2, 64, 96, 3
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    sx, sy = _coords(rng, b, d, r, w)
    tgt = jnp.asarray(
        rng.uniform(0, 1, (b, d, r, w, c)).astype(np.float32))

    def loss_pallas(a, b2):
        out = warp_images_border(src, a, b2, precise=True, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    def loss_gather(a, b2):
        out = _gather_warp(src, jnp.clip(a, 0, w - 1.0),
                           jnp.clip(b2, 0, r - 1.0))
        return jnp.sum((out - tgt) ** 2)

    gx_p, gy_p = jax.grad(loss_pallas, (0, 1))(sx, sy)
    gx_g, gy_g = jax.grad(loss_gather, (0, 1))(sx, sy)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_g),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_g),
                               atol=1e-4)


def test_image_warp_border_gradient_masked_outside(rng):
    """Coordinates clamped at the border: zero coordinate gradient, and
    the forward result equals edge sampling (border padding)."""
    b, d, r, w, c = 1, 1, 32, 48, 3
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    sx = jnp.full((b, d, r, w), -10.0)
    sy = jnp.full((b, d, r, w), 5.0)
    out = warp_images_border(src, sx, sy, precise=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0],
        np.broadcast_to(np.asarray(src[0, 5, 0]), (r, w, c)), atol=1e-6)
    g = jax.grad(lambda a: jnp.sum(
        warp_images_border(src, a, sy, precise=True, interpret=True)))(sx)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_image_warp_fallback_large_spread(rng):
    """Coordinates spanning the whole image vertically within one row:
    the windowed path cannot cover, the gather fallback must be exact."""
    b, d, r, w, c = 1, 2, 64, 96, 3
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    sx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (b, d, r, w))
    sy = jnp.broadcast_to(
        jnp.linspace(0.0, r - 1.0, w, dtype=jnp.float32)[None, None, None],
        (b, d, r, w))
    want = _gather_warp(src, sx, sy)
    got = warp_images_border(src, sx, sy, precise=True, interpret=True)
    # jit vs eager float reassociation only
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_image_warp_fold_out_matches_nhwc(rng):
    """fold_out=True returns the folded-planar layout with zero pad
    channels, for both the kernel path and the gather fallback."""
    from movedepth_tpu.ops.layout import unfold_image
    from movedepth_tpu.ops.pallas.image_warp import warp_folded_cp

    b, d, r, w, c = 1, 2, 64, 96, 3
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    for precise in (False, True):
        cp = warp_folded_cp(precise)
        # kernel path (small offsets -> windows cover)
        sx, sy = _coords(rng, b, d, r, w)
        want = warp_images_border(src, sx, sy, precise=precise,
                                  interpret=True)
        folded = warp_images_border(src, sx, sy, precise=precise,
                                    interpret=True, fold_out=True)
        assert folded.shape == (b, d, r * cp, w)
        full = unfold_image(folded, cp, cp)
        np.testing.assert_allclose(np.asarray(full[..., :c]),
                                   np.asarray(want), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(full[..., c:]), 0.0)
        # fallback path (vertical spread overflows every window)
        sy_spread = jnp.broadcast_to(
            jnp.linspace(0.0, r - 1.0, w, dtype=jnp.float32)[None, None,
                                                             None],
            (b, d, r, w))
        want = warp_images_border(src, sx, sy_spread, precise=precise,
                                  interpret=True)
        folded = warp_images_border(src, sx, sy_spread, precise=precise,
                                    interpret=True, fold_out=True)
        full = unfold_image(folded, cp, cp)
        np.testing.assert_allclose(np.asarray(full[..., :c]),
                                   np.asarray(want), atol=1e-6)


def test_image_warp_col_window_matches_full(rng):
    """Epipolar column windowing (narrow disparity bands at W > window):
    exact vs the unwindowed kernel, forward and coordinate gradient."""
    b, d, r, w = 1, 2, 16, 640
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, 3)).astype(np.float32))
    sx, sy = _coords(rng, b, d, r, w, off=3.0)

    want = warp_images_border(src, sx, sy, col_window=0, precise=True,
                              interpret=True)
    got = warp_images_border(src, sx, sy, col_window=384, precise=True,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)

    tgt = jnp.asarray(rng.uniform(0, 1, want.shape).astype(np.float32))

    def loss(cw):
        return lambda a, b2: jnp.sum(
            (warp_images_border(src, a, b2, col_window=cw, precise=True,
                                interpret=True) - tgt) ** 2)

    gx_w, gy_w = jax.grad(loss(384), (0, 1))(sx, sy)
    gx_f, gy_f = jax.grad(loss(0), (0, 1))(sx, sy)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_f),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy_w), np.asarray(gy_f),
                               atol=1e-4)


def test_image_warp_col_window_overflow_falls_back(rng):
    """Horizontal taps spanning the whole width within one chunk: the
    column rung's coverage check must reject and the row-only rung must
    still be exact."""
    b, d, r, w = 1, 1, 16, 640
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, 3)).astype(np.float32))
    # x mirrored: chunk 0's taps span [0, W) -- no 384-window covers them
    sx = jnp.broadcast_to(
        jnp.linspace(w - 1.0, 0.0, w, dtype=jnp.float32)[None, None, None],
        (b, d, r, w))
    ys, _ = np.meshgrid(np.arange(r), np.arange(w), indexing="ij")
    sy = jnp.asarray(np.broadcast_to(ys, (b, d, r, w)).astype(np.float32))
    want = warp_images_border(src, sx, sy, col_window=0, precise=True,
                              interpret=True)
    got = warp_images_border(src, sx, sy, col_window=384, precise=True,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_image_warp_l1_epilogue_matches_tail(rng):
    """In-kernel L1 epilogue == the XLA tail computed from the SAME
    warped output (cast-then-sum parity on the bf16x2 production path),
    for both the plain and fold_out call shapes."""
    b, d, r, w, c = 1, 3, 64, 96, 3
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    sx, sy = _coords(rng, b, d, r, w)
    for precise in (True, False):  # ends on the production bf16x2 path
        warped = warp_images_border(src, sx, sy, precise=precise,
                                    interpret=True)
        got_w, got_l1 = warp_images_border(src, sx, sy, precise=precise,
                                           interpret=True, target=tgt)
        np.testing.assert_array_equal(np.asarray(got_w), np.asarray(warped))
        want_l1 = jnp.mean(jnp.abs(warped - tgt[:, None]), axis=-1)
        np.testing.assert_allclose(np.asarray(got_l1), np.asarray(want_l1),
                                   atol=3e-7)
    # folded output: the l1 co-output is identical
    fw, fl1 = warp_images_border(src, sx, sy, interpret=True, target=tgt,
                                 fold_out=True)
    np.testing.assert_allclose(np.asarray(fl1), np.asarray(got_l1),
                               atol=3e-7)
    assert fw.shape == (b, d, r * 4, w)


def test_image_warp_l1_epilogue_gradient(rng):
    """The fused (warp, l1) VJP == grad of the unfused composition: the
    L1 cotangent folds into the warp-output cotangent inside the same
    coordinate-VJP kernel."""
    b, d, r, w, c = 1, 2, 64, 96, 3
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    sx, sy = _coords(rng, b, d, r, w)
    wgt = jnp.asarray(rng.uniform(0, 1, (b, d, r, w)).astype(np.float32))

    def loss_fused(a, b2):
        out, l1 = warp_images_border(src, a, b2, precise=True,
                                     interpret=True, target=tgt)
        return jnp.sum(l1 * wgt) + jnp.sum(out[..., 0] * 0.25)

    def loss_unfused(a, b2):
        out = warp_images_border(src, a, b2, precise=True, interpret=True)
        l1 = jnp.mean(jnp.abs(out - tgt[:, None]), axis=-1)
        return jnp.sum(l1 * wgt) + jnp.sum(out[..., 0] * 0.25)

    gx_f, gy_f = jax.grad(loss_fused, (0, 1))(sx, sy)
    gx_u, gy_u = jax.grad(loss_unfused, (0, 1))(sx, sy)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_u),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_u),
                               atol=1e-4)


def test_image_warp_gather_fallback_chunked(rng):
    """The gather fallback's lax.map batch chunking (b=8 -> 2 chunks of
    4) is bit-identical to the unchunked gather (the corner stack is
    per-item). row_window >= R disables every Pallas rung."""
    b, d, r, w, c = 8, 2, 32, 48, 3
    src = jnp.asarray(rng.uniform(0, 1, (b, r, w, c)).astype(np.float32))
    sx, sy = _coords(rng, b, d, r, w)
    got = warp_images_border(src, sx, sy, row_window=1000, interpret=True)
    want = _gather_warp(src, jnp.clip(sx, 0, w - 1.0),
                        jnp.clip(sy, 0, r - 1.0))
    # jit vs eager float reassociation only (as in the large-spread test)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)
