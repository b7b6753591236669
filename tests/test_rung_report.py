"""The kernel-rung diagnostics must name the rung the dispatch takes.

VERDICT round-2 weak item 1: the sweep/image-warp kernels pick their
epipolar window rung per call from value-dependent coverage checks inside
lax.cond -- invisible in profiles. rung_report/warp_rung_report evaluate
the SAME predicates eagerly so benchmarks can say which kernel they timed.
"""

import numpy as np

import jax
import jax.numpy as jnp

from movedepth_tpu.config import Config
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu.models import build_models
from movedepth_tpu.ops.pallas import image_warp as IW
from movedepth_tpu.ops.pallas import sweep_warp as SW
from movedepth_tpu import pipeline as P
from movedepth_tpu.train import state as S


def _identityish_coords(b=1, d=8, h=32, w=128, dy=0.2, dx=1.5):
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sx = np.broadcast_to(xs + dx, (b, d, h, w)).astype(np.float32)
    sy = np.broadcast_to(ys + dy, (b, d, h, w)).astype(np.float32)
    return jnp.asarray(sx), jnp.asarray(sy)


def test_sweep_rung_report_narrow_and_fallback():
    sx, sy = _identityish_coords()
    r = SW.rung_report(sx, sy, 32, 32, row_window=8, col_window=0 or None)
    assert r.startswith("rw=8"), r
    # wild VERTICAL coords cannot fit any narrow row window
    sy_wild = jnp.asarray(np.random.default_rng(0).uniform(
        0, 31, sy.shape), jnp.float32)
    r2 = SW.rung_report(sx, sy_wild, 32, 32, row_window=8)
    assert not r2.startswith("rw=8"), r2


def test_sweep_rung_report_col_window():
    # col windows round up to the 128 K-tile and disable at >= W, so the
    # image must be wider than one tile for the rung to exist
    sx, sy = _identityish_coords(w=256)
    r = SW.rung_report(sx, sy, 32, 32, row_window=8, col_window=128)
    assert "col window" in r, r


def test_sweep_rung_report_matches_dispatch():
    """The reported rung must be the configuration `_windowed_dispatch`
    actually executes (ADVICE r3 medium: both now read the shared
    `_ladder_plan`). A value-recording stub rides the real lax.cond
    chain: every branch returns its (rw, rb, cw) encoded as an array, so
    the selected branch's configuration comes back as data."""
    r = c = 32
    rng = np.random.default_rng(2)
    sx0, sy0 = _identityish_coords(w=256)
    cases = [
        (sx0, sy0),                                      # narrow rung
        (sx0, sy0 + jnp.asarray(rng.uniform(0, 6, sy0.shape),
                                jnp.float32)),           # mid rung
        (sx0, jnp.asarray(rng.uniform(0, 31, sy0.shape),
                          jnp.float32)),                 # full-row fallback
    ]
    for col_window in (None, 128):
        for sx, sy in cases:
            report = SW.rung_report(sx, sy, r, c, row_window=8,
                                    col_window=col_window)
            db = min(8, sx.shape[1])
            sx_t = SW._prep_coords(sx, db)
            sy_t = SW._prep_coords(sy, db)
            rw = SW._effective_window(8, r, c)
            rb = SW._row_block(sy_t.shape[1], 4)

            def record(wdt, rbw, colw):
                return jnp.array(
                    [wdt, rbw, -1 if colw is None else colw], jnp.int32)

            got = SW._windowed_dispatch(record, sx_t, sy_t, r, c, rw, rb,
                                        col_window)
            wdt, rbw, colw = (int(v) for v in np.asarray(got))
            if "exact full-row" in report:
                assert wdt == r and rbw == 1, (report, wdt, rbw)
            else:
                assert report.startswith(f"rw={wdt} rb={rbw}"), (
                    report, wdt, rbw)
            if colw >= 0:
                assert f"cw={colw}" in report, (report, colw)
            else:
                assert "cw=" not in report, (report, colw)


def test_warp_rung_report_names_a_rung():
    b, h, w = 1, 32, 128
    src = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (b, h, w, 3)).astype(np.float32))
    sx, sy = _identityish_coords(b, 1, h, w, dy=0.1, dx=0.4)
    r = IW.warp_rung_report(src, sx, sy, row_window=8, col_window=64)
    assert r.startswith("rw="), r
    # vertical jumps beyond any window -> exact gather fallback
    sy_wild = jnp.asarray(np.random.default_rng(1).uniform(
        0, h - 1, sy.shape), jnp.float32)
    r2 = IW.warp_rung_report(src, sx, sy_wild, row_window=8, col_window=64)
    assert "gather" in r2 or not r2.startswith("rw=8"), r2


def test_pipeline_kernel_rung_report_keys():
    cfg = Config(height=64, width=96, num_depth_bins=8, batch_size=2,
                 compute_dtype="float32")
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 2))
    report = P.kernel_rung_report(models, variables, batch, cfg)
    keys = sorted(report)
    assert any(k.startswith("sweep[") for k in keys), keys
    assert any(k.startswith("image_warp[") for k in keys), keys
    for v in report.values():
        assert isinstance(v, str) and v, report
