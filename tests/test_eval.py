"""Eval-protocol tests: eigen crop, median scaling, oracle fusion, tables,
flip post-processing, CLI option bridge."""

import io

import numpy as np
import pytest

from movedepth_tpu.eval import evaluate as E
from movedepth_tpu.config import Config
from movedepth_tpu.cli.options import build_parser, config_from_args


def test_eigen_mask_crop():
    gt = np.full((375, 1242), 10.0)
    mask = E.eigen_mask(gt)
    crop = np.array([0.40810811 * 375, 0.99189189 * 375,
                     0.03594771 * 1242, 0.96405229 * 1242]).astype(np.int32)
    assert mask[crop[0], crop[2]] and mask[crop[1] - 1, crop[3] - 1]
    assert not mask[crop[0] - 1, crop[2]] and not mask[0, 0]
    # out-of-range depths masked
    gt2 = gt.copy()
    gt2[200, 600] = 100.0
    assert not E.eigen_mask(gt2)[200, 600]


def test_batch_post_process_disparity_golden(rng):
    """Our flip post-processing vs a literal torch restatement of the
    reference formula (evaluate_depth.py:67-75): l/r ramp masks blending
    the mean disparity -- a branch the reference defines but never calls
    (its --post_process flag is parsed and dropped, SURVEY.md 2.2)."""
    import torch

    l = rng.uniform(0.01, 1.0, (3, 96, 320)).astype(np.float32)
    r = rng.uniform(0.01, 1.0, (3, 96, 320)).astype(np.float32)

    tl, tr_ = torch.from_numpy(l), torch.from_numpy(r)
    _, h, w = tl.shape
    m = 0.5 * (tl + tr_)
    grid = torch.from_numpy(
        np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))[0]
        .astype(np.float32))
    lm = (1.0 - torch.clamp(20 * (grid - 0.05), 0, 1))[None]
    rm = torch.flip(lm, dims=[2])
    ref = rm * tl + lm * tr_ + (1.0 - lm - rm) * m

    ours = E.batch_post_process_disparity(l, r)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6, atol=1e-7)


def test_evaluate_disparities_perfect_prediction(rng):
    h, w = 94, 311
    gts = []
    monos = []
    mvss = []
    for _ in range(3):
        gt = rng.uniform(2.0, 60.0, (h, w)).astype(np.float32)
        gts.append(gt)
        # predictions at the same spatial size -> cv2 resize is identity;
        # mono off by a global scale (median scaling must fix it)
        monos.append((1.0 / gt) * 3.7)
        mvss.append(1.0 / gt)
    res = E.evaluate_disparities(np.stack(monos), np.stack(mvss), gts,
                                 eval_split="other")
    for k in ("mono", "mvs", "upbound"):
        assert res[k][0] == pytest.approx(0.0, abs=1e-5), k  # abs_rel
        assert res[k][4] == pytest.approx(1.0), k  # a1


def test_evaluate_disparities_oracle_best_of_two(rng):
    h, w = 50, 80
    gt = rng.uniform(2.0, 60.0, (h, w)).astype(np.float32)
    mono = 1.0 / (gt * rng.uniform(1.1, 1.3, gt.shape).astype(np.float32))
    mvs = 1.0 / (gt * rng.uniform(0.8, 0.95, gt.shape).astype(np.float32))
    res = E.evaluate_disparities(mono[None], mvs[None], [gt],
                                 eval_split="other",
                                 disable_median_scaling=True)
    assert res["upbound"][0] <= res["mono"][0] + 1e-6
    assert res["upbound"][0] <= res["mvs"][0] + 1e-6


def test_print_tables_format():
    res = {k: np.arange(7, dtype=np.float64) for k in
           ("mono", "mvs", "upbound")}
    buf = io.StringIO()
    E.print_tables(res, file=buf)
    text = buf.getvalue()
    assert "mono results:" in text and "upbound results:" in text
    assert "abs_rel" in text


def test_batch_post_process_disparity(rng):
    l = rng.uniform(0.1, 1.0, (2, 20, 30)).astype(np.float32)
    out = E.batch_post_process_disparity(l, l[:, :, ::-1][:, :, ::-1])
    assert out.shape == l.shape
    # equal inputs -> average is the input in the blended center
    np.testing.assert_allclose(out[:, :, 10:20], l[:, :, 10:20], atol=1e-6)


def test_cli_config_roundtrip():
    parser = build_parser("test")
    args = parser.parse_args([
        "--data_path", "/data", "--height", "192", "--width", "640",
        "--png", "--batch_size", "6", "--scales", "0", "1", "2", "3",
        "--frame_ids", "0", "-1", "1", "--learning_rate", "2e-4",
        "--no-convex_up",
    ])
    cfg = config_from_args(args)
    assert cfg.png is True and cfg.convex_up is False
    assert cfg.batch_size == 6 and cfg.learning_rate == 2e-4
    assert cfg.frame_ids == (0, -1, 1)
    # json round trip (opt.json parity)
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg
