"""KITTI Eigen evaluation -- the reference protocol, exactly.

(reference: movedepth/evaluate_depth.py:77-331). Protocol constants:
697-image eigen split, crop [0.40810811H : 0.99189189H,
0.03594771W : 0.96405229W], per-image median scaling, depth clamp
[1e-3, 80] m; reports the 7 metrics for mono, MVS, and the oracle
"upbound" fusion.

Device work (the full MVS forward) is batched and jitted; per-image
resize-to-GT + masked metrics stay on host numpy, matching the reference's
cv2-based protocol bit-for-bit.
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from movedepth_tpu.config import Config, xla_compiler_options
from movedepth_tpu import pipeline as P
from movedepth_tpu.models import build_models
from movedepth_tpu.data.kitti import KITTIRawDataset, readlines
from movedepth_tpu.data.loader import Loader

MIN_DEPTH = 1e-3
MAX_DEPTH = 80.0
METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def compute_errors_np(gt: np.ndarray, pred: np.ndarray):
    """Host-side 7 metrics on masked vectors
    (reference: evaluate_depth.py:22-40)."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean((gt - pred) ** 2 / gt)
    return np.array([abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3])


def compute_fuse_errors_np(gt, pred_mono, pred_mvs):
    """Oracle best-of-two (reference: evaluate_depth.py:42-64)."""
    use1 = np.abs(gt - pred_mono) < np.abs(pred_mvs - gt)
    return compute_errors_np(gt, np.where(use1, pred_mono, pred_mvs))


def batch_post_process_disparity(l_disp, r_disp):
    """monodepth-v1 flip post-processing
    (reference: evaluate_depth.py:67-75)."""
    _, h, w = l_disp.shape
    m_disp = 0.5 * (l_disp + r_disp)
    grid = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))[0]
    l_mask = (1.0 - np.clip(20 * (grid - 0.05), 0, 1))[None]
    r_mask = l_mask[:, :, ::-1]
    return r_mask * l_disp + l_mask * r_disp + (1 - l_mask - r_mask) * m_disp


def eigen_mask(gt_depth: np.ndarray) -> np.ndarray:
    h, w = gt_depth.shape
    mask = (gt_depth > MIN_DEPTH) & (gt_depth < MAX_DEPTH)
    crop = np.array([0.40810811 * h, 0.99189189 * h,
                     0.03594771 * w, 0.96405229 * w]).astype(np.int32)
    crop_mask = np.zeros_like(mask)
    crop_mask[crop[0]:crop[1], crop[2]:crop[3]] = 1
    return mask & (crop_mask > 0)


def predict_disparities(variables, cfg: Config, data_path: str,
                        split_dir: str, batch_size: int = 1,
                        num_workers: int = 8, limit: Optional[int] = None):
    """Run full-MVS inference over the eval split.

    Returns (pred_disps_mono, pred_disps_mvs, pred_disps_fused) as
    (N, H, W) numpy arrays (reference: evaluate_depth.py:176-256). The
    fused channel is the LEARNED mono/MVS blend (mask_cnn on the
    cost-volume entropy) the reference trains but never evaluates
    (it loads mask_cnn and drops it, evaluate_depth.py:170-174).
    """
    filenames = readlines(os.path.join(split_dir, "test_files.txt"))
    if limit:
        filenames = filenames[:limit]
    img_ext = ".png" if cfg.png else ".jpg"
    dataset = KITTIRawDataset(
        data_path, filenames, cfg.height, cfg.width, cfg.matching_ids,
        is_train=False, img_ext=img_ext, load_depth=False)
    loader = Loader(dataset, batch_size, shuffle=False, drop_last=False,
                    num_workers=num_workers)

    models = build_models(cfg)

    copts = xla_compiler_options(cfg, infer=True)

    @functools.partial(jax.jit, compiler_options=copts)
    def infer(variables, batch):
        out = P.forward_infer_fused(models, variables, batch, cfg)
        return out["disp_mono"], 1.0 / out["depth_mvs"], out["disp_fused"]

    @functools.partial(jax.jit, compiler_options=copts)
    def infer_flipped(variables, batch):
        fb = dict(batch)
        fb["color"] = batch["color"][..., ::-1, :]
        out = P.forward_infer_fused(models, variables, fb, cfg)
        return (out["disp_mono"][..., ::-1],
                (1.0 / out["depth_mvs"])[..., ::-1],
                out["disp_fused"][..., ::-1])

    monos, mvss, fuseds = [], [], []
    for batch in loader.epoch(0):
        jb = jax.tree.map(jnp.asarray, batch)
        dm, dz, df = infer(variables, jb)
        dm, dz, df = np.asarray(dm), np.asarray(dz), np.asarray(df)
        if cfg.post_process:
            # monodepth-v1 flip blending; the reference parses the flag but
            # never applies it (SURVEY.md 2.2) -- functional here
            dmf, dzf, dff = infer_flipped(variables, jb)
            dm = batch_post_process_disparity(dm, np.asarray(dmf))
            dz = batch_post_process_disparity(dz, np.asarray(dzf))
            df = batch_post_process_disparity(df, np.asarray(dff))
        monos.append(dm)
        mvss.append(dz)
        fuseds.append(df)
    return (np.concatenate(monos, 0), np.concatenate(mvss, 0),
            np.concatenate(fuseds, 0))


def evaluate_disparities(pred_disps_mono, pred_disps_mvs, gt_depths,
                         eval_split: str = "eigen",
                         disable_median_scaling: bool = False,
                         pred_depth_scale_factor: float = 1.0,
                         pred_disps_fused=None):
    """Host-side metric computation over predicted disparities.

    (reference: evaluate_depth.py:259-314)
    Returns dict with 'mono', 'mvs', 'upbound' 7-metric arrays, plus
    'fused' (the learned mask_cnn blend, same per-image protocol) when
    ``pred_disps_fused`` is given -- a row the reference cannot print
    (its eval never calls mask_cnn, evaluate_depth.py:170-174).
    """
    import cv2

    errs_mono, errs_mvs, errs_fuse, errs_learned = [], [], [], []
    for i in range(pred_disps_mono.shape[0]):
        gt = gt_depths[i]
        gh, gw = gt.shape[:2]
        dm = cv2.resize(pred_disps_mono[i], (gw, gh))
        dz = cv2.resize(pred_disps_mvs[i], (gw, gh))
        pm = 1.0 / dm
        pz = 1.0 / dz

        mask = (eigen_mask(gt) if eval_split == "eigen" else gt > 0)
        pm, pz, g = pm[mask], pz[mask], gt[mask]
        pm *= pred_depth_scale_factor
        pz *= pred_depth_scale_factor
        if not disable_median_scaling:
            pm *= np.median(g) / np.median(pm)
            pz *= np.median(g) / np.median(pz)
        pm = np.clip(pm, MIN_DEPTH, MAX_DEPTH)
        pz = np.clip(pz, MIN_DEPTH, MAX_DEPTH)

        errs_mono.append(compute_errors_np(g, pm))
        errs_mvs.append(compute_errors_np(g, pz))
        errs_fuse.append(compute_fuse_errors_np(g, pm, pz))

        if pred_disps_fused is not None:
            df = cv2.resize(pred_disps_fused[i], (gw, gh))
            pf = (1.0 / df)[mask] * pred_depth_scale_factor
            if not disable_median_scaling:
                pf *= np.median(g) / np.median(pf)
            pf = np.clip(pf, MIN_DEPTH, MAX_DEPTH)
            errs_learned.append(compute_errors_np(g, pf))

    results = {
        "mono": np.stack(errs_mono).mean(0),
        "mvs": np.stack(errs_mvs).mean(0),
        "upbound": np.stack(errs_fuse).mean(0),
    }
    if errs_learned:
        results["fused"] = np.stack(errs_learned).mean(0)
    return results


def print_tables(results: Dict[str, np.ndarray], file=sys.stdout):
    for name in ("mono", "mvs", "fused", "upbound"):
        if name not in results:
            continue
        print(f"{name} results:", file=file)
        print(("{:>8} | " * 7).format(*METRIC_NAMES), file=file)
        print(("&{: 8.3f}  " * 7).format(*results[name].tolist()) + "\\\\",
              file=file)
        print("", file=file)


def evaluate(variables, cfg: Config, data_path: str, split_dir: str,
             gt_path: Optional[str] = None, batch_size: int = 1,
             limit: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Full protocol: inference + GT comparison + tables."""
    mono, mvs, fused = predict_disparities(variables, cfg, data_path,
                                           split_dir, batch_size, limit=limit)
    gt_path = gt_path or os.path.join(split_dir, "gt_depths.npz")
    gt = np.load(gt_path, fix_imports=True, encoding="latin1",
                 allow_pickle=True)["data"]
    if limit:
        gt = gt[:limit]
    results = evaluate_disparities(mono, mvs, gt, cfg.eval_split,
                                   cfg.disable_median_scaling,
                                   cfg.pred_depth_scale_factor,
                                   pred_disps_fused=fused)
    print_tables(results)
    return results
