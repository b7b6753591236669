"""End-to-end evaluation: synthetic KITTI tree + checkpoint -> metric tables
through the real predict/evaluate path (the de-facto integration test the
reference relies on, SURVEY.md section 4)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.train import state as S
from movedepth_tpu.eval.evaluate import evaluate, predict_disparities


@pytest.fixture(scope="module")
def eval_tree(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("evalkitti")
    drive = "2011_09_26/2011_09_26_drive_0002_sync"
    img_dir = tmp_path / drive / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(4):
        small = rng.uniform(0, 255, (8, 12, 3))
        arr = np.repeat(np.repeat(small, 8, 0), 8, 1).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.jpg")
    split_dir = tmp_path / "eigen"
    split_dir.mkdir()
    (split_dir / "test_files.txt").write_text(
        f"{drive} 1 l\n{drive} 2 l")
    # synthetic GT depths at a different (GT-native) resolution
    gt = [rng.uniform(5, 60, (96, 320)).astype(np.float32)
          for _ in range(2)]
    arr = np.empty(len(gt), dtype=object)
    for i, g in enumerate(gt):
        arr[i] = g
    np.savez_compressed(split_dir / "gt_depths.npz", data=arr)
    return str(tmp_path), str(split_dir)


def test_evaluate_end_to_end(eval_tree):
    data_path, split_dir = eval_tree
    cfg = Config(height=64, width=96, num_depth_bins=8, batch_size=1,
                 compute_dtype="float32", num_workers=2)
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))

    results = evaluate(variables, cfg, data_path, split_dir, batch_size=1)
    for name in ("mono", "mvs", "fused", "upbound"):
        r = results[name]
        assert r.shape == (7,)
        assert np.isfinite(r).all()
        assert 0 <= r[4] <= 1  # a1 in [0, 1]
    # oracle upbound cannot be worse than either branch
    assert results["upbound"][0] <= results["mono"][0] + 1e-9
    assert results["upbound"][0] <= results["mvs"][0] + 1e-9


def test_predict_disparities_shapes(eval_tree):
    data_path, split_dir = eval_tree
    cfg = Config(height=64, width=96, num_depth_bins=8, batch_size=2,
                 compute_dtype="float32", num_workers=2)
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    mono, mvs, fused = predict_disparities(variables, cfg, data_path,
                                           split_dir, batch_size=2)
    assert mono.shape == (2, 64, 96) and mvs.shape == (2, 64, 96)
    assert fused.shape == (2, 64, 96)
    assert (mvs > 0).all() and np.isfinite(mono).all()
    assert (fused > 0).all()
    # the learned blend lies between its two branches pointwise, so its
    # DEPTH is bounded by min/max of mono depth and mvs depth
    dmono, dmvs, dfused = 1.0 / mono, 1.0 / mvs, 1.0 / fused
    lo = np.minimum(dmono, dmvs) - 1e-4
    hi = np.maximum(dmono, dmvs) + 1e-4
    assert ((dfused >= lo) & (dfused <= hi)).all()


@pytest.mark.slow
def test_parity_eval_script(eval_tree, tmp_path):
    """scripts/parity_eval.sh runs the WHOLE runbook (ckpt conversion ->
    eval -> tables -> target diff) on a synthetic tree + a reference-style
    folder of per-model .pth files (VERDICT round-2 item 6)."""
    import subprocess

    import torch

    from test_torch_import import (
        TorchConvexUpHead,
        TorchDepthDecoderFull,
        TorchFPN4,
        TorchPoseDecoder,
        TorchReg3D,
        TorchResNet18Encoder,
        TorchUncertNet,
    )

    data_path, _ = eval_tree
    ckpt = tmp_path / "weights_19"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch_models = {
        "mono_encoder": TorchResNet18Encoder(),
        "mono_depth": TorchDepthDecoderFull([64, 64, 128, 256, 512]),
        "pose_encoder": TorchResNet18Encoder(num_input_images=2),
        "pose": TorchPoseDecoder(),
        "mvs_encoder": TorchFPN4(),
        "reg3d": TorchReg3D(16),
        "mask_cnn": TorchUncertNet(),
        "up": TorchConvexUpHead(),
    }
    for name, tm in torch_models.items():
        torch.save(tm.state_dict(), ckpt / f"{name}.pth")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["SPLITS"] = data_path  # the fixture's split lists + gt_depths.npz
    env["PARITY_CFG_OVERRIDES"] = (
        "height=64,width=96,num_depth_bins=8,batch_size=1,"
        "compute_dtype=float32,num_workers=2")
    proc = subprocess.run(
        [os.path.join(repo, "scripts", "parity_eval.sh"), data_path,
         str(ckpt)],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1200)
    out = proc.stdout + proc.stderr
    # random weights won't hit parity; the runbook must still complete
    assert proc.returncode in (0, 1), out
    assert "mvs results:" in out, out
    assert "PARITY" in out, out


def test_predict_disparities_post_process(eval_tree):
    data_path, split_dir = eval_tree
    cfg = Config(height=64, width=96, num_depth_bins=8, batch_size=2,
                 compute_dtype="float32", num_workers=2, post_process=True)
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    mono, mvs, fused = predict_disparities(variables, cfg, data_path,
                                           split_dir, batch_size=2)
    assert mono.shape == (2, 64, 96)
    assert np.isfinite(mono).all() and np.isfinite(mvs).all()
    assert np.isfinite(fused).all()
