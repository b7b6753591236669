"""Serving surfaces: the folder-inference CLI and the jax.export artifact."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.train import state as S
from movedepth_tpu.train import checkpoints as C

CFG = Config(height=64, width=96, num_depth_bins=8,
             compute_dtype="float32")


@pytest.fixture(scope="module")
def weights_folder(tmp_path_factory):
    """An Orbax checkpoint of freshly initialized weights."""
    tmp = tmp_path_factory.mktemp("serve")
    models = build_models(CFG)
    variables = S.init_variables(models, CFG, jax.random.PRNGKey(0))
    params, stats = S.split_variables(variables)
    tx = S.create_optimizer(CFG, 1, params)
    state = S.TrainState(step=0, params=params, batch_stats=stats,
                         opt_state=tx.init(params))
    path = C.save_checkpoint(str(tmp), state, last=True)
    return path


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(3)
    for i in range(3):
        arr = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
        Image.fromarray(arr).save(tmp / f"frame_{i:03d}.jpg")
    return str(tmp)


def test_infer_cli_sequence(weights_folder, frames_dir, tmp_path):
    from movedepth_tpu.cli.infer import main
    out = str(tmp_path / "out")
    main(["--image_path", frames_dir, "--out_dir", out, "--save_png",
          "--load_weights_folder", weights_folder,
          "--height", "64", "--width", "96", "--num_depth_bins", "8",
          "--compute_dtype", "float32"])
    # frame 0 falls back to mono, frames 1..2 run full MVS
    for i in range(3):
        d = np.load(os.path.join(out, f"frame_{i:03d}_depth.npy"))
        assert d.shape == (64, 96)
        assert np.all(np.isfinite(d)) and np.all(d > 0)
        assert os.path.isfile(os.path.join(out, f"frame_{i:03d}_disp.png"))


def test_infer_cli_mono(weights_folder, frames_dir, tmp_path):
    from movedepth_tpu.cli.infer import main
    out = str(tmp_path / "out_mono")
    main(["--image_path", frames_dir, "--out_dir", out, "--mono_only",
          "--load_weights_folder", weights_folder,
          "--height", "64", "--width", "96", "--num_depth_bins", "8",
          "--compute_dtype", "float32"])
    d = np.load(os.path.join(out, "frame_001_depth.npy"))
    assert d.shape == (64, 96)


@pytest.mark.parametrize("mono", [True, False])
@pytest.mark.slow
def test_export_roundtrip(weights_folder, mono):
    """Serialized artifact reproduces the live forward exactly."""
    from jax import export
    from movedepth_tpu.cli.export_model import build_export
    from movedepth_tpu import pipeline as P

    cfg = CFG.replace(load_weights_folder=weights_folder)
    from movedepth_tpu.cli.evaluate import load_variables
    variables = load_variables(cfg)
    exp = build_export(cfg, variables, mono=mono, batch=1,
                       platforms=("cpu",))
    fn = export.deserialize(exp.serialize())

    h, w = cfg.height, cfg.width
    nf = 1 if mono else len(cfg.matching_ids)
    rng = np.random.default_rng(0)
    color = jnp.asarray(
        rng.uniform(0, 1, (1, nf, h, w, 3)).astype(np.float32))
    K = np.array([[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)[None]
    Kb = jnp.asarray(K)
    invKb = jnp.linalg.inv(Kb)
    got = fn.call(color, Kb, invKb)

    models = build_models(cfg)
    batch = {"color": color, "K": Kb, "inv_K": invKb}
    if mono:
        want = P.forward_mono_infer(models, variables, batch, cfg)
        np.testing.assert_allclose(np.asarray(got[1]),
                                   np.asarray(want["depth_mono"]),
                                   rtol=1e-6)
    else:
        want = P.forward_infer(models, variables, batch, cfg)
        np.testing.assert_allclose(np.asarray(got[2]),
                                   np.asarray(want["depth_mvs"]),
                                   rtol=1e-6)
