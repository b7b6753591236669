"""Model shape/behavior tests (reference shapes from SURVEY.md section 3.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from movedepth_tpu.config import Config
from movedepth_tpu.models import (
    ResNetEncoder, DepthDecoder, UncertNet, PoseDecoder, FPN4, Reg3D, Reg2D,
    ConvexUpsampleHead, encoder_channels, build_models,
)

KEY = jax.random.PRNGKey(0)
H, W = 96, 160  # small multiples of 32 for fast tests


def init_and_run(model, *args, train=False, method=None):
    variables = model.init(KEY, *args, train)
    out = model.apply(variables, *args, train,
                      mutable=["batch_stats"] if train else False)
    return variables, out


@pytest.mark.parametrize("arch", [18, 50])
def test_resnet_encoder_shapes(arch):
    x = jnp.zeros((1, H, W, 3))
    model = ResNetEncoder(arch=arch, dtype=jnp.float32)
    _, (feats, _) = init_and_run(model, x, train=True)
    chans = encoder_channels(arch)
    assert len(feats) == 5
    for i, (f, c) in enumerate(zip(feats, chans)):
        s = 2 ** (i + 1)
        assert f.shape == (1, H // s, W // s, c), (i, f.shape)


def test_pose_encoder_6ch():
    x = jnp.zeros((2, H, W, 6))
    model = ResNetEncoder(arch=18, num_input_images=2, dtype=jnp.float32)
    variables = model.init(KEY, x, False)
    feats = model.apply(variables, x, False)
    assert feats[-1].shape == (2, H // 32, W // 32, 512)


def test_depth_decoder_shapes():
    chans = encoder_channels(18)
    feats = [
        jnp.zeros((1, H // (2 ** (i + 1)), W // (2 ** (i + 1)), c))
        for i, c in enumerate(chans)
    ]
    model = DepthDecoder(num_ch_enc=chans, dtype=jnp.float32)
    variables = model.init(KEY, feats)
    out = model.apply(variables, feats)
    for s in range(4):
        d = out[("disp", s)]
        assert d.shape == (1, H // 2 ** s, W // 2 ** s, 1)
        v = np.asarray(d)
        assert (v >= 0).all() and (v <= 1).all()


def test_depth_decoder_fold_stage0_parity():
    """The subpixel-folded stage 0 computes the same function from the
    same parameters as the reference schedule (upsample -> conv -> conv).
    """
    rng = np.random.default_rng(3)
    chans = encoder_channels(18)
    feats = [
        jnp.asarray(rng.normal(0, 1, (2, H // 2 ** (i + 1),
                                      W // 2 ** (i + 1), c))
                    .astype(np.float32))
        for i, c in enumerate(chans)
    ]
    folded = DepthDecoder(num_ch_enc=chans, fold_stage0=True,
                          dtype=jnp.float32)
    plain = DepthDecoder(num_ch_enc=chans, fold_stage0=False,
                         dtype=jnp.float32)
    variables = folded.init(KEY, feats)
    # identical parameter trees: the fold changes the schedule, not params
    assert (jax.tree.map(lambda a: a.shape, variables)
            == jax.tree.map(lambda a: a.shape, plain.init(KEY, feats)))
    of = folded.apply(variables, feats)
    op = plain.apply(variables, feats)
    for s in range(4):
        np.testing.assert_allclose(np.asarray(of[("disp", s)]),
                                   np.asarray(op[("disp", s)]), atol=5e-6)


def test_depth_decoder_fold_stage1_parity():
    """The subpixel-folded stage 1 (upsample + skip-concat + upconv_1_1 as
    one coarse conv, stage-0 merged conv consuming the phase rep) computes
    the same function from the same parameters as the plain schedule."""
    rng = np.random.default_rng(5)
    chans = encoder_channels(18)
    feats = [
        jnp.asarray(rng.normal(0, 1, (2, H // 2 ** (i + 1),
                                      W // 2 ** (i + 1), c))
                    .astype(np.float32))
        for i, c in enumerate(chans)
    ]
    folded = DepthDecoder(num_ch_enc=chans, fold_stage1=True,
                          dtype=jnp.float32)
    plain = DepthDecoder(num_ch_enc=chans, fold_stage1=False,
                         dtype=jnp.float32)
    variables = folded.init(KEY, feats)
    # identical parameter trees: the fold changes the schedule, not params
    assert (jax.tree.map(lambda a: a.shape, variables)
            == jax.tree.map(lambda a: a.shape, plain.init(KEY, feats)))
    of = folded.apply(variables, feats)
    op = plain.apply(variables, feats)
    for s in range(4):
        np.testing.assert_allclose(np.asarray(of[("disp", s)]),
                                   np.asarray(op[("disp", s)]), atol=5e-6)


def test_depth_decoder_merge_heads_parity():
    """Merged disp heads (dispconv_{1..3} folded into the next stage's
    upconv as one conv) compute the same function from the same params.
    """
    rng = np.random.default_rng(7)
    chans = encoder_channels(18)
    feats = [
        jnp.asarray(rng.normal(0, 1, (2, H // 2 ** (i + 1),
                                      W // 2 ** (i + 1), c))
                    .astype(np.float32))
        for i, c in enumerate(chans)
    ]
    merged = DepthDecoder(num_ch_enc=chans, merge_heads=True,
                          dtype=jnp.float32)
    plain = DepthDecoder(num_ch_enc=chans, merge_heads=False,
                         dtype=jnp.float32)
    variables = merged.init(KEY, feats)
    # identical parameter trees: the merge changes the schedule, not params
    assert (jax.tree.map(lambda a: a.shape, variables)
            == jax.tree.map(lambda a: a.shape, plain.init(KEY, feats)))
    om = merged.apply(variables, feats)
    op = plain.apply(variables, feats)
    for s in range(4):
        np.testing.assert_allclose(np.asarray(om[("disp", s)]),
                                   np.asarray(op[("disp", s)]), atol=5e-6)


def test_pose_decoder_shapes_and_scale():
    feats = [[jnp.ones((3, H // 32, W // 32, 512))]]
    model = PoseDecoder(num_ch_enc=encoder_channels(18), dtype=jnp.float32)
    variables = model.init(KEY, feats)
    aa, tr = model.apply(variables, feats)
    assert aa.shape == (3, 2, 1, 3) and tr.shape == (3, 2, 1, 3)
    # the 0.01 scaling keeps initial poses small (reference pose_decoder.py:43)
    assert float(jnp.abs(aa).max()) < 1.0


def test_fpn4_shapes():
    x = jnp.zeros((1, H, W, 3))
    model = FPN4(base_channels=8, scale=2, dtype=jnp.float32)
    variables = model.init(KEY, x, False)
    match, ctx = model.apply(variables, x, False)
    assert match.shape == (1, H // 4, W // 4, 32)
    assert ctx.shape == (1, H // 4, W // 4, 32)


@pytest.mark.parametrize("scale", [2, 1, 0])
def test_fpn4_fold_eval_parity(scale):
    """The eval-time subpixel-folded fine trunks (conv0_*/conv1_* on the
    2x2 phase representation) compute the same function from the same
    parameters as the plain schedule, at every FPN output scale."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    folded = FPN4(base_channels=8, scale=scale, fold_eval=True,
                  dtype=jnp.float32)
    plain = FPN4(base_channels=8, scale=scale, fold_eval=False,
                 dtype=jnp.float32)
    variables = folded.init(KEY, x, False)
    # identical parameter trees: the fold changes the schedule, not params
    assert (jax.tree.map(lambda a: a.shape, variables)
            == jax.tree.map(lambda a: a.shape, plain.init(KEY, x, False)))
    mf, cf = folded.apply(variables, x, False)
    mp, cp = plain.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cp), atol=2e-5)


def test_fpn4_fold_eval_train_mode_unchanged():
    """Training mode never folds (BN batch statistics must be computed on
    the fine grid); fold_eval has no effect on the train path."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    folded = FPN4(base_channels=8, scale=2, fold_eval=True,
                  dtype=jnp.float32)
    plain = FPN4(base_channels=8, scale=2, fold_eval=False,
                 dtype=jnp.float32)
    variables = folded.init(KEY, x, False)
    (mf, _), sf = folded.apply(variables, x, True, mutable=["batch_stats"])
    (mp, _), sp = plain.apply(variables, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mp), atol=0)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=0), sf, sp)


def test_reg3d_shapes():
    vol = jnp.zeros((1, 16, H // 4, W // 4, 16))
    model = Reg3D(base_channels=16, down_size=3, dtype=jnp.float32)
    variables = model.init(KEY, vol, False)
    out = model.apply(variables, vol, False)
    assert out.shape == (1, 16, H // 4, W // 4)


def test_reg2d_shapes():
    vol = jnp.zeros((1, 4, H // 4, W // 4, 16))
    model = Reg2D(base_channels=16, dtype=jnp.float32)
    variables = model.init(KEY, vol, False)
    out = model.apply(variables, vol, False)
    assert out.shape == (1, 4, H // 4, W // 4)


def test_uncertnet_range():
    x = jnp.ones((1, 12, 20, 1)) * 0.5
    model = UncertNet(dtype=jnp.float32)
    variables = model.init(KEY, x, False)
    out = model.apply(variables, x, False)
    v = np.asarray(out)
    assert out.shape == x.shape and (v > 0).all() and (v < 1).all()


def test_convex_upsample_head_shape():
    feat = jnp.zeros((1, 12, 20, 32))
    model = ConvexUpsampleHead(scale=2, dtype=jnp.float32)
    variables = model.init(KEY, feat)
    out = model.apply(variables, feat)
    assert out.shape == (1, 12, 20, 9 * 16)


def test_build_models_shipped_config():
    cfg = Config(compute_dtype="float32")
    models = build_models(cfg)
    assert set(models) == {
        "mono_encoder", "mono_depth", "pose_encoder", "pose", "mvs_encoder",
        "reg3d", "mask_cnn", "up",
    }
    # reg2d is selected below 8 bins (reference trainer.py:116-119)
    m2 = build_models(cfg.replace(num_depth_bins=4))
    assert type(m2["reg3d"]).__name__ == "Reg2D"


def test_batchnorm_updates_stats():
    x = jax.random.normal(KEY, (4, 16, 16, 3)) * 3 + 1
    model = FPN4(base_channels=8, scale=2, dtype=jnp.float32)
    variables = model.init(KEY, x, False)
    _, updates = model.apply(variables, x, True, mutable=["batch_stats"])
    old = variables["batch_stats"]["conv0_0"]["bn"]["mean"]
    new = updates["batch_stats"]["conv0_0"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_depth_decoder_fold_stage2_parity():
    """fold_stage2: upsample + skip-concat + upconv_2_1 as one coarse
    conv at 1/8 res, the stage-1 merged conv consuming the phase rep --
    same function, same parameters as the plain schedule."""
    rng = np.random.default_rng(6)
    chans = encoder_channels(18)
    feats = [
        jnp.asarray(rng.normal(0, 1, (2, H // 2 ** (i + 1),
                                      W // 2 ** (i + 1), c))
                    .astype(np.float32))
        for i, c in enumerate(chans)
    ]
    folded = DepthDecoder(num_ch_enc=chans, fold_stage2=True,
                          dtype=jnp.float32)
    plain = DepthDecoder(num_ch_enc=chans, fold_stage2=False,
                         dtype=jnp.float32)
    variables = folded.init(KEY, feats)
    # identical parameter trees: the fold changes the schedule, not params
    assert (jax.tree.map(lambda a: a.shape, variables)
            == jax.tree.map(lambda a: a.shape, plain.init(KEY, feats)))
    of = folded.apply(variables, feats)
    op = plain.apply(variables, feats)
    for s in range(4):
        np.testing.assert_allclose(np.asarray(of[("disp", s)]),
                                   np.asarray(op[("disp", s)]), atol=2e-5)
