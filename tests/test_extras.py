"""Smoke + behavior tests for the optional capability surface
(SURVEY.md section 2.2): experimental decoders, context encoder/refiner,
deformable conv, v1 schedulers, per-pixel transforms, masked SSIM,
flow visualization, point-cloud export."""

import os

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from movedepth_tpu.models import (
    ContextEncoder, MPMDecoder, DepthDecoder3D, DepthDecoderBin,
    DepthDecoder3Head, ContextAdjustmentLayer, DCNConv2d, FPN3cas,
    encoder_channels,
)
from movedepth_tpu.ops import costvolume as CV
from movedepth_tpu.ops import geometry as G
from movedepth_tpu.ops.losses import mvs_ssim
from movedepth_tpu.ops.deform import deform_conv2d
from movedepth_tpu.ops.flowvis import flow_to_image, make_colorwheel
from movedepth_tpu.ops.pointcloud import generate_pointcloud

KEY = jax.random.PRNGKey(0)
H, W = 64, 96


def _feats():
    chans = encoder_channels(18)
    return [
        jnp.ones((1, H // 2 ** (i + 1), W // 2 ** (i + 1), c))
        for i, c in enumerate(chans)
    ]


def test_context_encoder():
    m = ContextEncoder(arch=18, dtype=jnp.float32)
    v = m.init(KEY, jnp.zeros((1, H, W, 3)), False)
    out = m.apply(v, jnp.zeros((1, H, W, 3)), False)
    assert out.shape == (1, H // 4, W // 4, 64)


def test_mpm_decoder():
    m = MPMDecoder(num_ch_enc=encoder_channels(18), num_bins=8,
                   dtype=jnp.float32)
    cost = jnp.zeros((1, H // 4, W // 4, 8))
    v = m.init(KEY, cost, _feats())
    out = m.apply(v, cost, _feats())
    for s in (2, 1, 0):
        assert out[("mpm_disp", s)].shape == (1, H // 2 ** s, W // 2 ** s, 1)


def test_depth_decoder_3d():
    m = DepthDecoder3D(num_ch_enc=encoder_channels(18), scales=(0,),
                       mono_bins=16, dtype=jnp.float32)
    v = m.init(KEY, _feats())
    out = m.apply(v, _feats())
    d = np.asarray(out[("mono_depth", 0)])
    assert d.shape == (1, H, W, 1)
    assert (d >= 0.1 - 1e-5).all() and (d <= 10.0 + 1e-5).all()


def test_depth_decoder_bin_and_3head():
    m = DepthDecoderBin(num_ch_enc=encoder_channels(18), mono_bins=8,
                        dtype=jnp.float32)
    v = m.init(KEY, _feats())
    out = m.apply(v, _feats())
    bins = np.asarray(out[("bin", 0)])
    np.testing.assert_allclose(bins.sum(-1), 1.0, atol=1e-5)

    m3 = DepthDecoder3Head(num_ch_enc=encoder_channels(18),
                           dtype=jnp.float32)
    v3 = m3.init(KEY, _feats())
    out3 = m3.apply(v3, _feats())
    assert out3[("disp_rough", 0)].shape == (1, H, W, 1)


def test_context_adjustment_layer():
    m = ContextAdjustmentLayer(num_blocks=2, dtype=jnp.float32)
    depth = jnp.ones((1, 16, 24, 1)) * 10.0
    img = jnp.zeros((1, 16, 24, 3))
    v = m.init(KEY, depth, img)
    out = m.apply(v, depth, img)
    assert out.shape == depth.shape


def test_fpn4_dcn_smoke():
    from movedepth_tpu.models import FPN4
    m = FPN4(base_channels=8, scale=2, dcn=True, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 48, 3))
    v = m.init(KEY, x, False)
    out, ctx = m.apply(v, x, False)
    assert out.shape == (1, 8, 12, 32)


def test_deform_conv_zero_offsets_equals_conv(rng):
    """With zero offsets and unit modulation, DCN == plain conv."""
    x = rng.normal(0, 1, (1, 10, 12, 4)).astype(np.float32)
    wgt = rng.normal(0, 0.3, (3, 3, 4, 6)).astype(np.float32)
    off = np.zeros((1, 10, 12, 18), np.float32)
    mod = np.ones((1, 10, 12, 9), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(mod), jnp.asarray(wgt)))
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(wgt.transpose(3, 2, 0, 1)), padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_schedule_v1_band_clamped(rng):
    disp = rng.uniform(0.05, 0.9, (2, 8, 10)).astype(np.float32)
    bins = np.asarray(CV.schedule_depth_bins_v1(
        jnp.asarray(disp), 8, 0.5, 0.1, 100.0))
    assert bins.shape == (2, 8, 8, 10)
    center = 1.0 / (1 / 100.0 + disp * (1 / 0.1 - 1 / 100.0))
    assert bins.max() <= center.reshape(2, -1).max(1).max() + 1e-3
    assert bins.min() >= center.reshape(2, -1).min(1).min() - 1e-3
    # geo and z variants run
    geo = CV.schedule_depth_bins_v1(
        jnp.asarray(disp), 8, 0.5, 0.1, 100.0,
        geo_mask=jnp.zeros_like(jnp.asarray(disp), bool), damper=2.0)
    zb = CV.schedule_depth_bins_v1(
        jnp.asarray(disp), 8, 0.5, 0.1, 100.0,
        z_trans=jnp.asarray([0.5, 1.0]))
    assert geo.shape == zb.shape == bins.shape


def test_transformation_v2_per_pixel(rng):
    aa = rng.normal(0, 0.05, (2, 3)).astype(np.float32)
    t = rng.normal(0, 0.2, (2, 4, 6, 3)).astype(np.float32)
    T = G.transformation_from_parameters_v2(jnp.asarray(aa), jnp.asarray(t))
    assert T.shape == (2, 4, 6, 4, 4)
    # constant per-pixel translation == global variant
    tc = np.broadcast_to(t[:, :1, :1], t.shape).copy()
    T2 = np.asarray(G.transformation_from_parameters_v2(
        jnp.asarray(aa), jnp.asarray(tc)))
    Tg = np.asarray(G.transformation_from_parameters(
        jnp.asarray(aa), jnp.asarray(tc[:, 0, 0])))
    np.testing.assert_allclose(T2[:, 2, 3], Tg, atol=1e-6)

    depth = rng.uniform(1, 20, (2, 4, 6)).astype(np.float32)
    K = np.tile(np.array([[6.0, 0, 3, 0], [0, 8.0, 2, 0], [0, 0, 1, 0],
                          [0, 0, 0, 1]], np.float32), (2, 1, 1))
    pts = G.backproject(jnp.asarray(depth), jnp.asarray(np.linalg.inv(K)))
    grid_pp = np.asarray(G.project_per_pixel(pts, jnp.asarray(K),
                                             jnp.asarray(T2)))
    grid_g = np.asarray(G.project(pts, jnp.asarray(K), jnp.asarray(Tg),
                                  4, 6))
    np.testing.assert_allclose(grid_pp, grid_g, atol=1e-5)


def test_mvs_ssim(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 10, 12, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (1, 10, 12, 3)).astype(np.float32))
    mask = jnp.ones((1, 10, 12, 1))
    out, pooled = mvs_ssim(x, y, mask)
    assert out.shape == (1, 8, 10, 3) and pooled.shape == (1, 8, 10, 1)
    v = np.asarray(out)
    assert (v >= 0).all() and (v <= 1).all()


def test_flowvis():
    assert make_colorwheel().shape == (55, 3)
    flow = np.random.default_rng(0).normal(0, 2, (12, 16, 2))
    img = flow_to_image(flow.astype(np.float32))
    assert img.shape == (12, 16, 3) and img.dtype == np.uint8


def test_pointcloud_ply(tmp_path):
    rgb = np.full((4, 5, 3), 128, np.uint8)
    depth = np.full((4, 5), 2.0, np.float32)
    K = np.array([[2.0, 0, 2], [0, 2.0, 2], [0, 0, 1]], np.float32)
    extr = np.eye(4, dtype=np.float32)
    mask = np.ones((4, 5), np.float32)
    out = generate_pointcloud([rgb], [depth], str(tmp_path / "a.ply"),
                              [K], [extr], [mask])
    text = open(out).read()
    assert text.startswith("ply") and "element vertex 20" in text
