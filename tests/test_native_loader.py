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
