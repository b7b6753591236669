"""Golden tests: grid_sample / resize vs torch (the hard-parity ops).

The bilinear gather boundary semantics drive abs_rel parity (SURVEY.md
section 7 hard part #1), so these are exact-tolerance tests against
torch.nn.functional on CPU.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp
import pytest

from movedepth_tpu.ops.sampling import grid_sample, resize_bilinear, upsample_nearest_2x


def _rand_img(rng, b, c, h, w):
    return rng.normal(0, 1, (b, c, h, w)).astype(np.float32)


def _rand_grid(rng, b, h, w, lo=-1.3, hi=1.3):
    return rng.uniform(lo, hi, (b, h, w, 2)).astype(np.float32)


@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(rng, padding, align):
    b, c, h, w = 2, 3, 12, 17
    img = _rand_img(rng, b, c, h, w)
    grid = _rand_grid(rng, b, 9, 14)
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding, align_corners=align,
    ).numpy()
    ours = np.asarray(
        grid_sample(
            jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid),
            padding=padding, align_corners=align,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_exact_grid_points(rng):
    """Sampling exactly at pixel centers must return the pixels."""
    b, c, h, w = 1, 2, 5, 7
    img = _rand_img(rng, b, c, h, w)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = xs / (w - 1) * 2 - 1
    gy = ys / (h - 1) * 2 - 1
    grid = np.stack([gx, gy], -1).astype(np.float32)[None]
    ours = np.asarray(
        grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid),
                    padding="zeros", align_corners=True)
    )
    np.testing.assert_allclose(ours, img.transpose(0, 2, 3, 1), atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("out_hw", [(24, 40), (7, 9), (12, 17)])
def test_resize_bilinear_matches_torch(rng, align, out_hw):
    b, c, h, w = 2, 3, 12, 17
    img = _rand_img(rng, b, c, h, w)
    ref = F.interpolate(
        torch.from_numpy(img), out_hw, mode="bilinear", align_corners=align
    ).numpy()
    ours = np.asarray(
        resize_bilinear(jnp.asarray(img.transpose(0, 2, 3, 1)), out_hw, align)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    img = _rand_img(rng, 2, 4, 6, 5)
    ref = F.interpolate(torch.from_numpy(img), scale_factor=2, mode="nearest").numpy()
    ours = np.asarray(
        upsample_nearest_2x(jnp.asarray(img.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=0)
