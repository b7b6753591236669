"""Golden tests: convex upsampling vs reference torch math; random box mask
and geometric consistency mask behavior."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from movedepth_tpu.ops.upsample import convex_upsample
from movedepth_tpu.ops.masking import random_image_mask, geometric_consistency_mask
from movedepth_tpu.ops import geometry as G


def torch_convex_upsample(depth, mask, scale=2):
    """reference: movedepth/layers.py:200-214."""
    B, H, W = depth.shape
    depth = depth.unsqueeze(1)
    s = 2 ** scale
    mask = mask.view(B, 9, s, s, H, W)
    mask = torch.softmax(mask, dim=1)
    up_ = F.unfold(depth, [3, 3], padding=1)
    up_ = up_.view(B, 9, 1, 1, H, W)
    up_ = torch.sum(mask * up_, dim=1)
    up_ = up_.permute(0, 3, 1, 4, 2)
    return up_.reshape(B, s * H, s * W)


def test_convex_upsample_matches_reference(rng):
    b, h, w, scale = 2, 6, 10, 2
    s = 2 ** scale
    depth = rng.uniform(1, 50, (b, h, w)).astype(np.float32)
    mask = rng.normal(0, 1, (b, 9 * s * s, h, w)).astype(np.float32)
    ref = torch_convex_upsample(
        torch.from_numpy(depth), torch.from_numpy(mask), scale
    ).numpy()
    ours = np.asarray(
        convex_upsample(
            jnp.asarray(depth), jnp.asarray(mask.transpose(0, 2, 3, 1)), scale
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_random_image_mask():
    key = jax.random.PRNGKey(0)
    img = jnp.ones((2, 18, 30, 3))
    masked, mask = random_image_mask(key, img, (6, 10))
    mask = np.asarray(mask)
    masked = np.asarray(masked)
    # exactly one 6x10 box of zeros, identical across batch and channels
    assert mask.shape == img.shape
    zeros_per_image = (mask[0, :, :, 0] == 0).sum()
    assert zeros_per_image == 6 * 10
    np.testing.assert_array_equal(mask[0], mask[1])
    np.testing.assert_array_equal(masked, np.asarray(img) * mask)
    # the zero region is a contiguous box
    ys, xs = np.where(mask[0, :, :, 0] == 0)
    assert ys.max() - ys.min() == 5 and xs.max() - xs.min() == 9
    # full-size filter returns the image untouched
    same, none = random_image_mask(key, img, (18, 30))
    assert none is None


def test_geometric_consistency_identity(rng):
    """Identity transform + equal depths => everything consistent."""
    b, h, w = 1, 8, 12
    K = np.tile(
        np.array([[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
        (b, 1, 1),
    )
    depth = rng.uniform(5, 50, (b, h, w)).astype(np.float32)
    T = jnp.tile(jnp.eye(4), (b, 1, 1))
    mask = geometric_consistency_mask(
        jnp.asarray(depth), jnp.asarray(K), T, jnp.asarray(depth), jnp.asarray(K)
    )
    assert bool(np.all(np.asarray(mask)))


def test_geometric_consistency_rejects_mismatched_depth(rng):
    b, h, w = 1, 8, 12
    K = np.tile(
        np.array([[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
        (b, 1, 1),
    )
    depth = rng.uniform(5, 50, (b, h, w)).astype(np.float32)
    T = jnp.tile(jnp.eye(4), (b, 1, 1))
    mask = geometric_consistency_mask(
        jnp.asarray(depth), jnp.asarray(K), T, jnp.asarray(depth * 3.0),
        jnp.asarray(K),
    )
    assert not bool(np.any(np.asarray(mask)))
