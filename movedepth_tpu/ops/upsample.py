"""RAFT-style learned convex upsampling (reference: movedepth/layers.py:184-214).

The reference uses ``F.unfold`` (im2col) + softmax-weighted sums; here the
3x3 neighborhood is built with nine static pads/slices that XLA fuses, and
the weighted combination is a single einsum.
"""

from __future__ import annotations

import jax.numpy as jnp


def _patches3x3(x):
    """Zero-padded 3x3 neighborhoods: (B, H, W) -> (B, H, W, 9).

    Neighbor ordering matches torch F.unfold with padding=1:
    k = (dy+1)*3 + (dx+1) for dy, dx in {-1, 0, 1}.
    """
    b, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    cols = [
        xp[:, dy:dy + h, dx:dx + w]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(cols, axis=-1)


def convex_upsample(depth, mask, scale=2):
    """Upsample depth by 2**scale with learned 9-tap convex weights.

    depth: (B, H, W); mask: (B, H, W, 9 * s * s) raw logits from the mask
    head with channel layout (9, s, s) -- the NHWC transpose of the
    reference's ``view(B, 9, s, s, H, W)`` (movedepth/layers.py:206).
    Returns (B, H*s, W*s).
    """
    s = 2 ** scale
    b, h, w = depth.shape
    m = mask.reshape(b, h, w, 9, s, s)
    m = jnp.exp(m - jnp.max(m, axis=3, keepdims=True))
    m = m / jnp.sum(m, axis=3, keepdims=True)  # softmax over the 9 taps
    patches = _patches3x3(depth)  # (B, H, W, 9)
    up = jnp.einsum("bhwk,bhwkij->bhiwj", patches, m)  # (B, H, s, W, s)
    return up.reshape(b, h * s, w * s)
