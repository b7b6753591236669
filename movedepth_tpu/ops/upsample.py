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

    TPU note: everything runs on the FLAT (.., 9*s*s) lane layout -- a
    (.., 9, s, s) reshape would put s (= 4) on the minor dims, and every
    elementwise op on such an array pays up to 64x tile padding. The tap
    softmax becomes 9 lane-slice max/exp/add ops and the convex
    combination 9 fused multiply-adds against unmaterialized (B, H, W)
    neighbor views; XLA fuses the whole thing into one pass.
    """
    s = 2 ** scale
    ss = s * s
    b, h, w = depth.shape
    parts = [mask[..., k * ss:(k + 1) * ss] for k in range(9)]
    mx = parts[0]
    for p in parts[1:]:
        mx = jnp.maximum(mx, p)
    es = [jnp.exp(p - mx) for p in parts]
    den = sum(es[1:], es[0])
    xp = jnp.pad(depth, ((0, 0), (1, 1), (1, 1)))
    up = None
    for k, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                 for dx in range(3)):
        tap = es[k] * xp[:, dy:dy + h, dx:dx + w, None]  # (B, H, W, ss)
        up = tap if up is None else up + tap
    up = (up / den).reshape(b, h, w, s, s)
    return jnp.transpose(up, (0, 1, 3, 2, 4)).reshape(b, h * s, w * s)
