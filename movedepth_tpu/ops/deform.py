"""Deformable convolution v2 as pure JAX (bilinear sampling + matmul).

TPU-native replacement for the reference's *optional* external CUDA
extension (reference: networks/resnet_encoder.py:15-19,282-303
DeformConvPack/DCNConv2d, gated by --dcn, off in shipped scripts). Instead
of a custom scatter/gather kernel, each of the K*K deformed taps is one
batched bilinear sample (ops.sampling) followed by a single contraction
over (tap, channel) that lands on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from movedepth_tpu.ops.sampling import _sample_one, stack_corners


def deform_conv2d(x, offsets, modulation, weight, bias=None, kernel_size=3):
    """Modulated deformable conv (DCNv2), stride 1, 'same' padding.

    x:          (B, H, W, Cin)
    offsets:    (B, H, W, 2*K*K)  per-tap (dy, dx) displacements
    modulation: (B, H, W, K*K)    per-tap sigmoid gates (None for DCNv1)
    weight:     (K, K, Cin, Cout)
    Returns (B, H, W, Cout).
    """
    b, h, w, cin = x.shape
    k = kernel_size
    pad = (k - 1) // 2
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)

    off = offsets.reshape(b, h, w, k * k, 2)
    taps = []
    for i in range(k):
        for j in range(k):
            t = i * k + j
            sy = ys + (i - pad) + off[..., t, 0]
            sx = xs + (j - pad) + off[..., t, 1]

            def sample(img, sx_, sy_):
                corners = stack_corners(img)
                gx = sx_ / (w - 1) * 2.0 - 1.0
                gy = sy_ / (h - 1) * 2.0 - 1.0
                return _sample_one(img, gx, gy, "zeros", True, corners)

            v = jax.vmap(sample)(x, sx, sy)  # (B, H, W, Cin)
            if modulation is not None:
                v = v * modulation[..., t:t + 1]
            taps.append(v)
    stacked = jnp.stack(taps, axis=-2)  # (B, H, W, K*K, Cin)
    wk = weight.reshape(k * k, cin, -1)
    out = jnp.einsum("bhwtc,tco->bhwo", stacked, wk)
    if bias is not None:
        out = out + bias
    return out
