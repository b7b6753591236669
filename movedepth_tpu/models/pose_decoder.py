"""Pose regression heads (flax, NHWC).

PoseDecoder (reference: movedepth/networks/pose_decoder.py:8-48) and the
alternate PoseCNN (reference: movedepth/networks/pose_cnn.py:5-42, unused by
the shipped config but part of the capability surface).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn


class PoseDecoder(nn.Module):
    """Encoder features -> (axisangle, translation), each (B, F, 1, 3).

    squeeze 1x1 -> 3 convs -> global mean -> 0.01 * 6-DoF per frame.
    """

    num_ch_enc: Sequence[int]
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features) -> Tuple[jnp.ndarray, jnp.ndarray]:
        last = [f[-1] for f in input_features]
        squeeze = nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")
        cat = [nn.relu(squeeze(f)) for f in last]  # shared weights
        out = jnp.concatenate(cat, axis=-1)
        for i in range(3):
            k = (3, 3) if i != 2 else (1, 1)
            pad = ((1, 1), (1, 1)) if i != 2 else ((0, 0), (0, 0))
            features = 256 if i != 2 else 6 * self.num_frames_to_predict_for
            out = nn.Conv(
                features, k, strides=(self.stride, self.stride) if i != 2
                else (1, 1), padding=pad, dtype=self.dtype, name=f"pose_{i}",
            )(out)
            if i != 2:
                out = nn.relu(out)
        out = out.mean(axis=(1, 2))  # (B, 6F)
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]


class PoseCNN(nn.Module):
    """monodepth2 alternate pose network over stacked frames.

    (reference: movedepth/networks/pose_cnn.py:5-42)
    """

    num_input_frames: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        chans = (16, 32, 64, 128, 256, 256, 256)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        strides = (2, 2, 2, 2, 2, 2, 2)
        for i, (c, k, s) in enumerate(zip(chans, kernels, strides)):
            pad = (k - 1) // 2
            x = nn.Conv(
                c, (k, k), strides=(s, s), padding=((pad, pad), (pad, pad)),
                dtype=self.dtype, name=f"convs_{i}",
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            6 * (self.num_input_frames - 1), (1, 1), dtype=self.dtype,
            name="pose_conv",
        )(x)
        x = x.mean(axis=(1, 2))
        x = 0.01 * x.reshape(-1, self.num_input_frames - 1, 1, 6)
        return x[..., :3], x[..., 3:]
