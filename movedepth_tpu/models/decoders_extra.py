"""Experimental decoder variants -- capability parity with the reference's
defined-but-unused components (SURVEY.md section 2.2; reference:
movedepth/networks/depth_decoder.py:105-367). None are used by the shipped
train/eval path; they are available for research configurations.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from movedepth_tpu.models.layers import Conv3x3, ConvBlock
from movedepth_tpu.models.depth_decoder import NUM_CH_DEC
from movedepth_tpu.ops.sampling import upsample_nearest_2x


def depth_grid(discret: str, bins: int, min_d: float = 0.001,
               max_d: float = 1.0, dtype=jnp.float32):
    """SID (log-spaced) or UD (uniform) depth discretization (1, 1, 1, D).

    (reference: depth_decoder.py:57-69,219-231)
    """
    if discret == "SID":
        k = jnp.arange(bins, dtype=dtype)
        t = jnp.exp(jnp.log(jnp.asarray(min_d, dtype))
                    + jnp.log(jnp.asarray(max_d / min_d, dtype)) * k / bins)
    elif discret == "UD":
        t = jnp.linspace(min_d, max_d, bins, dtype=dtype)
    else:
        raise ValueError(discret)
    return t.reshape(1, 1, 1, bins)


class MPMDecoder(nn.Module):
    """Decoder that injects the cost volume at 1/4 scale
    (reference: depth_decoder.py:105-161)."""

    num_ch_enc: Sequence[int]
    num_bins: int = 8
    use_skips: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, costvol, mono_feats) -> Dict:
        outputs = {}
        x = mono_feats[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = upsample_nearest_2x(x)
            if i == 2:
                x = nn.Conv(NUM_CH_DEC[2], (1, 1), dtype=self.dtype,
                            name="reduce_conv")(
                    jnp.concatenate([x, costvol], axis=-1))
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, mono_feats[i - 1]], axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in (2, 1, 0):
                outputs[("mpm_disp", i)] = nn.sigmoid(
                    Conv3x3(1, dtype=self.dtype, name=f"dispconv_{i}")(x))
        return outputs


class DepthDecoder3D(nn.Module):
    """Per-scale 3D-CNN depth classification over SID/UD bins
    (reference: depth_decoder.py:178-259)."""

    num_ch_enc: Sequence[int]
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    discret: str = "UD"
    mono_bins: int = 96
    min_d: float = 0.1
    max_d: float = 10.0
    reg_c: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features) -> Dict:
        outputs = {}
        grid = depth_grid(self.discret, self.mono_bins, self.min_d,
                          self.max_d)
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = upsample_nearest_2x(x)
            if i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                feat = ConvBlock(self.mono_bins * self.reg_c,
                                 dtype=self.dtype,
                                 name=f"depth_expand_{i}")(x)
                b, h, w, _ = feat.shape
                # NDHWC volume: (B, D, H, W, reg_c)
                vol = feat.reshape(b, h, w, self.reg_c, self.mono_bins)
                vol = jnp.transpose(vol, (0, 4, 1, 2, 3))
                vol = nn.Conv(self.reg_c, (3, 3, 3),
                              padding=((1, 1), (1, 1), (1, 1)),
                              use_bias=False, dtype=self.dtype,
                              name=f"depth_3dcnn_{i}_a")(vol)
                vol = nn.elu(vol)
                vol = nn.Conv(1, (3, 3, 3), padding=((1, 1), (1, 1), (1, 1)),
                              use_bias=False, dtype=self.dtype,
                              name=f"depth_3dcnn_{i}_b")(vol)
                prob = nn.softmax(vol[..., 0], axis=1)  # (B, D, H, W)
                prob = jnp.transpose(prob, (0, 2, 3, 1))  # (B, H, W, D)
                outputs[("mono_depth", i)] = jnp.sum(
                    prob * grid, axis=-1, keepdims=True)
        return outputs


class DepthDecoderBin(nn.Module):
    """Disp + bin-softmax dual head (reference: depth_decoder.py:262-312)."""

    num_ch_enc: Sequence[int]
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    use_skips: bool = True
    mono_bins: int = 96
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features) -> Dict:
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = upsample_nearest_2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                outputs[("disp", i)] = nn.sigmoid(
                    Conv3x3(1, dtype=self.dtype, name=f"dispconv_{i}")(x))
                outputs[("bin", i)] = nn.softmax(
                    Conv3x3(self.mono_bins, dtype=self.dtype,
                            name=f"binconv_{i}")(x), axis=-1)
        return outputs


class DepthDecoder3Head(nn.Module):
    """4-way disparity heads (reference: depth_decoder.py:316-367)."""

    num_ch_enc: Sequence[int]
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    use_skips: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features) -> Dict:
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = upsample_nearest_2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = nn.sigmoid(
                    Conv3x3(4, dtype=self.dtype, name=f"dispconv_{i}")(x))
                outputs[("disp_rough", i)] = disp[..., 0:1]
                outputs[("disp_1", i)] = disp[..., 1:2]
                outputs[("disp_2", i)] = disp[..., 2:3]
                outputs[("disp_3", i)] = disp[..., 3:4]
        return outputs


class ResBlockWDSR(nn.Module):
    """WDSR-style residual block with the disparity concatenated in
    (reference: networks/resnet_encoder.py:526-537; weight_norm omitted --
    it only reparameterizes initialization/optimization geometry)."""

    n_feats: int
    expansion: int = 3
    res_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, disp):
        h = jnp.concatenate([disp, x], axis=-1)
        h = nn.Conv(self.n_feats * self.expansion, (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv0")(h)
        h = nn.relu(h)
        h = nn.Conv(self.n_feats, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        return x + h * self.res_scale


class ContextAdjustmentLayer(nn.Module):
    """Image-guided depth refinement
    (reference: networks/resnet_encoder.py:492-523)."""

    num_blocks: int = 8
    feature_dim: int = 16
    expansion: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, fused_depth, img):
        eps = 1e-6
        mean = jnp.mean(fused_depth)
        std = jnp.std(fused_depth) + eps
        norm = (fused_depth - mean) / std
        feat = nn.Conv(self.feature_dim, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="in_conv")(
            jnp.concatenate([norm, img], axis=-1))
        for i in range(self.num_blocks):
            feat = ResBlockWDSR(self.feature_dim, self.expansion,
                                dtype=self.dtype, name=f"block_{i}")(feat,
                                                                     norm)
        res = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                      name="out_conv")(feat)
        return (norm + res) * std + mean
