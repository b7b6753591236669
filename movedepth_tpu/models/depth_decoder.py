"""monodepth2-style depth decoder + uncertainty head (flax, NHWC).

(reference: movedepth/networks/depth_decoder.py:10-101 DepthDecoder;
:371-393 UncertNet). The shipped config disables the ddv / mono_conf /
match_conv side-heads (reference: movedepth/trainer.py:74-75); they are
kept as module options for capability parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from movedepth_tpu.models.layers import (
    Conv3x3,
    ConvBlock,
    depth_to_space22,
    merged_conv3x3_reflect,
    torch_batchnorm,
)
from movedepth_tpu.ops.sampling import upsample_nearest_2x

NUM_CH_DEC = (16, 32, 64, 128, 256)


class DepthDecoder(nn.Module):
    """U-Net decoder over the 5-level encoder pyramid.

    Returns {('disp', s): (B, Hs, Ws, 1) sigmoid disparity} for s in scales
    (plus optional ddv/mono_conf/match outputs when enabled).
    """

    num_ch_enc: Sequence[int]
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    ddv: bool = False
    mono_conf: bool = False
    match_conv: bool = False
    mono_bins: int = 128
    # subpixel-fold the (skip-free) full-resolution stage: upconv_0_1 and
    # dispconv_0 run at half resolution on 4x channels and finish with a
    # depth_to_space -- same function, same params, ~4x less MXU time on
    # the N-padding-bound 16-channel convs. Disabled automatically when a
    # side-head consumes the fine-resolution stage-0 features.
    fold_stage0: bool = True
    # run each disp head merged into the next stage's first conv (both
    # read the same features; one MXU issue instead of two N-padded ones)
    merge_heads: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features) -> Dict:
        outputs = {}
        fold0 = (self.fold_stage0 and not self.ddv and not self.mono_conf
                 and not self.match_conv and 0 in self.scales)
        x = input_features[-1]
        pending = None  # disp head deferred into the next stage's conv
        for i in range(4, -1, -1):
            num_ch_out = NUM_CH_DEC[i]
            if pending is not None:
                # dispconv_{i+1} reads the same x as upconv_i_0: run both
                # as ONE conv -- each alone pads its output channels to the
                # MXU's 128 lanes, so the merged disp head is free
                ku, bu = ConvBlock(num_ch_out, dtype=self.dtype,
                                   name=f"upconv_{i}_0")(x, fold="params")
                kd, bd = Conv3x3(self.num_output_channels, dtype=self.dtype,
                                 name=f"dispconv_{pending}")(x,
                                                             fold="params")
                u, d = merged_conv3x3_reflect(x, [ku, kd], [bu, bd],
                                              self.dtype)
                outputs[("disp", pending)] = nn.sigmoid(d)
                x = nn.elu(u)
                pending = None
            else:
                x = ConvBlock(num_ch_out, dtype=self.dtype,
                              name=f"upconv_{i}_0")(x)
            if i == 0 and fold0:
                x = ConvBlock(num_ch_out, dtype=self.dtype,
                              name="upconv_0_1")(x, fold="up2")
                disp4 = Conv3x3(self.num_output_channels, dtype=self.dtype,
                                name="dispconv_0")(x, fold="phase2")
                outputs[("disp", 0)] = nn.sigmoid(depth_to_space22(disp4))
                continue
            x = upsample_nearest_2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_out, dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)

            if i in self.scales:
                if self.ddv:
                    feat = Conv3x3(self.mono_bins, dtype=self.dtype,
                                   name=f"dispconv_{i}")(x)
                    ddv = nn.softmax(feat, axis=-1)
                    grid = jnp.linspace(0.001, 1.0, self.mono_bins,
                                        dtype=feat.dtype)
                    outputs[("ddv", i)] = ddv
                    outputs[("disp", i)] = jnp.sum(
                        ddv * grid, axis=-1, keepdims=True)
                elif i > 0 and self.merge_heads and not self.mono_conf:
                    pending = i  # merged into upconv_{i-1}_0 next stage
                else:
                    outputs[("disp", i)] = nn.sigmoid(
                        Conv3x3(self.num_output_channels, dtype=self.dtype,
                                name=f"dispconv_{i}")(x)
                    )
                    if self.mono_conf:
                        outputs[("mono_conf", i)] = (
                            nn.elu(Conv3x3(self.num_output_channels,
                                           dtype=self.dtype,
                                           name=f"confconv_{i}")(x))
                            + 1.0 + 1e-10
                        )
            if i == 0 and self.match_conv:
                outputs[("match", 0)] = Conv3x3(
                    NUM_CH_DEC[0], dtype=self.dtype, name="matchconv_0")(x)
        return outputs


class UncertNet(nn.Module):
    """Entropy -> per-pixel "trust mono" weight in (0, 1).

    (reference: movedepth/networks/depth_decoder.py:371-393; the residual
    ``out += x`` broadcasts the 1-channel input over the 8 hidden channels.)
    """

    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: torch_batchnorm(self.dtype, self.axis_name, name=n)
        conv = lambda f, n: nn.Conv(
            f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name=n,
        )
        out = nn.relu(bn("bn1")(conv(8, "conv1")(x),
                                use_running_average=not train))
        out = nn.relu(bn("bn2")(conv(8, "conv2")(out),
                                use_running_average=not train))
        out = out + x  # broadcast over channels
        out = conv(1, "head")(out)
        return nn.sigmoid(out)
