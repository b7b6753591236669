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
    conv_folded_edge,
    depth_to_space22,
    fold_phase2_kernel,
    fold_up2_kernel,
    merged_conv3x3_reflect,
    space_to_depth22,
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
    # subpixel-fold stage 1 as well: upconv_1_1 (half-res, 32ch) runs as
    # one coarse conv over [x, space_to_depth(skip)] via
    # fold_up2/fold_phase2 kernels, and the stage-0 merged conv consumes
    # the phase representation directly. Requires fold_stage0+merge_heads
    # (the shipped config); same function, same params.
    fold_stage1: bool = True
    # extend the same fold to stage 2 (upconv_2_1, 64ch at 1/4 res): the
    # coarse conv runs at 1/8 with 256 output lanes (vs 64 at 1/4), and
    # the stage-1 merged conv consumes the phase representation through
    # the SAME x_phase pending branch stage 1 already feeds stage 0 with.
    # Same function, same params (parity:
    # tests/test_models.py::test_depth_decoder_fold_stage2_parity).
    # Default off pending a chip A/B (cfg.fold_stage2).
    fold_stage2: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features, stop_after: Optional[int] = None
                 ) -> Dict:
        """stop_after=k (valid range 5..1) returns right after decoder
        stage i = k-1 (stages run 4..0) with the running features under
        "_x" — a profiling affordance so the chip harness can time
        cumulative stage prefixes (isolated-stage timings under-count on
        TPU, PROFILE.md). stop_after=0 can never match the k == i+1 check
        and silently runs the FULL decoder including disp heads — pass
        None (production, unchanged) for the full row instead."""
        outputs = {}
        fold0 = (self.fold_stage0 and not self.ddv and not self.mono_conf
                 and not self.match_conv and 0 in self.scales)
        skip0 = input_features[0]
        fold1 = (fold0 and self.fold_stage1 and self.merge_heads
                 and self.use_skips and 1 in self.scales
                 and skip0.shape[1] % 2 == 0 and skip0.shape[2] % 2 == 0)
        skip1 = input_features[1]
        fold2 = (fold1 and self.fold_stage2 and 2 in self.scales
                 and skip1.shape[1] % 2 == 0 and skip1.shape[2] % 2 == 0)
        x = input_features[-1]
        x_phase = False  # x held as 2x2 subpixel phases (half fine res)
        pending = None  # disp head deferred into the next stage's conv
        for i in range(4, -1, -1):
            if stop_after is not None and stop_after == i + 1:
                outputs["_x"] = x
                return outputs
            num_ch_out = NUM_CH_DEC[i]
            if pending is not None:
                # dispconv_{i+1} reads the same x as upconv_i_0: run both
                # as ONE conv -- each alone pads its output channels to the
                # MXU's 128 lanes, so the merged disp head is free
                nco = num_ch_out + self.num_output_channels
                # params-mode reads only the channel count: the phase rep
                # carries 4x channels, but the conv params are fine-grid
                px = jnp.zeros((1, 1, 1, x.shape[-1] // 4),
                               x.dtype) if x_phase else x
                ku, bu = ConvBlock(num_ch_out, dtype=self.dtype,
                                   name=f"upconv_{i}_0")(px, fold="params")
                kd, bd = Conv3x3(self.num_output_channels, dtype=self.dtype,
                                 name=f"dispconv_{pending}")(px,
                                                             fold="params")
                if x_phase:
                    # consume the stage-1 phase representation directly:
                    # the merged conv runs folded at quarter resolution
                    km = fold_phase2_kernel(jnp.concatenate([ku, kd], -1))
                    bm = jnp.tile(jnp.concatenate([bu, bd]), 4)
                    y = conv_folded_edge(x, km, bm, self.dtype)
                    parts = [y[..., p * nco:(p + 1) * nco] for p in range(4)]
                    d = jnp.concatenate(
                        [p_[..., num_ch_out:] for p_ in parts], -1)
                    outputs[("disp", pending)] = nn.sigmoid(
                        depth_to_space22(d))
                    u = jnp.concatenate(
                        [p_[..., :num_ch_out] for p_ in parts], -1)
                    x = depth_to_space22(nn.elu(u))
                    x_phase = False
                else:
                    u, d = merged_conv3x3_reflect(x, [ku, kd], [bu, bd],
                                                  self.dtype)
                    outputs[("disp", pending)] = nn.sigmoid(d)
                    x = nn.elu(u)
                pending = None
            else:
                x = ConvBlock(num_ch_out, dtype=self.dtype,
                              name=f"upconv_{i}_0")(x)
            if (i == 1 and fold1) or (i == 2 and fold2):
                # upsample + skip-concat + upconv_{i}_1 as ONE coarse conv:
                # the up2(x) part folds via fold_up2_kernel, the skip part
                # reads space_to_depth(skip) via fold_phase2_kernel; the
                # output stays in phase form for the NEXT stage's merged
                # conv (the x_phase pending branch above)
                skip = skip0 if i == 1 else skip1
                cin_x, cin_s = x.shape[-1], skip.shape[-1]
                dummy = jnp.zeros((1, 1, 1, cin_x + cin_s), x.dtype)
                ku, bu = ConvBlock(num_ch_out, dtype=self.dtype,
                                   name=f"upconv_{i}_1")(dummy,
                                                         fold="params")
                kf = jnp.concatenate(
                    [fold_up2_kernel(ku[:, :, :cin_x]),
                     fold_phase2_kernel(ku[:, :, cin_x:])], axis=2)
                xin = jnp.concatenate([x, space_to_depth22(skip)], -1)
                x = nn.elu(conv_folded_edge(xin, kf, jnp.tile(bu, 4),
                                            self.dtype))
                x_phase = True
                pending = i  # i in scales is part of the fold gate
                continue
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
