"""MVS matching encoder (FPN) and cost-volume regularizers (flax, NHWC/NDHWC).

FPN4 (reference: movedepth/networks/resnet_encoder.py:311-391), FPN3cas
(:393-451), Reg3D / Reg2D 3D U-Nets (:227-280, :184-225). The 3-D volumes
run in NDHWC so the channel contraction lands on the MXU lane dimension;
transposed convs use ConvTransposeTorch for exact shape/semantics parity
with torch's output_padding bookkeeping (SURVEY.md section 7 hard part #6).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
import flax.linen as nn

from movedepth_tpu.models.layers import (
    ConvBNReLU,
    ConvBnReLU3D,
    ConvTransposeTorch,
    TorchBatchNorm,
)
from movedepth_tpu.ops.sampling import resize_bilinear


def _up2(x):
    """F.interpolate(scale_factor=2, bilinear, align_corners=True)."""
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                           align_corners=True)


class FPN4(nn.Module):
    """4-stage FPN; returns (matching_feature, context_feature).

    At the shipped ``scale=2`` the matching feature is base*4 channels at
    1/4 resolution and the context feature is the stride-4 trunk (conv2)
    (reference: resnet_encoder.py:384-391).
    """

    base_channels: int = 8
    scale: int = 2
    dcn: bool = False
    # eval-only subpixel folding of the two finest trunks: their 8/16
    # channel convs are MXU N-padding-bound (pad to the 128 lanes), so
    # conv0_*/conv1_* run on the 2x2 phase representation (4x channels at
    # 1/4 the positions -- same math, see layers.fold_phase2_kernel) and
    # the stride-2 conv1_0/conv2_0 land back on the native layout.
    # OFF by default: chip A/B measured it +56 ms/iter at batch 128
    # (109.2 -> 165.7 ms whole-model; the fold's space_to_depth re-layouts
    # on the full-res tensors cost more than the lane occupancy saves --
    # PROFILE.md, session of 2026-08-18). Kept as a tested option for
    # shapes where the trunk dominates.
    fold_eval: bool = False
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bc = self.base_channels
        blk = lambda f, k, s, n: ConvBNReLU(
            f, (k, k), (s, s), ((k // 2, k // 2), (k // 2, k // 2)),
            dtype=self.dtype, axis_name=self.axis_name, name=n,
        )
        fold = (self.fold_eval and not train and not self.dcn
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)
        if fold:
            from movedepth_tpu.models.layers import (
                depth_to_space22,
                space_to_depth22,
            )
            xp = space_to_depth22(x)
            c = blk(bc, 3, 1, "conv0_0")(xp, train, fold="phase")
            conv0p = blk(bc, 3, 1, "conv0_1")(c, train, fold="phase")
            conv0 = None  # d2s(conv0p) materialized only if consumed
            c = blk(bc * 2, 5, 2, "conv1_0")(conv0p, train, fold="s2")
            cp = space_to_depth22(c)
            cp = blk(bc * 2, 3, 1, "conv1_1")(cp, train, fold="phase")
            conv1p = blk(bc * 2, 3, 1, "conv1_2")(cp, train, fold="phase")
            conv1 = None
            c = blk(bc * 4, 5, 2, "conv2_0")(conv1p, train, fold="s2")
            if self.scale < 2:
                conv1 = depth_to_space22(conv1p)
            if self.scale < 1:
                conv0 = depth_to_space22(conv0p)
        else:
            c = blk(bc, 3, 1, "conv0_0")(x, train)
            conv0 = blk(bc, 3, 1, "conv0_1")(c, train)
            c = blk(bc * 2, 5, 2, "conv1_0")(conv0, train)
            c = blk(bc * 2, 3, 1, "conv1_1")(c, train)
            conv1 = blk(bc * 2, 3, 1, "conv1_2")(c, train)
            c = blk(bc * 4, 5, 2, "conv2_0")(conv1, train)
        c = blk(bc * 4, 3, 1, "conv2_1")(c, train)
        conv2 = blk(bc * 4, 3, 1, "conv2_2")(c, train)
        c = blk(bc * 8, 5, 2, "conv3_0")(conv2, train)
        c = blk(bc * 8, 3, 1, "conv3_1")(c, train)
        conv3 = blk(bc * 8, 3, 1, "conv3_2")(c, train)

        final_chs = bc * 8
        inner = lambda n: nn.Conv(final_chs, (1, 1), use_bias=True,
                                  dtype=self.dtype, name=n)
        intra = conv3
        if self.scale < 3:
            intra = _up2(intra) + inner("inner1")(conv2)
        if self.scale < 2:
            intra = _up2(intra) + inner("inner2")(conv1)
        if self.scale < 1:
            intra = _up2(intra) + inner("inner3")(conv0)

        if self.scale == 3:
            out = nn.Conv(bc * 8, (1, 1), use_bias=False, dtype=self.dtype,
                          name="out")(intra)
            return out, conv3
        out_ch = {2: bc * 4, 1: bc * 2, 0: bc}[self.scale]
        out = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="out")(intra)
        if self.dcn:
            # optional deformable refinement (reference: :342-347,382-383)
            out = DCNConv2d(out_ch, dtype=self.dtype,
                            axis_name=self.axis_name,
                            name="out_dcn_0")(out, train)
            out = DCNConv2d(out_ch, dtype=self.dtype,
                            axis_name=self.axis_name,
                            name="out_dcn_1")(out, train)
            out = DCNConv2d(out_ch, relu=False, use_bn=False,
                            dtype=self.dtype, name="out_dcn_2")(out, train)
        ctx = {2: conv2, 1: conv1, 0: conv0}[self.scale]
        return out, ctx


class FPN3cas(nn.Module):
    """Cascade FPN emitting features at 1/4, 1/2, 1/1 resolution.

    (reference: resnet_encoder.py:393-451; pairs with the unused
    ``--mvs_cascade`` flag -- optional capability surface.)
    """

    base_channels: int = 8
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        bc = self.base_channels
        blk = lambda f, k, s, n: ConvBNReLU(
            f, (k, k), (s, s), ((k // 2, k // 2), (k // 2, k // 2)),
            dtype=self.dtype, axis_name=self.axis_name, name=n,
        )
        c = blk(bc, 3, 1, "conv0_0")(x, train)
        conv0 = blk(bc, 3, 1, "conv0_1")(c, train)
        c = blk(bc * 2, 5, 2, "conv1_0")(conv0, train)
        c = blk(bc * 2, 3, 1, "conv1_1")(c, train)
        conv1 = blk(bc * 2, 3, 1, "conv1_2")(c, train)
        c = blk(bc * 4, 5, 2, "conv2_0")(conv1, train)
        c = blk(bc * 4, 3, 1, "conv2_1")(c, train)
        conv2 = blk(bc * 4, 3, 1, "conv2_2")(c, train)
        c = blk(bc * 8, 5, 2, "conv3_0")(conv2, train)
        c = blk(bc * 8, 3, 1, "conv3_1")(c, train)
        conv3 = blk(bc * 8, 3, 1, "conv3_2")(c, train)

        final_chs = bc * 8
        inner = lambda n: nn.Conv(final_chs, (1, 1), use_bias=True,
                                  dtype=self.dtype, name=n)
        outc = lambda f, n: nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)),
                                    use_bias=False, dtype=self.dtype, name=n)
        intra = _up2(conv3) + inner("inner1")(conv2)
        out1 = outc(bc * 4, "out1")(intra)
        intra = _up2(intra) + inner("inner2")(conv1)
        out2 = outc(bc * 2, "out2")(intra)
        intra = _up2(intra) + inner("inner3")(conv0)
        out3 = outc(bc, "out3")(intra)
        return [out1, out2, out3]


class Reg3D(nn.Module):
    """3-D U-Net cost regularizer: (B, D, H, W, G) -> (B, D, H, W) logits.

    Encoder: 3 stride-2 ConvBnReLU3D stages; decoder: ConvTranspose3d with
    additive skips; 1-channel prob head (reference: resnet_encoder.py:227-280,
    down_size=3 as shipped). The reference permutes to channels-first; here
    the volume stays NDHWC end to end.
    """

    base_channels: int = 16
    down_size: int = 3
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bc = self.base_channels
        c3 = lambda f, s, n: ConvBnReLU3D(
            f, (3, 3, 3), (s, s, s), (1, 1, 1), dtype=self.dtype,
            axis_name=self.axis_name, name=n,
        )
        up = lambda f, n: ConvTransposeTorch(
            f, (3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1), use_bias=False,
            dtype=self.dtype, name=n,
        )
        bnrelu = lambda y, n: nn.relu(
            TorchBatchNorm(dtype=self.dtype,
                           axis_name=self.axis_name, name=n)(
                y, use_running_average=not train)
        )

        conv0 = c3(bc, 1, "conv0")(x, train)
        conv2 = c3(bc * 2, 1, "conv2")(c3(bc * 2, 2, "conv1")(conv0, train), train)
        if self.down_size >= 2:
            conv4 = c3(bc * 4, 1, "conv4")(c3(bc * 4, 2, "conv3")(conv2, train), train)
        if self.down_size >= 3:
            y = c3(bc * 8, 1, "conv6")(c3(bc * 8, 2, "conv5")(conv4, train), train)
            y = conv4 + bnrelu(up(bc * 4, "conv7_0")(y), "conv7_1")
            y = conv2 + bnrelu(up(bc * 2, "conv9_0")(y), "conv9_1")
        elif self.down_size == 2:
            y = conv2 + bnrelu(up(bc * 2, "conv9_0")(conv4), "conv9_1")
        else:
            y = conv2
        y = conv0 + bnrelu(up(bc, "conv11_0")(y), "conv11_1")
        y = nn.Conv(1, (3, 3, 3), padding=((1, 1), (1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="prob")(y)
        return y[..., 0]  # (B, D, H, W)


class Reg2D(nn.Module):
    """(1,3,3)-kernel variant for few depth bins (< 8).

    (reference: resnet_encoder.py:184-225; selected by trainer.py:116-119)
    """

    base_channels: int = 16
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bc = self.base_channels
        c = lambda f, s, n: ConvBnReLU3D(
            f, (1, 3, 3), (1, s, s), (0, 1, 1), dtype=self.dtype,
            axis_name=self.axis_name, name=n,
        )
        up = lambda f, n: ConvTransposeTorch(
            f, (1, 3, 3), (1, 2, 2), (0, 1, 1), (0, 1, 1), use_bias=False,
            dtype=self.dtype, name=n,
        )
        bnrelu = lambda y, n: nn.relu(
            TorchBatchNorm(dtype=self.dtype,
                           axis_name=self.axis_name, name=n)(
                y, use_running_average=not train)
        )
        conv0 = c(bc, 1, "conv0")(x, train)
        conv2 = c(bc * 2, 1, "conv2")(c(bc * 2, 2, "conv1")(conv0, train), train)
        conv4 = c(bc * 4, 1, "conv4")(c(bc * 4, 2, "conv3")(conv2, train), train)
        y = c(bc * 8, 1, "conv6")(c(bc * 8, 2, "conv5")(conv4, train), train)
        y = conv4 + bnrelu(up(bc * 4, "conv7_0")(y), "conv7_1")
        y = conv2 + bnrelu(up(bc * 2, "conv9_0")(y), "conv9_1")
        y = conv0 + bnrelu(up(bc, "conv11_0")(y), "conv11_1")
        # reference prob head is Conv3d(8, 1, 1) -- in_channels hardcoded 8
        y = nn.Conv(1, (1, 1, 1), use_bias=True, dtype=self.dtype,
                    name="prob")(y)
        return y[..., 0]


class DCNConv2d(nn.Module):
    """Modulated deformable conv block: offsets/gates predicted by a plain
    conv, applied via ops.deform.deform_conv2d, then BN + ReLU.

    TPU-native equivalent of the reference's optional CUDA DeformConvPack
    (reference: networks/resnet_encoder.py:282-303; --dcn, off by default).
    """

    features: int
    kernel_size: int = 3
    relu: bool = True
    use_bn: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from movedepth_tpu.ops.deform import deform_conv2d

        k = self.kernel_size
        offmod = nn.Conv(3 * k * k, (k, k), padding=((k // 2, k // 2),) * 2,
                         kernel_init=nn.initializers.zeros,
                         dtype=self.dtype, name="conv_offset")(x)
        offsets = offmod[..., : 2 * k * k]
        gates = nn.sigmoid(offmod[..., 2 * k * k:])
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features))
        y = deform_conv2d(x, offsets, gates, weight, kernel_size=k)
        if self.use_bn:
            y = TorchBatchNorm(dtype=self.dtype,
                               axis_name=self.axis_name, name="bn")(
                y, use_running_average=not train)
        if self.relu:
            y = nn.relu(y)
        return y


class ConvexUpsampleHead(nn.Module):
    """Mask head for RAFT-style convex upsampling.

    conv3x3 -> ReLU -> conv1x1 producing 9*(2^scale)^2 logits per pixel
    (reference: movedepth/layers.py:184-198; both convs bias-free).
    """

    scale: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, feat):
        m = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="mask0")(feat)
        m = nn.relu(m)
        m = nn.Conv((2 ** self.scale) ** 2 * 9, (1, 1), use_bias=False,
                    dtype=self.dtype, name="mask1")(m)
        return m
