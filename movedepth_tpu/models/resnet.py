"""ResNet pyramid encoder (flax), torchvision-compatible weights.

Re-designs the reference's torchvision-backed encoder
(reference: movedepth/networks/resnet_encoder.py:21-121) as native flax
modules in NHWC. Supports 18/34/50/101/152 and multi-image input (the pose
encoder stacks 2 frames, conv1 weights averaged at conversion time --
reference: resnet_encoder.py:69). Input normalization (x - 0.45) / 0.225 is
applied inside the module (reference: resnet_encoder.py:112).

The module tree is named to make the torchvision state-dict mapping a pure
string transform ('layer1.0.conv1' -> params['layer1_0']['conv1']), see
train/torch_import.py.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import numpy as np

from movedepth_tpu.models.layers import max_pool_3x3_s2, torch_batchnorm

RESNET_BLOCKS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def encoder_channels(arch: int) -> Tuple[int, ...]:
    """Per-level feature channels (reference: resnet_encoder.py:81,107-108)."""
    ch = np.array([64, 64, 128, 256, 512])
    if arch > 34:
        ch[1:] *= 4
    return tuple(int(c) for c in ch)


_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _conv(features, kernel, strides=1, name=None, dtype=None):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(strides, strides),
        padding=((pad, pad), (pad, pad)), use_bias=False,
        kernel_init=_KAIMING, dtype=dtype, name=name,
    )


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: torch_batchnorm(self.dtype, self.axis_name, name=n)
        identity = x
        out = _conv(self.features, 3, self.strides, "conv1", self.dtype)(x)
        out = bn("bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, "conv2", self.dtype)(out)
        out = bn("bn2")(out, use_running_average=not train)
        if self.downsample:
            identity = _conv(self.features, 1, self.strides, "downsample_0",
                             self.dtype)(x)
            identity = bn("downsample_1")(identity,
                                          use_running_average=not train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision v1.5 bottleneck: the stride sits on the 3x3 conv."""

    features: int  # width of the 3x3; block output is 4x this
    strides: int = 1
    downsample: bool = False
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: torch_batchnorm(self.dtype, self.axis_name, name=n)
        identity = x
        out = _conv(self.features, 1, 1, "conv1", self.dtype)(x)
        out = bn("bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.features, 3, self.strides, "conv2", self.dtype)(out)
        out = bn("bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1, 1, "conv3", self.dtype)(out)
        out = bn("bn3")(out, use_running_average=not train)
        if self.downsample:
            identity = _conv(self.features * 4, 1, self.strides,
                             "downsample_0", self.dtype)(x)
            identity = bn("downsample_1")(identity,
                                          use_running_average=not train)
        return nn.relu(out + identity)


class ContextEncoder(nn.Module):
    """Truncated ResNet (stem + stage 1 only) -> stride-4 feature.

    (reference: networks/resnet_encoder.py:124-172; experimental surface)
    """

    arch: int = 18
    num_input_images: int = 1
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, layers = RESNET_BLOCKS[self.arch]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        expansion = 1 if block_kind == "basic" else 4
        x = (x - 0.45) / 0.225
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=_KAIMING, dtype=self.dtype,
                    name="conv1")(x)
        x = torch_batchnorm(self.dtype, self.axis_name, name="bn1")(
            x, use_running_average=not train)
        x = max_pool_3x3_s2(nn.relu(x))
        in_planes = 64
        for b in range(layers[0]):
            need_ds = in_planes != 64 * expansion
            x = block_cls(64, strides=1, downsample=need_ds,
                          dtype=self.dtype, axis_name=self.axis_name,
                          name=f"layer1_{b}")(x, train)
            in_planes = 64 * expansion
        return x


class ResNetEncoder(nn.Module):
    """5-level feature pyramid encoder.

    __call__(images NHWC in [0,1]) -> list of 5 feature maps at strides
    2, 4, 8, 16, 32 with channels ``encoder_channels(arch)``.
    ``num_input_images > 1`` stacks frames along channels (pose encoder).
    """

    arch: int = 18
    num_input_images: int = 1
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, layers = RESNET_BLOCKS[self.arch]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        expansion = 1 if block_kind == "basic" else 4

        x = (x - 0.45) / 0.225  # reference: resnet_encoder.py:112
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, kernel_init=_KAIMING, dtype=self.dtype,
            name="conv1",
        )(x)
        x = torch_batchnorm(self.dtype, self.axis_name, name="bn1")(
            x, use_running_average=not train)
        feat0 = nn.relu(x)

        feats = [feat0]
        x = max_pool_3x3_s2(feat0)
        in_planes = 64
        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), layers)
        ):
            strides = 1 if stage == 0 else 2
            for b in range(n_blocks):
                s = strides if b == 0 else 1
                need_ds = (s != 1) or (in_planes != planes * expansion)
                x = block_cls(
                    planes, strides=s, downsample=need_ds, dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
                in_planes = planes * expansion
            feats.append(x)
        return feats
