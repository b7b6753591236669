"""Shared flax building blocks with torch-parity semantics.

Covers the reference's conv primitives (ConvBlock/Conv3x3,
movedepth/layers.py:521-553; Conv2d-BN-ReLU, networks/resnet_encoder.py:453-475;
ConvBnReLU3D, :175-182) plus a torch-compatible transposed conv.

BatchNorm notes (SURVEY.md section 7 hard part #2):
  * torch momentum 0.1 == flax momentum 0.9 (flax: ra = m*ra + (1-m)*batch).
  * Cross-replica (SyncBN) statistics come for free under pjit/GSPMD because
    modules see the *global* batch; ``axis_name`` is only set when running
    under shard_map/pmap.
  * Normalization uses biased batch variance in both frameworks; torch's
    running-var is stored unbiased, which only matters when converting
    *training* state (we load torch running stats verbatim for inference
    parity).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn
from jax import lax


def torch_batchnorm(dtype=None, axis_name=None, name="bn"):
    """BatchNorm with torch-default hyperparameters (eps 1e-5, momentum 0.1).

    flax momentum = 1 - torch momentum.
    """
    return nn.BatchNorm(
        momentum=0.9, epsilon=1e-5, dtype=dtype, axis_name=axis_name,
        name=name,
    )


class Conv3x3(nn.Module):
    """Pad-then-3x3-convolve, reflection padding by default.

    (reference: movedepth/layers.py:537-553)
    """

    features: int
    use_refl: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        mode = "reflect" if self.use_refl else "constant"
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        return nn.Conv(
            self.features, (3, 3), padding="VALID", dtype=self.dtype,
            name="conv",
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 (reflect) followed by ELU (reference: movedepth/layers.py:521-534)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv3x3(self.features, dtype=self.dtype, name="conv")(x)
        return nn.elu(x)


class ConvBNReLU(nn.Module):
    """conv(bias iff no bn) -> BN -> optional ReLU.

    Matches the FPN's Conv2d block (reference:
    movedepth/networks/resnet_encoder.py:453-470, bn_momentum=0.1).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bn: bool = True
    relu: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding=self.padding, use_bias=not self.use_bn, dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_bn:
            x = torch_batchnorm(self.dtype, self.axis_name)(
                x, use_running_average=not train)
        if self.relu:
            x = nn.relu(x)
        return x


class ConvBnReLU3D(nn.Module):
    """3-D conv -> BN -> ReLU over NDHWC volumes.

    (reference: movedepth/networks/resnet_encoder.py:175-182)
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(p, p) for p in self.padding]
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding=pad, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = torch_batchnorm(self.dtype, self.axis_name)(
            x, use_running_average=not train)
        return nn.relu(x)


class ConvTransposeTorch(nn.Module):
    """Transposed conv with exact torch ConvTranspose{2,3}d semantics.

    Implemented as an input-dilated regular convolution:
    pad (k-1-p) before / (k-1-p+output_padding) after each spatial dim with
    lhs_dilation = stride. The kernel is stored already spatially *flipped*
    relative to torch's, so the torch->flax converter flips at import time
    and this module runs a plain correlation (one conv_general_dilated that
    XLA maps straight onto the MXU).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Sequence[int]
    output_padding: Sequence[int]
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ndim = len(self.kernel_size)
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (in_features, self.features),
        )
        pad = [
            (k - 1 - p, k - 1 - p + op)
            for k, p, op in zip(self.kernel_size, self.padding,
                                self.output_padding)
        ]
        if ndim == 3:
            dn = lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC")
            )
        else:
            dn = lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            )
        dtype = self.dtype or x.dtype
        y = lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1,) * ndim, padding=pad,
            lhs_dilation=tuple(self.strides), rhs_dilation=(1,) * ndim,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) for NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
