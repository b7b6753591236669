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


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-default hyperparameters and a FUSED eval path.

    Variable tree is identical to ``nn.BatchNorm`` (params ``scale``/
    ``bias``, batch_stats ``mean``/``var``, all f32), and the training
    path reproduces flax/torch arithmetic exactly: f32 global-batch
    statistics (mean / mean-of-squares, biased variance -- SyncBN for
    free under GSPMD, ``axis_name`` for shard_map/pmap), f32 normalize,
    cast to the compute dtype.

    The eval path is why this exists: flax's ``nn.BatchNorm`` always
    normalizes in f32 even at ``dtype=bfloat16``, and on the cost-volume
    trunk XLA leaves those f32 sub/mul/add as standalone HLO ops -- three
    extra 1.3 GB passes over each full-resolution volume (~10 ms/step at
    batch 128, measured via scripts/dump_mvs_hlo.py). With running stats
    the transform is affine, so the bf16 eval path folds it to one
    per-channel ``x * A + B`` computed in f32 on (C,) vectors and applied
    in the compute dtype, which XLA fuses into the producing conv. The
    f32 eval path keeps flax's exact op order for bit-parity with the
    torch goldens.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool, phases: int = 1):
        f32 = jnp.float32
        feat = x.shape[-1] // phases
        scale = self.param("scale", nn.initializers.ones, (feat,), f32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), f32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, f32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, f32), (feat,))
        out_dt = self.dtype or jnp.promote_types(x.dtype, f32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            if jnp.dtype(out_dt) == f32:
                mul = lax.rsqrt(var + self.epsilon) * scale
                if phases > 1:
                    # subpixel phase representation (phase*C + c channel
                    # order): per-channel stats tile across phases
                    mean, mul, bias = (jnp.tile(t, phases)
                                       for t in (mean, mul, bias))
                return ((x.astype(f32) - mean) * mul + bias).astype(out_dt)
            a = scale * lax.rsqrt(var + self.epsilon)
            b = bias - mean * a
            if phases > 1:
                a, b = jnp.tile(a, phases), jnp.tile(b, phases)
            return (x.astype(out_dt) * a.astype(out_dt)
                    + b.astype(out_dt))
        assert phases == 1, "phase-folded conv schedules are eval-only"

        axes = tuple(range(x.ndim - 1))
        xf = x.astype(f32)
        mean = jnp.mean(xf, axis=axes)
        mean2 = jnp.mean(xf * xf, axis=axes)
        if self.axis_name is not None:
            mean = lax.pmean(mean, self.axis_name)
            mean2 = lax.pmean(mean2, self.axis_name)
        var = mean2 - mean * mean  # biased, like flax/torch normalization
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        mul = lax.rsqrt(var + self.epsilon) * scale
        return ((xf - mean) * mul + bias).astype(out_dt)


def torch_batchnorm(dtype=None, axis_name=None, name="bn"):
    """BatchNorm with torch-default hyperparameters (eps 1e-5, momentum 0.1).

    flax momentum = 1 - torch momentum.
    """
    return TorchBatchNorm(dtype=dtype, axis_name=axis_name, name=name)


class _Conv2dParams(nn.Module):
    """3x3 conv with explicit params, param-tree-identical to ``nn.Conv``
    (child scope holds ``kernel`` (3,3,Cin,Cout) HWIO + ``bias``).

    Exists so folded callers (`Conv3x3(fold=...)`) can apply a *derived*
    kernel built from the same parameters -- keeping checkpoint and
    converter compatibility while changing how the conv is scheduled.
    """

    features: int
    in_features: int
    dtype: Any = None

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def _run(self, x, kernel, bias):
        # nn.Conv(dtype=None) promotes input and params to a common dtype
        dtype = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
            padding="VALID", dimension_numbers=dn)
        return y + bias.astype(dtype)

    def __call__(self, x):
        return self._run(x, self.kernel, self.bias)

    def fold_up2(self, x):
        """conv3x3(reflect_pad(nearest_up_2x(x))) without leaving coarse
        resolution: the upsample duplicates pixels, so each fine output
        phase (a, b) reads at most 2x2 coarse taps; all four phases run as
        ONE 3x3 coarse conv with 4*Cout outputs followed by
        depth_to_space. Fine-grid reflection padding maps exactly to
        coarse EDGE padding. 4x fewer conv positions -> 4x less MXU time
        for the same math (the decoder's narrow-channel convs are MXU
        N-padding-bound, VERDICT round 1).
        """
        k3 = fold_up2_kernel(self.kernel)
        b3 = jnp.tile(self.bias, 4)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return self._run(x, k3, b3)

    def fold_phase2(self, x):
        """conv3x3(reflect_pad(z_fine)) where z_fine = depth_to_space(x):
        run directly on the coarse phase representation. Fine reflection
        padding maps exactly to coarse EDGE padding (a 3x3 conv reads at
        most one fine pixel past the border).
        """
        k3 = fold_phase2_kernel(self.kernel)
        b3 = jnp.tile(self.bias, 4)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return self._run(x, k3, b3)


def merged_conv3x3_reflect(x, kernels, biases, dtype=None):
    """ONE reflect-padded 3x3 conv for several convs sharing the input.

    Each partner's output channels pad to the MXU's 128 lanes alone; the
    merged issue pays that padding once, so every extra small head (the
    decoder's 1-channel disp convs) is effectively free. Returns the
    per-partner output slices (same math as running each conv alone).
    """
    widths = [k.shape[-1] for k in kernels]
    kernel = jnp.concatenate(kernels, axis=-1)
    bias = jnp.concatenate(biases)
    dtype = dtype or jnp.promote_types(x.dtype, kernel.dtype)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=dn) + bias.astype(dtype)
    outs, off = [], 0
    for wdt in widths:
        outs.append(y[..., off:off + wdt])
        off += wdt
    return outs


def depth_to_space22(x):
    """(B, H, W, 4*C) with channel order (a*2+b)*C + c -> (B, 2H, 2W, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * h, 2 * w, c)


def space_to_depth22(x):
    """(B, 2H, 2W, C) -> (B, H, W, 4*C), channel order (a*2+b)*C + c.

    Exact inverse of :func:`depth_to_space22`.
    """
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h2 // 2, w2 // 2, 4 * c)


# fine tap index u of a 3x3 stride-1 conv, keyed by (output phase a,
# coarse kernel offset dy+? index, input phase pa): fine row 2i+a reads
# fine rows 2i+a+u-1 = coarse (i + dy, phase pa)
_PHASE_TAPS = {
    (0, 0, 1): 0, (0, 1, 0): 1, (0, 1, 1): 2,
    (1, 1, 0): 0, (1, 1, 1): 1, (1, 2, 0): 2,
}


def fold_phase2_kernel(w):
    """(3,3,Cin,Cout) fine stride-1 conv -> (3,3,4Cin,4Cout) coarse conv
    on the 2x2 subpixel phase representation.

    Both input channels (pa*2+pb)*Cin + ci and output channels
    (a*2+b)*Cout + co follow the depth_to_space22 order. Fine padding of
    one pixel maps to coarse padding of one position (zeros for
    zero-padding; EDGE for fine reflect -- a 3x3 reads at most one fine
    pixel past the border, and both conventions agree there).
    """
    cin, cout = w.shape[2], w.shape[3]
    k3 = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for (a, dy, pa), u in _PHASE_TAPS.items():
        for (b, dx, pb), v in _PHASE_TAPS.items():
            k3 = k3.at[
                dy, dx,
                (pa * 2 + pb) * cin:(pa * 2 + pb + 1) * cin,
                (a * 2 + b) * cout:(a * 2 + b + 1) * cout,
            ].add(w[u, v])
    return k3


def fold_up2_kernel(w):
    """(3,3,Cin,Cout) fine stride-1 conv over nearest_up_2x input ->
    (3,3,Cin,4Cout) coarse conv whose output is the 2x2 phase
    representation ((a*2+b)*Cout + co order).

    The nearest upsample duplicates pixels, so each fine output phase
    reads at most 2x2 coarse taps; fine reflect padding maps to coarse
    EDGE padding (a 3x3 reads at most one fine pixel past the border).
    """
    zero = jnp.zeros_like(w[0])
    # phase row transforms: fine row 2i+a reads coarse rows via
    # a=0: dy'=0 <- W0, dy'=1 <- W1+W2 ; a=1: dy'=1 <- W0+W1, dy'=2 <- W2
    rows = [
        jnp.stack([w[0], w[1] + w[2], zero]),
        jnp.stack([zero, w[0] + w[1], w[2]]),
    ]
    ks = []
    for a in range(2):
        wa = rows[a]  # (3, 3, Cin, Cout), u already folded
        zero_c = jnp.zeros_like(wa[:, 0])
        cols = [
            jnp.stack([wa[:, 0], wa[:, 1] + wa[:, 2], zero_c], axis=1),
            jnp.stack([zero_c, wa[:, 0] + wa[:, 1], wa[:, 2]], axis=1),
        ]
        ks.extend(cols)
    return jnp.concatenate(ks, axis=-1)  # (3, 3, Cin, 4*Cout)


def conv_folded_edge(x, kernel, bias, dtype=None):
    """EDGE-pad-1 then 3x3 stride-1 convolve with an explicit (derived)
    kernel -- the shared launcher for the subpixel-folded decoder
    schedules (fold_up2_kernel / fold_phase2_kernel products)."""
    dtype = dtype or jnp.promote_types(x.dtype, kernel.dtype)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=dn) + bias.astype(dtype)


def fold_conv5x5s2_kernel(w):
    """(5,5,Cin,Cout) fine stride-2 pad-2 conv -> (3,3,4Cin,Cout) coarse
    stride-1 pad-1 conv consuming the 2x2 phase representation.

    Output coarse row i == fine row 2i (the stride-2 output grid); fine
    tap u reads fine row 2i+u-2 = coarse (i + (u-2)//2, phase (u-2)%2),
    so the folded kernel lands back on the NATIVE half-resolution layout.
    Fine zero padding of 2 maps exactly to coarse zero padding of 1.
    """
    cin = w.shape[2]
    # u -> (coarse offset index dy+1, input phase)
    s2 = [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0)]
    k3 = jnp.zeros((3, 3, 4 * cin) + w.shape[3:], w.dtype)
    for u in range(5):
        dy, pa = s2[u]
        for v in range(5):
            dx, pb = s2[v]
            k3 = k3.at[dy, dx,
                       (pa * 2 + pb) * cin:(pa * 2 + pb + 1) * cin].add(
                w[u, v])
    return k3


class Conv3x3(nn.Module):
    """Pad-then-3x3-convolve, reflection padding by default.

    (reference: movedepth/layers.py:537-553). ``fold`` selects a
    subpixel-folded schedule that computes the SAME function from the same
    parameters at coarse resolution (see _Conv2dParams.fold_*).
    """

    features: int
    use_refl: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, fold: Optional[str] = None):
        if fold == "params":
            # expose (kernel, bias) so the caller can run this conv merged
            # with a sibling that shares the input (see merged_conv3x3) --
            # param path identical to the normal call
            conv = _Conv2dParams(self.features, x.shape[-1],
                                 dtype=self.dtype, name="conv")
            return conv.kernel, conv.bias
        if fold is not None:
            assert self.use_refl, "folded schedules assume reflect padding"
            cin = x.shape[-1] if fold == "up2" else x.shape[-1] // 4
            conv = _Conv2dParams(self.features, cin, dtype=self.dtype,
                                 name="conv")
            return conv.fold_up2(x) if fold == "up2" else conv.fold_phase2(x)
        mode = "reflect" if self.use_refl else "constant"
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        return _Conv2dParams(self.features, x.shape[-1], dtype=self.dtype,
                             name="conv")(x)


class ConvBlock(nn.Module):
    """Conv3x3 (reflect) followed by ELU (reference: movedepth/layers.py:521-534).

    ``fold`` passes through to Conv3x3; ELU is elementwise, so it commutes
    with the folded schedules' depth_to_space.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, fold: Optional[str] = None):
        x = Conv3x3(self.features, dtype=self.dtype, name="conv")(x, fold)
        if fold == "params":
            return x  # (kernel, bias) pass-through; caller applies the ELU
        return nn.elu(x)


class _ConvParams(nn.Module):
    """Bare conv parameter holder, tree-identical to ``nn.Conv``
    (``kernel`` (kh, kw, Cin, Cout) HWIO + optional ``bias``), so folded
    callers can apply derived kernels while keeping checkpoint and
    converter compatibility.
    """

    features: int
    in_features: int
    kernel_size: Tuple[int, int]
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (self.in_features, self.features))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,))


class ConvBNReLU(nn.Module):
    """conv(bias iff no bn) -> BN -> optional ReLU.

    Matches the FPN's Conv2d block (reference:
    movedepth/networks/resnet_encoder.py:453-470, bn_momentum=0.1).

    ``fold`` (eval-only) selects a subpixel-folded schedule computing the
    SAME function from the same parameters on the 2x2 phase
    representation (channel order (a*2+b)*C + c):
      * ``"phase"``: 3x3 stride-1 zero-pad-1 conv, phase rep in -> phase
        rep out, at 1/4 of the fine conv positions;
      * ``"s2"``: 5x5 stride-2 zero-pad-2 conv, phase rep in -> NATIVE
        half-resolution layout out.
    Both exist because the FPN's fine stages are MXU N-padding-bound
    (8-16 channels pad to the 128 lanes; folding quadruples N and K).
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
    def __call__(self, x, train: bool = False, fold: Optional[str] = None):
        cin = x.shape[-1] // (4 if fold else 1)
        holder = _ConvParams(self.features, cin, self.kernel_size,
                             use_bias=not self.use_bn, name="conv")
        kernel = holder.kernel
        if fold == "phase":
            assert not train and self.kernel_size == (3, 3) \
                and tuple(self.strides) == (1, 1)
            kernel, strides, padding = (fold_phase2_kernel(kernel), (1, 1),
                                        ((1, 1), (1, 1)))
        elif fold == "s2":
            assert not train and self.kernel_size == (5, 5) \
                and tuple(self.strides) == (2, 2)
            kernel, strides, padding = (fold_conv5x5s2_kernel(kernel),
                                        (1, 1), ((1, 1), (1, 1)))
        else:
            assert fold is None
            strides, padding = self.strides, self.padding
        dtype = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        x = lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype), window_strides=strides,
            padding=padding, dimension_numbers=dn)
        if not self.use_bn:
            x = x + (jnp.tile(holder.bias, 4) if fold == "phase"
                     else holder.bias).astype(dtype)
        else:
            x = torch_batchnorm(self.dtype, self.axis_name)(
                x, use_running_average=not train,
                phases=4 if fold == "phase" else 1)
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

    A phase-decomposed schedule (per-phase <=2-tap conv + depth_to_space,
    avoiding the inserted zeros of input dilation) was measured on v5e and
    REJECTED: reg3d dilated = 10.7 ms vs phase = 17.9 ms at batch 128 --
    XLA's lhs_dilation lowering already skips the zero taps, and the
    phase variant pays a real transpose for the interleave.
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
        dtype = self.dtype or x.dtype
        pad = [
            (k - 1 - p, k - 1 - p + op)
            for k, p, op in zip(self.kernel_size, self.padding,
                                self.output_padding)
        ]
        dims = ("NDHWC", "DHWIO", "NDHWC") if ndim == 3 else \
            ("NHWC", "HWIO", "NHWC")
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape, dims)
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
