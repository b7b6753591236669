"""Checkpoint-conversion fidelity: random-weight torch reference models vs
converted flax models, output-level comparison (inference mode).

The torch modules below re-state the reference architectures
(movedepth/networks/*) compactly so a state_dict with the reference's key
layout can be produced without torchvision or the reference package.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax.numpy as jnp
import pytest

from movedepth_tpu.models import (
    ResNetEncoder, DepthDecoder, PoseDecoder, FPN4, Reg3D, UncertNet,
    ConvexUpsampleHead, encoder_channels,
)
from movedepth_tpu.train import torch_import as TI

torch.manual_seed(0)


def _randomize_bn(module):
    """Give BN layers nontrivial affine + running stats."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def _np_state(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ----------------------------------------------------------- torch references

class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class TorchBottleneck(nn.Module):
    """torchvision v1.5 Bottleneck (stride on the 3x3, expansion 4) -- the
    block the reference loads for arch > 34
    (reference: networks/resnet_encoder.py:95-108 via torchvision)."""

    def __init__(self, cin, width, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = None
        if stride != 1 or cin != width * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                nn.BatchNorm2d(width * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


class TorchResNet50Encoder(nn.Module):
    """reference: networks/resnet_encoder.py:74-121 (arch 50: torchvision
    resnet50, state_dict keys prefixed 'encoder.')."""

    def __init__(self, num_input_images=1):
        super().__init__()
        enc = nn.Module()
        enc.conv1 = nn.Conv2d(3 * num_input_images, 64, 7, 2, 3, bias=False)
        enc.bn1 = nn.BatchNorm2d(64)

        def stage(cin, width, n_blocks, stride):
            blocks = [TorchBottleneck(cin, width, stride)]
            blocks += [TorchBottleneck(width * 4, width, 1)
                       for _ in range(n_blocks - 1)]
            return nn.Sequential(*blocks)

        enc.layer1 = stage(64, 64, 3, 1)
        enc.layer2 = stage(256, 128, 4, 2)
        enc.layer3 = stage(512, 256, 6, 2)
        enc.layer4 = stage(1024, 512, 3, 2)
        self.encoder = enc

    def forward(self, x):
        feats = []
        x = (x - 0.45) / 0.225
        x = F.relu(self.encoder.bn1(self.encoder.conv1(x)))
        feats.append(x)
        x = F.max_pool2d(x, 3, 2, 1)
        for layer in (self.encoder.layer1, self.encoder.layer2,
                      self.encoder.layer3, self.encoder.layer4):
            x = layer(x)
            feats.append(x)
        return feats


class TorchResNet18Encoder(nn.Module):
    """reference: networks/resnet_encoder.py:74-121 (arch 18, state_dict keys
    prefixed 'encoder.')."""

    def __init__(self, num_input_images=1):
        super().__init__()
        enc = nn.Module()
        enc.conv1 = nn.Conv2d(3 * num_input_images, 64, 7, 2, 3, bias=False)
        enc.bn1 = nn.BatchNorm2d(64)
        def stage(cin, cout, stride):
            return nn.Sequential(TorchBasicBlock(cin, cout, stride),
                                 TorchBasicBlock(cout, cout, 1))
        enc.layer1 = stage(64, 64, 1)
        enc.layer2 = stage(64, 128, 2)
        enc.layer3 = stage(128, 256, 2)
        enc.layer4 = stage(256, 512, 2)
        self.encoder = enc

    def forward(self, x):
        feats = []
        x = (x - 0.45) / 0.225
        x = F.relu(self.encoder.bn1(self.encoder.conv1(x)))
        feats.append(x)
        x = F.max_pool2d(x, 3, 2, 1)
        for layer in (self.encoder.layer1, self.encoder.layer2,
                      self.encoder.layer3, self.encoder.layer4):
            x = layer(x)
            feats.append(x)
        return feats


class TorchConv3x3(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return self.conv(F.pad(x, (1, 1, 1, 1), mode="reflect"))


class TorchConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TorchConv3x3(cin, cout)

    def forward(self, x):
        return F.elu(self.conv(x))


class TorchDepthDecoderFull(nn.Module):
    """Same as reference forward, emitting all disp scales."""

    def __init__(self, num_ch_enc, scales=(0, 1, 2, 3)):
        super().__init__()
        num_ch_dec = [16, 32, 64, 128, 256]
        self.scales = scales
        mods = []
        for i in range(4, -1, -1):
            cin = num_ch_enc[-1] if i == 4 else num_ch_dec[i + 1]
            mods.append(TorchConvBlock(cin, num_ch_dec[i]))
            cin = num_ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            mods.append(TorchConvBlock(cin, num_ch_dec[i]))
        for s in scales:
            mods.append(TorchConv3x3(num_ch_dec[s], 1))
        self.decoder = nn.ModuleList(mods)

    def forward(self, feats):
        disps = {}
        x = feats[-1]
        n = 0
        xs = {}
        for i in range(4, -1, -1):
            x = self.decoder[n](x); n += 1
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                x = torch.cat([x, feats[i - 1]], 1)
            x = self.decoder[n](x); n += 1
            xs[i] = x
        for s in self.scales:
            disps[s] = torch.sigmoid(self.decoder[n](xs[s])); n += 1
        return disps


class TorchPoseDecoder(nn.Module):
    """reference: networks/pose_decoder.py:8-48."""

    def __init__(self, cin=512, num_frames=2):
        super().__init__()
        self.num_frames = num_frames
        self.net = nn.ModuleList([
            nn.Conv2d(cin, 256, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 6 * num_frames, 1),
        ])

    def forward(self, feat):
        out = F.relu(self.net[0](feat))
        out = F.relu(self.net[1](out))
        out = F.relu(self.net[2](out))
        out = self.net[3](out)
        out = out.mean(3).mean(2)
        out = 0.01 * out.view(-1, self.num_frames, 1, 6)
        return out[..., :3], out[..., 3:]


class TorchFPNConv(nn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, padding=k // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout, momentum=0.1)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchFPN4(nn.Module):
    """reference: networks/resnet_encoder.py:311-391 (scale=2)."""

    def __init__(self, bc=8):
        super().__init__()
        self.conv0 = nn.Sequential(TorchFPNConv(3, bc, 3), TorchFPNConv(bc, bc, 3))
        self.conv1 = nn.Sequential(TorchFPNConv(bc, bc * 2, 5, 2),
                                   TorchFPNConv(bc * 2, bc * 2, 3),
                                   TorchFPNConv(bc * 2, bc * 2, 3))
        self.conv2 = nn.Sequential(TorchFPNConv(bc * 2, bc * 4, 5, 2),
                                   TorchFPNConv(bc * 4, bc * 4, 3),
                                   TorchFPNConv(bc * 4, bc * 4, 3))
        self.conv3 = nn.Sequential(TorchFPNConv(bc * 4, bc * 8, 5, 2),
                                   TorchFPNConv(bc * 8, bc * 8, 3),
                                   TorchFPNConv(bc * 8, bc * 8, 3))
        self.inner1 = nn.Conv2d(bc * 4, bc * 8, 1, bias=True)
        self.out = nn.Conv2d(bc * 8, bc * 4, 3, padding=1, bias=False)

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.conv1(c0)
        c2 = self.conv2(c1)
        c3 = self.conv3(c2)
        intra = F.interpolate(c3, scale_factor=2, mode="bilinear",
                              align_corners=True) + self.inner1(c2)
        return self.out(intra), c2


class TorchConvBnReLU3D(nn.Module):
    def __init__(self, cin, cout, k=3, stride=1, pad=1):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, stride=stride, padding=pad,
                              bias=False)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchReg3D(nn.Module):
    """reference: networks/resnet_encoder.py:227-280 (down_size=3)."""

    def __init__(self, c=16):
        super().__init__()
        self.conv0 = TorchConvBnReLU3D(c, c)
        self.conv1 = TorchConvBnReLU3D(c, c * 2, stride=2)
        self.conv2 = TorchConvBnReLU3D(c * 2, c * 2)
        self.conv3 = TorchConvBnReLU3D(c * 2, c * 4, stride=2)
        self.conv4 = TorchConvBnReLU3D(c * 4, c * 4)
        self.conv5 = TorchConvBnReLU3D(c * 4, c * 8, stride=2)
        self.conv6 = TorchConvBnReLU3D(c * 8, c * 8)
        def up(ci, co):
            return nn.Sequential(
                nn.ConvTranspose3d(ci, co, 3, padding=1, output_padding=1,
                                   stride=2, bias=False),
                nn.BatchNorm3d(co), nn.ReLU(inplace=True))
        self.conv7 = up(c * 8, c * 4)
        self.conv9 = up(c * 4, c * 2)
        self.conv11 = up(c * 2, c)
        self.prob = nn.Conv3d(c, 1, 3, stride=1, padding=1, bias=False)

    def forward(self, x):
        x = x.permute(0, 2, 1, 3, 4)  # B,D,G,H,W -> B,G,D,H,W
        conv0 = self.conv0(x)
        conv2 = self.conv2(self.conv1(conv0))
        conv4 = self.conv4(self.conv3(conv2))
        x = self.conv6(self.conv5(conv4))
        x = conv4 + self.conv7(x)
        x = conv2 + self.conv9(x)
        x = conv0 + self.conv11(x)
        return self.prob(x).squeeze(1)


class TorchUncertNet(nn.Module):
    """reference: networks/depth_decoder.py:371-393."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv2d(1, 8, 3, 1, 1, bias=False),
                                   nn.BatchNorm2d(8), nn.ReLU())
        self.conv2 = nn.Sequential(nn.Conv2d(8, 8, 3, 1, 1, bias=False),
                                   nn.BatchNorm2d(8), nn.ReLU())
        self.head_convs = nn.Conv2d(8, 1, 3, 1, 1, bias=False)

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        out = out + x
        return torch.sigmoid(self.head_convs(out))


class TorchConvexUpHead(nn.Module):
    """reference: movedepth/layers.py:184-198 (mask head only)."""

    def __init__(self, feature_dim=32, scale=2):
        super().__init__()
        self.upsample_mask = nn.Sequential(
            nn.Conv2d(feature_dim, 64, 3, 1, 1, bias=False),
            nn.ReLU(inplace=True),
            nn.Conv2d(64, (2 ** scale) ** 2 * 9, 1, bias=False),
        )

    def forward(self, x):
        return self.upsample_mask(x)


# --------------------------------------------------------------------- tests

def _to_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def test_resnet18_conversion(rng):
    tm = TorchResNet18Encoder().eval()
    _randomize_bn(tm)
    x = torch.from_numpy(rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32))
    with torch.no_grad():
        ref_feats = tm(x)
    variables = TI.convert_resnet_encoder(_np_state(tm))
    fm = ResNetEncoder(arch=18, dtype=jnp.float32)
    ours = fm.apply(variables, _to_nhwc(x), False)
    for rf, of in zip(ref_feats, ours):
        np.testing.assert_allclose(
            np.asarray(of).transpose(0, 3, 1, 2), rf.numpy(), atol=2e-4)


def test_resnet50_conversion(rng):
    """Bottleneck conversion golden (VERDICT r4 missing #2): expansion-4,
    1x1 downsample (incl. layer1 block 0's stride-1 projection), stride on
    the 3x3 (torchvision v1.5) -- the path the released res50 checkpoint
    takes (reference: networks/resnet_encoder.py:95-108)."""
    tm = TorchResNet50Encoder().eval()
    _randomize_bn(tm)
    x = torch.from_numpy(rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32))
    with torch.no_grad():
        ref_feats = tm(x)
    variables = TI.convert_resnet_encoder(_np_state(tm))
    fm = ResNetEncoder(arch=50, dtype=jnp.float32)
    ours = fm.apply(variables, _to_nhwc(x), False)
    assert [f.shape[-1] for f in ours] == list(encoder_channels(50))
    for rf, of in zip(ref_feats, ours):
        np.testing.assert_allclose(
            np.asarray(of).transpose(0, 3, 1, 2), rf.numpy(), atol=5e-4)


def test_resnet50_pose_encoder_conversion(rng):
    """conv1 multi-image adaptation at arch 50 (the res50 pose encoder:
    reference resnet_encoder.py:59-71 tiles conv1 over stacked frames)."""
    tm = TorchResNet50Encoder().eval()
    _randomize_bn(tm)
    variables = TI.adapt_conv1_multi_image(
        TI.convert_resnet_encoder(_np_state(tm)), 2)
    x2 = torch.from_numpy(rng.uniform(0, 1, (1, 6, 64, 96)).astype(np.float32))
    # the adapted conv1 averages the two stacked frames: feeding the SAME
    # frame twice must reproduce the single-frame torch forward exactly
    with torch.no_grad():
        ref_feats = tm(x2[:, :3])
    fm = ResNetEncoder(arch=50, num_input_images=2, dtype=jnp.float32)
    x_same = torch.cat([x2[:, :3], x2[:, :3]], 1)
    ours = fm.apply(variables, _to_nhwc(x_same), False)
    np.testing.assert_allclose(
        np.asarray(ours[-1]).transpose(0, 3, 1, 2), ref_feats[-1].numpy(),
        atol=5e-4)


def test_pose_encoder_conversion_multi_image(rng):
    tm = TorchResNet18Encoder(num_input_images=2).eval()
    _randomize_bn(tm)
    x = torch.from_numpy(rng.uniform(0, 1, (1, 6, 64, 96)).astype(np.float32))
    with torch.no_grad():
        ref_feats = tm(x)
    variables = TI.convert_resnet_encoder(_np_state(tm))
    fm = ResNetEncoder(arch=18, num_input_images=2, dtype=jnp.float32)
    ours = fm.apply(variables, _to_nhwc(x), False)
    np.testing.assert_allclose(
        np.asarray(ours[-1]).transpose(0, 3, 1, 2), ref_feats[-1].numpy(),
        atol=2e-4)


def test_depth_decoder_conversion(rng):
    chans = encoder_channels(18)
    tm = TorchDepthDecoderFull(chans).eval()
    h, w = 64, 96
    feats_t = [
        torch.from_numpy(rng.normal(0, 1, (1, c, h // 2 ** (i + 1),
                                           w // 2 ** (i + 1))).astype(np.float32))
        for i, c in enumerate(chans)
    ]
    with torch.no_grad():
        ref = tm(feats_t)
    variables = TI.convert_depth_decoder(_np_state(tm))
    fm = DepthDecoder(num_ch_enc=chans, dtype=jnp.float32)
    ours = fm.apply(variables, [_to_nhwc(f) for f in feats_t])
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(ours[("disp", s)]).transpose(0, 3, 1, 2),
            ref[s].numpy(), atol=1e-5)


def test_pose_decoder_conversion(rng):
    tm = TorchPoseDecoder().eval()
    feat = torch.from_numpy(rng.normal(0, 1, (2, 512, 2, 3)).astype(np.float32))
    with torch.no_grad():
        aa_ref, tr_ref = tm(feat)
    variables = TI.convert_pose_decoder(_np_state(tm))
    fm = PoseDecoder(num_ch_enc=encoder_channels(18), dtype=jnp.float32)
    aa, tr = fm.apply(variables, [[_to_nhwc(feat)]])
    np.testing.assert_allclose(np.asarray(aa), aa_ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr), tr_ref.numpy(), atol=1e-6)


def test_fpn4_conversion(rng):
    tm = TorchFPN4().eval()
    _randomize_bn(tm)
    x = torch.from_numpy(rng.uniform(0, 1, (1, 3, 32, 48)).astype(np.float32))
    with torch.no_grad():
        match_ref, ctx_ref = tm(x)
    variables = TI.convert_fpn4(_np_state(tm))
    fm = FPN4(base_channels=8, scale=2, dtype=jnp.float32)
    match, ctx = fm.apply(variables, _to_nhwc(x), False)
    np.testing.assert_allclose(np.asarray(match).transpose(0, 3, 1, 2),
                               match_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ctx).transpose(0, 3, 1, 2),
                               ctx_ref.numpy(), atol=2e-4)


def test_reg3d_conversion(rng):
    tm = TorchReg3D(16).eval()
    _randomize_bn(tm)
    vol = torch.from_numpy(
        rng.normal(0, 1, (1, 16, 16, 16, 24)).astype(np.float32))  # B,D,G,H,W
    with torch.no_grad():
        ref = tm(vol)  # B,D,H,W
    variables = TI.convert_reg3d(_np_state(tm))
    fm = Reg3D(base_channels=16, down_size=3, dtype=jnp.float32)
    # ours takes (B, D, H, W, G)
    ours = fm.apply(variables, jnp.asarray(
        vol.numpy().transpose(0, 1, 3, 4, 2)), False)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-4)


def test_uncertnet_conversion(rng):
    tm = TorchUncertNet().eval()
    _randomize_bn(tm)
    x = torch.from_numpy(rng.uniform(0, 2, (1, 1, 12, 20)).astype(np.float32))
    with torch.no_grad():
        ref = tm(x)
    variables = TI.convert_uncertnet(_np_state(tm))
    fm = UncertNet(dtype=jnp.float32)
    ours = fm.apply(variables, _to_nhwc(x), False)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-5)


def test_convex_up_head_conversion(rng):
    tm = TorchConvexUpHead().eval()
    x = torch.from_numpy(rng.normal(0, 1, (1, 32, 12, 20)).astype(np.float32))
    with torch.no_grad():
        ref = tm(x)
    variables = TI.convert_convex_up(_np_state(tm))
    fm = ConvexUpsampleHead(scale=2, dtype=jnp.float32)
    ours = fm.apply(variables, _to_nhwc(x))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-5)
