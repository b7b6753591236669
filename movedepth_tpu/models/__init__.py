"""Model zoo and factory (reference model setup: movedepth/trainer.py:65-131)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from movedepth_tpu.config import Config
from movedepth_tpu.models.resnet import (
    ContextEncoder,
    ResNetEncoder,
    encoder_channels,
)
from movedepth_tpu.models.depth_decoder import DepthDecoder, UncertNet
from movedepth_tpu.models.pose_decoder import PoseDecoder, PoseCNN
from movedepth_tpu.models.fpn import (
    FPN4,
    FPN3cas,
    Reg3D,
    Reg2D,
    DCNConv2d,
    ConvexUpsampleHead,
)
from movedepth_tpu.models.decoders_extra import (
    MPMDecoder,
    DepthDecoder3D,
    DepthDecoderBin,
    DepthDecoder3Head,
    ContextAdjustmentLayer,
    ResBlockWDSR,
)

__all__ = [
    "ResNetEncoder", "ContextEncoder", "encoder_channels", "DepthDecoder",
    "UncertNet", "PoseDecoder", "PoseCNN", "FPN4", "FPN3cas", "Reg3D",
    "Reg2D", "DCNConv2d", "ConvexUpsampleHead", "MPMDecoder",
    "DepthDecoder3D", "DepthDecoderBin", "DepthDecoder3Head",
    "ContextAdjustmentLayer", "ResBlockWDSR", "build_models",
]


def build_models(cfg: Config, dtype: Any = None,
                 axis_name=None) -> Dict[str, Any]:
    """Instantiate the 7-8 model modules of the shipped pipeline.

    Mirrors the reference's Trainer model setup (trainer.py:65-131):
    mono encoder/decoder, pose encoder/decoder, FPN matching encoder,
    cost regularizer (Reg3D for >=8 bins else Reg2D), uncertainty head,
    and optionally the convex-upsample head.
    """
    if dtype is None:
        dtype = jnp.dtype(cfg.compute_dtype)
    ch_enc = encoder_channels(cfg.res_arch)
    models = {
        "mono_encoder": ResNetEncoder(arch=cfg.res_arch, dtype=dtype,
                                      axis_name=axis_name),
        "mono_depth": DepthDecoder(num_ch_enc=ch_enc, scales=tuple(cfg.scales),
                                   fold_stage2=cfg.fold_stage2,
                                   dtype=dtype),
        "mask_cnn": UncertNet(dtype=dtype, axis_name=axis_name),
        "mvs_encoder": FPN4(base_channels=8, scale=cfg.prior_scale,
                            dcn=cfg.dcn, dtype=dtype, axis_name=axis_name),
    }
    if not cfg.load_pose:
        models["pose_encoder"] = ResNetEncoder(
            arch=cfg.res_arch, num_input_images=2, dtype=dtype,
            axis_name=axis_name,
        )
        models["pose"] = PoseDecoder(
            num_ch_enc=ch_enc, num_input_features=1,
            num_frames_to_predict_for=2, dtype=dtype,
        )
    if cfg.num_depth_bins >= 8:
        models["reg3d"] = Reg3D(base_channels=cfg.reg3d_c, down_size=3,
                                dtype=dtype, axis_name=axis_name)
    else:
        models["reg3d"] = Reg2D(base_channels=cfg.reg3d_c, dtype=dtype,
                                axis_name=axis_name)
    if cfg.convex_up:
        models["up"] = ConvexUpsampleHead(scale=cfg.prior_scale, dtype=dtype)
    return models
