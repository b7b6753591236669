"""Convert reference PyTorch checkpoints into MoveDepth-TPU variables.

The reference saves one ``{name}.pth`` torch state dict per model
(reference: movedepth/trainer.py:807-831). This module maps those state
dicts onto our flax module trees so released checkpoints are drop-in
(BASELINE.json north star: numerical fidelity of depth maps).

Layout rules:
  * Conv2d  weight (O, I, kh, kw)      -> kernel (kh, kw, I, O)
  * Conv3d  weight (O, I, kd, kh, kw)  -> kernel (kd, kh, kw, I, O)
  * ConvTranspose3d weight (I, O, kd, kh, kw) -> spatially flipped then
    (kd, kh, kw, I, O), matching models.layers.ConvTransposeTorch which
    runs the transpose as an input-dilated correlation.
  * BatchNorm weight/bias -> params scale/bias; running_mean/var ->
    batch_stats mean/var (loaded verbatim; see models/layers.py notes).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Mapping, Tuple

import numpy as np

from movedepth_tpu.config import Config

Array = np.ndarray
State = Mapping[str, Array]


# ------------------------------------------------------------- tree helpers

def _set(tree: Dict, path: Tuple[str, ...], value: Array):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def _conv_w(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d_w(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convT3d_w(w):
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))


def _put_bn(params, stats, state, torch_prefix, flax_path):
    _set(params, flax_path + ("scale",), state[torch_prefix + ".weight"])
    _set(params, flax_path + ("bias",), state[torch_prefix + ".bias"])
    _set(stats, flax_path + ("mean",), state[torch_prefix + ".running_mean"])
    _set(stats, flax_path + ("var",), state[torch_prefix + ".running_var"])


def _put_conv(params, state, torch_key, flax_path, transform=_conv_w,
              bias_key=None):
    _set(params, flax_path + ("kernel",), transform(state[torch_key]))
    if bias_key is not None and bias_key in state:
        _set(params, flax_path + ("bias",), state[bias_key])


def _variables(params, stats):
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ------------------------------------------------------------ per-model maps

def convert_resnet_encoder(state: State) -> Dict:
    """torchvision-style ResNet (reference: networks/resnet_encoder.py:74-121).

    Accepts both the reference's saved encoders (keys prefixed 'encoder.')
    and raw torchvision ImageNet dicts (no prefix, fc.* ignored).
    """
    params: Dict = {}
    stats: Dict = {}
    for key, w in state.items():
        k = key[len("encoder."):] if key.startswith("encoder.") else key
        if k.startswith("fc."):
            continue
        if k in ("conv1.weight",):
            _put_conv(params, {k: w}, k, ("conv1",))
        elif k.startswith("bn1."):
            pass  # handled below as a group
        elif k.startswith("layer"):
            m = re.match(r"layer(\d)\.(\d+)\.(.+)", k)
            stage, block, rest = m.group(1), m.group(2), m.group(3)
            base = (f"layer{stage}_{block}",)
            if re.match(r"conv\d\.weight", rest):
                _put_conv(params, {k: w}, k, base + (rest.split(".")[0],))
            elif rest == "downsample.0.weight":
                _put_conv(params, {k: w}, k, base + ("downsample_0",))
            # bn params handled as groups below
    # group-wise BN handling
    prefixes = set()
    for key in state:
        k = key[len("encoder."):] if key.startswith("encoder.") else key
        if k.endswith(".running_mean"):
            prefixes.add(k[: -len(".running_mean")])
    raw = {
        (key[len("encoder."):] if key.startswith("encoder.") else key): w
        for key, w in state.items()
    }
    for p in prefixes:
        if p == "bn1":
            path = ("bn1",)
        else:
            m = re.match(r"layer(\d)\.(\d+)\.(.+)", p)
            rest = m.group(3)
            name = "downsample_1" if rest == "downsample.1" else rest
            path = (f"layer{m.group(1)}_{m.group(2)}", name)
        _put_bn(params, stats, raw, p, path)
    return _variables(params, stats)


def adapt_conv1_multi_image(variables: Dict, num_input_images: int) -> Dict:
    """Replicate/average conv1 over stacked input frames
    (reference: networks/resnet_encoder.py:69)."""
    k = variables["params"]["conv1"]["kernel"]  # (7,7,3,64)
    k = np.concatenate([k] * num_input_images, axis=2) / num_input_images
    variables["params"]["conv1"]["kernel"] = k
    return variables


def convert_depth_decoder(state: State, scales=(0, 1, 2, 3)) -> Dict:
    """DepthDecoder: positional 'decoder.N' keys -> semantic names
    (reference: networks/depth_decoder.py:27-55: N=0..9 are upconv(4..0,0/1),
    then one dispconv per scale)."""
    params: Dict = {}
    n = 0
    for i in range(4, -1, -1):
        for j in (0, 1):
            _put_conv(params, state, f"decoder.{n}.conv.conv.weight",
                      (f"upconv_{i}_{j}", "conv", "conv"),
                      bias_key=f"decoder.{n}.conv.conv.bias")
            n += 1
    for s in scales:
        _put_conv(params, state, f"decoder.{n}.conv.weight",
                  (f"dispconv_{s}", "conv"),
                  bias_key=f"decoder.{n}.conv.bias")
        n += 1
    return _variables(params, {})


def convert_pose_decoder(state: State) -> Dict:
    """PoseDecoder: net.0=squeeze, net.1..3=pose_0..2
    (reference: networks/pose_decoder.py:19-27)."""
    params: Dict = {}
    names = ["squeeze", "pose_0", "pose_1", "pose_2"]
    for idx, name in enumerate(names):
        _put_conv(params, state, f"net.{idx}.weight", (name,),
                  bias_key=f"net.{idx}.bias")
    return _variables(params, {})


def convert_fpn4(state: State) -> Dict:
    """FPN4 (reference: networks/resnet_encoder.py:311-391)."""
    params: Dict = {}
    stats: Dict = {}
    stage_sizes = {"conv0": 2, "conv1": 3, "conv2": 3, "conv3": 3}
    for stage, nblocks in stage_sizes.items():
        for i in range(nblocks):
            name = f"{stage}_{i}"
            _put_conv(params, state, f"{stage}.{i}.conv.weight",
                      (name, "conv"))
            _put_bn(params, stats, state, f"{stage}.{i}.bn", (name, "bn"))
    for inner in ("inner1", "inner2", "inner3"):
        if f"{inner}.weight" in state:
            _put_conv(params, state, f"{inner}.weight", (inner,),
                      bias_key=f"{inner}.bias")
    _put_conv(params, state, "out.weight", ("out",))
    return _variables(params, stats)


def convert_reg3d(state: State) -> Dict:
    """Reg3D/Reg2D 3D U-Net (reference: networks/resnet_encoder.py:184-280)."""
    params: Dict = {}
    stats: Dict = {}
    for n in (0, 1, 2, 3, 4, 5, 6):
        key = f"conv{n}.conv.weight"
        if key not in state:
            continue
        _put_conv(params, state, key, (f"conv{n}", "conv"), _conv3d_w)
        _put_bn(params, stats, state, f"conv{n}.bn", (f"conv{n}", "bn"))
    for n in (7, 9, 11):
        key = f"conv{n}.0.weight"
        if key not in state:
            continue
        _put_conv(params, state, key, (f"conv{n}_0",), _convT3d_w)
        _put_bn(params, stats, state, f"conv{n}.1", (f"conv{n}_1",))
    _put_conv(params, state, "prob.weight", ("prob",), _conv3d_w,
              bias_key="prob.bias")
    return _variables(params, stats)


def convert_uncertnet(state: State) -> Dict:
    """UncertNet (reference: networks/depth_decoder.py:371-393)."""
    params: Dict = {}
    stats: Dict = {}
    _put_conv(params, state, "conv1.0.weight", ("conv1",))
    _put_bn(params, stats, state, "conv1.1", ("bn1",))
    _put_conv(params, state, "conv2.0.weight", ("conv2",))
    _put_bn(params, stats, state, "conv2.1", ("bn2",))
    _put_conv(params, state, "head_convs.weight", ("head",))
    return _variables(params, stats)


def convert_convex_up(state: State) -> Dict:
    """convex_upsample_layer mask head (reference: movedepth/layers.py:184-198)."""
    params: Dict = {}
    _put_conv(params, state, "upsample_mask.0.weight", ("mask0",))
    _put_conv(params, state, "upsample_mask.2.weight", ("mask1",))
    return _variables(params, {})


_CONVERTERS = {
    "mono_encoder": convert_resnet_encoder,
    "pose_encoder": convert_resnet_encoder,
    "mono_depth": convert_depth_decoder,
    "pose": convert_pose_decoder,
    "mvs_encoder": convert_fpn4,
    "reg3d": convert_reg3d,
    "mask_cnn": convert_uncertnet,
    "up": convert_convex_up,
}


def convert_state_dict(model_name: str, state: State) -> Dict:
    """Convert one torch state dict (numpy-valued) to flax variables."""
    if model_name not in _CONVERTERS:
        raise KeyError(f"no converter for model {model_name!r}")
    return _CONVERTERS[model_name](state)


def _torch_state_to_numpy(sd) -> Dict[str, Array]:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in sd.items()}


def find_imagenet_weights(num_layers: int, search_dirs=None):
    """Locate a torchvision ImageNet .pth using the reference's on-disk
    convention ``pretrain_resnet/resnet{N}-*.pth``
    (reference: networks/resnet_encoder.py:59-104). Searches the given
    dirs, then $PRETRAIN_RESNET_DIR, then ./pretrain_resnet, then the
    repo-root pretrain_resnet. Returns a path or None."""
    import glob

    dirs = list(search_dirs or [])
    env = os.environ.get("PRETRAIN_RESNET_DIR")
    if env:
        dirs.append(env)
    dirs.append("pretrain_resnet")
    dirs.append(os.path.join(os.path.dirname(__file__), "..", "..",
                             "pretrain_resnet"))
    for d in dirs:
        hits = sorted(glob.glob(os.path.join(d, f"resnet{num_layers}-*.pth")))
        if hits:
            return hits[0]
    return None


def load_imagenet_encoders(cfg: Config, search_dirs=None) -> Dict[str, Dict]:
    """ImageNet warm start for the three ResNet encoders
    (reference: trainer.py:67,84 constructs every encoder with
    pretrained=weights_init=='pretrained'; resnet_encoder.py:59-104 loads
    torchvision weights, tiling conv1 over stacked frames for the pose
    encoder). Returns {model_name: flax variables}; empty if no weights
    file is found (caller should warn and fall back to scratch init)."""
    import copy

    import torch  # local import; only needed when converting

    path = find_imagenet_weights(cfg.res_arch, search_dirs)
    if path is None:
        return {}
    sd = _torch_state_to_numpy(torch.load(path, map_location="cpu"))
    mono = convert_resnet_encoder(sd)
    out = {"mono_encoder": mono}
    if not cfg.load_pose:
        out["pose_encoder"] = adapt_conv1_multi_image(copy.deepcopy(mono), 2)
    return out


def load_reference_checkpoint(folder: str, cfg: Config) -> Dict[str, Dict]:
    """Load a reference ``weights_*``/``last`` folder of per-model .pth files.

    Returns {model_name: flax variables}. Missing files are skipped with
    the same leniency as the reference's filtered partial restore
    (reference: movedepth/trainer.py:846-880).
    """
    import torch  # local import; only needed when converting

    out = {}
    for name in cfg.models_to_load:
        path = os.path.join(folder, f"{name}.pth")
        if not os.path.isfile(path):
            continue
        sd = torch.load(path, map_location="cpu")
        out[name] = convert_state_dict(name, _torch_state_to_numpy(sd))
    return out
