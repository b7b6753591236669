"""Depth prediction on arbitrary image folders -- the serving entry point.

The reference repo ships no simple-inference path (its only inference is
the eigen evaluator, movedepth/evaluate_depth.py); monodepth-family users
expect a ``test_simple``-style tool, so this CLI closes that gap:

  python -m movedepth_tpu.cli.infer --image_path /path/to/frames \
      --load_weights_folder log/exp/models/last --out_dir depth_out

Frames are read in sorted order and treated as a video sequence: each
output is the full MVS depth of frame t using frame t-1 as the matching
frame (PoseNet supplies the relative pose, exactly like eval). The first
frame falls back to mono-only depth. ``--mono_only`` forces single-frame
mono depth for every image (no sequence assumption).

Outputs per frame: ``<name>_depth.npy`` (H, W) float32 metric depth and
(with ``--save_png``) ``<name>_disp.png`` plasma-colormapped disparity.
Intrinsics default to the normalized KITTI K scaled to the input size
(reference: datasets/kitti_dataset.py:26-29); pass ``--fx ...`` etc. (in
pixels at the processed resolution) to override.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from movedepth_tpu.cli.evaluate import load_variables
from movedepth_tpu.cli.options import add_config_args, config_from_args
from movedepth_tpu.config import Config, xla_compiler_options
from movedepth_tpu.models import build_models
from movedepth_tpu import pipeline as P

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def _normalized_kitti_K(h: int, w: int, fx=None, fy=None, cx=None, cy=None):
    """Pixel-space K at (h, w) from the normalized KITTI intrinsics."""
    K = np.array([[0.58 * w, 0, 0.5 * w, 0],
                  [0, 1.92 * h, 0.5 * h, 0],
                  [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    if fx is not None:
        K[0, 0] = fx
    if fy is not None:
        K[1, 1] = fy
    if cx is not None:
        K[0, 2] = cx
    if cy is not None:
        K[1, 2] = cy
    return K


def _load_image(path: str, h: int, w: int) -> np.ndarray:
    img = Image.open(path).convert("RGB").resize((w, h), Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0


def _save_outputs(out_dir, name, depth, png: bool):
    np.save(os.path.join(out_dir, f"{name}_depth.npy"),
            depth.astype(np.float32))
    if png:
        from movedepth_tpu.train.logging import colormap
        disp = 1.0 / np.maximum(depth, 1e-6)
        rgb = (colormap(disp) * 255).astype(np.uint8).transpose(1, 2, 0)
        Image.fromarray(rgb).save(os.path.join(out_dir, f"{name}_disp.png"))


def run(cfg: Config, image_path: str, out_dir: str, mono: bool, png: bool,
        K_override=None, fused: bool = False):
    files = sorted(
        f for f in os.listdir(image_path)
        if f.lower().endswith(IMG_EXTS))
    if not files:
        raise SystemExit(f"no images under {image_path}")
    os.makedirs(out_dir, exist_ok=True)

    models = build_models(cfg)
    variables = load_variables(cfg)
    h, w = cfg.height, cfg.width
    K = K_override if K_override is not None else _normalized_kitti_K(h, w)
    invK = np.linalg.inv(K)

    copts = xla_compiler_options(cfg, infer=True)
    mono_fn = jax.jit(lambda v, b: P.forward_mono_infer(models, v, b, cfg),
                      compiler_options=copts)
    # --fused: the learned mono/MVS blend via mask_cnn on the cost-volume
    # entropy (BASELINE config 3) -- the depth users actually train; the
    # reference has no way to produce it (mask_cnn unused at eval,
    # reference: movedepth/evaluate_depth.py:170-174)
    infer_fn = P.forward_infer_fused if fused else P.forward_infer
    mvs_fn = jax.jit(lambda v, b: infer_fn(models, v, b, cfg),
                     compiler_options=copts)
    depth_key = "depth_fused" if fused else "depth_mvs"

    prev = None
    for i, fname in enumerate(files):
        img = _load_image(os.path.join(image_path, fname), h, w)
        name = os.path.splitext(fname)[0]
        if mono or prev is None:
            batch = {
                "color": jnp.asarray(img)[None, None],
                "K": jnp.asarray(K)[None],
                "inv_K": jnp.asarray(invK)[None],
            }
            out = mono_fn(variables, batch)
            depth = np.asarray(out["depth_mono"][0])
        else:
            # frames stacked in matching_ids order (0, -1): ref then prev
            stack = np.stack([img, prev], axis=0)
            batch = {
                "color": jnp.asarray(stack)[None],
                "K": jnp.asarray(K)[None],
                "inv_K": jnp.asarray(invK)[None],
            }
            out = mvs_fn(variables, batch)
            depth = np.asarray(out[depth_key][0])
        _save_outputs(out_dir, name, depth, png)
        prev = img
        print(f"[{i + 1}/{len(files)}] {name}: "
              f"depth {depth.min():.2f}..{depth.max():.2f} m", flush=True)
    print(f"done -> {out_dir}", flush=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description="MoveDepth-TPU inference")
    add_config_args(parser)
    parser.add_argument("--image_path", type=str, required=True,
                        help="folder of video frames (sorted order)")
    parser.add_argument("--out_dir", type=str, default="depth_out")
    parser.add_argument("--mono_only", action="store_true",
                        help="single-frame mono depth only")
    parser.add_argument("--fused", action="store_true",
                        help="emit the learned mono/MVS fused depth "
                             "(mask_cnn uncertainty blend)")
    parser.add_argument("--save_png", action="store_true",
                        help="also save colormapped disparity PNGs")
    for k in ("fx", "fy", "cx", "cy"):
        parser.add_argument(f"--{k}", type=float, default=None,
                            help=f"intrinsics {k} (pixels at processed res)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    K = None
    if any(getattr(args, k) is not None for k in ("fx", "fy", "cx", "cy")):
        K = _normalized_kitti_K(cfg.height, cfg.width, args.fx, args.fy,
                                args.cx, args.cy)
    run(cfg, args.image_path, args.out_dir, args.mono_only,
        args.save_png, K, fused=args.fused)


if __name__ == "__main__":
    main()
