#!/usr/bin/env bash
# Zero-friction KITTI parity runbook (VERDICT round-2 item 6).
#
# Converts a released reference checkpoint folder (per-model .pth files,
# README.md:45 of the reference) on the fly, runs the full 697-image
# eigen evaluation (protocol: reference test_movedepth.sh:10-22 /
# evaluate_depth.py:77-331), prints the mono/mvs/upbound tables, and
# diffs abs_rel and delta<1.25 against the BASELINE.json north-star
# targets. Exports gt_depths.npz first if the split dir lacks it.
#
# Usage: scripts/parity_eval.sh <kitti_raw_path> <released_ckpt_dir> \
#            [abs_rel_target] [a1_target]
#
# Smoke-tested end to end on a synthetic KITTI tree by
# tests/test_eval_e2e.py::test_parity_eval_script.
set -euo pipefail

if [ $# -lt 2 ]; then
    grep '^#' "$0" | sed 's/^# \{0,1\}//' | head -16
    exit 2
fi

KITTI="$1"
CKPT="$2"
ABS_REL_TARGET="${3:-0.098}"
A1_TARGET="${4:-0.900}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPLITS="${SPLITS:-$REPO/movedepth_tpu/splits}"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

python - "$KITTI" "$CKPT" "$SPLITS" "$ABS_REL_TARGET" "$A1_TARGET" <<'PY'
import glob
import os
import sys

kitti, ckpt, splits, abs_rel_t, a1_t = sys.argv[1:6]
abs_rel_t, a1_t = float(abs_rel_t), float(a1_t)
split_dir = os.path.join(splits, "eigen")

from movedepth_tpu.config import Config, validate

# the released checkpoint's shipped eval config (reference
# test_movedepth.sh:10-22): eigen split, 640x192, convex_up, 16 bins
png = not glob.glob(os.path.join(
    kitti, "*", "*", "image_02", "data", "*.jpg"))

# sniff the encoder architecture from the checkpoint itself: a
# bottleneck conv3 key means torchvision resnet50+ (reference releases
# ship both res18 and res50 models, networks/resnet_encoder.py:95-108)
res_arch = 18
enc_pth = os.path.join(ckpt, "encoder.pth")
if os.path.exists(enc_pth):
    import torch
    sd = torch.load(enc_pth, map_location="cpu", weights_only=True)
    if any("layer1.0.conv3" in k for k in sd):
        res_arch = 50
    del sd
print(f"encoder arch from checkpoint: resnet{res_arch}", flush=True)

cfg = Config(data_path=kitti, eval_split="eigen", png=png,
             load_weights_folder=ckpt, res_arch=res_arch)
# PARITY_CFG_OVERRIDES="height=64,width=96,..." lets the smoke test run
# the whole runbook on a tiny synthetic tree; unset for the real protocol
for item in filter(None, os.environ.get("PARITY_CFG_OVERRIDES",
                                        "").split(",")):
    k, v = item.split("=", 1)
    cur = getattr(cfg, k)
    if isinstance(cur, bool):
        v = v.lower() in ("1", "true")
    elif isinstance(cur, (int, float)):
        v = type(cur)(v)
    cfg = cfg.replace(**{k: v})
cfg = validate(cfg)
print(f"image extension: {'.png' if png else '.jpg'}", flush=True)

if not os.path.exists(os.path.join(split_dir, "gt_depths.npz")):
    print("gt_depths.npz missing -- exporting from velodyne...", flush=True)
    from movedepth_tpu.eval.export_gt import export_gt_depths
    export_gt_depths(kitti, split_dir, "eigen")

from movedepth_tpu.cli.evaluate import load_variables
from movedepth_tpu.eval.evaluate import evaluate

variables = load_variables(cfg)
results = evaluate(variables, cfg, kitti, split_dir, batch_size=1)

abs_rel, a1 = float(results["mvs"][0]), float(results["mvs"][4])
print(f"parity check (MVS depth): abs_rel {abs_rel:.4f} vs target "
      f"<= {abs_rel_t}; delta<1.25 {a1:.4f} vs target >= {a1_t}")
ok = abs_rel <= abs_rel_t and a1 >= a1_t
print("PARITY " + ("PASS" if ok else "FAIL"))
sys.exit(0 if ok else 1)
PY
