"""Few-hundred-step training soak on the real chip (VERDICT round-2 item 9).

Exercises the REAL orchestrator loop (train/trainer.py Trainer.train:
loader -> jitted step -> log/val cadence -> per-epoch checkpoints) off
the unit-test path, the way the reference's only real QC is its own
training loop (reference: movedepth/trainer.py:244-295). Data is a
synthetic KITTI tree written on the fly: a smooth random texture with a
sliding crop per frame, so neighbor frames carry REAL horizontal motion
and the photometric objective has signal to descend (random noise jpgs
would leave SSIM at chance).

Per-step wall time + loss are captured by wrapping the Trainer's jitted
step with a blocking timer, and written as JSONL for the committed
artifact; at the end the script asserts

  * every loss finite,
  * mean(last quartile) < mean(first quartile)  (loss decreasing),
  * checkpoints (weights_*/last) + the logger's scalar files exist,
  * and reports step-time drift (median of first vs last quartile).

Usage:
  python scripts/train_soak.py [steps] [batch] [--out artifacts/soak.jsonl]
Defaults: 300 steps, batch 24 (current defaults -> remat on), 640x192.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# The full-step compile through the tunnel is minutes; cache it.
import jax

try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_tree(root: str, n_frames: int = 64, n_lines: int = 2400,
              seed: int = 0):
    """Synthetic KITTI drive: sliding crops of one smooth texture."""
    from PIL import Image

    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    img_dir = os.path.join(root, "kitti", drive, "image_02", "data")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    # low-frequency texture upsampled 32x: photometrically smooth, so the
    # warp/SSIM landscape is informative; 2 px/frame horizontal slide.
    small = rng.random((24, 90, 3)).astype(np.float32)
    tex = np.asarray(Image.fromarray(
        (small * 255).astype(np.uint8)).resize(
            (90 * 32, 24 * 32), Image.BILINEAR))  # (768, 2880, 3)
    if not os.path.exists(os.path.join(img_dir, "%010d.jpg" % (n_frames - 1))):
        for i in range(n_frames):
            x0 = 2 * i
            crop = tex[100:475, x0:x0 + 1242]
            Image.fromarray(crop, "RGB").save(
                os.path.join(img_dir, "%010d.jpg" % i), quality=92)
    split_dir = os.path.join(root, "splits", "soak")
    os.makedirs(split_dir, exist_ok=True)
    frames = [f"{drive} {1 + (k % (n_frames - 2))} l\n"
              for k in range(n_lines)]
    with open(os.path.join(split_dir, "train_files.txt"), "w") as f:
        f.writelines(frames)
    with open(os.path.join(split_dir, "val_files.txt"), "w") as f:
        f.writelines(frames[:48])
    return os.path.join(root, "kitti"), split_dir


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(args[0]) if args else 300
    batch = int(args[1]) if len(args) > 1 else 24
    out_path = "artifacts/soak.jsonl"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from movedepth_tpu.config import Config
    from movedepth_tpu.train.trainer import Trainer

    root = os.environ.get("SOAK_ROOT", "/tmp/soak_kitti")
    data_path, split_dir = make_tree(root, n_lines=batch * steps)
    log(f"soak tree at {data_path} ({batch * steps} train lines)")

    cfg = Config(
        data_path=data_path, log_dir=os.path.join(root, "log"),
        model_name="soak", split="soak", batch_size=batch,
        num_epochs=1, log_frequency=100, save_frequency=1,
        weights_init="scratch", num_workers=8,
        # CPU smoke-test knobs; chip soak uses the 640x192 defaults
        height=int(os.environ.get("SOAK_H", Config.height)),
        width=int(os.environ.get("SOAK_W", Config.width)),
        num_depth_bins=int(os.environ.get("SOAK_BINS",
                                          Config.num_depth_bins)))

    trainer = Trainer(cfg, split_dir=split_dir)

    records = []
    inner = trainer.train_step

    def timed_step(state, dbatch, rng, use_z):
        t0 = time.time()
        state, losses, outputs = inner(state, dbatch, rng, use_z)
        loss = float(losses["loss"])  # blocks: honest wall step time
        ms = (time.time() - t0) * 1e3
        records.append({"step": len(records), "ms": round(ms, 1),
                        "loss": round(loss, 5)})
        if len(records) % 25 == 0:
            log(f"step {len(records):4d}  {ms:7.1f} ms  loss {loss:.4f}")
        return state, losses, outputs

    trainer.train_step = timed_step
    t0 = time.time()
    trainer.train()
    wall = time.time() - t0

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    q = max(1, len(records) // 4)
    losses = np.array([r["loss"] for r in records])
    times = np.array([r["ms"] for r in records])
    # steady-state excludes the first (compile) step
    summary = {
        "steps": len(records), "batch": batch,
        "wall_s": round(wall, 1),
        "first_step_ms": times[0] if len(times) else None,
        "median_ms": float(np.median(times[1:])),
        "median_ms_first_quartile": float(np.median(times[1:1 + q])),
        "median_ms_last_quartile": float(np.median(times[-q:])),
        "examples_per_s": round(
            batch / (float(np.median(times[1:])) / 1e3), 1),
        "loss_first_quartile": float(losses[:q].mean()),
        "loss_last_quartile": float(losses[-q:].mean()),
        "all_finite": bool(np.isfinite(losses).all()),
    }
    with open(out_path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps({"summary": summary}) + "\n")
    log(json.dumps(summary, indent=2))

    assert summary["all_finite"], "non-finite loss during soak"
    assert summary["loss_last_quartile"] < summary["loss_first_quartile"], \
        "loss did not decrease over the soak"
    models_dir = os.path.join(cfg.log_dir, "soak", "models")
    names = os.listdir(models_dir)
    assert "last" in names and any(n.startswith("weights_") for n in names), \
        f"checkpoint cadence broken: {names}"
    # MetricsLogger writes tensorboardX event dirs, or metrics.jsonl
    # when tensorboardX is absent
    log_root = os.path.join(cfg.log_dir, "soak")
    assert (os.path.isdir(os.path.join(log_root, "train"))
            or os.path.exists(os.path.join(log_root, "metrics.jsonl"))), \
        f"logger wrote nothing under {log_root}"
    log(f"SOAK OK: checkpoints {sorted(names)}; artifact -> {out_path}")


if __name__ == "__main__":
    main()
