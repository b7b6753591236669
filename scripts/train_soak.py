"""Few-hundred-step training soak on the real chip (VERDICT round-2 item 9).

Exercises the REAL orchestrator loop (train/trainer.py Trainer.train:
loader -> jitted step -> log/val cadence -> per-epoch checkpoints) off
the unit-test path, the way the reference's only real QC is its own
training loop (reference: movedepth/trainer.py:244-295). Data is a
synthetic KITTI tree written on the fly: three depth bands of a smooth
random texture translating at different speeds (parallax), so neighbor
frames carry real structured motion and both the photometric and the
MVS objectives have signal to descend (a single sliding plane is
degenerate for MVS; random noise jpgs leave SSIM at chance).

Tunnel caveat (measured 2026-08-19, PROFILE.md): device->host transfers
through the axon tunnel run at ~1.8 MB/s for small buffers and collapse
entirely for MB-scale ones (11.8 MB = 445 s), while host->device runs
~600 MB/s. The soak therefore never fetches per step: step timing uses
block_until_ready (sync, no transfer), the loss history accumulates as
device scalars and is fetched ONCE at the end, and the logger's image
panels -- which would D2H megabytes -- are disabled for the run (they
are unit-tested; the scalar/val/checkpoint cadence still runs).

The artifact (JSONL) records per-step wall ms + every loss component;
the script asserts every loss finite, the photometric total decreasing
(first vs last quartile), and checkpoints + scalar logs on disk, and
reports step-time drift.

Usage:
  python scripts/train_soak.py [steps] [batch] [--out artifacts/soak.jsonl]
Defaults: 300 steps, batch 8 (the measured-best per-chip batch,
PROFILE.md 2026-08-19), 640x192.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# The full-step compile through the tunnel is minutes; cache it.
import jax
import jax.numpy as jnp

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
    """Synthetic KITTI drive: 3 texture bands sliding at 1/3/6 px/frame.

    Far band (top) moves slowest, near band (bottom) fastest -- the
    parallax ordering a forward-translating camera produces, so the
    plane-sweep correlation has distinct depths to lock onto per band.
    """
    from PIL import Image

    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    img_dir = os.path.join(root, "kitti", drive, "image_02", "data")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    def texture(h_small, w_small, up):
        small = (rng.random((h_small, w_small, 3)) * 255).astype(np.uint8)
        return np.asarray(Image.fromarray(small).resize(
            (w_small * up, h_small * up), Image.BILINEAR))

    # each band texture is wide enough for n_frames * speed px of travel
    speeds = (1, 3, 6)
    bands = [texture(8, 60, 32) for _ in speeds]   # (256, 1920, 3) each
    if not os.path.exists(os.path.join(img_dir, "%010d.jpg" % (n_frames - 1))):
        for i in range(n_frames):
            rows = []
            for band, speed in zip(bands, speeds):
                x0 = speed * i
                rows.append(band[:125, x0:x0 + 1242])
            frame = np.concatenate(rows, axis=0)  # (375, 1242, 3)
            Image.fromarray(frame, "RGB").save(
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
    batch = int(args[1]) if len(args) > 1 else 8
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
    # image panels D2H megabytes per call -- unusable through this
    # tunnel (see module docstring); scalar/val cadence still runs
    trainer.logger.log_images = lambda *a, **k: None

    times = []
    loss_hist = []  # device-side (K,) vectors, fetched once at the end
    loss_keys = None
    inner = trainer.train_step

    def timed_step(state, dbatch, rng, use_z):
        nonlocal loss_keys
        t0 = time.time()
        state, losses, outputs = inner(state, dbatch, rng, use_z)
        losses["loss"].block_until_ready()  # sync WITHOUT device->host
        times.append((time.time() - t0) * 1e3)
        if loss_keys is None:
            loss_keys = sorted(losses)
        loss_hist.append(jnp.stack([losses[k] for k in loss_keys]))
        if len(times) % 25 == 0:
            log(f"step {len(times):4d}  {times[-1]:7.1f} ms")
        return state, losses, outputs

    trainer.train_step = timed_step
    t0 = time.time()
    trainer.train()
    wall = time.time() - t0

    hist = np.asarray(jnp.stack(loss_hist))  # ONE bulk-free D2H (~15 KB)
    times = np.array(times)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    q = max(1, len(times) // 4)
    li = loss_keys.index("loss")
    # the masked-aug MVS consistency term is unbounded (smooth-L1 in
    # METERS x mask_lw^2, reference trainer.py:399-400) and dominated by
    # bin flapping early in scratch training, so trend-check the bounded
    # photometric objective separately as well
    photo_keys = [k for k in ("mono_loss", "mvs_loss", "fuse_reproj_loss")
                  if k in loss_keys]
    photo = hist[:, [loss_keys.index(k) for k in photo_keys]].sum(1)
    summary = {
        "steps": len(times), "batch": batch,
        "wall_s": round(wall, 1),
        "first_step_ms": round(float(times[0]), 1) if len(times) else None,
        "median_ms": float(np.median(times[1:])),
        "median_ms_first_quartile": float(np.median(times[1:1 + q])),
        "median_ms_last_quartile": float(np.median(times[-q:])),
        "examples_per_s": round(
            batch / (float(np.median(times[1:])) / 1e3), 1),
        "loss_first_quartile": float(hist[:q, li].mean()),
        "loss_last_quartile": float(hist[-q:, li].mean()),
        "photometric_first_quartile": float(photo[:q].mean()),
        "photometric_last_quartile": float(photo[-q:].mean()),
        "all_finite": bool(np.isfinite(hist).all()),
    }
    with open(out_path, "w") as f:
        for i in range(len(times)):
            rec = {"step": i, "ms": round(float(times[i]), 1)}
            rec.update({k: round(float(hist[i, j]), 5)
                        for j, k in enumerate(loss_keys)})
            f.write(json.dumps(rec) + "\n")
        f.write(json.dumps({"summary": summary}) + "\n")
    log(json.dumps(summary, indent=2))

    assert summary["all_finite"], "non-finite loss during soak"
    assert (summary["photometric_last_quartile"]
            < summary["photometric_first_quartile"]), \
        "photometric loss did not decrease over the soak"
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
