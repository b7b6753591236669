"""Host input-pipeline throughput bench: native C++ loader vs PIL.

The deploy question is whether the host can feed the chip at the measured
inference rate (frames/s/chip from bench.py). Decodes N KITTI-resolution
(1242x375) jpgs and runs the 640x192 4-scale pyramid through both paths,
reporting images/s. This box has one core; scale by deploy host cores.

Usage: python scripts/bench_loader.py [n_images] [threads]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from movedepth_tpu.data import native_loader  # noqa: E402


def make_images(tmp, n):
    from PIL import Image

    rng = np.random.default_rng(0)
    # realistic jpg entropy: smooth base + noise, like road scenes
    base = rng.integers(0, 255, (12, 39, 3), dtype=np.uint8)
    big = np.array(
        Image.fromarray(base).resize((1242, 375), Image.BILINEAR),
        np.int16,
    )
    paths = []
    for i in range(n):
        img = np.clip(
            big + rng.integers(-20, 20, big.shape, dtype=np.int16), 0, 255
        ).astype(np.uint8)
        p = os.path.join(tmp, f"{i:05d}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    return paths


def bench_native(paths, threads, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        native_loader.load_batch(paths, 640, 192, num_scales=4,
                                 num_threads=threads)
        best = min(best, time.perf_counter() - t0)
    return len(paths) / best


def bench_pil(paths, repeats=3):
    from PIL import Image

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for p in paths:
            im = Image.open(p).convert("RGB")
            for s in range(4):
                im = im.resize((640 >> s, 192 >> s), Image.LANCZOS) \
                    if s == 0 else im.resize((640 >> s, 192 >> s),
                                             Image.LANCZOS)
                np.asarray(im, np.float32)
        best = min(best, time.perf_counter() - t0)
    return len(paths) / best


def bench_native_jittered(paths, threads, repeats=3, native_jitter=True):
    """The TRAIN path for augmented samples: C++ decode+pyramid, then the
    fused C++ md_jitter_batch (or, with ``native_jitter=False``, the
    numpy fallback color_jitter_np) on scale 0."""
    from movedepth_tpu.data.kitti import _apply_jitter_np, draw_jitter_params

    best = float("inf")
    for r in range(repeats):
        rng = np.random.default_rng(r)
        t0 = time.perf_counter()
        outs = native_loader.load_batch(paths, 640, 192, num_scales=4,
                                        num_threads=threads)
        params, ops = draw_jitter_params(rng)
        if native_jitter:
            native_loader.jitter_batch(outs[0].copy(), params, ops,
                                       num_threads=threads)
        else:
            jit = _apply_jitter_np(params, ops)
            for img in outs[0]:
                jit(img)
        best = min(best, time.perf_counter() - t0)
    return len(paths) / best


def bench_pil_jittered(paths, repeats=3):
    """The old PIL train path for augmented samples (decode + pyramid +
    ImageEnhance jitter on the scale-0 image)."""
    from PIL import Image

    from movedepth_tpu.data.kitti import color_jitter

    best = float("inf")
    for r in range(repeats):
        rng = np.random.default_rng(r)
        jit = color_jitter(rng)
        t0 = time.perf_counter()
        for p in paths:
            im = Image.open(p).convert("RGB")
            for s in range(4):
                im = im.resize((640 >> s, 192 >> s), Image.LANCZOS)
                if s == 0:
                    np.asarray(jit(im), np.float32)
                np.asarray(im, np.float32)
        best = min(best, time.perf_counter() - t0)
    return len(paths) / best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else os.cpu_count()
    with tempfile.TemporaryDirectory() as tmp:
        paths = make_images(tmp, n)
        if native_loader.available():
            r = bench_native(paths, threads)
            print(f"native ({threads} threads): {r:.1f} images/s")
            if native_loader.jitter_available():
                r = bench_native_jittered(paths, threads)
                print(f"native + C++ jitter (train path): {r:.1f} images/s")
            r = bench_native_jittered(paths, threads, native_jitter=False)
            print(f"native + numpy jitter (fallback): {r:.1f} images/s")
        else:
            print("native loader unavailable")
        r = bench_pil(paths)
        print(f"PIL fallback (1 thread): {r:.1f} images/s")
        r = bench_pil_jittered(paths)
        print(f"PIL + ImageEnhance jitter (old train path): "
              f"{r:.1f} images/s")


if __name__ == "__main__":
    main()
