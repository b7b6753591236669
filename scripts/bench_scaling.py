"""Weak-scaling bench of the jitted train step over a (data, model) mesh.

For each requested device count the GLOBAL batch grows with the data axis
(per-chip batch fixed), so ideal scaling is flat ms/step and linear
examples/s -- GSPMD inserts the gradient all-reduce over ICI and BatchNorm
sees the global batch (SyncBN), exactly the path `cli/train.py` runs.

On real multi-chip hardware this measures ICI overhead directly. On a
single-host dev box it runs the same programs on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=N, auto-forced here):
the timings then share one core and only validate that every mesh shape
compiles and executes -- the tool exists for pods.

Usage: python scripts/bench_scaling.py [ndev ...]   (default: 1 2 4 8)
  env: SCALE_BATCH  per-chip batch (default 2 on CPU, 8 on TPU)
       SCALE_MODEL  model-axis size when ndev is even (default 1)
       SCALE_HW     "HxW" step resolution (default 64x96 CPU, 192x640 TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv):
    ndevs = [int(a) for a in argv] or [1, 2, 4, 8]
    want = max(ndevs)
    # Force enough virtual CPU devices when the default platform cannot
    # provide them (single-chip tunnel / plain dev box). Must happen
    # before any backend init, like tests/conftest.py.
    if "--xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={want}")
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from movedepth_tpu.config import Config
    from movedepth_tpu.models import build_models
    from movedepth_tpu.data.synthetic import make_batch
    from movedepth_tpu.parallel import mesh as M
    from movedepth_tpu.train import state as S

    devices = jax.devices()
    on_tpu = devices[0].platform == "tpu"
    per_chip = int(os.environ.get("SCALE_BATCH", "8" if on_tpu else "2"))
    model_ax = int(os.environ.get("SCALE_MODEL", "1"))
    h, w = (int(x) for x in os.environ.get(
        "SCALE_HW", "192x640" if on_tpu else "64x96").split("x"))
    log(f"platform={devices[0].platform} devices={len(devices)} "
        f"per_chip_batch={per_chip} model_axis={model_ax} res={h}x{w}")

    base_ms = None
    for n in ndevs:
        if n > len(devices):
            log(f"n={n}: skipped (only {len(devices)} devices)")
            continue
        model = model_ax if (model_ax > 1 and n % model_ax == 0) else 1
        data = n // model
        cfg = Config(height=h, width=w, batch_size=per_chip * data,
                     num_depth_bins=8 if not on_tpu else 16,
                     compute_dtype="float32" if not on_tpu else "bfloat16")
        models = build_models(cfg)
        mesh = M.make_mesh(devices[:n], model=model)
        with M.activate_mesh(mesh):
            state, tx = S.create_train_state(
                models, cfg, jax.random.PRNGKey(0), steps_per_epoch=10)
            step = S.make_train_step(models, cfg, tx)
            batch = M.shard_batch(
                jax.tree.map(jnp.asarray, make_batch(cfg, cfg.batch_size)),
                mesh)
            state = M.replicate(state, mesh)
            rng = jax.device_put(jax.random.PRNGKey(0), M.replicated(mesh))
            use_z = jax.device_put(jnp.asarray(False), M.replicated(mesh))

            def run(k, state):
                for _ in range(k):
                    state, losses, _ = step(state, batch, rng, use_z)
                jax.block_until_ready(losses["loss"])
                return state, losses

            state, _ = run(1, state)  # compile
            t0 = time.perf_counter()
            state, losses = run(2, state)
            t1 = time.perf_counter()
            state, losses = run(6, state)
            t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / 4 * 1000
        if base_ms is None:
            base_ms = ms
        eff = base_ms / ms if ms > 0 else float("nan")
        print(f"n={n:2d} data={data} model={model} "
              f"global_batch={cfg.batch_size:3d} step={ms:8.1f} ms "
              f"ex/s={cfg.batch_size / ms * 1000:7.1f} "
              f"weak-scaling eff={eff:5.2f} "
              f"loss={float(losses['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
