"""A/B the folded-planar photometric path on the full train step.

Times make_train_step end to end (fwd+bwd+Adam) with cfg.planar_losses
on vs off at the given batch sizes, plus the compiled HBM temp footprint
from XLA memory analysis. Chip-day variance on the tunnel is ~30%, so
only same-run comparisons are meaningful.

Usage: python scripts/profile_planar_ab.py [batch ...]  (default: 8 24)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu.train import state as S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step(cfg, batch_size, iters=8):
    models = build_models(cfg)
    state, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0))
    step = S.make_train_step(models, cfg, tx)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size))
    rng = jax.random.PRNGKey(1)
    zb = jnp.asarray(True)

    try:
        mem = step.lower(state, batch, rng, zb).compile().memory_analysis()
        temp_gb = mem.temp_size_in_bytes / 2**30
    except Exception:
        temp_gb = float("nan")

    state, losses, _ = step(state, batch, rng, zb)
    jax.block_until_ready(losses["loss"])
    t0 = time.time()
    for _ in range(iters):
        state, losses, _ = step(state, batch, rng, zb)
    jax.block_until_ready(losses["loss"])
    ms = (time.time() - t0) / iters * 1000.0
    return ms, temp_gb


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8, 24]
    hw = (int(os.environ.get("AB_H", 192)), int(os.environ.get("AB_W", 640)))
    thresh = os.environ.get("AB_REMAT_THRESHOLD")
    for bs in sizes:
        row = {}
        for planar in (True, False):
            cfg = Config(batch_size=bs, planar_losses=planar,
                         height=hw[0], width=hw[1])
            if thresh is not None:
                cfg = cfg.replace(remat_batch_threshold=int(thresh))
            ms, gb = time_step(cfg, bs)
            row[planar] = (ms, gb)
            log(f"batch {bs} planar={planar}: {ms:.1f} ms/step, "
                f"temp {gb:.2f} GB")
        on, off = row[True][0], row[False][0]
        log(f"batch {bs}: planar speedup {off / on:.2f}x")


if __name__ == "__main__":
    main()
