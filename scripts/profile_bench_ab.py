"""Same-session A/B of the inference bench across eval-path variants.

Usage: python scripts/profile_bench_ab.py [variant ...]

Variants: base (shipped), nofold1 (decoder stage-1 fold off),
nofpnfold (FPN finest-trunk folds off), nocolw (sweep_col_window=0),
nowin (all of the above off). Each row re-times the bench.py scan pair
under the variant; chip-day variance cancels within one run.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
from movedepth_tpu.config import Config  # noqa: E402
from movedepth_tpu.models import build_models  # noqa: E402
from movedepth_tpu.data.synthetic import make_batch  # noqa: E402
from movedepth_tpu.train import state as S  # noqa: E402

VARIANTS = {
    "base": {},
    "nofold1": {"fold1": False},
    "nofpnfold": {"fpnfold": False},
    "nocolw": {"cfg": {"sweep_col_window": 0}},
    "nowarpcolw": {"cfg": {"warp_col_window": 0}},
    "nowin": {"fold1": False, "fpnfold": False,
              "cfg": {"sweep_col_window": 0}},
    "nofold0": {"fold1": False, "fold0": False, "fpnfold": False},
}


def run(name, spec):
    cfg = Config().replace(**spec.get("cfg", {}))
    models = build_models(cfg)
    if not spec.get("fold1", True):
        models["mono_depth"] = models["mono_depth"].clone(fold_stage1=False)
    if not spec.get("fold0", True):
        models["mono_depth"] = models["mono_depth"].clone(fold_stage0=False)
    if not spec.get("fpnfold", True):
        models["mvs_encoder"] = models["mvs_encoder"].clone(fold_eval=False)
    variables = bench.temper_pose_head(
        S.init_variables(models, cfg, jax.random.PRNGKey(0)))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, bench.BATCH))
    t_short = bench.timed(bench.make_bench_fn(models, cfg, bench.N_SHORT),
                          variables, batch)
    t_long = bench.timed(bench.make_bench_fn(models, cfg, bench.N_LONG),
                         variables, batch)
    per_iter = (t_long - t_short) / (bench.N_LONG - bench.N_SHORT)
    fps = bench.BATCH / per_iter
    print(f"{name:12s} {per_iter*1000:8.2f} ms/iter  {fps:8.1f} fps",
          flush=True)


def main():
    names = sys.argv[1:] or list(VARIANTS)
    print(f"devices: {jax.devices()}  batch {bench.BATCH}", flush=True)
    for n in names:
        t0 = time.time()
        run(n, VARIANTS[n])
        print(f"  (wall {time.time()-t0:.0f}s incl. compile)", flush=True)


if __name__ == "__main__":
    main()
