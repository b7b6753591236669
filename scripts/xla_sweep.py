"""XLA compiler-option sweep on the production donated train step.

The round-4 finding (PROFILE.md "production step" section): the identical
step body compiles to schedules spanning 1.7x depending on the outer
graph, and at batch 16 the PRODUCTION dispatch (701 ms) is superlinear vs
batch 8 (266 ms) at 3.1% MFU -- neither MXU- nor HBM-bound, i.e. XLA
schedule quality. Every outer-graph suspect (donation, scan, multistep,
boundary layout) was eliminated by round-4 chip A/Bs; this script runs
the promised next probe: per-jit XLA compiler options
(``jax.jit(compiler_options=...)``) on the unmodified step body.

Subcommands:
  probe          try each candidate flag on a tiny jit; print accepted /
                 rejected (unknown flags fail at compile time)
  sweep [b ...]  time the donated dispatch for every accepted config at
                 the given batches (default: 16); writes
                 artifacts/xla_sweep.json and prints a table
  hlodiff [b b]  compile the BASELINE step at two batches (default 8 16),
                 fetch optimized HLO text, and write per-opcode op-count /
                 byte histograms + the top ops to
                 artifacts/hlo_sched_diff.md -- names what grows
                 superlinearly between the two schedules

Env: SWEEP_CONFIGS="name=k1=v1;k2=v2|name2=..." overrides the built-in
config list (flags within a config are ';'-separated).
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from movedepth_tpu.config import Config  # noqa: E402

ART_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts")

# Candidate flags for `probe`. Unknown names are rejected by the compiler
# at compile time, which is exactly what probe reports.
CANDIDATES = [
    "xla_tpu_enable_latency_hiding_scheduler=false",
    "xla_tpu_scoped_vmem_limit_kib=65536",
    "xla_tpu_scoped_vmem_limit_kib=32768",
    "xla_tpu_async_copy_bandwidth_scaling_factor=0.5",
    "xla_tpu_async_copy_bandwidth_scaling_factor=2.0",
    "xla_tpu_licm_size_inflation_ratio=2.0",
    "xla_tpu_enable_aggressive_loop_fusion=true",
    "xla_tpu_enable_dot_strength_reduction=false",
    "xla_tpu_rwb_fusion=false",
    "xla_tpu_dot_dot_fusion=false",
    "xla_tpu_nd_short_transfer_max_chunks=4096",
    "xla_tpu_allocate_scoped_vmem_at_same_offset=false",
    "xla_tpu_use_repeated_instance_for_preferred_prefetch_time=true",
    "xla_tpu_memory_bound_loop_optimizer=false",
    "xla_tpu_enable_all_experimental_scheduler_features=true",
    "xla_latency_hiding_scheduler_rerun=2",
    "xla_tpu_perform_spmd_cse_prevention=false",
    "xla_tpu_vector_load_fusion_window=512",
    "xla_tpu_enable_multi_level_nested_loop_fusion=false",
    "xla_jf_rematerialization_percent_shared_memory_limit=97",
]

# Sweep configs: (name, {flag: value}). Built from the probe results of
# 2026-08-20 (see artifacts/xla_sweep.json "probe" key after running).
SWEEP = [
    ("baseline", {}),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("copy_bw_half", {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"}),
    ("copy_bw_2x", {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ("sched_experimental",
     {"xla_tpu_enable_all_experimental_scheduler_features": "true"}),
    ("lhs_rerun2", {"xla_latency_hiding_scheduler_rerun": "2"}),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_probe():
    ok, bad = [], []
    for cand in CANDIDATES:
        k, v = cand.split("=", 1)
        try:
            jax.jit(lambda x: x * 2 + 1,
                    compiler_options={k: v})(jnp.ones((8, 128))).block_until_ready()
            ok.append(cand)
            log(f"  OK      {cand}")
        except Exception as e:
            bad.append(cand)
            log(f"  reject  {cand}: {str(e).splitlines()[0][:120]}")
    os.makedirs(ART_DIR, exist_ok=True)
    out = {"accepted": ok, "rejected": bad}
    path = os.path.join(ART_DIR, "xla_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"probe -> {path}: {len(ok)} accepted, {len(bad)} rejected")


def parse_env_configs():
    spec = os.environ.get("SWEEP_CONFIGS")
    if not spec:
        return SWEEP
    configs = []
    for part in spec.split("|"):
        name, _, flags = part.partition("=")
        d = {}
        if flags:
            for kv in flags.split(";"):
                k, v = kv.split("=", 1)
                d[k] = v
        configs.append((name, d))
    return configs


def run_sweep(batches):
    from profile_planar_ab import time_step_dispatch

    configs = parse_env_configs()
    results = {"device": str(jax.devices()), "batches": batches, "rows": []}
    path = os.path.join(ART_DIR, "xla_sweep.json")
    os.makedirs(ART_DIR, exist_ok=True)
    for name, copts in configs:
        for bs in batches:
            cfg = Config(batch_size=bs)
            t0 = time.time()
            try:
                ms, _ = time_step_dispatch(cfg, bs, copts=copts or None,
                                           donate=True)
            except Exception as e:
                first = str(e).splitlines()[0][:200] if str(e) else repr(e)
                log(f"[{name}] b{bs}: FAILED: {first}")
                results["rows"].append({"config": name, "batch": bs,
                                        "error": first, "flags": copts})
                with open(path, "w") as f:
                    json.dump(results, f, indent=1)
                continue
            wall = time.time() - t0
            exps = bs / ms * 1000.0
            log(f"[{name}] b{bs}: {ms:.1f} ms/step = {exps:.1f} ex/s "
                f"(compile+measure {wall:.0f}s)")
            results["rows"].append({"config": name, "batch": bs,
                                    "ms_per_step": round(ms, 1),
                                    "examples_per_s": round(exps, 1),
                                    "flags": copts})
            with open(path, "w") as f:
                json.dump(results, f, indent=1)
    log(f"sweep -> {path}")
    # summary table to stdout
    print(f"{'config':<22}" + "".join(f"b{b:<10}" for b in batches))
    by = {}
    for r in results["rows"]:
        by.setdefault(r["config"], {})[r["batch"]] = r.get(
            "ms_per_step", "ERR")
    for name, _ in configs:
        cells = "".join(f"{by.get(name, {}).get(b, '--'):<11}"
                        for b in batches)
        print(f"{name:<22}{cells}")


# ------------------------------------------------------------------ hlodiff

OP_RE = re.compile(
    r"^\s*(?:ROOT )?%?[\w.-]+ = ([a-z0-9]+)\[([\d,]*)\]"
    r"(?:\{[\d,:TSE()]*\})? ([\w-]+)\(", re.M)
DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "f16": 2, "pred": 1,
            "u32": 4, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8,
            "s16": 2, "u16": 2}


def hlo_histogram(txt):
    """Per-opcode (count, total output bytes) + the largest single ops."""
    hist = {}
    biggest = []
    for m in OP_RE.finditer(txt):
        dt, dims, opcode = m.groups()
        if dt not in DT_BYTES:
            continue
        n = DT_BYTES[dt]
        for d in dims.split(","):
            if d:
                n *= int(d)
        c, b = hist.get(opcode, (0, 0))
        hist[opcode] = (c + 1, b + n)
        if n >= 32 << 20:
            biggest.append((n, opcode, f"{dt}[{dims}]"))
    biggest.sort(reverse=True)
    return hist, biggest[:40]


def run_hlodiff(b_lo, b_hi):
    from movedepth_tpu.models import build_models
    from movedepth_tpu.data.synthetic import make_batch
    from movedepth_tpu.train import state as S

    os.makedirs(ART_DIR, exist_ok=True)
    reports = {}
    for bs in (b_lo, b_hi):
        cfg = Config(batch_size=bs)
        models = build_models(cfg)
        state0, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0))
        step = S.make_train_step(models, cfg, tx)
        batch = jax.tree.map(jnp.asarray, make_batch(cfg, bs))
        t0 = time.time()
        compiled = step.lower(state0, batch, jax.random.PRNGKey(1),
                              jnp.asarray(True)).compile()
        log(f"b{bs}: compiled in {time.time() - t0:.0f}s; fetching text...")
        t0 = time.time()
        txt = compiled.as_text()
        log(f"b{bs}: HLO text {len(txt) / 1e6:.1f} MB in "
            f"{time.time() - t0:.0f}s")
        hist, biggest = hlo_histogram(txt)
        mem = compiled.memory_analysis()
        reports[bs] = {"hist": hist, "biggest": biggest,
                       "temp_gb": mem.temp_size_in_bytes / 2**30}
        del txt

    lo, hi = reports[b_lo], reports[b_hi]
    lines = [
        "# HLO schedule diff: production donated train step, "
        f"batch {b_lo} vs {b_hi}",
        "",
        f"temp HBM: b{b_lo}={lo['temp_gb']:.2f} GB, "
        f"b{b_hi}={hi['temp_gb']:.2f} GB "
        f"(ratio {hi['temp_gb'] / lo['temp_gb']:.2f}x for "
        f"{b_hi / b_lo:.0f}x batch)",
        "",
        f"| opcode | b{b_lo} count | b{b_lo} GB | b{b_hi} count |"
        f" b{b_hi} GB | byte ratio |",
        "|---|---|---|---|---|---|",
    ]
    keys = sorted(set(lo["hist"]) | set(hi["hist"]),
                  key=lambda k: -hi["hist"].get(k, (0, 0))[1])
    for k in keys:
        c0, by0 = lo["hist"].get(k, (0, 0))
        c1, by1 = hi["hist"].get(k, (0, 0))
        if by1 < 1 << 20 and by0 < 1 << 20:
            continue
        ratio = (by1 / by0) if by0 else float("inf")
        lines.append(f"| {k} | {c0} | {by0 / 2**30:.3f} | {c1} | "
                     f"{by1 / 2**30:.3f} | {ratio:.2f} |")
    for bs, rep in ((b_lo, lo), (b_hi, hi)):
        lines += ["", f"## Largest single ops, b{bs} (>=32 MB output)", ""]
        for n, opcode, shape in rep["biggest"]:
            lines.append(f"- {n / 2**20:.0f} MB {opcode} {shape}")
    path = os.path.join(ART_DIR, "hlo_sched_diff.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"hlodiff -> {path}")
    print("\n".join(lines[:40]))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if mode == "probe":
        run_probe()
    elif mode == "sweep":
        batches = [int(a) for a in sys.argv[2:]] or [16]
        run_sweep(batches)
    elif mode == "hlodiff":
        args = [int(a) for a in sys.argv[2:]] or [8, 16]
        run_hlodiff(*args)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
