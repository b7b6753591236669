"""A/B the folded-planar photometric path on the full train step.

Times make_train_step end to end (fwd+bwd+Adam) with cfg.planar_losses
on vs off at the given batch sizes. The steps are CHAINED inside an
on-device lax.scan (long/short pair, differenced) -- a host dispatch
loop under-measures through the axon tunnel, whose block_until_ready
returns before the device work drains (observed 5 ms/"step" for a
290 ms step). Optionally (AB_MEM=1) also reports the compiled HBM temp
footprint of the single jitted step. Chip-day variance on the tunnel is
~30%, so only same-run comparisons are meaningful.

Usage: python scripts/profile_planar_ab.py [batch ...]  (default: 8 24)

Env knobs: AB_MODE=dispatch times the PRODUCTION donated single-step
jit via chained dispatches (authoritative; the scan harnesses compile a
different outer program whose XLA schedule can differ 2x).
AB_MODE=multistep times the SHIPPED make_train_multistep (AB_K steps
per dispatch, default 4; reports ms per real step).
AB_FIELD=planar (default) A/Bs cfg.planar_losses on/off;
AB_FIELD=colwin A/Bs cfg.warp_col_window 384 (default) vs 0;
AB_FIELD=kernel_l1 A/Bs the warp-kernel L1 epilogue on/off. AB_VARIANT
restricts to one arm; AB_MEM=1 adds compiled HBM temp footprints.
AB_DONATE=0 (dispatch mode only) turns off donation of the TrainState.
AB_XLA=key=val[,key=val] (dispatch mode only) forwards XLA compiler
options to the step jit, e.g.
AB_XLA=xla_tpu_enable_latency_hiding_scheduler=false.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
import optax

# Persistent compilation cache: the tunnel compiles a full train step in
# minutes; re-runs and the on/off pair share whatever matches.
try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu.train import state as S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step_dispatch(cfg, batch_size, n_long=12, n_short=2,
                       copts=None, donate=None):
    """Time the PRODUCTION program: the donated single-step jit from
    train/state.py, dispatched N times with the state chained call-to-call
    (step i+1 consumes step i's state, so the device serializes them),
    blocking once by fetching the FINAL loss -- a value transfer cannot
    return before the whole chain drains, unlike the tunnel's
    block_until_ready. Long/short differencing cancels the dispatch
    pipeline fill and the one-time transfer latency. Unlike the scan
    harnesses, this compiles and measures exactly what Trainer.train runs.

    ``copts``/``donate`` override the AB_XLA / AB_DONATE env knobs when
    given (scripts/xla_sweep.py drives this directly).
    """
    models = build_models(cfg)
    state0, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0))
    # AB_XLA="key=val,key=val" forwards XLA compiler options to this jit
    # only (e.g. xla_tpu_enable_latency_hiding_scheduler=false) -- probes
    # whether the large-batch residual is scheduler choice, not the graph
    if copts is None and os.environ.get("AB_XLA"):
        entries = os.environ["AB_XLA"].split(",")
        bad = [kv for kv in entries if "=" not in kv]
        if bad:
            raise SystemExit(f"AB_XLA entries must be key=val; bad: {bad}")
        copts = dict(kv.split("=", 1) for kv in entries)
    if donate is None:
        donate = os.environ.get("AB_DONATE") != "0"
    if not donate:
        # same step body, donation off: costs a params+opt-state double
        # buffer (~0.36 GB) but frees XLA from aliasing input and output
        # state buffers, which can change the schedule it picks
        step = jax.jit(S._train_step_body(models, cfg, tx),
                       compiler_options=copts)
    elif copts:
        step = jax.jit(S._train_step_body(models, cfg, tx),
                       donate_argnums=(0,), compiler_options=copts)
    else:
        step = S.make_train_step(models, cfg, tx)  # donated, production jit
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size))
    zb = jnp.asarray(True)

    temp_gb = float("nan")
    if os.environ.get("AB_MEM"):
        try:
            mem = step.lower(state0, batch, jax.random.PRNGKey(1),
                             zb).compile().memory_analysis()
            temp_gb = mem.temp_size_in_bytes / 2**30
        except Exception:
            pass

    def run(n):
        # fresh state per run (the chain donates it away)
        st = jax.tree.map(jnp.copy, state0)
        jax.block_until_ready(st)
        rng = jax.random.PRNGKey(1)
        # warm the program + transfer path outside the timed region
        st, losses, _ = step(st, batch, rng, zb)
        float(losses["loss"])
        t0 = time.time()
        for i in range(n):
            rng, sub = jax.random.split(rng)
            st, losses, _ = step(st, batch, sub, zb)
        final = float(losses["loss"])  # transfers -> full drain
        dt = time.time() - t0
        assert final == final, "loss went NaN"
        return dt

    run(1)
    ts = min(run(n_short) for _ in range(2))
    tl = min(run(n_long) for _ in range(2))
    ms = (tl - ts) / (n_long - n_short) * 1000.0
    return ms, temp_gb


def time_step_multistep(cfg, batch_size, n_long=6, n_short=2):
    """Time the SHIPPED cfg.steps_per_dispatch path: make_train_multistep
    (train/state.py) -- K real steps per device call as an undonated
    lax.scan of the production step body. Each scanned step consumes a
    DISTINCT stacked batch (as Trainer.run_epoch_multistep feeds it);
    dispatches are chained through the returned state and drained once by
    fetching the final loss. Reports ms per REAL step (dispatch time / K).
    """
    k = int(os.environ.get("AB_K", "4"))
    models = build_models(cfg)
    state0, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0))
    multi = S.make_train_multistep(models, cfg, tx)
    batches = [jax.tree.map(jnp.asarray, make_batch(cfg, batch_size, seed=i))
               for i in range(k)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *batches)
    zb = jnp.asarray(True)

    temp_gb = float("nan")
    if os.environ.get("AB_MEM"):
        try:
            mem = multi.lower(
                state0, stacked,
                jnp.stack([jax.random.PRNGKey(i) for i in range(k)]),
                zb).compile().memory_analysis()
            temp_gb = mem.temp_size_in_bytes / 2**30
        except Exception:
            pass

    def run(n):
        st = jax.tree.map(jnp.copy, state0)
        jax.block_until_ready(st)
        rng = jax.random.PRNGKey(1)
        rng, *subs = jax.random.split(rng, k + 1)
        st, losses = multi(st, stacked, jnp.stack(subs), zb)
        float(losses["loss"][-1])  # warm program + transfer path
        t0 = time.time()
        for _ in range(n):
            rng, *subs = jax.random.split(rng, k + 1)
            st, losses = multi(st, stacked, jnp.stack(subs), zb)
        final = float(losses["loss"][-1])  # transfers -> full drain
        dt = time.time() - t0
        assert final == final, "loss went NaN"
        return dt

    run(1)
    ts = min(run(n_short) for _ in range(2))
    tl = min(run(n_long) for _ in range(2))
    ms = (tl - ts) / (n_long - n_short) * 1000.0 / k
    return ms, temp_gb


def time_step(cfg, batch_size, n_long=6, n_short=2):
    models = build_models(cfg)
    state, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0))
    step = S.make_train_step(models, cfg, tx)
    step_fn = step.__wrapped__  # unjitted body, re-jitted inside the scan
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size))
    zb = jnp.asarray(True)

    temp_gb = float("nan")
    if os.environ.get("AB_MEM"):
        try:
            mem = step.lower(state, batch, jax.random.PRNGKey(1),
                             zb).compile().memory_analysis()
            temp_gb = mem.temp_size_in_bytes / 2**30
        except Exception:
            pass

    def make(n):
        def outer(state, batch):
            def body(carry, _):
                st, rng = carry
                rng, sub = jax.random.split(rng)
                st, losses, _ = step_fn(st, batch, sub, zb)
                return (st, rng), losses["loss"].astype(jnp.float32)
            (st_f, _), ls = lax.scan(body, (state, jax.random.PRNGKey(1)),
                                     None, length=n)
            # returning the final carry lets the donated input state alias
            # the output buffers (donation without a matching output is
            # only advisory)
            return jnp.mean(ls), st_f
        # donate the TrainState like the production loop (train/trainer.py
        # donates into the jitted step): an undonated full-state scan
        # carry adds a params+opt-state copy to peak HBM, which at batch
        # 24's 14.8 GB footprint pushes XLA into a serialized schedule
        # the real trainer never sees
        return jax.jit(outer, donate_argnums=(0,))

    def timed(f):
        def run():
            # donation consumes the state buffers: hand each call its own
            # copy, materialized before the timed region
            st = jax.tree.map(jnp.copy, state)
            jax.block_until_ready(st)
            t0 = time.time()
            float(f(st, batch)[0])
            return time.time() - t0
        run()  # compile
        return min(run() for _ in range(3))

    ts = timed(make(n_short))
    tl = timed(make(n_long))
    ms = (tl - ts) / (n_long - n_short) * 1000.0
    if ms <= 0:
        log(f"WARNING: long-short difference <= 0 ({ms:.2f} ms) -- "
            f"dominated by timing noise; raise n_long or rerun")
    return ms, temp_gb


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8, 24]
    hw = (int(os.environ.get("AB_H", 192)), int(os.environ.get("AB_W", 640)))
    thresh = os.environ.get("AB_REMAT_THRESHOLD")
    # AB_VARIANT=on|off runs a single variant (tunnel compiles are slow;
    # split the pair across invocations and compare same-chip-day numbers)
    only = os.environ.get("AB_VARIANT")
    if only not in (None, "", "on", "off"):
        raise SystemExit(f"AB_VARIANT must be 'on', 'off', or unset; "
                         f"got {only!r}")
    variants = {"on": (True,), "off": (False,)}.get(only, (True, False))
    field = os.environ.get("AB_FIELD", "planar")
    if field not in ("planar", "colwin", "kernel_l1"):
        raise SystemExit(f"AB_FIELD must be 'planar', 'colwin', or "
                         f"'kernel_l1'; got {field!r}")
    # AB_DONATE / AB_XLA only steer the dispatch-mode jit; silently
    # ignoring them elsewhere would mislabel the measured variant
    if os.environ.get("AB_MODE", "") != "dispatch":
        for knob in ("AB_DONATE", "AB_XLA"):
            if os.environ.get(knob):
                raise SystemExit(
                    f"{knob} applies only to AB_MODE=dispatch "
                    f"(got AB_MODE={os.environ.get('AB_MODE', '')!r})")
    for bs in sizes:
        row = {}
        for on in variants:
            if field == "planar":
                cfg = Config(batch_size=bs, planar_losses=on,
                             height=hw[0], width=hw[1])
            elif field == "kernel_l1":
                cfg = Config(batch_size=bs, kernel_l1=on,
                             height=hw[0], width=hw[1])
            else:
                cfg = Config(batch_size=bs, warp_col_window=384 if on else 0,
                             height=hw[0], width=hw[1])
            if thresh is not None:
                cfg = cfg.replace(remat_batch_threshold=int(thresh))
            try:
                timer = {"dispatch": time_step_dispatch,
                         "multistep": time_step_multistep}.get(
                    os.environ.get("AB_MODE", ""), time_step)
                ms, gb = timer(cfg, bs)
            except Exception as e:
                # one cell OOMing (a real verdict) must not kill the rest
                # of the table
                msg = str(e).splitlines()
                oom = next((ln for ln in msg if "memory" in ln.lower()),
                           msg[0] if msg else repr(e))
                log(f"batch {bs} {field}={on}: FAILED: {oom[:200]}")
                continue
            row[on] = (ms, gb)
            log(f"batch {bs} {field}={on}: {ms:.1f} ms/step, "
                f"temp {gb:.2f} GB")
        if True in row and False in row:
            on, off = row[True][0], row[False][0]
            log(f"batch {bs}: {field} speedup {off / on:.2f}x")


if __name__ == "__main__":
    main()
