"""Component-level timing of the MOVEDepth inference and train paths.

The axon TPU tunnel cannot export jax.profiler device traces, so this
drives the same long/short on-device lax.scan differencing as bench.py
per component; the difference cancels host round-trips and per-call
overheads. Results feed PROFILE.md (VERDICT round-1 item 9).

Usage:  python scripts/profile_components.py [infer|train] > profile.txt
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu import pipeline as P
from movedepth_tpu.train import state as S
from movedepth_tpu.ops.costvolume import schedule_depth_bins_z
from movedepth_tpu.ops.geometry import disp_to_depth
from movedepth_tpu.ops.upsample import convex_upsample


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args):
    jf = jax.jit(fn)
    float(jf(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(jf(*args))
        best = min(best, time.time() - t0)
    return best


def scan_time(body_of, variables, batch, n_long=10, n_short=2):
    """ms per iteration of body_of(variables, batch) on device."""

    def make(n):
        def fn(variables, batch):
            def body(carry, _):
                b = dict(batch)
                b["color"] = batch["color"] + carry * 1e-20
                if "color_aug" in b:
                    b["color_aug"] = batch["color_aug"] + carry * 1e-20
                return body_of(variables, b), ()

            f, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return f

        return fn

    ts = timed(make(n_short), variables, batch)
    tl = timed(make(n_long), variables, batch)
    return (tl - ts) / (n_long - n_short) * 1000.0


def profile_infer(batch_size=128):
    cfg = Config()
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size))
    c2 = cfg.replace(frame_ids=cfg.matching_ids)

    def s(x):
        return jnp.mean(x).astype(jnp.float32)

    def mono_enc(v, b):
        f = models["mono_encoder"].apply(v["mono_encoder"], b["color"][:, 0],
                                         False)
        return s(f[-1])

    def mono_full(v, b):
        f = models["mono_encoder"].apply(v["mono_encoder"], b["color"][:, 0],
                                         False)
        d = models["mono_depth"].apply(v["mono_depth"], f)
        return s(d[("disp", 0)]) + s(d[("disp", 2)])

    def pose(v, b):
        eb = dict(b)
        eb["color_aug"] = b["color"]
        _, rel, _ = P.predict_poses(models, v, eb, c2, train=False)
        return s(rel)

    def fpn(v, b):
        bsz = b["color"].shape[0]
        m = len(c2.matching_ids)
        stacked = b["color"][:, :m].reshape((bsz * m,) + b["color"].shape[2:])
        mt, ctx = models["mvs_encoder"].apply(v["mvs_encoder"], stacked,
                                              False)
        return s(mt) + s(ctx)

    def up_head(v, b):
        mt, ctx = models["mvs_encoder"].apply(v["mvs_encoder"],
                                              b["color"][:, 0], False)
        mask = models["up"].apply(v["up"], ctx)
        d = jnp.mean(mt, axis=-1)
        return s(convex_upsample(d, mask, c2.prior_scale))

    def full(v, b):
        out = P.forward_infer(models, v, b, cfg)
        return s(out["depth_mvs"]) + s(out["disp_mono"])

    # cost volume + reg3d + localmax: full minus everything else is noisy;
    # time the MVS trunk directly instead
    def mvs_trunk(v, b):
        f = models["mono_encoder"].apply(v["mono_encoder"], b["color"][:, 0],
                                         False)
        d = models["mono_depth"].apply(v["mono_depth"], f)
        eb = dict(b)
        eb["color_aug"] = b["color"]
        _, rel, _ = P.predict_poses(models, v, eb, c2, train=False)
        bsz = b["color"].shape[0]
        m = len(c2.matching_ids)
        stacked = b["color"][:, :m].reshape((bsz * m,) + b["color"].shape[2:])
        mt, _ = models["mvs_encoder"].apply(v["mvs_encoder"], stacked, False)
        mt = mt.reshape((bsz, m) + mt.shape[1:])
        disp_prior = d[("disp", c2.prior_scale)][..., 0]
        _, depth_prior = disp_to_depth(disp_prior, c2.min_depth, c2.max_depth)
        z = c2.z_scale * rel[:, 0, 2, 3]
        bins = schedule_depth_bins_z(depth_prior, c2.num_depth_bins,
                                     c2.depth_bin_fac, z[:, None, None],
                                     c2.schedule_type)
        K_p = P.scale_intrinsics(b["K"], c2.prior_scale)
        invK_p = jnp.linalg.inv(K_p)
        dm, prob, _ = P.mvs_depth_from_features(
            models, v, mt[:, 0], [mt[:, i] for i in range(1, m)], bins,
            K_p, invK_p, rel, c2, train=False, weight_axis="depth")
        return s(dm) + s(prob)

    names = [
        ("mono_encoder", mono_enc),
        ("mono_enc+dec", mono_full),
        ("pose_path", pose),
        ("fpn_all_frames", fpn),
        ("mvs_trunk(=mono+pose+fpn+cv+reg3d+localmax)", mvs_trunk),
        ("convex_up(+1 fpn)", up_head),
        ("full_forward_infer", full),
    ]
    results = {}
    for name, fn in names:
        ms = scan_time(fn, variables, batch)
        results[name] = ms
        print(f"{name}: {ms:.2f} ms @ batch {batch_size}", flush=True)
    return results


def profile_decoder(batch_size=128):
    """Cumulative decoder-stage prefixes (enc + dec stages 4..i).

    The decoder is the #1 inference residual (~23 ms of 98.4 at batch
    128, PROFILE.md roofline); per-stage DELTAS between consecutive rows
    attribute it. Cumulative prefixes, not isolated stages: the scan
    harness reduces outputs to a scalar, so isolated timings let XLA
    skip materialization and under-count (PROFILE.md round-2 lesson).
    """
    cfg = Config()
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size))

    def s(x):
        return jnp.mean(x).astype(jnp.float32)

    def enc_only(v, b):
        f = models["mono_encoder"].apply(v["mono_encoder"], b["color"][:, 0],
                                         False)
        return s(f[-1])

    def make_prefix(stop):
        def fn(v, b):
            f = models["mono_encoder"].apply(v["mono_encoder"],
                                             b["color"][:, 0], False)
            d = models["mono_depth"].apply(v["mono_depth"], f,
                                           stop_after=stop)
            acc = s(d["_x"]) if "_x" in d else 0.0
            for k, val in d.items():
                if isinstance(k, tuple) and k[0] == "disp":
                    acc = acc + s(val)
            return acc

        return fn

    rows = [("enc_only", enc_only)]
    for stop in (4, 3, 2, 1, 0):
        # stop_after=k returns right after decoder stage k (4 = coarsest)
        rows.append((f"enc+dec_through_stage_{stop}" if stop else
                     "enc+dec_full", make_prefix(stop if stop else None)))
    prev = None
    for name, fn in rows:
        ms = scan_time(fn, variables, batch)
        delta = "" if prev is None else f"  (delta {ms - prev:+.2f})"
        print(f"{name}: {ms:.2f} ms @ batch {batch_size}{delta}", flush=True)
        prev = ms


def profile_train(batch_size=8):
    cfg = Config(batch_size=batch_size)
    models = build_models(cfg)
    state, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0),
                                     steps_per_epoch=100)
    step = S.make_train_step(models, cfg, tx)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size))
    rng = jax.random.PRNGKey(0)
    use_z = jnp.asarray(True)

    # scan the step on device (cancels the tunnel's host round trips)
    def make(n):
        def fn(state, batch, rng):
            def body(st, _):
                st2, losses, _ = step(st, batch, rng, use_z)
                return st2, losses["loss"]

            _, ls = lax.scan(body, state, None, length=n)
            return ls[-1].astype(jnp.float32)

        return fn

    ts = timed(make(2), state, batch, rng)
    tl = timed(make(6), state, batch, rng)
    ms = (tl - ts) / 4 * 1000.0
    print(f"train_step: {ms:.1f} ms @ batch {batch_size}", flush=True)
    return ms


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "infer"
    if mode == "infer":
        profile_infer()
    elif mode == "decoder":
        profile_decoder(int(sys.argv[2]) if len(sys.argv) > 2 else 128)
    else:
        profile_train(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
