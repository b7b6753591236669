"""Analytic FLOPs + MFU/roofline accounting (VERDICT round-2 item 4).

Useful (algorithmic) FLOPs are counted by walking the jaxpr of each
component: ``conv_general_dilated`` and ``dot_general`` contribute
2*M*N*K; ``lax.cond`` counts its TRUE branch (the kernel dispatch
ladders put the production rung there, the widening fallback chain in
the false arm); scans multiply by their length. ``pallas_call`` carries
no dot structure in the jaxpr, so the warp kernels contribute their
USEFUL flops analytically (bilinear interpolation ~11 flops/sample +
correlate/reduce) while their MXU *implementation* flops (one-hot
matmuls, mostly structural zeros -- see ops/pallas/sweep_warp.py) are
reported as a separate column: they occupy the MXU but are not useful
work, so they belong in occupancy, not MFU.

Peak: TPU v5e (v5 lite) = 197 TFLOP/s bf16, 819 GB/s HBM
(public v5e datasheet numbers).

Usage:
  python scripts/roofline.py infer            # FLOP counts (any backend)
  python scripts/roofline.py infer --measure  # + same-session chip ms -> MFU
  python scripts/roofline.py infer --ms 98.4  # combine with a known ms
  python scripts/roofline.py train [batch] [--measure|--ms X] [--bytes]
      --bytes (TPU backend): compile the step and read XLA's own
      'bytes accessed' -> HBM-roofline speed-of-light vs the measured ms
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu import pipeline as P
from movedepth_tpu.train import state as S

PEAK_BF16 = 197e12  # v5e MXU peak, FLOP/s
PEAK_HBM = 819e9    # v5e HBM, B/s


# --------------------------------------------------------------- jaxpr walk

def _conv_flops(eqn):
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    k_spatial = 1
    for d in dn.rhs_spec[2:]:
        k_spatial *= rhs.shape[d]
    in_ch = rhs.shape[dn.rhs_spec[1]]  # already C_in / feature_group_count
    out_elems = 1
    for s in out.shape:
        out_elems *= s
    return 2 * out_elems * in_ch * k_spatial


def _dot_flops(eqn):
    (lc, _), (lb, _) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    k = 1
    for d in lc:
        k *= lhs.shape[d]
    bprod = 1
    for d in lb:
        bprod *= lhs.shape[d]
    m = 1
    for i, s in enumerate(lhs.shape):
        if i not in lc and i not in lb:
            m *= s
    rc, rb = eqn.params["dimension_numbers"][0][1], \
        eqn.params["dimension_numbers"][1][1]
    n = 1
    for i, s in enumerate(rhs.shape):
        if i not in rc and i not in rb:
            n *= s
    return 2 * bprod * m * n * k


def flops_of(jaxpr):
    """(useful_flops, n_pallas_calls) of a (possibly open) jaxpr."""
    total, npallas = 0, 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "pallas_call":
            npallas += 1
        elif name == "cond":
            t, p = flops_of(eqn.params["branches"][-1].jaxpr)
            total += t
            npallas += p
        else:
            mult = eqn.params.get("length", 1) if name == "scan" else 1
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is None:
                    continue
                if hasattr(sub, "jaxpr"):
                    sub = sub.jaxpr
                t, p = flops_of(sub)
                total += t * mult
                npallas += p * mult
                break
    return total, npallas


def count(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    return flops_of(jaxpr.jaxpr)


# ------------------------------------------------- pallas kernel accounting

def match_channels(cfg, models, variables):
    """FPN4 match-feature channel count at the prior scale, derived from
    the BUILT model via eval_shape (no compute) rather than hardcoding
    the 8 * 2**prior_scale formula -- stays correct if FPN widths change
    (mirrors pipeline.kernel_rung_report's match0.shape[-1])."""
    img = jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32)
    shp = jax.eval_shape(
        lambda v: models["mvs_encoder"].apply(v["mvs_encoder"], img,
                                              False)[0], variables)
    return shp.shape[-1]


def parse_rung(report_str, h, w):
    """(rw, kw) of the dispatched sweep rung from its rung_report string
    (e.g. 'rw=8 rb=2 (rung 0 of [8, 16, 32, 48])' or
    '... col window cw=384)' or 'exact full-row fallback (rw=R=48, ...')."""
    import re

    m = re.search(r"rw=(?:R=)?(\d+)", report_str)
    rw = int(m.group(1)) if m else h
    m = re.search(r"cw=(\d+)", report_str)
    kw = int(m.group(1)) if m else w
    return rw, kw


def sweep_impl_flops(cfg, batch, c, rw=None, kw=None):
    """MXU implementation flops of ONE sweep_warp[_corr] call.

    The kernel's single matmul per (row-block, bin-block, x-chunk) is
    (sg*RB*XW, KW) @ (KW, RW*C); summed over the grid this is exactly
    2*B*D*H*W*KW*RW*C regardless of blocking (ops/pallas/sweep_warp.py
    _sweep_body). KW = W unless the column-window rung dispatches
    (pass rw/kw from the actual rung via parse_rung).
    """
    h = cfg.height // 2 ** cfg.prior_scale
    w = cfg.width // 2 ** cfg.prior_scale
    rw = rw or cfg.sweep_row_window or h
    kw = kw or w
    return 2 * batch * cfg.num_depth_bins * h * w * kw * rw * c


def sweep_useful_flops(cfg, batch, c):
    """Algorithmic flops of the same call: bilinear (~11/sample) +
    correlate (2) per (bin, pixel, channel), + group mean."""
    h = cfg.height // 2 ** cfg.prior_scale
    w = cfg.width // 2 ** cfg.prior_scale
    return batch * cfg.num_depth_bins * h * w * c * 13


# ------------------------------------------------------------------ drivers

def gf(x):
    return x / 1e9


def report(name, useful, batch, ms=None, impl=0):
    line = (f"{name}: {gf(useful):,.1f} GFLOP @ batch {batch} "
            f"({gf(useful) / batch:,.2f} GFLOP/frame)")
    if impl:
        line += f" [+{gf(impl):,.1f} GFLOP pallas impl]"
    if ms:
        ach = useful / (ms / 1e3)
        occ = (useful + impl) / (ms / 1e3)
        line += (f"  {ms:.2f} ms -> {ach / 1e12:.2f} TFLOP/s useful "
                 f"(MFU {100 * ach / PEAK_BF16:.1f}%), MXU occupancy "
                 f"{100 * occ / PEAK_BF16:.1f}%")
    print(line, flush=True)


def main_infer(ms_arg, measure):
    cfg = Config()
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    batch_d = jax.tree.map(jnp.asarray, make_batch(cfg, batch))

    def full(v, b):
        out = P.forward_infer(models, v, b, cfg)
        return out["depth_mvs"], out["disp_mono"]

    useful, npal = count(full, variables, batch_d)
    n_frames = len(cfg.matching_ids) - 1
    c_match = match_channels(cfg, models, variables)
    # the rung the dispatch actually takes on this batch (value-dependent)
    hp = cfg.height // 2 ** cfg.prior_scale
    wp = cfg.width // 2 ** cfg.prior_scale
    rung = P.kernel_rung_report(models, variables, batch_d, cfg)
    sweep_rungs = [v for k, v in rung.items() if k.startswith("sweep[")]
    rw, kw = parse_rung(sweep_rungs[0], hp, wp)
    impl = sweep_impl_flops(cfg, batch, c_match, rw=rw, kw=kw) * n_frames
    useful += sweep_useful_flops(cfg, batch, c_match) * n_frames
    print(f"forward_infer: {npal} pallas calls in jaxpr; sweep impl flops "
          f"use the DISPATCHED rung rw={rw} kw={kw} (c={c_match}): "
          f"{sweep_rungs[0]}")

    ms = ms_arg
    if measure and ms is None:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_components import scan_time

        def body(v, b):
            out = P.forward_infer(models, v, b, cfg)
            return (jnp.mean(out["depth_mvs"])
                    + jnp.mean(out["disp_mono"])).astype(jnp.float32)

        ms = scan_time(body, variables, batch_d)
    report("forward_infer", useful, batch, ms, impl)

    # per-component counts (mirrors scripts/profile_components.py rows)
    def mono_enc(v, b):
        return models["mono_encoder"].apply(v["mono_encoder"],
                                            b["color"][:, 0], False)[-1]

    def mono_full(v, b):
        f = models["mono_encoder"].apply(v["mono_encoder"], b["color"][:, 0],
                                         False)
        return models["mono_depth"].apply(v["mono_depth"], f)[("disp", 0)]

    def pose(v, b):
        eb = dict(b)
        eb["color_aug"] = b["color"]
        c2 = cfg.replace(frame_ids=cfg.matching_ids)
        return P.predict_poses(models, v, eb, c2, train=False)[1]

    def fpn(v, b):
        bsz = b["color"].shape[0]
        m = len(cfg.matching_ids)
        stacked = b["color"][:, :m].reshape((bsz * m,) + b["color"].shape[2:])
        return models["mvs_encoder"].apply(v["mvs_encoder"], stacked,
                                           False)[0]

    for name, fn in [("mono_encoder", mono_enc), ("mono_enc+dec", mono_full),
                     ("pose_path", pose), ("fpn_all_frames", fpn)]:
        u, _ = count(fn, variables, batch_d)
        report(name, u, batch)

    # reg3d on its real input shape
    h = cfg.height // 2 ** cfg.prior_scale
    w = cfg.width // 2 ** cfg.prior_scale
    cor = jnp.zeros((batch, cfg.num_depth_bins, h, w, cfg.reg3d_c),
                    jnp.bfloat16)
    u, _ = count(
        lambda v, c: models["reg3d"].apply(v["reg3d"], c, False),
        variables, cor)
    report("reg3d", u, batch)
    report("sweep kernel (impl, per frame)",
           sweep_useful_flops(cfg, batch, c_match),
           batch, None, sweep_impl_flops(cfg, batch, c_match, rw=rw, kw=kw))


def hbm_speed_of_light(compiled, useful_flops, ms=None):
    """Bandwidth accounting from the compiled executable's cost model.

    Measured on chip (batch 16, 2026-08-19): XLA's
    ``cost_analysis()['bytes accessed']`` is a PRE-FUSION upper bound --
    it counts producer-consumer edges that fusion keeps in
    registers/VMEM, and came out 3.8x larger than the traffic the
    measured wall time could possibly move at peak HBM. So it cannot
    serve as a speed-of-light floor; what IS meaningful:
      * bytes_upper / measured  -> how much traffic fusion provably
        eliminated (lower bound on fusion win);
      * measured * PEAK_HBM     -> upper bound on true traffic;
      * the MXU floor from useful flops.
    TPU-compiled executables only (CPU layouts/fusions differ)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    byt = ca.get("bytes accessed")
    if byt is None:
        print("cost_analysis has no 'bytes accessed'; skipping")
        return
    t_mxu = useful_flops / PEAK_BF16 * 1e3
    line = (f"  XLA cost-model bytes (pre-fusion upper bound): "
            f"{byt / 2**30:.2f} GiB; MXU floor {t_mxu:.1f} ms")
    if ms:
        max_traffic = ms / 1e3 * PEAK_HBM
        line += (f"; measured {ms:.1f} ms moves <= {max_traffic / 2**30:.0f}"
                 f" GiB at peak BW -> fusion eliminated >= "
                 f"{100 * (1 - max_traffic / byt):.0f}% of naive traffic"
                 if max_traffic < byt else
                 f"; measured {ms:.1f} ms could move the full naive "
                 f"traffic -- HBM-bound regime")
    print(line, flush=True)


def main_train(bs, ms_arg, measure, want_bytes=False):
    cfg = Config(batch_size=bs)
    models = build_models(cfg)
    state, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0),
                                     steps_per_epoch=100)
    step = S.make_train_step(models, cfg, tx)
    batch_d = jax.tree.map(jnp.asarray, make_batch(cfg, bs))
    rng = jax.random.PRNGKey(0)
    zb = jnp.asarray(True)

    useful, npal = count(step.__wrapped__, state, batch_d, rng, zb)
    # pallas impl flops NOT accounted for the train path (fwd sweep + its
    # transposed bwd + 2x image warp + coordinate VJPs); the useful-flop
    # MFU below is therefore an upper bound on how much headroom remains
    print(f"train_step: {npal} pallas calls in jaxpr (impl flops not "
          f"accounted; MFU is useful-work only)")
    ms = ms_arg
    if measure and ms is None:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_components import profile_train
        ms = profile_train(bs)
    report(f"train_step(batch {bs})", useful, bs, ms)
    if want_bytes:
        if jax.devices()[0].platform != "tpu":
            print("--bytes needs the TPU backend (layout/fusion-accurate)")
        else:
            compiled = step.lower(state, batch_d, rng, zb).compile()
            hbm_speed_of_light(compiled, useful, ms)


if __name__ == "__main__":
    args = sys.argv[1:]
    mode = args[0] if args else "infer"
    ms = None
    if "--ms" in args:
        ms = float(args[args.index("--ms") + 1])
    measure = "--measure" in args
    if mode == "infer":
        main_infer(ms, measure)
    else:
        bs = int(args[1]) if len(args) > 1 and args[1].isdigit() else 24
        main_train(bs, ms, measure, want_bytes="--bytes" in args)
