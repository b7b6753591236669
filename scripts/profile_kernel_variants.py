"""Ablation timing of the sweep-warp kernel's internal stages on TPU.

Copies the production kernel body and disables one stage per variant so
the long/short scan difference attributes the ~51-58 ms kernel time to
H build / MXU matmul / V build / product+reduce / epilogue. Variants
compute WRONG results by design -- timing only.

Usage: python scripts/profile_kernel_variants.py [batch]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from movedepth_tpu.ops.pallas import sweep_warp as SW


def _variant_body(sx_ref, sy_ref, srcT_ref, ref_ref, out_ref, R, C, RW, RB,
                  G, mode):
    w, db = sx_ref.shape[-2], sx_ref.shape[-1]
    dt = srcT_ref.dtype

    sx_all = jnp.clip(sx_ref[0, :, 0], -2.0, w + 1.0)
    sy_all = jnp.clip(sy_ref[0, :, 0], -2.0, R + 1.0)
    y0_all = jnp.floor(sy_all).astype(jnp.int32)

    if RW == R:
        r0 = 0
        src_w = srcT_ref[0]
    else:
        r0 = SW._window_base(y0_all, R, RW, C)
        src_w = srcT_ref[0, :, pl.ds(pl.multiple_of(r0 * C, 128), RW * C)]

    refblk = ref_ref[0].astype(jnp.float32).reshape(RB * w, C)

    sg0 = SW._stack_group(db, RB, w, RW * C)
    for g in range(0, db, sg0):
        sg = min(sg0, db - g)
        m = sg * RB * w
        sxc = jnp.concatenate(
            [sx_all[k, :, d:d + 1] for d in range(g, g + sg)
             for k in range(RB)], axis=0)
        syc = jnp.concatenate(
            [sy_all[k, :, d:d + 1] for d in range(g, g + sg)
             for k in range(RB)], axis=0) - r0
        qm = lax.broadcasted_iota(jnp.int32, (m, w), 1)
        lane_rm = lax.broadcasted_iota(jnp.int32, (m, RW * C), 1) // C
        if mode == "no_hbuild":
            h_all = (sxc * 0.0 + 1.0).astype(dt) * jnp.full(
                (m, w), 0.01, dt)
        else:
            h_all = jnp.maximum(
                0.0, 1.0 - jnp.abs(qm.astype(jnp.float32) - sxc)).astype(dt)
        if mode == "no_vbuild":
            v_all = None  # product against 1.0
        else:
            v_all = jnp.maximum(
                0.0, 1.0 - jnp.abs(lane_rm.astype(jnp.float32) - syc))
        if mode == "no_matmul":
            hi = pltpu.repeat(h_all.astype(jnp.float32), RW * C // w, axis=1)
        else:
            hi = jnp.dot(h_all, src_w, preferred_element_type=jnp.float32)
        if mode == "no_product" or v_all is None:
            hv = SW._chunk_sum(hi, C)
        else:
            hv = SW._chunk_sum(hi * v_all, C)
        hv = hv * jnp.concatenate([refblk] * sg, axis=0)
        hv = SW._chunk_sum(hv, G) * (G / C)
        out_ref[0, g:g + sg] = hv.reshape(sg, RB, w, G).astype(out_ref.dtype)


def run_variant(mode, src, ref, sx, sy, groups, n=10, ns=2):
    b, r, w, c = src.shape
    _, d, h, _ = sx.shape
    db = min(8, d)
    rw = SW._effective_window(16, r, c)
    rb = SW._row_block(h, 4)
    sx_t = SW._prep_coords(sx, db)
    sy_t = SW._prep_coords(sy, db)
    srcT = jnp.transpose(src, (0, 2, 1, 3)).reshape(b, w, r * c)
    nd = d // db

    kernel = functools.partial(_variant_body, R=r, C=c, RW=rw, RB=rb,
                               G=groups, mode=mode)

    def call(sx_t, sy_t, srcT, ref):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, d, h, w, groups), src.dtype),
            grid=(b, h // rb, nd),
            in_specs=SW._coord_specs(w, db, rb) + [
                pl.BlockSpec((1, w, c * r), lambda bi, hi, di: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rb, w, c),
                             lambda bi, hi, di: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, db, rb, w, groups),
                                   lambda bi, hi, di: (bi, di, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(sx_t, sy_t, srcT, ref)

    def scan_fn(length):
        def fn(sx_t, sy_t, srcT, ref):
            def body(carry, _):
                o = call(sx_t + carry * 1e-20, sy_t, srcT, ref)
                return jnp.mean(o).astype(jnp.float32), ()

            f, _ = lax.scan(body, jnp.float32(0), None, length=length)
            return f

        return jax.jit(fn)

    args = (sx_t, sy_t, srcT, ref)
    ts_f = scan_fn(ns)
    tl_f = scan_fn(n)
    float(ts_f(*args)); float(tl_f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(ts_f(*args)); ts = time.time() - t0
        t0 = time.time(); float(tl_f(*args)); tl = time.time() - t0
        best = min(best, (tl - ts) / (n - ns))
    return best * 1000.0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    key = jax.random.PRNGKey(0)
    b, r, w, c, d, g = batch, 48, 160, 32, 16, 16
    k1, k2, k3, k4 = jax.random.split(key, 4)
    src = jax.random.normal(k1, (b, r, w, c), jnp.bfloat16)
    ref = jax.random.normal(k2, (b, r, w, c), jnp.bfloat16)
    sx = jax.random.uniform(k3, (b, d, r, w), jnp.float32, -2.0, w + 1.0)
    # vertical coords in a narrow band so the rw=16 window covers
    base = jax.random.uniform(k4, (b, d, r, w), jnp.float32, -2.0, 4.0)
    rows = jnp.arange(r, dtype=jnp.float32)[None, None, :, None]
    sy = jnp.clip(rows + base, -2.0, r + 1.0)

    for mode in ["full", "no_vbuild", "no_product", "no_hbuild",
                 "no_matmul"]:
        ms = run_variant(mode, src, ref, sx, sy, g)
        print(f"{mode}: {ms:.2f} ms @ batch {batch}", flush=True)


def prep_breakdown(batch=128):
    """Time the host-side prep that wraps the kernel in sweep_warp_corr."""
    key = jax.random.PRNGKey(0)
    b, r, w, c, d = batch, 48, 160, 32, 16
    k1, k3, k4 = jax.random.split(key, 3)
    src = jax.random.normal(k1, (b, r, w, c), jnp.bfloat16)
    sx = jax.random.uniform(k3, (b, d, r, w), jnp.float32, -2.0, w + 1.0)
    base = jax.random.uniform(k4, (b, d, r, w), jnp.float32, -2.0, 4.0)
    rows = jnp.arange(r, dtype=jnp.float32)[None, None, :, None]
    sy = jnp.clip(rows + base, -2.0, r + 1.0)
    db = 8
    sy_t = SW._prep_coords(sy, db)

    def scan_ms(body, args, n=10, ns=2):
        def make(length):
            def fn(*a):
                def inner(carry, _):
                    return body(*a, carry * 1e-20), ()
                f, _ = lax.scan(inner, jnp.float32(0), None, length=length)
                return f
            return jax.jit(fn)
        fs, fl = make(ns), make(n)
        float(fs(*args)); float(fl(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.time(); float(fs(*args)); ts = time.time() - t0
            t0 = time.time(); float(fl(*args)); tl = time.time() - t0
            best = min(best, (tl - ts) / (n - ns))
        return best * 1000.0

    ms = scan_ms(lambda sx, sy, eps: jnp.mean(
        SW._prep_coords(sx + eps, db)) + jnp.mean(SW._prep_coords(sy, db)),
        (sx, sy))
    print(f"prep_coords x2: {ms:.2f} ms", flush=True)
    ms = scan_ms(lambda src, eps: jnp.mean(jnp.transpose(
        src + eps, (0, 2, 1, 3)).reshape(b, w, r * c).astype(jnp.float32)),
        (src,))
    print(f"srcT transpose: {ms:.2f} ms", flush=True)
    ms = scan_ms(lambda sy_t, eps: SW._coverage_ok(
        sy_t + eps, r, 16, c, 4).astype(jnp.float32), (sy_t,))
    print(f"coverage_ok(rw=16): {ms:.2f} ms", flush=True)


def wrapper_ab(batch=128):
    """Production sweep_warp_corr (prep + ladder + kernel) vs the bare
    pallas_call on identical synthetic data, same session."""
    key = jax.random.PRNGKey(0)
    b, r, w, c, d, g = batch, 48, 160, 32, 16, 16
    k1, k2, k3, k4 = jax.random.split(key, 4)
    src = jax.random.normal(k1, (b, r, w, c), jnp.bfloat16)
    ref = jax.random.normal(k2, (b, r, w, c), jnp.bfloat16)
    sx = jax.random.uniform(k3, (b, d, r, w), jnp.float32, -2.0, w + 1.0)
    base = jax.random.uniform(k4, (b, d, r, w), jnp.float32, -2.0, 4.0)
    rows = jnp.arange(r, dtype=jnp.float32)[None, None, :, None]
    sy = jnp.clip(rows + base, -2.0, r + 1.0)

    def scan_ms(body, args, n=10, ns=2):
        def make(length):
            def fn(*a):
                def inner(carry, _):
                    return body(*a, carry * 1e-20), ()
                f, _ = lax.scan(inner, jnp.float32(0), None, length=length)
                return f
            return jax.jit(fn)
        fs, fl = make(ns), make(n)
        float(fs(*args)); float(fl(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.time(); float(fs(*args)); ts = time.time() - t0
            t0 = time.time(); float(fl(*args)); tl = time.time() - t0
            best = min(best, (tl - ts) / (n - ns))
        return best * 1000.0

    ms = scan_ms(lambda src, ref, sx, sy, eps: jnp.mean(
        SW.sweep_warp_corr(src, ref, sx + eps, sy, g)).astype(jnp.float32),
        (src, ref, sx, sy))
    print(f"production sweep_warp_corr: {ms:.2f} ms", flush=True)
    ms = run_variant("full", src, ref, sx, sy, g)
    print(f"bare pallas_call (full): {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    if "prep" in sys.argv:
        prep_breakdown(int(sys.argv[1]) if sys.argv[1].isdigit() else 128)
    elif "wrap" in sys.argv:
        wrapper_ab(int(sys.argv[1]) if sys.argv[1].isdigit() else 128)
    else:
        main()
