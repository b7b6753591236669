"""A/B the subpixel-fold schedules on the real chip.

Times (a) FPN4 eval forward with fold_eval on/off and (b) mono
encoder+decoder forward with fold_stage1 on/off, batch 128 bf16, same
session (long/short scan difference, same methodology as bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from movedepth_tpu.models.fpn import FPN4
from movedepth_tpu.models.resnet import ResNetEncoder
from movedepth_tpu.models.depth_decoder import DepthDecoder


def scan_ms(fn, args, n=10, ns=2):
    def make(length):
        def f(*a):
            def body(carry, _):
                return jnp.mean(fn(*a, carry)).astype(jnp.float32), ()
            out, _ = lax.scan(body, jnp.float32(0), None, length=length)
            return out
        return jax.jit(f)
    fs, fl = make(ns), make(n)
    float(fs(*args)); float(fl(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(fs(*args)); ts = time.time() - t0
        t0 = time.time(); float(fl(*args)); tl = time.time() - t0
        best = min(best, (tl - ts) / (n - ns))
    return best * 1000.0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, 192, 640, 3), jnp.bfloat16)

    for fold in (False, True):
        fpn = FPN4(base_channels=8, scale=2, fold_eval=fold,
                   dtype=jnp.bfloat16)
        fv = fpn.init(jax.random.PRNGKey(1), x, False)
        ms = scan_ms(
            lambda v, xx, c: fpn.apply(v, xx + c * 1e-20, False)[0],
            (fv, x), n=20, ns=4)
        print(f"fpn4 fold_eval={fold}: {ms:.2f} ms/iter @ batch {batch}",
              flush=True)

    enc = ResNetEncoder(arch=18, dtype=jnp.bfloat16)
    ev = enc.init(jax.random.PRNGKey(2), x, train=False)
    feats = jax.jit(lambda v, xx: enc.apply(v, xx, train=False))(ev, x)
    chs = [f.shape[-1] for f in feats]
    for fold in (False, True):
        dec = DepthDecoder(num_ch_enc=chs, dtype=jnp.bfloat16,
                           fold_stage1=fold)
        dv = dec.init(jax.random.PRNGKey(3), feats)

        def fwd(variables, xx, c, _dec=dec, _ev=ev):
            f = enc.apply(_ev, xx + c * 1e-20, train=False)
            return _dec.apply(variables, f)[("disp", 0)]

        ms = scan_ms(fwd, (dv, x))
        print(f"enc+decoder fold_stage1={fold}: {ms:.2f} ms/iter "
              f"@ batch {batch}", flush=True)


if __name__ == "__main__":
    main()
