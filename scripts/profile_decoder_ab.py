"""A/B the decoder's merged disp heads on the real chip.

Times encoder+decoder forward at batch 128 bf16 with merge_heads on/off,
same session (long/short scan difference, same methodology as bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

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
    enc = ResNetEncoder(arch=18, dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 192, 640, 3),
                           jnp.bfloat16)
    ev = enc.init(jax.random.PRNGKey(1), x, train=False)
    feats = jax.jit(lambda v, x: enc.apply(v, x, train=False))(ev, x)
    chs = [f.shape[-1] for f in feats]
    for merge in (False, True):
        dec = DepthDecoder(num_ch_enc=chs, dtype=jnp.bfloat16,
                           merge_heads=merge)
        dv = dec.init(jax.random.PRNGKey(2), feats)

        def fwd(dv, x, eps):
            f = enc.apply(ev, x + eps * 1e-20, train=False)
            out = dec.apply(dv, f)
            return sum(jnp.mean(v) for k, v in out.items() if k[0] == "disp")

        ms = scan_ms(fwd, (dv, x))
        print(f"merge_heads={merge}: {ms:.2f} ms @ batch {batch}",
              flush=True)


if __name__ == "__main__":
    main()
