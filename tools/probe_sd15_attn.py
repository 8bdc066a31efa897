"""Probe: SD1.5 self-attention shapes on the padded-head-dim fused path.

SD1.5's UNet uses 8 heads at dims 320/640/1280 -> head_dim 40/80/160, none
a 64 multiple, so until round 3 the whole family fell back to XLA attention
(materializing (Sq, Sk) logits in HBM at 512^2 -> seq 4096). The fused path
now zero-pads D to the 64 quantum (exact math). This measures both sides at
the SD1.5 shapes. Run: python tools/probe_sd15_attn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu.kernels import flash_attention as fa
from imagharmony_tpu.nn import attention as attn_lib


def bench(f, args, iters=30):
    def loop(a):
        q = a[0]

        def body(c, _):
            o = f(c, *a[1:])
            return o.astype(q.dtype), ()

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out[0, 0, :2, :2]

    jl = jax.jit(loop)
    np.asarray(jl(args))
    t0 = time.perf_counter()
    np.asarray(jl(args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    # (B=2 CFG pair, H, S, D): the three SD1.5 self-attention shapes at 512px
    for (h, s, d, label) in [(8, 4096, 40, "64sq d40"),
                             (8, 1024, 80, "32sq d80"),
                             (8, 256, 160, "16sq d160 (tiny-K: XLA by rule)")]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (2, h, s, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (2, h, s, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (2, h, s, d), jnp.bfloat16)
        scale = d ** -0.5
        fl = 4 * 2 * h * s * s * d

        xla = lambda q_, k_, v_: attn_lib.sdpa(q_, k_, v_, backend="xla")
        tx = bench(xla, (q, k, v))
        line = f"{label}: XLA {tx:.3f} ms ({fl/tx/1e9:5.1f} TF/s)"
        fused = fa.flash_attention(q, k, v, scale=scale)
        if fused is None:
            print(f"{line}  fused: declined (by rule)")
            continue
        ref = np.asarray(jax.jit(xla)(q, k, v), np.float32)
        out = np.asarray(jax.jit(
            lambda q_, k_, v_: fa.flash_attention(q_, k_, v_, scale=scale)
        )(q, k, v), np.float32)
        err = np.abs(out - ref).max()
        tp = bench(lambda q_, k_, v_: fa.flash_attention(q_, k_, v_, scale=scale),
                   (q, k, v))
        print(f"{line}  fused {tp:.3f} ms ({fl/tp/1e9:5.1f} TF/s) "
              f"maxdiff={err:.1e}")


if __name__ == "__main__":
    main()
