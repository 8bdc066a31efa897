"""Probe: lane-group (G) sweep for the NHD attention kernel.

At 32-sq latents (S=1024, dim 1280, 20 heads) the NHD kernel's grid is
(b, hd/G, S/bq) = (2, 10, 1) with G=128 — 20 small steps whose per-step
overhead dominates (measured ~10 TF/s isolated vs 44 TF/s at S=4096).
Raising G packs more heads into one grid step (in-kernel python loop over
d=64 head pairs), trading grid overhead for a longer serial body.

Run on the real chip: python tools/probe_attn_lanegroup.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu.kernels import flash_attention as fa


def nhd_with_g(q, k, v, scale, head_dim, kv_len, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, hd = q.shape
    sk = k.shape[1]
    bq = fa._fwd_block_q(sq, sk)
    grid = (b, hd // g, sq // bq)
    return pl.pallas_call(
        functools.partial(
            fa._attn_nhd_kernel, scale=scale, head_dim=head_dim,
            kv_valid=kv_len, kb=fa._kblock(sk),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, g), lambda i, hp, j: (i, j, hp)),
            pl.BlockSpec((1, sk, g), lambda i, hp, j: (i, 0, hp)),
            pl.BlockSpec((1, sk, g), lambda i, hp, j: (i, 0, hp)),
        ],
        out_specs=pl.BlockSpec((1, bq, g), lambda i, hp, j: (i, j, hp)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(q, k, v)


def bench(f, args, iters=30):
    def loop(a):
        q = a[0]
        def body(c, _):
            o = f(c, *a[1:])
            return o.astype(q.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out[0, :2, :2]
    jl = jax.jit(loop)
    np.asarray(jl(args))
    t0 = time.perf_counter()
    np.asarray(jl(args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    for (b, s, hd, label) in [(2, 1024, 1280, "32sq dim1280 h20"),
                              (2, 4096, 640, "64sq dim640 h10")]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, s, hd), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, hd), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, hd), jnp.bfloat16)
        scale = 64 ** -0.5
        fl = 4 * b * (hd // 64) * s * s * 64
        base = None
        print(f"\n{label}:")
        for g in (128, 256, 640, 1280):
            if hd % g or g > hd:
                continue
            f = lambda q_, k_, v_: nhd_with_g(q_, k_, v_, scale, 64, s, g)
            out = np.asarray(jax.jit(f)(q, k, v), np.float32)
            if base is None:
                base = out
            err = np.abs(out - base).max()
            t = bench(f, (q, k, v))
            print(f"  G={g:5d}: {t:7.3f} ms ({fl/t/1e9:5.1f} TF/s) maxdiff={err:.1e}")


if __name__ == "__main__":
    main()
