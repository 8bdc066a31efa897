"""Tune the fused GEGLU kernel block sizes at both SDXL FFN shapes.

Also probes a weight-stationary grid order (M fastest) and bf16 epilogue.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_geglu_tune.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ITERS = 100


def timed(fn, iters=ITERS):
    def body(c, _):
        return fn(c), ()

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    run(jnp.float32(0.0)).block_until_ready()
    t0 = time.perf_counter()
    run(jnp.float32(0.0)).block_until_ready()
    return (time.perf_counter() - t0) / iters


def _erf(z):
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))


def _geglu_kernel(x_ref, wh_ref, wg_ref, o_ref):
    h = jax.lax.dot_general(x_ref[:], wh_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x_ref[:], wg_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    gelu_g = 0.5 * g * (1.0 + _erf(g * 0.7071067811865476))
    o_ref[:] = (h * gelu_g).astype(o_ref.dtype)


def pallas_geglu(x, wh, wg, bm, bn, m_fast):
    m, k = x.shape
    n = wh.shape[1]
    if m_fast:
        grid = (n // bn, m // bm)
        xmap = lambda j, i: (i, 0)
        wmap = lambda j, i: (0, j)
        omap = lambda j, i: (i, j)
    else:
        grid = (m // bm, n // bn)
        xmap = lambda i, j: (i, 0)
        wmap = lambda i, j: (0, j)
        omap = lambda i, j: (i, j)
    return pl.pallas_call(
        _geglu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), xmap),
            pl.BlockSpec((k, bn), wmap),
            pl.BlockSpec((k, bn), wmap),
        ],
        out_specs=pl.BlockSpec((bm, bn), omap),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, wh, wg)


def main():
    print(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    for m, k, ffi, tag in [(8192, 640, 2560, "dim640"),
                           (2048, 1280, 5120, "dim1280")]:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, 2 * ffi)) * 0.02, jnp.bfloat16)
        wh, wg = w[:, :ffi], w[:, ffi:]
        flops = 2 * m * k * 2 * ffi
        for bm in (256, 512, 1024, 2048):
            for bn in (256, 512, 640, 1024):
                if ffi % bn or m % bm:
                    continue
                # VMEM estimate: x + 2w + out, double buffered
                vmem = 2 * (bm * k + 2 * k * bn + bm * bn) * 2
                if vmem > 14 * 1024 * 1024:
                    continue
                for m_fast in (False, True):
                    try:
                        t = timed(functools.partial(
                            lambda c, bm=bm, bn=bn, mf=m_fast: (
                                pallas_geglu(x + c.astype(x.dtype), wh, wg, bm, bn, mf)
                                [0, 0].astype(jnp.float32) * 1e-30)))
                    except Exception as e:
                        print(f"{tag} bm{bm} bn{bn} mfast{m_fast}: FAIL {type(e).__name__}")
                        continue
                    print(f"{tag} bm{bm:4d} bn{bn:4d} m_fast={int(m_fast)}: "
                          f"{t*1e3:7.3f} ms ({flops/t/1e12:6.1f} TF/s)")


if __name__ == "__main__":
    main()
