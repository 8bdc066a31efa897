"""Which GEGLU epilogue is VPU-cheapest at acceptable accuracy?

Variants: none (h*g floor), A-S erf fp32, A-S erf bf16, tanh-approx bf16.
Also reports max abs deviation vs exact fp32 gelu on the real value range.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_geglu_epilogue.py
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


def _erf_as(z):
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))


def epi_none(h, g):
    return h * g


def epi_as_f32(h, g):
    return h * (0.5 * g * (1.0 + _erf_as(g * 0.7071067811865476)))


def epi_as_bf16(h, g):
    gb = g.astype(jnp.bfloat16)
    return h.astype(jnp.bfloat16) * (
        0.5 * gb * (1.0 + _erf_as(gb * jnp.bfloat16(0.70710678)))
    )


def epi_tanh_f32(h, g):
    inner = 0.7978845608028654 * (g + 0.044715 * g * g * g)
    return h * (0.5 * g * (1.0 + jnp.tanh(inner)))


def epi_tanh_bf16(h, g):
    gb = g.astype(jnp.bfloat16)
    inner = jnp.bfloat16(0.79788456) * (gb + jnp.bfloat16(0.044715) * gb * gb * gb)
    return h.astype(jnp.bfloat16) * (jnp.bfloat16(0.5) * gb * (1.0 + jnp.tanh(inner)))


def make_kernel(epi):
    def kernel(x_ref, wh_ref, wg_ref, o_ref):
        h = jax.lax.dot_general(x_ref[:], wh_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g = jax.lax.dot_general(x_ref[:], wg_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:] = epi(h, g).astype(o_ref.dtype)

    return kernel


def geglu(x, wh, wg, epi, bm=512, bn=512):
    m, k = x.shape
    n = wh.shape[1]
    return pl.pallas_call(
        make_kernel(epi),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, wh, wg)


def main():
    print(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    m, k, ffi = 8192, 640, 2560
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, 2 * ffi)) * 0.05, jnp.bfloat16)
    wh, wg = w[:, :ffi], w[:, ffi:]
    flops = 2 * m * k * 2 * ffi

    # accuracy reference: exact gelu fp32 on host
    hf = np.asarray(x, np.float32) @ np.asarray(wh, np.float32)
    gf = np.asarray(x, np.float32) @ np.asarray(wg, np.float32)
    from scipy.special import erf as serf  # available? fall back below

    exact = hf * (0.5 * gf * (1.0 + serf(gf / np.sqrt(2.0))))

    for name, epi in [("none", epi_none), ("as_f32", epi_as_f32),
                      ("as_bf16", epi_as_bf16), ("tanh_f32", epi_tanh_f32),
                      ("tanh_bf16", epi_tanh_bf16)]:
        try:
            t = timed(functools.partial(
                lambda c, epi=epi: (geglu(x + c.astype(x.dtype), wh, wg, epi)
                                    [0, 0].astype(jnp.float32) * 1e-30)))
            out = np.asarray(geglu(x, wh, wg, epi), np.float32)
            if name == "none":
                err = float("nan")
            else:
                scale = np.abs(exact).max()
                err = np.abs(out - exact).max() / scale
            print(f"{name:10s}: {t*1e3:7.3f} ms ({flops/t/1e12:6.1f} TF/s) "
                  f"rel-err {err:.2e}")
        except Exception as e:
            print(f"{name:10s}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
