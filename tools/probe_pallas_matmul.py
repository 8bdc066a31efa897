"""Pallas matmul probes: does explicit int8 (Mosaic) beat XLA's int8/bf16,
and what does a fused GEGLU kernel buy at the SDXL FFN shapes?

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas_matmul.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 100


def timed(fn, iters=ITERS):
    def body(c, _):
        return fn(c), ()

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    c = run(jnp.float32(0.0))
    c.block_until_ready()
    t0 = time.perf_counter()
    run(jnp.float32(0.0)).block_until_ready()
    return (time.perf_counter() - t0) / iters


# --- plain Pallas matmul, parameterizable dtype ---------------------------


def _mm_kernel(x_ref, w_ref, o_ref, *, acc_t):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    ).astype(o_ref.dtype)


def pallas_mm(x, w, bm, bn, out_dtype, acc_t):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_t=acc_t),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
    )(x, w)


# --- fused GEGLU: out = (x@W_h) * gelu(x@W_g), W packed [h|g] on N --------


def _geglu_kernel(x_ref, wh_ref, wg_ref, o_ref):
    h = jax.lax.dot_general(
        x_ref[:], wh_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g = jax.lax.dot_general(
        x_ref[:], wg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # erf/erfc are not lowerable in Pallas TPU; Abramowitz-Stegun 7.1.26
    # rational erf (|err| < 1.5e-7, far below bf16 resolution ~4e-3)
    z = g * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    erf_az = 1.0 - poly * jnp.exp(-az * az)
    erf_z = jnp.sign(z) * erf_az
    gelu_g = 0.5 * g * (1.0 + erf_z)
    o_ref[:] = (h * gelu_g).astype(o_ref.dtype)


def pallas_geglu(x, wh, wg, bm, bn):
    m, k = x.shape
    n = wh.shape[1]
    return pl.pallas_call(
        _geglu_kernel,
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

    shapes = [
        (8192, 640, 5120, "ffn-in dim640"),
        (2048, 1280, 10240, "ffn-in dim1280"),
        (8192, 2560, 640, "ffn-out dim640"),
        (2048, 5120, 1280, "ffn-out dim1280"),
    ]
    for m, k, n, tag in shapes:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        flops = 2 * m * k * n
        bm, bn = (256 if k >= 4096 else 512), min(512, n)

        def f_bf16(c, x=x, w=w, bm=bm, bn=bn):
            y = pallas_mm(x + c.astype(x.dtype), w, bm, bn, jnp.bfloat16, jnp.float32)
            return y[0, 0].astype(jnp.float32) * 1e-30

        def f_int8(c, xq=xq, wq=wq, bm=bm, bn=bn):
            xs = jnp.where(c < 1e30, xq, xq)
            y = pallas_mm(xs, wq, bm, bn, jnp.int32, jnp.int32)
            return y[0, 0].astype(jnp.float32) * 1e-30

        t_bf = timed(f_bf16)
        t_i8 = timed(f_int8)
        print(
            f"{tag:18s} M{m} K{k} N{n}: pallas bf16 {t_bf*1e3:7.3f} ms "
            f"({flops/t_bf/1e12:6.1f} TF/s) | pallas int8 {t_i8*1e3:7.3f} ms "
            f"({flops/t_i8/1e12:6.1f} TOP/s)"
        )

    # GEGLU: XLA unfused vs Pallas fused (both include the elementwise)
    for m, k, ffi, tag in [(8192, 640, 2560, "geglu dim640"),
                           (2048, 1280, 5120, "geglu dim1280")]:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, 2 * ffi)) * 0.02, jnp.bfloat16)
        wh, wg = w[:, :ffi], w[:, ffi:]
        flops = 2 * m * k * 2 * ffi
        bm, bn = 512, 512

        def f_xla(c, x=x, w=w, ffi=ffi):
            h = jnp.dot(x + c.astype(x.dtype), w, preferred_element_type=jnp.float32)
            a, g = h[:, :ffi], h[:, ffi:]
            y = (a * jax.nn.gelu(g, approximate=False)).astype(x.dtype)
            return y[0, 0].astype(jnp.float32) * 1e-30

        def f_pallas(c, x=x, wh=wh, wg=wg, bm=bm, bn=bn):
            y = pallas_geglu(x + c.astype(x.dtype), wh, wg, bm, bn)
            return y[0, 0].astype(jnp.float32) * 1e-30

        def f_xla_mm_only(c, x=x, w=w):
            h = jnp.dot(x + c.astype(x.dtype), w, preferred_element_type=jnp.float32)
            return h[0, 0].astype(jnp.float32) * 1e-30

        t_x = timed(f_xla)
        t_mm = timed(f_xla_mm_only)
        t_p = timed(f_pallas)
        print(
            f"{tag:18s} M{m} K{k} ffi{ffi}: XLA {t_x*1e3:7.3f} ms "
            f"({flops/t_x/1e12:6.1f} TF/s) | XLA mm-only {t_mm*1e3:7.3f} ms | "
            f"pallas fused {t_p*1e3:7.3f} ms ({flops/t_p/1e12:6.1f} TF/s)"
        )


if __name__ == "__main__":
    main()
