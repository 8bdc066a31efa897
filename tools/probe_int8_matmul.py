"""Measure bf16 vs int8 matmul at the SDXL transformer shapes on the real chip.

Decides the int8 integration strategy for the inference path:
  (a) pure int8 matmul throughput ceiling (weights+acts pre-quantized),
  (b) XLA dynamic-quant path (per-row absmax + round + int8 dot + dequant),
  (c) the bf16 status quo.

Timing uses an on-device scan with a scalar data dependency so the tunnel's
~25 ms host RTT is paid once per measurement, not per iteration (CLAUDE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8_matmul.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 100

# (M, K, N, tag): the hot projection shapes at 1024^2 (CFG pair packed)
SHAPES = [
    (8192, 640, 1920, "qkv dim640 seq4096"),
    (8192, 640, 5120, "ffn-in dim640"),
    (8192, 2560, 640, "ffn-out dim640"),
    (2048, 1280, 3840, "qkv dim1280 seq1024"),
    (2048, 1280, 10240, "ffn-in dim1280"),
    (2048, 5120, 1280, "ffn-out dim1280"),
    (8192, 2048, 1280, "cross-kv dim640"),
]


def timed(fn, x0, iters=ITERS):
    """fn: scalar-perturbed callable x -> scalar. Chained on device."""

    def body(c, _):
        return fn(c), ()

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    c = run(jnp.float32(0.0))
    c.block_until_ready()
    t0 = time.perf_counter()
    c = run(jnp.float32(0.0))
    c.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    print(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    for m, k, n, tag in SHAPES:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.asarray(rng.uniform(0.01, 0.02, (n,)), jnp.float32)

        flops = 2 * m * k * n

        def f_bf16(c, x=x, w=w):
            y = jnp.dot(x + c.astype(x.dtype), w, preferred_element_type=jnp.float32)
            return y[0, 0] * 1e-30

        def f_int8_pure(c, xq=xq, wq=wq, ws=ws):
            # c folded in via a no-op select to keep the dependency
            xs = jnp.where(c < 1e30, xq, xq)
            acc = jax.lax.dot_general(
                xs, wq,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * ws
            return y[0, 0] * 1e-30

        def f_int8_dyn(c, x=x, wq=wq, ws=ws):
            xi = (x + c.astype(x.dtype)).astype(jnp.float32)
            s = jnp.max(jnp.abs(xi), axis=-1, keepdims=True) / 127.0
            xq_ = jnp.clip(jnp.round(xi / s), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq_, wq,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * s * ws
            return (y[0, 0] * 1e-30).astype(jnp.float32)

        t_bf = timed(f_bf16, x)
        t_i8 = timed(f_int8_pure, x)
        t_dyn = timed(f_int8_dyn, x)
        print(
            f"{tag:24s} M{m} K{k} N{n}: "
            f"bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s) | "
            f"int8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:6.1f} TOP/s) | "
            f"int8+dynq {t_dyn*1e3:7.3f} ms ({flops/t_dyn/1e12:6.1f} TOP/s)"
        )


if __name__ == "__main__":
    main()
