"""GEGLU round 2: packed single-dot Pallas kernel, XLA two-dot, semantics.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_geglu_v2.py
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
    run(jnp.float32(0.0)).block_until_ready()
    t0 = time.perf_counter()
    run(jnp.float32(0.0)).block_until_ready()
    return (time.perf_counter() - t0) / iters


def _gelu_tanh(g):
    inner = 0.7978845608028654 * (g + 0.044715 * g * g * g)
    return 0.5 * g * (1.0 + jnp.tanh(inner))


# Packed: weight pre-interleaved so one dot covers [h|g] for this bn tile:
# w_packed[:, j*2bn : (j+1)*2bn] = [wh[:, j*bn:(j+1)*bn] | wg[:, j*bn:(j+1)*bn]]
def _packed_kernel(x_ref, w_ref, o_ref, *, bn):
    hg = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h, g = hg[:, :bn], hg[:, bn:]
    o_ref[:] = (h * _gelu_tanh(g)).astype(o_ref.dtype)


def geglu_packed(x, w_packed, ffi, bm, bn):
    m, k = x.shape
    return pl.pallas_call(
        functools.partial(_packed_kernel, bn=bn),
        grid=(m // bm, ffi // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, 2 * bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, ffi), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * 2 * ffi,
            bytes_accessed=(m * k + k * 2 * ffi + m * ffi) * 2,
            transcendentals=m * ffi,
        ),
    )(x, w_packed)


def main():
    print(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    for m, k, ffi, tag in [(8192, 640, 2560, "dim640"),
                           (2048, 1280, 5120, "dim1280")]:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, 2 * ffi)) * 0.02, jnp.bfloat16)
        wh, wg = w[:, :ffi], w[:, ffi:]
        flops = 2 * m * k * 2 * ffi

        # XLA two-dot
        def f_xla2(c):
            xi = x + c.astype(x.dtype)
            h = jnp.dot(xi, wh)
            g = jnp.dot(xi, wg)
            y = h * jax.nn.gelu(g, approximate=True)
            return y[0, 0].astype(jnp.float32) * 1e-30

        t = timed(f_xla2)
        print(f"{tag} xla-two-dot tanh: {t*1e3:7.3f} ms ({flops/t/1e12:6.1f} TF/s)")

        for bm in (256, 512):
            for bn in (256, 512):
                if ffi % bn or m % bm:
                    continue
                # interleave w into packed layout
                wp = np.empty((k, 2 * ffi), np.float32)
                for j in range(ffi // bn):
                    wp[:, j * 2 * bn: j * 2 * bn + bn] = np.asarray(wh, np.float32)[:, j * bn:(j + 1) * bn]
                    wp[:, j * 2 * bn + bn: (j + 1) * 2 * bn] = np.asarray(wg, np.float32)[:, j * bn:(j + 1) * bn]
                wpj = jnp.asarray(wp, jnp.bfloat16)

                def f_packed(c, wpj=wpj, bm=bm, bn=bn):
                    y = geglu_packed(x + c.astype(x.dtype), wpj, ffi, bm, bn)
                    return y[0, 0].astype(jnp.float32) * 1e-30

                try:
                    t = timed(f_packed)
                    print(f"{tag} packed bm{bm} bn{bn}: {t*1e3:7.3f} ms "
                          f"({flops/t/1e12:6.1f} TF/s)")
                except Exception as e:
                    print(f"{tag} packed bm{bm} bn{bn}: FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()
