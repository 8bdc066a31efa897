"""Is XLA's GEGLU slowness just the erfc? Try fusable formulations in XLA.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_geglu_xla.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

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


def main():
    print(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    for m, k, ffi, tag in [(8192, 640, 2560, "dim640"),
                           (2048, 1280, 5120, "dim1280")]:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, 2 * ffi)) * 0.02, jnp.bfloat16)
        flops = 2 * m * k * 2 * ffi

        def run(c, act):
            h = jnp.dot(x + c.astype(x.dtype), w)
            a, g = jnp.split(h, 2, axis=-1)
            y = a * act(g)
            return y[0, 0].astype(jnp.float32) * 1e-30

        variants = {
            "erfc_exact": lambda g: jax.nn.gelu(g, approximate=False),
            "tanh_approx": lambda g: jax.nn.gelu(g, approximate=True),
            "as_erf_f32": lambda g: (0.5 * g.astype(jnp.float32)
                                     * (1.0 + _erf_as(g.astype(jnp.float32)
                                                      * 0.7071067811865476))).astype(g.dtype),
            "as_erf_bf16": lambda g: 0.5 * g * (1.0 + _erf_as(g * jnp.bfloat16(0.70710678))),
        }
        for name, act in variants.items():
            t = timed(functools.partial(run, act=act))
            print(f"{tag} {name:12s}: {t*1e3:7.3f} ms ({flops/t/1e12:6.1f} TF/s)")


if __name__ == "__main__":
    main()
