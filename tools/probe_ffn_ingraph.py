"""FFN in-graph gap probe: why do the transformer FFN dots run ~120 TF/s
in the UNet graph when the chip sustains ~130-145 on the isolated shapes?

Measures the REAL FFN block composition (norm3 -> GEGLU two-dot -> net_2 ->
residual, nn/transformer.py:88-91) at the two dominant SDXL shapes, against
the pure-dot ceiling and targeted variants, all fetch-synced scan loops
(CLAUDE.md: block_until_ready can return early on this backend).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_ffn_ingraph.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import layers

ITERS = 50


def timed(fn, x, iters=ITERS):
    """On-device scan loop with a data dependency; fetch-synced."""

    def body(c, _):
        return fn(c), ()

    run = jax.jit(lambda c: jnp.sum(jax.lax.scan(body, c, None, length=iters)[0]
                                    .astype(jnp.float32)))
    np.asarray(run(x))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(x))
    return (time.perf_counter() - t0) / iters


def main():
    print(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    policy = dtypes.DEFAULT
    for b, s, d in [(2, 1024, 1280), (2, 4096, 640)]:
        f = 4 * d
        m = b * s
        flops = 6 * m * d * f  # two geglu dots + net_2
        x = jnp.asarray(rng.normal(size=(b, s, d)), jnp.bfloat16)
        ff = {
            "net_0_proj": {
                "weight": jnp.asarray(rng.normal(size=(d, 2 * f)) * 0.02, jnp.bfloat16),
                "bias": jnp.asarray(rng.normal(size=(2 * f,)) * 0.02, jnp.bfloat16),
            },
            "net_2": {
                "weight": jnp.asarray(rng.normal(size=(f, d)) * 0.02, jnp.bfloat16),
                "bias": jnp.asarray(rng.normal(size=(d,)) * 0.02, jnp.bfloat16),
            },
        }
        ln = {"weight": jnp.ones((d,), jnp.bfloat16),
              "bias": jnp.zeros((d,), jnp.bfloat16)}
        w1 = ff["net_0_proj"]["weight"][:, :f]
        w2 = ff["net_2"]["weight"]

        def norm_x(fn):
            # keep outputs bounded across the scan (y ~ x scale)
            def g(c):
                y = fn(c)
                return (y / (jnp.sqrt(jnp.mean(y.astype(jnp.float32) ** 2) + 1e-3))
                        ).astype(c.dtype)
            return g

        # 1. pure-dot ceiling at the same FLOP mix (3 dots, no elementwise)
        def dots_only(c):
            h = jnp.dot(c, w1)
            g = jnp.dot(c, w1)
            return jnp.dot((h + g), w2)

        # 2. the real FFN block (norm3 + geglu + net_2 + residual)
        def ffn_real(c):
            h = layers.layer_norm(ln, c, policy=policy)
            h = layers.geglu(ff["net_0_proj"], h, policy=policy)
            return c + layers.linear(ff["net_2"], h, policy=policy)

        # 3. no layer norm (isolate LN cost)
        def ffn_noln(c):
            h = layers.geglu(ff["net_0_proj"], c, policy=policy)
            return c + layers.linear(ff["net_2"], h, policy=policy)

        # 4. collapsed 2D operands (B*S, D)
        def ffn_2d(c):
            c2 = c.reshape(m, d)
            h = layers.layer_norm(ln, c2, policy=policy)
            h = layers.geglu(ff["net_0_proj"], h, policy=policy)
            return (c2 + layers.linear(ff["net_2"], h, policy=policy)).reshape(b, s, d)

        # 5. fp32 gelu argument (current path: bf16 tanh approx)
        def ffn_f32gelu(c):
            h = layers.layer_norm(ln, c, policy=policy)
            w = ff["net_0_proj"]["weight"]
            hh = jnp.dot(h, w[:, :f]) + ff["net_0_proj"]["bias"][:f]
            gg = jnp.dot(h, w[:, f:]) + ff["net_0_proj"]["bias"][f:]
            act = jax.nn.gelu(gg.astype(jnp.float32), approximate=True)
            hmul = (hh.astype(jnp.float32) * act).astype(c.dtype)
            return c + layers.linear(ff["net_2"], hmul, policy=policy)

        rows = [
            ("dots_only(ceiling)", dots_only),
            ("ffn_real", ffn_real),
            ("ffn_noln", ffn_noln),
            ("ffn_2d", ffn_2d),
            ("ffn_f32gelu", ffn_f32gelu),
        ]
        print(f"\n== B{b} S{s} D{d} (FFN flops {flops/1e9:.1f} GF) ==")
        for name, fn in rows:
            dt = timed(norm_x(fn), x)
            print(f"  {name:22s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
