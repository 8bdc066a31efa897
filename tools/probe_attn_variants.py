"""Attention kernel variants at the two SDXL self-attention shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_attn_variants.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu.kernels import flash_attention as fa

ITERS = 100


def timed(fn, iters=ITERS):
    def body(c, _):
        return fn(c), ()

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    run(jnp.float32(0.0)).block_until_ready()
    t0 = time.perf_counter()
    run(jnp.float32(0.0)).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    print(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    for b, h, s, d, tag in [(2, 10, 4096, 64, "seq4096 h10"),
                            (2, 20, 1024, 64, "seq1024 h20")]:
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        qp = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.bfloat16)
        kp = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.bfloat16)
        vp = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.bfloat16)
        scale = d**-0.5
        flops = 4 * b * h * s * s * d

        def f_bhsd(c):
            qq = q + c.astype(q.dtype)
            return fa._flash(qq, k, v, scale, s)[0, 0, 0, 0].astype(jnp.float32) * 1e-30

        def f_nhd(c):
            qq = qp + c.astype(qp.dtype)
            return fa._flash_nhd(qq, kp, vp, scale, d, s)[0, 0, 0].astype(jnp.float32) * 1e-30

        def f_nhd_with_transposes(c):
            # what the OLD path paid: transpose to heads, kernel, merge
            qq = qp + c.astype(qp.dtype)
            qh = qq.reshape(b, s, h, d).transpose(0, 2, 1, 3)
            kh = kp.reshape(b, s, h, d).transpose(0, 2, 1, 3)
            vh = vp.reshape(b, s, h, d).transpose(0, 2, 1, 3)
            o = fa._flash(qh, kh, vh, scale, s)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
            return o[0, 0, 0].astype(jnp.float32) * 1e-30

        for name, fn in [("bhsd kernel only", f_bhsd), ("nhd kernel", f_nhd),
                         ("bhsd + transposes", f_nhd_with_transposes)]:
            t = timed(fn)
            print(f"{tag} {name:18s}: {t*1e3:7.3f} ms ({flops/t/1e12:6.1f} TF/s)")


if __name__ == "__main__":
    main()
