"""Softmax cost levers inside the NHD attention kernel, measured on-chip.

Variants at the two SDXL self-attention shapes:
  v0  current kernel: logits*scale on the (BQ,Sk) tile, bf16 exp,
      probs = e * recip(denom) on the (BQ,Sk) tile
  v1  scale folded into q (a (BQ,D) multiply, 64x smaller), normalization
      deferred to AFTER the PV matmul (a (BQ,D) multiply) — two (BQ,Sk)
      VPU passes removed
  v2  v1 + exp2 with log2(e) folded into the q scaling (exp = exp2(x*log2e);
      folding the multiply into q makes the transcendental a bare exp2)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_softmax_tricks.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagharmony_tpu.kernels import flash_attention as fa

ITERS = 100
LOG2E = 1.4426950408889634


def timed(fn, iters=ITERS):
    def body(c, _):
        return fn(c), ()

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    run(jnp.float32(0.0)).block_until_ready()
    t0 = time.perf_counter()
    run(jnp.float32(0.0)).block_until_ready()
    return (time.perf_counter() - t0) / iters


def _kernel_v(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim, variant):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    outs = []
    for h in range(q.shape[-1] // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        if variant == 0:
            logits = jax.lax.dot_general(
                q[:, sl], k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp((logits - m).astype(jnp.bfloat16))
            denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            probs = (e * jax.lax.reciprocal(denom).astype(e.dtype)).astype(v.dtype)
            outs.append(jax.lax.dot_general(
                probs, v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        else:
            eff = scale * (LOG2E if variant == 2 else 1.0)
            qs = (q[:, sl].astype(jnp.float32) * eff).astype(q.dtype)
            logits = jax.lax.dot_general(
                qs, k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, axis=-1, keepdims=True)
            x = (logits - m).astype(jnp.bfloat16)
            e = jnp.exp2(x) if variant == 2 else jnp.exp(x)
            denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            pv = jax.lax.dot_general(
                e.astype(v.dtype), v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(pv * jax.lax.reciprocal(denom))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def run_variant(q, k, v, scale, head_dim, variant):
    b, sq, hd = q.shape
    sk = k.shape[1]
    g = 128
    bq = fa._fwd_block_q(sq, sk)
    return pl.pallas_call(
        functools.partial(_kernel_v, scale=scale, head_dim=head_dim,
                          variant=variant),
        grid=(b, hd // g, sq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, g), lambda i, hp, j: (i, j, hp)),
            pl.BlockSpec((1, sk, g), lambda i, hp, j: (i, 0, hp)),
            pl.BlockSpec((1, sk, g), lambda i, hp, j: (i, 0, hp)),
        ],
        out_specs=pl.BlockSpec((1, bq, g), lambda i, hp, j: (i, j, hp)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(q, k, v)


def xla_ref(q, k, v, scale, head_dim):
    b, s, hd = q.shape
    h = hd // head_dim
    qh = q.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3).astype(jnp.float32)
    kh = k.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3).astype(jnp.float32)
    vh = v.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3).astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, s, hd)


def main():
    print(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    for b, h, s, d, tag in [(2, 10, 4096, 64, "seq4096 h10 d64"),
                            (2, 20, 1024, 64, "seq1024 h20 d64")]:
        q = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.bfloat16)
        scale = d**-0.5
        flops = 4 * b * h * s * s * d

        ref = np.asarray(jax.jit(
            functools.partial(xla_ref, scale=scale, head_dim=d))(q, k, v))

        for variant in (0, 1, 2):
            out = np.asarray(jax.jit(functools.partial(
                run_variant, scale=scale, head_dim=d, variant=variant))(q, k, v))
            err = np.abs(out.astype(np.float32) - ref).max()

            def f(c, _variant=variant):
                qq = q + c.astype(q.dtype)
                return run_variant(qq, k, v, scale, d, _variant)[0, 0, 0].astype(jnp.float32) * 1e-30

            t = timed(f)
            print(f"{tag} v{variant}: {t*1e3:7.3f} ms ({flops/t/1e12:6.1f} TF/s)"
                  f"  maxerr vs fp32 XLA {err:.2e}")


if __name__ == "__main__":
    main()
