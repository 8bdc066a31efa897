"""Probe: remove the softmax max-reduce (clamp instead) and/or move the
denominator sum onto the MXU (ones-column PV) in the NHD attention kernel.

Rationale: the fused attention is VPU-bound (PERF.md §4: 24 ms at
50-60 TF/s). Per (BQ, Sk) logits tile the VPU does THREE passes: max-reduce,
exp2, sum-reduce. Softmax is shift-invariant, so subtracting the row max is
only overflow protection — exp2(min(l, 80)) is exact whenever the row max
is < 80 (fp32 exp2 overflows at 128; attention logits of real models sit
far below 80) and saturates gracefully above. That removes the max pass.
The sum pass can ride the MXU instead: denom = e @ ones(Sk), fused as an
extra accumulation column of the PV matmul.

Run on the real chip:  python tools/probe_softmax_nomax.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imagharmony_tpu.kernels import flash_attention as fa

_LOG2E = fa._LOG2E
_CLAMP = 80.0 * _LOG2E  # exp2 argument bound (fp32 overflow at 128)


def _kernel_variant(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim,
                    no_max, mxu_sum, kv_valid):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    outs = []
    for h in range(q.shape[-1] // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qs = (q[:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
        logits = jax.lax.dot_general(
            qs, k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = fa._mask_cols(logits, kv_valid)
        if no_max == "fp32":
            # fp32 exp2 arguments: no max-subtract AND no argument
            # quantization (bf16 args without the shift amplify error by
            # 2^(range * 2^-9) on wide-range logits)
            e = jnp.exp2(jnp.minimum(logits, _CLAMP))
        elif no_max:
            e = jnp.exp2(jnp.minimum(logits, _CLAMP).astype(jnp.bfloat16))
        else:
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp2((logits - m).astype(jnp.bfloat16))
        if mxu_sum:
            ones = jnp.ones((v.shape[0], 1), v.dtype)
            vv = jnp.concatenate([v[:, sl], ones], axis=-1)  # (Sk, D+1)
            pv_ext = jax.lax.dot_general(
                e.astype(v.dtype), vv,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pv, denom = pv_ext[:, :head_dim], pv_ext[:, head_dim:]
        else:
            denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            pv = jax.lax.dot_general(
                e.astype(v.dtype), v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        outs.append(pv * jax.lax.reciprocal(denom))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def run_variant(q, k, v, scale, head_dim, *, no_max, mxu_sum):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, hd = q.shape
    sk = k.shape[1]
    g = 128
    bq = fa._fwd_block_q(sq, sk)
    kern = functools.partial(
        _kernel_variant, scale=scale, head_dim=head_dim,
        no_max=no_max, mxu_sum=mxu_sum, kv_valid=None,
    )
    grid = (b, hd // g, sq // bq)
    return pl.pallas_call(
        kern, grid=grid,
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


def bench(f, *args, iters=50):
    def loop(a):
        def body(c, _):
            o = f(*((c,) + a[1:]))
            return o, ()
        out, _ = jax.lax.scan(body, a[0], None, length=iters)
        return out
    jl = jax.jit(loop)
    out = jl(args)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = jl(args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import numpy as np

    shapes = [
        (2, 4096, 10, "block1 self-attn"),
        (2, 1024, 20, "block2/mid/up self-attn"),
    ]
    for b, s, h, label in shapes:
        hd = h * 64
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, s, hd), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, hd), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, hd), jnp.bfloat16)
        scale = 64**-0.5

        base = np.asarray(
            run_variant(q, k, v, scale, 64, no_max=False, mxu_sum=False),
            np.float32,
        )
        rows = []
        for no_max in (False, True, "fp32"):
            for mxu_sum in (False, True):
                f = functools.partial(
                    run_variant, scale=scale, head_dim=64,
                    no_max=no_max, mxu_sum=mxu_sum,
                )
                out = np.asarray(f(q, k, v), np.float32)
                err = np.abs(out - base).max()
                ms = bench(lambda a, b_, c: f(a, b_, c), q, k, v)
                rows.append((no_max, mxu_sum, ms, err))
        print(f"\n{label}  (b={b} s={s} h={h})")
        for no_max, mxu_sum, ms, err in rows:
            print(f"  no_max={no_max} mxu_sum={int(mxu_sum)}: "
                  f"{ms:.3f} ms  maxerr_vs_base={err:.2e}")


if __name__ == "__main__":
    main()
