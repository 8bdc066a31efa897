"""Probe: k-blocked accumulative attention (enabled by the no-max softmax).

The current NHD kernel computes the FULL (BQ, Sk) logits tile per grid
step: MXU qk -> VPU exp2/sum -> MXU pv, serialized phases over an 8 MB
fp32 tile. With the no-max softmax there is NO running max, so flash-style
k-blocking needs no rescaling at all — per k-block j:
    e_j = exp2(min(q k_j^T, clamp));  pv += e_j v_j;  denom += rowsum(e_j)
pure accumulation. An unrolled in-kernel loop over k-blocks gives Mosaic
independent MXU/VPU work to software-pipeline, and the logits tile shrinks
(BQ, KB), freeing VMEM for larger q-blocks.

Sweeps (bq, kb) at the S=4096 self-attention shape (the bulk of the
in-graph self-attn cost) and S=1024. Run: python tools/probe_attn_kblock.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu.kernels import flash_attention as fa

_LOG2E = fa._LOG2E
_CLAMP = fa._EXP2_ARG_MAX


def _kblock_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim, kb):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sk = k.shape[0]
    outs = []
    for h in range(q.shape[-1] // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qs = (q[:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
        pv = None
        denom = None
        for j in range(0, sk, kb):
            kj = k[j:j + kb, sl]
            vj = v[j:j + kb, sl]
            logits = jax.lax.dot_general(
                qs, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            e = jnp.exp2(jnp.minimum(logits, _CLAMP))
            pvj = jax.lax.dot_general(
                e.astype(vj.dtype), vj,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dj = jnp.sum(e, axis=-1, keepdims=True)
            pv = pvj if pv is None else pv + pvj
            denom = dj if denom is None else denom + dj
        outs.append(pv * jax.lax.reciprocal(denom))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def kblock_attn(q, k, v, scale, head_dim, bq, kb):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, hd = q.shape
    sk = k.shape[1]
    g = head_dim if head_dim % 128 == 0 else 128
    grid = (b, hd // g, sq // bq)
    return pl.pallas_call(
        functools.partial(_kblock_kernel, scale=scale, head_dim=head_dim, kb=kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, g), lambda i, hp, j: (i, j, hp)),
            pl.BlockSpec((1, sk, g), lambda i, hp, j: (i, 0, hp)),
            pl.BlockSpec((1, sk, g), lambda i, hp, j: (i, 0, hp)),
        ],
        out_specs=pl.BlockSpec((1, bq, g), lambda i, hp, j: (i, j, hp)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(q, k, v)


def _batchpack_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim):
    """All batch rows in one block: grid steps drop b-fold at S=1024 where
    Mosaic per-step overhead dominates (PERF.md: ~10 TF/s isolated)."""
    nb = q_ref.shape[0]
    for i in range(nb):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        outs = []
        for h in range(q.shape[-1] // head_dim):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qs = (q[:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
            logits = jax.lax.dot_general(
                qs, k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            e = jnp.exp2(jnp.minimum(logits, _CLAMP))
            denom = jnp.sum(e, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                e.astype(v.dtype), v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(pv * jax.lax.reciprocal(denom))
        o_ref[i] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def batchpack_attn(q, k, v, scale, head_dim, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, hd = q.shape
    sk = k.shape[1]
    g = head_dim if head_dim % 128 == 0 else 128
    grid = (hd // g,)
    return pl.pallas_call(
        functools.partial(_batchpack_kernel, scale=scale, head_dim=head_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, sq, g), lambda hp: (0, 0, hp)),
            pl.BlockSpec((b, sk, g), lambda hp: (0, 0, hp)),
            pl.BlockSpec((b, sk, g), lambda hp: (0, 0, hp)),
        ],
        out_specs=pl.BlockSpec((b, sq, g), lambda hp: (0, 0, hp)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v)


def bench(f, args, iters=30):
    def loop(a):
        q = a[0]
        def body(c, _):
            o = f(c, *a[1:])
            return o.astype(q.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out[0, :2, :2]
    jl = jax.jit(loop)
    np.asarray(jl(args))
    t0 = time.perf_counter()
    np.asarray(jl(args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    for (b, s, hd, label) in [(2, 4096, 640, "64sq dim640 h10"),
                              (2, 1024, 1280, "32sq dim1280 h20")]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, s, hd), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, hd), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, hd), jnp.bfloat16)
        scale = 64 ** -0.5
        fl = 4 * b * (hd // 64) * s * s * 64
        cur = lambda q_, k_, v_: fa.flash_attention_nhd(q_, k_, v_, scale=scale, head_dim=64)
        ref = np.asarray(jax.jit(cur)(q, k, v), np.float32)
        t = bench(cur, (q, k, v))
        print(f"\n{label}: current {t:.3f} ms ({fl/t/1e9:.1f} TF/s)")
        for bq, kb in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                       (2048, 512), (4096, 512), (1024, 2048)]:
            if bq > s or kb > s or s % bq or s % kb:
                continue
            f = lambda q_, k_, v_: kblock_attn(q_, k_, v_, scale, 64, bq, kb)
            try:
                out = np.asarray(jax.jit(f)(q, k, v), np.float32)
            except Exception as e:
                print(f"  bq={bq} kb={kb}: FAILED {repr(e)[:80]}")
                continue
            err = np.abs(out - ref).max()
            t2 = bench(f, (q, k, v))
            print(f"  bq={bq:4d} kb={kb:4d}: {t2:.3f} ms ({fl/t2/1e9:5.1f} TF/s) maxdiff={err:.1e}")
        if s <= 1024:  # batch-packed: whole (b, s, 128) per grid step
            f = lambda q_, k_, v_: batchpack_attn(q_, k_, v_, scale, 64)
            try:
                out = np.asarray(jax.jit(f)(q, k, v), np.float32)
                err = np.abs(out - ref).max()
                t2 = bench(f, (q, k, v))
                print(f"  batch-packed  : {t2:.3f} ms ({fl/t2/1e9:5.1f} TF/s) maxdiff={err:.1e}")
            except Exception as e:
                print(f"  batch-packed  : FAILED {repr(e)[:100]}")


if __name__ == "__main__":
    main()
