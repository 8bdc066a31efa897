"""Pallas fused attention for the UNet's latent self-attention.

Why: the XLA path materializes softmax logits in HBM — at seq 4096
(64×64 latents) that is ~1.3 GB per layer instance and makes the whole
UNet memory-bound (measured: 116 GB accessed / 14 TFLOP per CFG-pair call,
40% MXU). This kernel keeps the (BQ, Sk) logits tile in VMEM: for SDXL's
sequence lengths (≤4096) the full K/V of one head is ~1 MB bf16, so each
grid step loads K/V once, computes logits → softmax → PV entirely
on-chip, and writes only the (BQ, D) output.

This replaces the vendor-fused SDPA the reference leans on
(torch F.scaled_dot_product_attention / xformers,
reference attention_processor.py:423). The tiny-K branches (text 77
tokens, IP 4 tokens) stay on XLA where a fused softmax is already cheap.

Backward: jax.custom_vjp with a recompute-based gradient (the standard
flash backward: recompute probs per tile) so the same kernel serves
training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INTERPRET = False  # set True to debug on CPU


def _use_pallas(q, k):
    sq, sk = q.shape[-2], k.shape[-2]
    d = q.shape[-1]
    if sk < 512:  # tiny-K branches: XLA softmax fusion is already optimal
        return False
    if sq % 256 != 0 or sk % 256 != 0:
        return False
    if d % 64 != 0:
        return False
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon") and not _INTERPRET:
        return False
    return True


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """One (BQ, D) output tile: full-K fused attention in VMEM."""
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (Sk, D)
    v = v_ref[0]  # (Sk, D)
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = (e / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    sk = k.shape[2]
    # tuned on v5e: whole-row blocks win up to 1024 (fewer K/V reloads);
    # 512 is flat-optimal at 4096 (logits tile stays ≤8 MB VMEM)
    bq = sq if sq <= 1024 else 512

    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, sk, d)
    vr = v.reshape(b * h, sk, d)

    grid = (b * h, sq // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qr.size + kr.size + vr.size + qr.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=_INTERPRET,
    )(qr, kr, vr)
    return out.reshape(b, h, sq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale)


def _flash_fwd(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    """Recompute-based backward (exact): probs re-derived per head.

    Memory note: this materializes (Sq, Sk) probs per head in the XLA
    backward — acceptable because training runs at 512² (seq ≤1024) and
    under remat; a fully-tiled Pallas backward is a later optimization.
    """
    q, k, v = res
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    pv = probs.astype(g.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", pv, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v).astype(jnp.float32)
    dsoft = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dsoft = (dsoft * scale).astype(q.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", dsoft, k)
    dk = jnp.einsum("bhqk,bhqd->bhkd", dsoft, q)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, scale):
    """Fused attention, or None to signal XLA fallback.

    q: (B, H, Sq, D); k, v: (B, H, Sk, D). No mask support (the UNet's
    latent self-attention is unmasked; masked paths use XLA).
    """
    if not _use_pallas(q, k):
        return None
    return _flash(q, k, v, scale)


# Note: a transpose-free (B, S, H, D) kernel was prototyped and reverted —
# Mosaic requires the block's minor two dims to be (8, 128)-divisible or
# full-size, and a single head slice (1, 64) in that layout is neither.
# The (B, H, S, D) relayout the callers do is the supported shape.
