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


# ---------------------------------------------------------------------------
# Transpose-free variant: (B, S, H*D) layout, heads never materialized
# ---------------------------------------------------------------------------
#
# The (B, H, S, D) relayout the standard kernel needs costs 4 transposes per
# attention instance (q/k/v split + output merge) — measured ~4-6 ms/UNet
# call of pure "data formatting" HBM traffic in the profile. A single head
# slice (1, bq, 64) violates Mosaic's 128-lane minor-dim rule, but a block
# of 128 LANES = TWO d=64 heads is legal: the kernel takes (1, bq, 128)
# blocks of the packed (B, S, H*D) tensor and computes both heads' attention
# in-register. No transpose anywhere; the out projection reads the packed
# layout directly.


def _attn_nhd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim, bf16_softmax):
    q = q_ref[0]  # (BQ, G) where G = lanes per group (n heads * head_dim)
    k = k_ref[0]  # (Sk, G)
    v = v_ref[0]  # (Sk, G)
    outs = []
    for h in range(q.shape[-1] // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        if bf16_softmax:
            # fp32 max-subtraction, bf16 exp: halves the VPU softmax cost;
            # exp in [0,1] so bf16's 8-bit mantissa gives ~0.4% relative
            # error — below the bf16 PV matmul error already present.
            e = jnp.exp((logits - m).astype(jnp.bfloat16))
            denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            probs = (e * jax.lax.reciprocal(denom).astype(e.dtype)).astype(v.dtype)
        else:
            e = jnp.exp(logits - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            probs = (e / denom).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                probs, v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _flash_nhd_impl(q, k, v, scale, head_dim):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, hd = q.shape
    sk = k.shape[1]
    # lanes per grid group: pack heads up to 128 lanes (two d=64 heads);
    # d >= 128 gets one head per group
    g = head_dim if head_dim % 128 == 0 else 128
    bq = sq if sq <= 1024 else 512
    bf16_softmax = q.dtype == jnp.bfloat16

    grid = (b, hd // g, sq // bq)
    out = pl.pallas_call(
        functools.partial(
            _attn_nhd_kernel, scale=scale, head_dim=head_dim,
            bf16_softmax=bf16_softmax,
        ),
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
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * (hd // head_dim) * sq * sk * head_dim,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * (hd // head_dim) * sq * sk,
        ),
        interpret=_INTERPRET,
    )(q, k, v)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_nhd(q, k, v, scale, head_dim):
    return _flash_nhd_impl(q, k, v, scale, head_dim)


def _flash_nhd_fwd(q, k, v, scale, head_dim):
    return _flash_nhd_impl(q, k, v, scale, head_dim), (q, k, v)


def _flash_nhd_bwd(scale, head_dim, res, g):
    """Exact recompute backward in the packed layout (XLA einsums)."""
    q, k, v = res
    b, sq, hd = q.shape
    h = hd // head_dim

    def split(x):
        return x.reshape(x.shape[0], x.shape[1], h, head_dim)

    qh, kh, vh, gh = split(q), split(k), split(v), split(g)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    pv = probs.astype(gh.dtype)
    dv = jnp.einsum("bhqk,bqhd->bkhd", pv, gh)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gh, vh).astype(jnp.float32)
    dsoft = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dsoft = (dsoft * scale).astype(q.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", dsoft, kh)
    dk = jnp.einsum("bhqk,bqhd->bkhd", dsoft, qh)
    rs = lambda x: x.reshape(b, x.shape[1], hd)
    return rs(dq), rs(dk), rs(dv)


_flash_nhd.defvjp(_flash_nhd_fwd, _flash_nhd_bwd)


def flash_attention_nhd(q, k, v, *, scale, head_dim):
    """Transpose-free fused attention on packed (B, S, H*D) tensors, or
    None to signal the caller to use the head-split path.

    Requirements: head_dim*n == 128 for some integer n (or head_dim % 128
    == 0), Sq/Sk % 256 == 0, Sk >= 512, TPU platform.
    """
    b, sq, hd = q.shape
    sk = k.shape[1]
    if head_dim % 128 != 0 and 128 % head_dim != 0:
        return None
    if hd % (head_dim if head_dim % 128 == 0 else 128) != 0:
        return None
    if sk < 512 or sq % 256 != 0 or sk % 256 != 0:
        return None
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon") and not _INTERPRET:
        return None
    return _flash_nhd(q, k, v, scale, head_dim)
