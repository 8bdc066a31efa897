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

Shape coverage: sequences are padded up to the 256 grid quantum and the
padded key columns are masked inside the kernel, so odd resolutions (e.g.
81×81 latents at 648²) stay on the fused path instead of silently
regressing to XLA; head dims that aren't a 64 multiple (SD1.5's 40/80/160)
are zero-padded to the quantum (exact math — zero contraction dims).
Remaining fallbacks (tiny K by design, non-TPU platform) are by design.

Backward: a Pallas kernel per (batch·head, q-block) recomputing the probs
tile in VMEM and accumulating dk/dv across q-blocks in fp32 — nothing
(Sq, Sk)-shaped ever reaches HBM, so training resolutions above 512² don't
hit a memory wall. jax.custom_vjp wires it in; an XLA einsum fallback
remains for platforms without Mosaic.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp

_INTERPRET = False  # set True to debug on CPU

_PAD = 256  # grid quantum: sequence lengths are padded to this multiple

_warned = set()


def _warn_once(key, msg):
    if key not in _warned:
        _warned.add(key)
        warnings.warn(msg, stacklevel=3)


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon") or _INTERPRET


def _use_pallas(q, k):
    sk = k.shape[-2]
    d = q.shape[-1]
    if not _on_tpu():
        return False
    if sk < 512:  # tiny-K branches: XLA softmax fusion is already optimal
        return False
    if d % 64 != 0 and sk < 2048:
        # padded head dims only pay off where the (Sq, Sk) materialization
        # hurts. On-chip (tools/probe_sd15_attn.py + r4 variants): fused
        # wins at EVERY admitted shape — d40 @ 4096 2.15x, d80 @ 2304 1.88x,
        # d80 @ 4096 5.4x, d160 @ 2048 2.3x; below the gate d80 @ 1024 XLA
        # wins by 14% -> declined by rule.
        return False
    return True


def _mask_cols(logits, kv_valid):
    """-inf the key columns beyond kv_valid (padding mask)."""
    if kv_valid is not None and kv_valid < logits.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
        logits = jnp.where(col < kv_valid, logits, -jnp.inf)
    return logits


_LOG2E = 1.4426950408889634

# Softmax without the row-max reduce (round-3 probe,
# tools/probe_softmax_nomax.py): softmax is shift-invariant, so the
# max-subtract is only overflow protection. Clamping the exp2 argument at
# 115 (fp32 exp2 overflows at 128; logits*log2e of real attention sit far
# below) removes one full (BQ, Sk) VPU reduce pass — measured −5..12%
# kernel time. exp2 arguments stay fp32: bf16 args WITHOUT the shift would
# amplify relative error by 2^(range·2^-9) on wide-range logits, while the
# post-exp2 value cast to bf16 for the PV matmul is plain value-space
# rounding (2^-9 relative, same as before). Exact whenever the row max is
# below the clamp; saturates gracefully (never inf/nan) above it.
_EXP2_ARG_MAX = 115.0


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_valid, kb=None):
    """One (BQ, D) output tile: fused attention in VMEM.

    VPU cost levers (probe-verified, tools/probe_softmax_tricks.py):
    scale·log2(e) folded into q (a (BQ,D) multiply instead of a (BQ,Sk)
    one), exp2 instead of exp, and the softmax denominator applied AFTER
    the PV matmul on the (BQ,D) output — no (BQ,Sk)-sized VPU pass except
    exp2/sum themselves. At long Sk the no-max softmax enables rescaling-
    free k-blocked accumulation (tools/probe_attn_kblock.py, −5.6% at
    seq 4096); fully-padded key blocks are statically skipped."""
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (Sk, D)
    v = v_ref[0]  # (Sk, D)
    sk = k.shape[0]
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    if kb is None or kb >= sk:
        steps = [(0, sk)]
    else:
        steps = [(j, min(j + kb, sk)) for j in range(0, sk, kb)]
    pv = None
    denom = None
    for (j, je) in steps:
        if kv_valid is not None and j >= kv_valid:
            break
        logits = jax.lax.dot_general(
            qs, k[j:je],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if kv_valid is not None and kv_valid < je:
            logits = _mask_cols(logits, kv_valid - j)
        e = jnp.exp2(jnp.minimum(logits, _EXP2_ARG_MAX))
        pvj = jax.lax.dot_general(
            e.astype(v.dtype), v[j:je],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dj = jnp.sum(e, axis=-1, keepdims=True)
        pv = pvj if pv is None else pv + pvj
        denom = dj if denom is None else denom + dj
    o_ref[0] = (pv * jax.lax.reciprocal(denom)).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, scale, kv_len):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    sk = k.shape[2]
    kb = _kblock(sk)
    bq = _fwd_block_q(sq, kb if kb is not None else sk)

    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, sk, d)
    vr = v.reshape(b * h, sk, d)

    grid = (b * h, sq // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_valid=kv_len, kb=kb),
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


# ---------------------------------------------------------------------------
# Pallas backward: probs recomputed per q-block in VMEM, dk/dv accumulated
# in fp32 across the (sequential) q-block grid axis — no (Sq, Sk) in HBM.
# ---------------------------------------------------------------------------


def _kblock(sk):
    """K-block size for the no-max accumulative softmax (None = full K).

    Probed on v5e (tools/probe_attn_kblock.py): kb=1024 at Sk 4096 is
    −5.6% vs full-K; at Sk 1024 (the 32² self-attentions, Mosaic
    per-step-overhead-bound at ~10 TF/s) kb ∈ {128..512} is −5..8% and
    roughly flat within that range — kb=512 chosen. Below 1024 the
    sequence is short enough that blocking only adds loop overhead."""
    if sk >= 2048:
        return 1024
    if sk >= 1024:
        return 512
    return None


def _fwd_block_q(sq, sk):
    """Forward q-block: tuned on v5e, whole-row blocks win up to 1024
    (fewer K/V reloads); beyond that keep the (bq, sk) fp32 logits tile
    ≤8 MB so the kernel stays inside the 16 MB VMEM stack."""
    if sq <= 1024 and sq * sk * 4 <= (1 << 23):
        return sq
    cap = max(128, (1 << 21) // max(sk, 1))
    for cand in (512, 256, 128):
        if cand <= cap and sq % cand == 0:
            return cand
    return sq if sq < 128 else 128


def _bwd_block_q(sq, sk):
    """Backward q-block: four (bq, sk) fp32 temporaries (logits/probs/dp/
    dsoft) must fit VMEM alongside K/V and the fp32 dk/dv accumulators —
    budget ~2 MB per temporary."""
    target = max(64, min(512, (1 << 19) // max(sk, 1)))
    for cand in (512, 256, 128, 64):
        if cand <= target and sq % cand == 0:
            return cand
    return sq  # sq < 64 (already a legal single block)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale, kv_valid):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    q = q_ref[0]   # (BQ, D)
    k = k_ref[0]   # (Sk, D)
    v = v_ref[0]   # (Sk, D)
    do = do_ref[0]  # (BQ, D)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = _mask_cols(logits * scale, kv_valid)
    # no-max softmax (same clamp rationale as the forward, _EXP2_ARG_MAX;
    # natural exp here, fp32 overflow at 88 → clamp 80)
    e = jnp.exp(jnp.minimum(logits, 80.0))
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom  # fp32 (BQ, Sk); masked cols are exactly 0

    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(dp * probs, axis=-1, keepdims=True)
    dsoft = probs * (dp - delta) * scale  # fp32

    dsoft_c = dsoft.astype(q.dtype)
    probs_c = probs.astype(v.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsoft_c, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += jax.lax.dot_general(
        dsoft_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[0] += jax.lax.dot_general(
        probs_c, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_bwd_impl(q, k, v, g, scale, kv_len):
    """Pallas backward on (B, H, S, D) tensors -> (dq, dk, dv)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq = _bwd_block_q(sq, sk)

    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, sk, d)
    vr = v.reshape(b * h, sk, d)
    gr = g.reshape(b * h, sq, d)

    grid = (b * h, sq // bq)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, kv_valid=kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            # dk/dv revisit the same block every j step: fp32 accumulators
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sk, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, sk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the fp32 dk/dv accumulators + 4 (bq, sk) temporaries brush the
            # default 16 MB scoped-VMEM ceiling at Sk ≥ 6k; v5e has headroom
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * b * h * sq * sk * d,
            bytes_accessed=3 * (qr.size + kr.size + vr.size + gr.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=_INTERPRET,
    )(qr, kr, vr, gr)
    rs = lambda x, s: x.reshape(b, h, s, d)
    return (
        rs(dq, sq),
        rs(dk, sk).astype(k.dtype),
        rs(dv, sk).astype(v.dtype),
    )


def _bwd_xla(q, k, v, g, scale, kv_len):
    """Einsum fallback backward (exact; materializes (Sq, Sk) probs)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = _mask_cols(logits * scale, kv_len)
    probs = jax.nn.softmax(logits, axis=-1)
    pv = probs.astype(g.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", pv, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v).astype(jnp.float32)
    dsoft = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dsoft = (dsoft * scale).astype(q.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", dsoft, k)
    dk = jnp.einsum("bhqk,bhqd->bhkd", dsoft, q)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale, kv_len):
    return _flash_fwd_impl(q, k, v, scale, kv_len)


def _flash_fwd(q, k, v, scale, kv_len):
    return _flash_fwd_impl(q, k, v, scale, kv_len), (q, k, v)


def _flash_bwd(scale, kv_len, res, g):
    q, k, v = res
    if _on_tpu():
        return _flash_bwd_impl(q, k, v, g, scale, kv_len)
    return _bwd_xla(q, k, v, g, scale, kv_len)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _pad_seq(x, axis, to):
    pad = (-x.shape[axis]) % to
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(q, k, v, *, scale):
    """Fused attention, or None to signal XLA fallback.

    q: (B, H, Sq, D); k, v: (B, H, Sk, D). No mask support (the UNet's
    latent self-attention is unmasked; masked paths use XLA). Sequences
    are padded to the 256 quantum internally (padded keys masked), so any
    resolution stays on the fused path. Head dims that aren't a multiple
    of 64 (SD1.5's 40/80/160) are zero-padded to the quantum — exact math:
    zero contraction dims don't change the logits, and the padded v
    columns produce zero output columns that are sliced away.
    """
    if not _use_pallas(q, k):
        return None
    sq, sk = q.shape[-2], k.shape[-2]
    d = q.shape[-1]
    qp = _pad_seq(q, 2, _PAD)
    kp = _pad_seq(k, 2, _PAD)
    vp = _pad_seq(v, 2, _PAD)
    dpad = (-d) % 64
    if dpad:
        widths = ((0, 0), (0, 0), (0, 0), (0, dpad))
        qp = jnp.pad(qp, widths)
        kp = jnp.pad(kp, widths)
        vp = jnp.pad(vp, widths)
    out = _flash(qp, kp, vp, scale, sk)
    if qp.shape[2] != sq:
        out = out[:, :, :sq, :]
    if dpad:
        out = out[..., :d]
    return out


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


def _attn_nhd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim,
                     kv_valid, kb=None):
    q = q_ref[0]  # (BQ, G) where G = lanes per group (n heads * head_dim)
    k = k_ref[0]  # (Sk, G)
    v = v_ref[0]  # (Sk, G)
    sk = k.shape[0]
    outs = []
    for h in range(q.shape[-1] // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # scale·log2(e) folded into the (BQ,D) q slice; denominator applied
        # after PV on the (BQ,D) output: removes both (BQ,Sk)-sized VPU
        # multiplies (probe: −19/−22% kernel time at seq 4096,
        # tools/probe_softmax_tricks.py)
        qs = (q[:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
        if kb is not None and kb < sk:
            # K-blocked accumulation (tools/probe_attn_kblock.py: −5.6% at
            # seq 4096): the no-max softmax has no running max, so flash-
            # style k-blocking is PURE accumulation — no rescaling. The
            # unrolled block loop gives Mosaic independent MXU (qk, pv) and
            # VPU (exp2, sum) work to software-pipeline, and the logits
            # tile shrinks from (BQ, Sk) to (BQ, KB). Blocks that are
            # entirely key-padding (j >= kv_valid) are statically skipped.
            pv = None
            denom = None
            j = 0
            while j < sk:
                je = min(j + kb, sk)
                if kv_valid is not None and j >= kv_valid:
                    break
                logits = jax.lax.dot_general(
                    qs, k[j:je, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if kv_valid is not None and kv_valid < je:
                    logits = _mask_cols(logits, kv_valid - j)
                e = jnp.exp2(jnp.minimum(logits, _EXP2_ARG_MAX))
                pvj = jax.lax.dot_general(
                    e.astype(v.dtype), v[j:je, sl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dj = jnp.sum(e, axis=-1, keepdims=True)
                pv = pvj if pv is None else pv + pvj
                denom = dj if denom is None else denom + dj
                j = je
            outs.append(pv * jax.lax.reciprocal(denom))
            continue
        logits = jax.lax.dot_general(
            qs, k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = _mask_cols(logits, kv_valid)
        # no-max softmax with a clamped fp32 exp2 argument (see
        # _EXP2_ARG_MAX); the (BQ,Sk) VPU passes are now exp2 + sum only.
        # (The MXU ones-column denominator variant that used to live here
        # was superseded by k-blocking — probe record in PERF.md.)
        e = jnp.exp2(jnp.minimum(logits, _EXP2_ARG_MAX))
        denom = jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            e.astype(v.dtype), v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(pv * jax.lax.reciprocal(denom))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _flash_nhd_impl(q, k, v, scale, head_dim, kv_len):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, hd = q.shape
    sk = k.shape[1]
    # lanes per grid group: pack heads up to 128 lanes (two d=64 heads);
    # d >= 128 gets one head per group
    g = head_dim if head_dim % 128 == 0 else 128
    # k-blocked accumulation at long Sk (probe −5.6% at 4096, −5..8% at
    # 1024); it supersedes the MXU ones-column denominator (probe: kblock +
    # VPU block-sums beat full-K + mxu_sum at every (bq, kb) tried). NOTE:
    # sk here is the 256-quantum PADDED length while _use_pallas gates on
    # the unpadded Sk — intentional: the kernel's tile sizes are what VMEM
    # sees, so the k-block threshold keys off the padded extent (original
    # Sk 1793..2047 pads to 2048 and k-blocks; the dispatch gate still saw
    # <2048).
    kb = _kblock(sk)
    bq = _fwd_block_q(sq, kb if kb is not None else sk)

    grid = (b, hd // g, sq // bq)
    out = pl.pallas_call(
        functools.partial(
            _attn_nhd_kernel, scale=scale, head_dim=head_dim,
            kv_valid=kv_len, kb=kb,
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_nhd(q, k, v, scale, head_dim, kv_len):
    return _flash_nhd_impl(q, k, v, scale, head_dim, kv_len)


def _flash_nhd_fwd(q, k, v, scale, head_dim, kv_len):
    return _flash_nhd_impl(q, k, v, scale, head_dim, kv_len), (q, k, v)


def _flash_nhd_bwd(scale, head_dim, kv_len, res, g):
    """Backward in the packed layout: relayout to (B, H, S, D) and reuse the
    Pallas backward (transpose cost ≪ an (Sq, Sk) HBM materialization)."""
    q, k, v = res
    b, sq, hd = q.shape
    h = hd // head_dim

    def split(x):
        return x.reshape(b, x.shape[1], h, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh, gh = split(q), split(k), split(v), split(g)
    if _on_tpu():
        dq, dk, dv = _flash_bwd_impl(qh, kh, vh, gh, scale, kv_len)
    else:
        dq, dk, dv = _bwd_xla(qh, kh, vh, gh, scale, kv_len)

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(b, x.shape[2], hd)

    return merge(dq), merge(dk), merge(dv)


_flash_nhd.defvjp(_flash_nhd_fwd, _flash_nhd_bwd)


def _nhd_lane_group(head_dim, hd):
    """Lanes per grid group for packed (B, S, H·D) kernels, or None if the
    packing is illegal (head_dim doesn't tile into 128 lanes)."""
    if head_dim % 128 != 0 and 128 % head_dim != 0:
        return None
    g = head_dim if head_dim % 128 == 0 else 128
    if hd % g != 0:
        return None
    return g


def flash_attention_nhd(q, k, v, *, scale, head_dim):
    """Transpose-free fused attention on packed (B, S, H*D) tensors, or
    None to signal the caller to use the head-split path.

    Requirements: head_dim*n == 128 for some integer n (or head_dim % 128
    == 0), Sk >= 512, TPU platform. Sequence lengths are padded to the 256
    quantum internally (padded keys masked).
    """
    b, sq, hd = q.shape
    sk = k.shape[1]
    if not _on_tpu():
        return None
    if sk < 512:
        return None
    if head_dim % 128 != 0 and 128 % head_dim != 0:
        _warn_once(
            ("nhd_head_dim", head_dim),
            f"flash_attention_nhd: head_dim={head_dim} doesn't pack into "
            "128 lanes; using the head-split path",
        )
        return None
    if hd % (head_dim if head_dim % 128 == 0 else 128) != 0:
        _warn_once(
            ("nhd_lanes", hd, head_dim),
            f"flash_attention_nhd: model dim {hd} isn't a whole number of "
            "128-lane head groups; using the head-split path",
        )
        return None
    qp = _pad_seq(q, 1, _PAD)
    kp = _pad_seq(k, 1, _PAD)
    vp = _pad_seq(v, 1, _PAD)
    out = _flash_nhd(qp, kp, vp, scale, head_dim, sk)
    if qp.shape[1] != sq:
        out = out[:, :sq, :]
    return out


# ---------------------------------------------------------------------------
# Fused CROSS attention (text Sk=77 / decoupled text+IP), packed layout
# ---------------------------------------------------------------------------
#
# The ~70 text cross-attentions per UNet call run as XLA einsums: at Sq 4096
# that materializes (Sq, 77) fp32 logits + probs in HBM per instance plus
# the 4 head split/merge transposes. These kernels keep the short-K softmax
# in VMEM on the packed (B, S, H·D) tensors — one HBM read of q/k/v, one
# write of out. The decoupled variant (SURVEY §7: the IP branch is just a
# second KV set with K-length 4) additionally fuses
# out = softmax(q k_t) v_t + softmax(q k_ip) (ip_scale·v_ip)
# in the same q pass, replacing the two-call XLA pair on the active IP
# layer (reference attention_processor.py:423,440-442 roles).

_CROSS_PAD = 128  # short-K quantum (77 -> 128, 4 -> 128)


def _cross_ip_nhd_kernel(q_ref, k_ref, v_ref, kip_ref, vip_ref, o_ref, *,
                         scale, head_dim, bf16_softmax, kv_valid, ip_valid):
    q = q_ref[0]      # (BQ, G)
    k = k_ref[0]      # (SkT, G)
    v = v_ref[0]
    kip = kip_ref[0]  # (SkI, G)
    vip = vip_ref[0]  # pre-scaled by ip_scale (softmax is v-scale invariant)
    outs = []
    for h in range(q.shape[-1] // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qs = (q[:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

        def branch(kb, vb, valid):
            logits = jax.lax.dot_general(
                qs, kb[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = _mask_cols(logits, valid)
            m = jnp.max(logits, axis=-1, keepdims=True)
            if bf16_softmax:
                e = jnp.exp2((logits - m).astype(jnp.bfloat16))
                denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            else:
                e = jnp.exp2(logits - m)
                denom = jnp.sum(e, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                e.astype(vb.dtype), vb[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return pv * jax.lax.reciprocal(denom)

        out = branch(k, v, kv_valid)
        if kip is not None:
            out = out + branch(kip, vip, ip_valid)
        outs.append(out)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _cross_nhd_impl(q, k, v, kip, vip, scale, head_dim, kv_len, ip_len):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, hd = q.shape
    skt = k.shape[1]
    g = _nhd_lane_group(head_dim, hd)
    bq = _fwd_block_q(sq, skt)
    bf16_softmax = q.dtype == jnp.bfloat16
    with_ip = kip is not None
    heads_per_group = g // head_dim

    kernel = functools.partial(
        _cross_ip_nhd_kernel, scale=scale, head_dim=head_dim,
        bf16_softmax=bf16_softmax, kv_valid=kv_len, ip_valid=ip_len,
    )
    if not with_ip:
        def kernel(qr, kr, vr, o, _k=None):  # text-only: drop the IP refs
            _cross_ip_nhd_kernel(
                qr, kr, vr, _NoRef, _NoRef, o, scale=scale,
                head_dim=head_dim, bf16_softmax=bf16_softmax,
                kv_valid=kv_len, ip_valid=ip_len,
            )

    in_specs = [
        pl.BlockSpec((1, bq, g), lambda i, hp, j: (i, j, hp)),
        pl.BlockSpec((1, skt, g), lambda i, hp, j: (i, 0, hp)),
        pl.BlockSpec((1, skt, g), lambda i, hp, j: (i, 0, hp)),
    ]
    args = [q, k, v]
    if with_ip:
        ski = kip.shape[1]
        in_specs += [
            pl.BlockSpec((1, ski, g), lambda i, hp, j: (i, 0, hp)),
            pl.BlockSpec((1, ski, g), lambda i, hp, j: (i, 0, hp)),
        ]
        args += [kip, vip]

    grid = (b, hd // g, sq // bq)
    sk_total = skt + (kip.shape[1] if with_ip else 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, g), lambda i, hp, j: (i, j, hp)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * (hd // head_dim) * sq * sk_total * head_dim,
            bytes_accessed=(2 * q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * (hd // head_dim) * sq * sk_total,
        ),
        interpret=_INTERPRET,
    )(*args)
    return out


class _NoRefT:
    """Sentinel standing in for an absent kernel ref (text-only path)."""

    def __getitem__(self, _):
        return None


_NoRef = _NoRefT()


def _cross_xla_bwd(q, k, v, g, scale, kv_len, head_dim):
    """XLA backward for the short-K cross branch: (Sq, 77) probs are ~1 MB
    per head — no memory wall, so einsum is the right backward here."""
    b, sq, hd = q.shape
    h = hd // head_dim

    def split(x):
        return x.reshape(b, x.shape[1], h, head_dim).transpose(0, 2, 1, 3)

    dq, dk, dv = _bwd_xla(split(q), split(k), split(v), split(g), scale, kv_len)

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(b, x.shape[2], hd)

    return merge(dq), merge(dk), merge(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_cross(q, k, v, scale, head_dim, kv_len):
    return _cross_nhd_impl(q, k, v, None, None, scale, head_dim, kv_len, None)


def _flash_cross_fwd(q, k, v, scale, head_dim, kv_len):
    return _flash_cross(q, k, v, scale, head_dim, kv_len), (q, k, v)


def _flash_cross_bwd(scale, head_dim, kv_len, res, g):
    q, k, v = res
    return _cross_xla_bwd(q, k, v, g, scale, kv_len, head_dim)


_flash_cross.defvjp(_flash_cross_fwd, _flash_cross_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_cross_ip(q, k, v, kip, vip, scale, head_dim, kv_len, ip_len):
    return _cross_nhd_impl(q, k, v, kip, vip, scale, head_dim, kv_len, ip_len)


def _flash_cross_ip_fwd(q, k, v, kip, vip, scale, head_dim, kv_len, ip_len):
    return (
        _flash_cross_ip(q, k, v, kip, vip, scale, head_dim, kv_len, ip_len),
        (q, k, v, kip, vip),
    )


def _flash_cross_ip_bwd(scale, head_dim, kv_len, ip_len, res, g):
    q, k, v, kip, vip = res
    dq_t, dk, dv = _cross_xla_bwd(q, k, v, g, scale, kv_len, head_dim)
    dq_i, dkip, dvip = _cross_xla_bwd(q, kip, vip, g, scale, ip_len, head_dim)
    return dq_t + dq_i, dk, dv, dkip, dvip


_flash_cross_ip.defvjp(_flash_cross_ip_fwd, _flash_cross_ip_bwd)


def flash_cross_nhd(q, k, v, *, scale, head_dim, k_ip=None, v_ip=None):
    """Fused short-K cross attention on packed (B, S, H·D) tensors, or None
    to signal the XLA fallback. When k_ip/v_ip are given, the decoupled IP
    branch is fused into the same pass (pre-scale v_ip by ip_scale — the
    softmax is invariant to V scaling, so this equals scale·ip_attn).

    Covers the text (Sk=77) / IP (Sk=4) key lengths the long-K kernels
    refuse; K is padded to the 128 quantum with in-kernel masking.
    """
    b, sq, hd = q.shape
    sk = k.shape[1]
    if not _on_tpu() or sk >= 512 or sq < 512:
        return None
    if _nhd_lane_group(head_dim, hd) is None:
        _warn_once(
            ("cross_lanes", hd, head_dim),
            f"flash_cross_nhd: head_dim={head_dim}/model dim {hd} don't "
            "pack into 128-lane groups; using the XLA path",
        )
        return None
    qp = _pad_seq(q, 1, _CROSS_PAD)
    kp = _pad_seq(k, 1, _CROSS_PAD)
    vp = _pad_seq(v, 1, _CROSS_PAD)
    if k_ip is not None:
        kip = _pad_seq(k_ip, 1, _CROSS_PAD)
        vip = _pad_seq(v_ip, 1, _CROSS_PAD)
        out = _flash_cross_ip(
            qp, kp, vp, kip, vip, scale, head_dim, sk, k_ip.shape[1]
        )
    else:
        out = _flash_cross(qp, kp, vp, scale, head_dim, sk)
    if qp.shape[1] != sq:
        out = out[:, :sq, :]
    return out
