"""Multi-head attention with a decoupled image-prompt (IP) branch.

TPU-first redesign of the reference's attention-processor layer
(reference: ip_adapter/attention_processor.py). Differences by design:

* The reference concatenates 4 image tokens onto the text tokens and has
  every processor re-split them at call time (attention_processor.py:402-406).
  Here text context and IP context are *separate tensors* end-to-end, and the
  per-layer variant (self / cross / cross+ip) is a static config on the UNet,
  not a runtime monkey-patch (reference ip_adapter.py:99-133).
* Softmax runs in fp32 regardless of compute dtype (TPU VPU is fast enough
  that this costs ~nothing and matches torch SDPA's internal upcast).
* ``backend="pallas"`` routes the big latent self-attention through the
  fused Pallas kernel (kernels/flash_attention.py); the text and IP cross
  branches have tiny key lengths (77 / 4 tokens) where XLA's fused softmax
  is already optimal, so they stay on XLA by design.

Shapes: sequences are (B, S, D_model); heads are folded/unfolded locally so
XLA sees large fused matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import layers

# Global default backend; pipelines override per-call.
_DEFAULT_BACKEND = "xla"


def set_default_backend(name: str):
    global _DEFAULT_BACKEND
    assert name in ("xla", "pallas")
    _DEFAULT_BACKEND = name


def default_backend() -> str:
    return _DEFAULT_BACKEND


# ---------------------------------------------------------------------------
# Core scaled-dot-product attention
# ---------------------------------------------------------------------------


def _split_heads(x, heads):
    b, s, d = x.shape
    return x.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def sdpa(q, k, v, *, scale=None, mask=None, backend=None):
    """softmax(q k^T * scale) v with fp32 softmax.

    q: (B, H, Sq, D); k, v: (B, H, Sk, D); mask: broadcastable to
    (B, H, Sq, Sk), additive.
    """
    backend = backend or _DEFAULT_BACKEND
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    if backend == "pallas" and mask is None:
        from imagharmony_tpu.kernels import flash_attention

        out = flash_attention.flash_attention(q, k, v, scale=scale)
        if out is not None:
            return out
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def attention_probs(q, k, *, scale=None, mask=None):
    """Explicit attention probabilities (observability path, small K only)."""
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    return jax.nn.softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# UNet/Transformer attention layer (optionally with decoupled IP branch)
# ---------------------------------------------------------------------------


def attention_init(
    key,
    query_dim,
    *,
    heads,
    head_dim=None,
    context_dim=None,
    with_ip=False,
    qkv_bias=False,
    out_bias=True,
    dtype=jnp.float32,
):
    """Init the attention layer used by SDXL transformer blocks.

    with_ip adds the decoupled image-prompt K/V projections — the trainable
    surface of the IP-Adapter (reference attention_processor.py:361-362).
    Note the reference instantiates these on *every* cross-attn layer but
    only uses them on the target block (skip=True elsewhere); we mirror the
    param layout so checkpoints round-trip, while the apply path is static.
    """
    from imagharmony_tpu.nn import prng

    inner = heads * (head_dim or query_dim // heads)
    ctx = context_dim or query_dim
    keys = prng.split(key, 6)
    params = {
        "to_q": layers.linear_init(keys[0], query_dim, inner, bias=qkv_bias, dtype=dtype),
        "to_k": layers.linear_init(keys[1], ctx, inner, bias=qkv_bias, dtype=dtype),
        "to_v": layers.linear_init(keys[2], ctx, inner, bias=qkv_bias, dtype=dtype),
        "to_out": layers.linear_init(keys[3], inner, query_dim, bias=out_bias, dtype=dtype),
    }
    if with_ip:
        params["to_k_ip"] = layers.linear_init(keys[4], ctx, inner, bias=False, dtype=dtype)
        params["to_v_ip"] = layers.linear_init(keys[5], ctx, inner, bias=False, dtype=dtype)
    return params


def attention(
    params,
    x,
    *,
    heads,
    context=None,
    ip_context=None,
    ip_scale=1.0,
    mask=None,
    backend=None,
    policy: dtypes.Policy = dtypes.DEFAULT,
    return_ip_probs=False,
):
    """Apply attention. context=None → self-attention.

    ip_context: (B, S_ip, ctx_dim) image-prompt tokens for the decoupled
    branch; requires ``to_k_ip``/``to_v_ip`` in params. Output is
    text_attn + ip_scale * ip_attn (reference attention_processor.py:450).

    return_ip_probs additionally returns the IP-branch attention
    probabilities (B, H, Sq, S_ip) for attention-map observability
    (reference ip_adapter/utils.py:6-79).
    """
    ctx = x if context is None else context
    if context is None and "to_qkv" in params:
        # inference-packed projections (pack_inference_params): one matmul
        q, k, v = jnp.split(layers.linear(params["to_qkv"], x, policy=policy), 3, axis=-1)
    elif "to_kv" in params:
        q = layers.linear(params["to_q"], x, policy=policy)
        k, v = jnp.split(layers.linear(params["to_kv"], ctx, policy=policy), 2, axis=-1)
    else:
        q = layers.linear(params["to_q"], x, policy=policy)
        k = layers.linear(params["to_k"], ctx, policy=policy)
        v = layers.linear(params["to_v"], ctx, policy=policy)

    # Transpose-free fast path: self-attention through the packed-layout
    # Pallas kernel skips the 4 head split/merge relayouts entirely
    # (measured several ms/UNet-call of "data formatting" HBM traffic).
    # The short-K cross paths deliberately stay on XLA: a fused Pallas
    # cross/cross+IP kernel exists (kernels/flash_attention.flash_cross_nhd)
    # and was probe-measured SLOWER than XLA's fused short-K softmax both in
    # isolation (0.68 vs 0.58 ms at Sq=4096·h=10·Sk=77) and end-to-end
    # (headline 0.299 vs 0.309 img/s) — see PERF.md levers table, round 3.
    if (
        context is None
        and mask is None
        and ip_context is None
        and (backend or _DEFAULT_BACKEND) == "pallas"
    ):
        from imagharmony_tpu.kernels import flash_attention as _fa

        head_dim = q.shape[-1] // heads
        packed = _fa.flash_attention_nhd(
            q, k, v, scale=head_dim**-0.5, head_dim=head_dim
        )
        if packed is not None:
            y = layers.linear(params["to_out"], packed, policy=policy)
            # keep the documented (y, ip_probs) contract: self-attention has
            # no IP branch, so probs are None
            return (y, None) if return_ip_probs else y

    qh = _split_heads(q, heads)
    kh = _split_heads(k, heads)
    vh = _split_heads(v, heads)
    out = sdpa(qh, kh, vh, mask=mask, backend=backend)

    ip_probs = None
    if ip_context is not None:
        k_ip = _split_heads(layers.linear(params["to_k_ip"], ip_context, policy=policy), heads)
        v_ip = _split_heads(layers.linear(params["to_v_ip"], ip_context, policy=policy), heads)
        # S_ip is tiny (4/16 tokens): both the text branch above (Sk=77,
        # below the pallas kernel's min length) and this IP branch run as
        # plain XLA einsum attention, where the fused softmax is already
        # bandwidth-optimal at these key lengths.
        ip_out = sdpa(qh, k_ip, v_ip, backend="xla")
        out = out + ip_scale * ip_out
        if return_ip_probs:
            ip_probs = attention_probs(qh, k_ip)

    y = layers.linear(params["to_out"], _merge_heads(out), policy=policy)
    if return_ip_probs:
        return y, ip_probs
    return y


def pack_inference_params(tree):
    """Inference-time transform: merge to_q/to_k/to_v into one to_qkv
    (self-attention) or to_k/to_v into to_kv (cross-attention), so each
    block issues one large projection matmul instead of three narrow ones.

    Returns a new tree; originals are removed (memory-neutral). Apply to an
    inference copy only — training/export paths expect the unpacked layout.
    Head-splitting is unaffected: concat is along the output dim and the
    per-head reshape happens after the split back into q/k/v.
    """
    import numpy as np

    def pack(mods, new_key, node):
        ws = [np.asarray(node[m]["weight"]) for m in mods]
        packed = {"weight": np.concatenate(ws, axis=-1)}
        if all("bias" in node[m] for m in mods):
            packed["bias"] = np.concatenate([np.asarray(node[m]["bias"]) for m in mods])
        node[new_key] = packed
        for m in mods:
            del node[m]

    def visit(node):
        if isinstance(node, dict):
            if {"to_q", "to_k", "to_v"} <= set(node.keys()) and "bias" not in node["to_k"]:
                # biased projections (e.g. the VAE mid-block attention) are
                # left untouched — their apply path reads to_q/k/v directly
                same_input = node["to_q"]["weight"].shape[0] == node["to_k"]["weight"].shape[0]
                if same_input and node["to_q"]["weight"].shape == node["to_k"]["weight"].shape:
                    pack(["to_q", "to_k", "to_v"], "to_qkv", node)
                else:
                    pack(["to_k", "to_v"], "to_kv", node)
            for v in node.values():
                visit(v)
        elif isinstance(node, list):
            for v in node:
                visit(v)

    import copy

    tree = copy.deepcopy(tree)
    visit(tree)
    return tree
