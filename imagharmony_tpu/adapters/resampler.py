"""Perceiver-style image-token resampler (IPAdapterPlus family).

Learned latent queries attend to CLIP penultimate patch features over
``depth`` attention+FFN blocks with residuals — same capability surface as
reference ip_adapter/resampler.py:81-147, including:

* K/V computed over concat(x, latents) (reference resampler.py:63);
* the fp16 stability trick (q·d^-1/4)(k·d^-1/4)ᵀ (reference
  resampler.py:71-73) — kept even though bf16 doesn't need it, for
  bit-comparable parity with torch checkpoints;
* optional positional embedding and mean-pooled latents
  (reference resampler.py:92-94,106-114,137-140).

Param keys mirror the torch module tree so IP-Adapter-Plus checkpoints load
via io/hf_import.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import layers, prng


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 1280
    depth: int = 4
    dim_head: int = 64
    heads: int = 20
    num_queries: int = 16
    embedding_dim: int = 1664
    output_dim: int = 2048
    ff_mult: int = 4
    max_seq_len: int = 257
    apply_pos_emb: bool = False
    num_latents_mean_pooled: int = 0


def plus_config(cross_attention_dim=768, clip_hidden_size=1280, num_tokens=16) -> ResamplerConfig:
    """IPAdapterPlus (SD1.5): dim=cross_attn, depth 4, 12 heads
    (reference ip_adapter/ip_adapter.py:350-359)."""
    return ResamplerConfig(
        dim=cross_attention_dim, depth=4, dim_head=64, heads=12,
        num_queries=num_tokens, embedding_dim=clip_hidden_size,
        output_dim=cross_attention_dim, ff_mult=4,
    )


def plus_xl_config(clip_hidden_size=1664, num_tokens=16) -> ResamplerConfig:
    """IPAdapterPlusXL: dim 1280, 20 heads, output 2048
    (reference ip_adapter/ip_adapter.py:392-402)."""
    return ResamplerConfig(
        dim=1280, depth=4, dim_head=64, heads=20,
        num_queries=num_tokens, embedding_dim=clip_hidden_size,
        output_dim=2048, ff_mult=4,
    )


def tiny_config(**overrides) -> ResamplerConfig:
    base = dict(
        dim=32, depth=2, dim_head=8, heads=4, num_queries=4,
        embedding_dim=24, output_dim=40, ff_mult=2,
    )
    base.update(overrides)
    return ResamplerConfig(**base)


def _perceiver_attn_init(key, cfg, *, dtype):
    inner = cfg.dim_head * cfg.heads
    k = prng.split(key, 3)
    return {
        "norm1": layers.layer_norm_init(cfg.dim, dtype=dtype),
        "norm2": layers.layer_norm_init(cfg.dim, dtype=dtype),
        "to_q": layers.linear_init(k[0], cfg.dim, inner, bias=False, dtype=dtype),
        "to_kv": layers.linear_init(k[1], cfg.dim, inner * 2, bias=False, dtype=dtype),
        "to_out": layers.linear_init(k[2], inner, cfg.dim, bias=False, dtype=dtype),
    }


def _ff_init(key, dim, mult, *, dtype):
    k1, k2 = prng.split(key, 2)
    return {
        "0": layers.layer_norm_init(dim, dtype=dtype),
        "1": layers.linear_init(k1, dim, dim * mult, bias=False, dtype=dtype),
        "3": layers.linear_init(k2, dim * mult, dim, bias=False, dtype=dtype),
    }


def init(key, cfg: ResamplerConfig, *, dtype=jnp.float32):
    k = iter(prng.split(key, cfg.depth * 2 + 8))
    params = {
        "latents": next(k).normal((1, cfg.num_queries, cfg.dim), dtype, stddev=cfg.dim**-0.5),
        "proj_in": layers.linear_init(next(k), cfg.embedding_dim, cfg.dim, dtype=dtype),
        "proj_out": layers.linear_init(next(k), cfg.dim, cfg.output_dim, dtype=dtype),
        "norm_out": layers.layer_norm_init(cfg.output_dim, dtype=dtype),
        "layers": [
            {
                "0": _perceiver_attn_init(next(k), cfg, dtype=dtype),
                "1": _ff_init(next(k), cfg.dim, cfg.ff_mult, dtype=dtype),
            }
            for _ in range(cfg.depth)
        ],
    }
    if cfg.apply_pos_emb:
        params["pos_emb"] = layers.embedding_init(
            next(k), cfg.max_seq_len, cfg.embedding_dim, dtype=dtype
        )
    if cfg.num_latents_mean_pooled > 0:
        params["to_latents_from_mean_pooled_seq"] = {
            "0": layers.layer_norm_init(cfg.dim, dtype=dtype),
            "1": layers.linear_init(
                next(k), cfg.dim, cfg.dim * cfg.num_latents_mean_pooled, dtype=dtype
            ),
        }
    return params


def _perceiver_attn(p, x, latents, cfg, *, policy):
    xn = layers.layer_norm(p["norm1"], x, policy=policy)
    ln = layers.layer_norm(p["norm2"], latents, policy=policy)
    b, l, _ = ln.shape
    h, dh = cfg.heads, cfg.dim_head

    q = layers.linear(p["to_q"], ln, policy=policy)
    kv_in = jnp.concatenate([xn, ln], axis=-2)
    kv = layers.linear(p["to_kv"], kv_in, policy=policy)
    k, v = jnp.split(kv, 2, axis=-1)

    def heads_first(t):
        return t.reshape(b, t.shape[1], h, dh).transpose(0, 2, 1, 3)

    q, k, v = heads_first(q), heads_first(k), heads_first(v)
    scale = dh**-0.25
    w = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, h * dh)
    return layers.linear(p["to_out"], out, policy=policy)


def apply(params, cfg: ResamplerConfig, x, *, policy: dtypes.Policy = dtypes.DEFAULT):
    """x (B, P, embedding_dim) CLIP patch features ->
    (B, num_queries [+ mean_pooled], output_dim) prompt tokens."""
    b = x.shape[0]
    if "pos_emb" in params:
        pos = layers.embedding(params["pos_emb"], jnp.arange(x.shape[1]), policy=policy)
        x = x + pos[None]

    latents = jnp.broadcast_to(
        policy.cast(params["latents"]), (b,) + params["latents"].shape[1:]
    )
    x = layers.linear(params["proj_in"], x, policy=policy)

    if "to_latents_from_mean_pooled_seq" in params:
        p = params["to_latents_from_mean_pooled_seq"]
        pooled = jnp.mean(x, axis=1)
        pooled = layers.layer_norm(p["0"], pooled, policy=policy)
        extra = layers.linear(p["1"], pooled, policy=policy)
        extra = extra.reshape(b, cfg.num_latents_mean_pooled, cfg.dim)
        latents = jnp.concatenate([extra, latents], axis=-2)

    for layer in params["layers"]:
        latents = _perceiver_attn(layer["0"], x, latents, cfg, policy=policy) + latents
        ffp = layer["1"]
        h = layers.layer_norm(ffp["0"], latents, policy=policy)
        h = layers.linear(ffp["1"], h, policy=policy)
        h = layers.gelu(h)
        latents = layers.linear(ffp["3"], h, policy=policy) + latents

    out = layers.linear(params["proj_out"], latents, policy=policy)
    return layers.layer_norm(params["norm_out"], out, policy=policy)
