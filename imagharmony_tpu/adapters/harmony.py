"""Harmony-Aware (HA) fusion module — the paper's core contribution.

Fuses the "extra text" caption embedding (count + class, e.g. "eight
sheep") into the CLIP image embedding before it is projected to image
prompt tokens:

    delta = fc2(LN(flatten(fuse(reshape(fc1(img)), text)))) * scale
    image_embed <- image_embed + delta

(reference train.py:188-266 forward, applied at train.py:303-307 and
ip_adapter/ip_adapter.py:170-175.)

All four fusion variants are provided (reference train.py:210-235 +
baseline.py): ``cross_attention`` (the shipped config), ``qformer``,
``mlp`` and ``gated-attention``. The legacy fixed-shape Composed_Attention
(reference shared_models.py:88-171) is the ``legacy_composed_config()``
preset of the same math, generalized to any batch size (the reference
hardcodes batch 1 at shared_models.py:112-114).

Deliberate divergences from the reference (documented, not accidental):
* The LN/fc2 input width is computed from the *actual* fusion output
  (the reference always sizes it for the cross-attention variant,
  train.py:237-239, which crashes for the others under the shipped dims).
* The HA hyperparameters serialize into checkpoints (config.to_dict) —
  closing the train/inference hand-sync footgun (reference test.py:9-15).
* No debug prints in forward (reference train.py:209,258,260).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import layers, prng

FUSION_METHODS = ("cross_attention", "qformer", "mlp", "gated-attention")


@dataclasses.dataclass(frozen=True)
class HarmonyConfig:
    """Defaults = the shipped training config (reference run.sh:17-20,
    test.py:12-15)."""

    image_hidden_size: int = 1280
    text_context_dim: int = 2048
    inter_dim: int = 2560
    cross_heads: int = 8
    reshape_blocks: int = 8
    cross_value_dim: int = 64
    scale: float = 1.0
    fusion_method: str = "cross_attention"
    qformer_queries: int = 16
    qformer_layers: int = 1
    qformer_ff_dim: int = 2048  # torch TransformerEncoderLayer default
    mlp_tokens: int = 16
    gate_hidden_dim: int = 512

    @property
    def query_dim(self) -> int:
        return self.inter_dim // self.reshape_blocks

    @property
    def flattened_dim(self) -> int:
        if self.fusion_method == "cross_attention":
            return self.cross_heads * self.cross_value_dim * self.reshape_blocks
        if self.fusion_method == "qformer":
            return self.qformer_queries * self.query_dim
        return self.mlp_tokens * self.query_dim

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items() if k in {f.name for f in dataclasses.fields(cls)}})


def legacy_composed_config(**overrides) -> HarmonyConfig:
    """The older Composed_Attention shape (reference shared_models.py:93-122):
    4 blocks of 640, 10 heads, value dim 32."""
    base = dict(inter_dim=2560, reshape_blocks=4, cross_heads=10, cross_value_dim=32)
    base.update(overrides)
    return HarmonyConfig(**base)


def tiny_config(**overrides) -> HarmonyConfig:
    base = dict(
        image_hidden_size=24,
        text_context_dim=80,
        inter_dim=64,
        cross_heads=2,
        reshape_blocks=4,
        cross_value_dim=8,
        qformer_ff_dim=32,
        gate_hidden_dim=16,
    )
    base.update(overrides)
    return HarmonyConfig(**base)


# ---------------------------------------------------------------------------
# Fusion variants
# ---------------------------------------------------------------------------


def _cross_attention_init(key, cfg: HarmonyConfig, *, dtype):
    """Multi-head cross-attn with separately-sized value dim
    (reference attention_processor.py:12-56)."""
    qd, h, vd = cfg.query_dim, cfg.cross_heads, cfg.cross_value_dim
    hd = qd // h
    k = prng.split(key, 4)
    return {
        "to_q": layers.linear_init(k[0], qd, h * hd, dtype=dtype),
        "to_k": layers.linear_init(k[1], cfg.text_context_dim, h * hd, dtype=dtype),
        "to_v": layers.linear_init(k[2], cfg.text_context_dim, h * vd, dtype=dtype),
        "out_proj": layers.linear_init(k[3], h * vd, h * vd, dtype=dtype),
    }


def _cross_attention(p, cfg, x, text, *, policy):
    b, n, _ = x.shape
    h = cfg.cross_heads
    hd = cfg.query_dim // h
    vd = cfg.cross_value_dim
    q = layers.linear(p["to_q"], x, policy=policy).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
    k = layers.linear(p["to_k"], text, policy=policy).reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
    v = layers.linear(p["to_v"], text, policy=policy).reshape(b, -1, h, vd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    # reference divides by sqrt(head_dim) (attention_processor.py:23,45)
    probs = jax.nn.softmax(logits / (hd**0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, h * vd)
    return layers.linear(p["out_proj"], o, policy=policy)


def _qformer_init(key, cfg: HarmonyConfig, *, dtype):
    """Learned queries + post-LN transformer encoder over
    concat[queries, image, text] with modality embeddings
    (reference baseline.py:5-64)."""
    d = cfg.query_dim
    k = iter(prng.split(key, 4 + 6 * cfg.qformer_layers))
    p = {
        "query_tokens": next(k).normal((1, cfg.qformer_queries, d), dtype),
        "modality_embed": layers.embedding_init(next(k), 2, d, dtype=dtype),
        "image_proj": layers.linear_init(next(k), d, d, dtype=dtype),
        "text_proj": layers.linear_init(next(k), cfg.text_context_dim, d, dtype=dtype),
        "transformer": {"layers": []},
    }
    for _ in range(cfg.qformer_layers):
        p["transformer"]["layers"].append(
            {
                "self_attn": {
                    "in_proj": {
                        "weight": next(k).normal((d, 3 * d), dtype, stddev=d**-0.5),
                        "bias": np.zeros((3 * d,), dtype),
                    },
                    "out_proj": layers.linear_init(next(k), d, d, dtype=dtype),
                },
                "linear1": layers.linear_init(next(k), d, cfg.qformer_ff_dim, dtype=dtype),
                "linear2": layers.linear_init(next(k), cfg.qformer_ff_dim, d, dtype=dtype),
                "norm1": layers.layer_norm_init(d, dtype=dtype),
                "norm2": layers.layer_norm_init(d, dtype=dtype),
            }
        )
    return p


def _qformer_layer(p, x, heads, *, policy):
    """torch TransformerEncoderLayer semantics: post-LN, ReLU FFN."""
    b, s, d = x.shape
    qkv = jnp.dot(policy.cast(x), policy.cast(p["self_attn"]["in_proj"]["weight"]))
    qkv = qkv + policy.cast(p["self_attn"]["in_proj"]["bias"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // heads

    def hsplit(t):
        return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = hsplit(q), hsplit(k), hsplit(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (hd**-0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, s, d)
    o = layers.linear(p["self_attn"]["out_proj"], o, policy=policy)
    x = layers.layer_norm(p["norm1"], x + o, policy=policy)
    h = jax.nn.relu(layers.linear(p["linear1"], x, policy=policy))
    h = layers.linear(p["linear2"], h, policy=policy)
    return layers.layer_norm(p["norm2"], x + h, policy=policy)


def _qformer(p, cfg, x, text, *, policy):
    b = x.shape[0]
    img = layers.linear(p["image_proj"], x, policy=policy)
    txt = layers.linear(p["text_proj"], text, policy=policy)
    kv = jnp.concatenate([img, txt], axis=1)
    mod_ids = jnp.concatenate(
        [jnp.zeros((img.shape[1],), jnp.int32), jnp.ones((txt.shape[1],), jnp.int32)]
    )
    kv = kv + layers.embedding(p["modality_embed"], mod_ids, policy=policy)[None]
    queries = jnp.broadcast_to(
        policy.cast(p["query_tokens"]), (b,) + p["query_tokens"].shape[1:]
    )
    seq = jnp.concatenate([queries, kv], axis=1)
    for lp in p["transformer"]["layers"]:
        seq = _qformer_layer(lp, seq, cfg.cross_heads, policy=policy)
    return seq[:, : cfg.qformer_queries]


def _mlp_init(key, cfg: HarmonyConfig, *, dtype):
    d = cfg.query_dim
    k = iter(prng.split(key, 5))
    return {
        "image_proj": layers.linear_init(next(k), d, d, dtype=dtype),
        "text_proj": layers.linear_init(next(k), cfg.text_context_dim, d, dtype=dtype),
        "mlp": {
            "0": layers.linear_init(next(k), 2 * d, d, dtype=dtype),
            "2": layers.linear_init(next(k), d, d, dtype=dtype),
            "4": layers.linear_init(next(k), d, d * cfg.mlp_tokens, dtype=dtype),
        },
    }


def _mlp(p, cfg, x, text, *, policy):
    """Mean-pool both modalities, concat, 3-layer ReLU MLP → N tokens
    (reference baseline.py:67-98)."""
    b = x.shape[0]
    img = layers.linear(p["image_proj"], jnp.mean(x, axis=1), policy=policy)
    txt = layers.linear(p["text_proj"], jnp.mean(text, axis=1), policy=policy)
    h = jnp.concatenate([img, txt], axis=-1)
    h = jax.nn.relu(layers.linear(p["mlp"]["0"], h, policy=policy))
    h = jax.nn.relu(layers.linear(p["mlp"]["2"], h, policy=policy))
    h = layers.linear(p["mlp"]["4"], h, policy=policy)
    return h.reshape(b, cfg.mlp_tokens, cfg.query_dim)


def _gated_init(key, cfg: HarmonyConfig, *, dtype):
    d = cfg.query_dim
    k = iter(prng.split(key, 5))
    return {
        "img_proj": layers.linear_init(next(k), d, d, dtype=dtype),
        "txt_proj": layers.linear_init(next(k), cfg.text_context_dim, d, dtype=dtype),
        "fusion": {
            "gate_mlp": {
                "0": layers.linear_init(next(k), 2 * d, cfg.gate_hidden_dim, dtype=dtype),
                "2": layers.linear_init(next(k), cfg.gate_hidden_dim, 1, dtype=dtype),
            }
        },
        "dim_transfer": layers.linear_init(next(k), d, d * cfg.mlp_tokens, dtype=dtype),
    }


def _gated(p, cfg, x, text, *, policy):
    """Sigmoid-gated convex mix α·img + (1-α)·txt
    (reference baseline.py:103-151)."""
    b = x.shape[0]
    img = layers.linear(p["img_proj"], jnp.mean(x, axis=1), policy=policy)
    txt = layers.linear(p["txt_proj"], jnp.mean(text, axis=1), policy=policy)
    g = jax.nn.relu(
        layers.linear(p["fusion"]["gate_mlp"]["0"], jnp.concatenate([img, txt], -1), policy=policy)
    )
    alpha = jax.nn.sigmoid(layers.linear(p["fusion"]["gate_mlp"]["2"], g, policy=policy))
    fused = alpha * img + (1.0 - alpha) * txt
    out = layers.linear(p["dim_transfer"], fused, policy=policy)
    return out.reshape(b, cfg.mlp_tokens, cfg.query_dim)


_FUSION_INIT = {
    "cross_attention": _cross_attention_init,
    "qformer": _qformer_init,
    "mlp": _mlp_init,
    "gated-attention": _gated_init,
}
_FUSION_APPLY = {
    "cross_attention": _cross_attention,
    "qformer": _qformer,
    "mlp": _mlp,
    "gated-attention": _gated,
}


# ---------------------------------------------------------------------------
# HarmonyAttention
# ---------------------------------------------------------------------------


def init(key, cfg: HarmonyConfig, *, dtype=jnp.float32):
    if cfg.fusion_method not in FUSION_METHODS:
        raise ValueError(f"unknown fusion_method {cfg.fusion_method!r}")
    k1, k2, k3 = prng.split(key, 3)
    return {
        "fc1": layers.linear_init(k1, cfg.image_hidden_size, cfg.inter_dim, dtype=dtype),
        "fusion_text_image": _FUSION_INIT[cfg.fusion_method](k2, cfg, dtype=dtype),
        "ln": layers.layer_norm_init(cfg.flattened_dim, dtype=dtype),
        "fc2": layers.linear_init(k3, cfg.flattened_dim, cfg.image_hidden_size, dtype=dtype),
    }


def apply(params, cfg: HarmonyConfig, text_embeds, image_embeds, *, policy: dtypes.Policy = dtypes.DEFAULT):
    """text_embeds (B, T, text_dim), image_embeds (B, img_dim) ->
    (B, img_dim) delta to be *added* to the image embedding."""
    b = image_embeds.shape[0]
    x = layers.linear(params["fc1"], image_embeds, policy=policy)
    x = x.reshape(b, cfg.reshape_blocks, cfg.query_dim)
    fused = _FUSION_APPLY[cfg.fusion_method](
        params["fusion_text_image"], cfg, x, policy.cast(text_embeds), policy=policy
    )
    flat = fused.reshape(b, -1)
    out = layers.layer_norm(params["ln"], flat, policy=policy)
    return layers.linear(params["fc2"], out, policy=policy) * cfg.scale


def fuse_image_embeds(params, cfg: HarmonyConfig, text_embeds, image_embeds, *, policy=dtypes.DEFAULT):
    """image_embed + HA(text, image) — the composition every call site uses
    (reference train.py:304-305, ip_adapter.py:172-173)."""
    return image_embeds + apply(params, cfg, text_embeds, image_embeds, policy=policy)
