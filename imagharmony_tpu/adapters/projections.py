"""Image-embedding → prompt-token projections.

The small trainable heads that turn a CLIP image embedding into
cross-attention tokens:

* ``image_proj``  — linear → reshape to N tokens → LayerNorm
  (reference ip_adapter/ip_adapter.py:28-48, shared_models.py:64-84);
* ``mlp_proj``    — per-patch Linear/GELU/Linear/LN used by IPAdapterFull
  (reference ip_adapter/ip_adapter.py:51-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import layers, prng


def image_proj_init(key, *, clip_embed_dim=1280, cross_attention_dim=2048, num_tokens=4, dtype=jnp.float32):
    k1, _ = prng.split(key, 2)
    return {
        "proj": layers.linear_init(k1, clip_embed_dim, num_tokens * cross_attention_dim, dtype=dtype),
        "norm": layers.layer_norm_init(cross_attention_dim, dtype=dtype),
    }


def image_proj(params, image_embeds, *, num_tokens=4, policy=dtypes.DEFAULT):
    """(B, clip_dim) -> (B, num_tokens, cross_dim)."""
    b = image_embeds.shape[0]
    x = layers.linear(params["proj"], image_embeds, policy=policy)
    x = x.reshape(b, num_tokens, -1)
    return layers.layer_norm(params["norm"], x, policy=policy)


def mlp_proj_init(key, *, clip_hidden_dim=1664, cross_attention_dim=2048, dtype=jnp.float32):
    k1, k2 = prng.split(key, 2)
    return {
        "proj": {
            "0": layers.linear_init(k1, clip_hidden_dim, clip_hidden_dim, dtype=dtype),
            "2": layers.linear_init(k2, clip_hidden_dim, cross_attention_dim, dtype=dtype),
            "3": layers.layer_norm_init(cross_attention_dim, dtype=dtype),
        }
    }


def mlp_proj(params, patch_embeds, *, policy=dtypes.DEFAULT):
    """(B, P, hidden) -> (B, P, cross_dim): per-patch tokens (IPAdapterFull)."""
    p = params["proj"]
    x = layers.linear(p["0"], patch_embeds, policy=policy)
    x = layers.gelu(x)
    x = layers.linear(p["2"], x, policy=policy)
    return layers.layer_norm(p["3"], x, policy=policy)
