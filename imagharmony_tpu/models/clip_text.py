"""CLIP text encoders (both SDXL towers), TPU-native.

Covers the reference's frozen text stack: CLIPTextModel (ViT-L tower,
quick_gelu, 768-d) and CLIPTextModelWithProjection (OpenCLIP bigG tower,
gelu, 1280-d with a text projection) — reference train.py:507-509,660-673.

SDXL consumes the *penultimate* hidden state of each tower concatenated to
2048-d, plus the projected pooled embedding of tower 2; ``apply`` returns
exactly those tensors so pipelines never re-slice hidden-state lists.

Param keys mirror the HF checkpoint tree (text_model.encoder.layers.N.*).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import attention as attn_lib
from imagharmony_tpu.nn import layers, prng


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    projection_dim: Optional[int] = None  # set for the WithProjection tower
    eos_token_id: int = 49407


# SDXL tower configs
def clip_l_config() -> CLIPTextConfig:
    return CLIPTextConfig()


def clip_bigg_config() -> CLIPTextConfig:
    return CLIPTextConfig(
        hidden_size=1280,
        num_layers=32,
        num_heads=20,
        intermediate_size=5120,
        hidden_act="gelu",
        projection_dim=1280,
    )


def config_from_transformers(d: dict, *, with_projection=None, **overrides) -> CLIPTextConfig:
    """CLIPTextConfig from a transformers CLIPTextModel ``config.json``
    dict (SD2.x-style towers differ in depth/width/activation from the
    SDXL pair). ``with_projection`` forces the projection head on/off;
    None keeps it when the json carries a projection_dim AND the
    architectures list names a WithProjection class."""
    arch = d.get("architectures") or []
    if with_projection is None:
        with_projection = any("WithProjection" in a for a in arch)
    cfg = dict(
        vocab_size=int(d.get("vocab_size", 49408)),
        hidden_size=int(d.get("hidden_size", 768)),
        num_layers=int(d.get("num_hidden_layers", 12)),
        num_heads=int(d.get("num_attention_heads", 12)),
        intermediate_size=int(d.get("intermediate_size", 3072)),
        max_position_embeddings=int(d.get("max_position_embeddings", 77)),
        hidden_act=d.get("hidden_act", "quick_gelu"),
        projection_dim=int(d["projection_dim"]) if with_projection else None,
        eos_token_id=int(d.get("eos_token_id", 49407)),
    )
    cfg.update(overrides)
    return CLIPTextConfig(**cfg)


def tiny_config(**overrides) -> CLIPTextConfig:
    base = dict(
        vocab_size=1000,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=16,
        eos_token_id=999,
    )
    base.update(overrides)
    return CLIPTextConfig(**base)


def _encoder_layer_init(key, d, inter, *, dtype):
    k = prng.split(key, 6)
    return {
        "layer_norm1": layers.layer_norm_init(d, dtype=dtype),
        "self_attn": {
            "q_proj": layers.linear_init(k[0], d, d, dtype=dtype),
            "k_proj": layers.linear_init(k[1], d, d, dtype=dtype),
            "v_proj": layers.linear_init(k[2], d, d, dtype=dtype),
            "out_proj": layers.linear_init(k[3], d, d, dtype=dtype),
        },
        "layer_norm2": layers.layer_norm_init(d, dtype=dtype),
        "mlp": {
            "fc1": layers.linear_init(k[4], d, inter, dtype=dtype),
            "fc2": layers.linear_init(k[5], inter, d, dtype=dtype),
        },
    }


def init(key, cfg: CLIPTextConfig, *, dtype=jnp.float32):
    k = prng.split(key, cfg.num_layers + 4)
    params = {
        "embeddings": {
            "token_embedding": layers.embedding_init(k[0], cfg.vocab_size, cfg.hidden_size, dtype=dtype),
            "position_embedding": layers.embedding_init(
                k[1], cfg.max_position_embeddings, cfg.hidden_size, dtype=dtype
            ),
        },
        "encoder_layers": [
            _encoder_layer_init(k[3 + i], cfg.hidden_size, cfg.intermediate_size, dtype=dtype)
            for i in range(cfg.num_layers)
        ],
        "final_layer_norm": layers.layer_norm_init(cfg.hidden_size, dtype=dtype),
    }
    if cfg.projection_dim:
        params["text_projection"] = layers.linear_init(
            k[2], cfg.hidden_size, cfg.projection_dim, bias=False, dtype=dtype
        )
    return params


def _encoder_layer(p, x, *, heads, act, mask, policy):
    h = layers.layer_norm(p["layer_norm1"], x, policy=policy)
    a = p["self_attn"]
    q = layers.linear(a["q_proj"], h, policy=policy)
    kk = layers.linear(a["k_proj"], h, policy=policy)
    v = layers.linear(a["v_proj"], h, policy=policy)
    b, s, d = q.shape
    qh = q.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)
    kh = kk.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)
    o = attn_lib.sdpa(qh, kh, vh, mask=mask, backend="xla")
    o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + layers.linear(a["out_proj"], o, policy=policy)

    h = layers.layer_norm(p["layer_norm2"], x, policy=policy)
    h = layers.linear(p["mlp"]["fc1"], h, policy=policy)
    h = layers.ACTIVATIONS[act](h)
    x = x + layers.linear(p["mlp"]["fc2"], h, policy=policy)
    return x


def apply(params, cfg: CLIPTextConfig, input_ids, *,
          policy: dtypes.Policy = dtypes.DEFAULT, clip_skip: int = 0):
    """input_ids (B, S) -> dict with:

    penultimate: (B, S, D)  hidden state entering the last layer — the
                 ``hidden_states[-2]`` SDXL conditions on (reference
                 train.py:662,665,670,672)
    last:        (B, S, D)  final_layer_norm'd last hidden state
    pooled:      (B, D)     hidden at the EOS position (LN'd)
    projected:   (B, P)     text_projection(pooled), present iff the tower
                 has a projection — the ``pooled_text_embeds`` SDXL uses
                 (reference train.py:664)

    clip_skip > 0 conditions on an earlier layer (diffusers' clip_skip —
    a standard community knob for checkpoints fine-tuned that way):
    ``penultimate`` becomes hidden_states[-(2+clip_skip)] and ``last``
    the final-layer-norm of hidden_states[-(1+clip_skip)]. ``pooled`` /
    ``projected`` always come from the FULL tower (diffusers semantics —
    the pooler is unaffected by clip_skip)."""
    if not 0 <= clip_skip < cfg.num_layers - 1:
        raise ValueError(
            f"clip_skip must be in [0, {cfg.num_layers - 2}], got {clip_skip}"
        )
    b, s = input_ids.shape
    tok = layers.embedding(params["embeddings"]["token_embedding"], input_ids, policy=policy)
    pos = layers.embedding(
        params["embeddings"]["position_embedding"], jnp.arange(s), policy=policy
    )
    x = tok + pos[None]

    # causal mask (CLIP text towers are causal)
    causal = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)[None, None]

    penultimate = None
    skip_hidden = None
    for i, layer in enumerate(params["encoder_layers"]):
        if i == cfg.num_layers - 1 - clip_skip:
            penultimate = x
        if clip_skip and i == cfg.num_layers - clip_skip:
            skip_hidden = x
        x = _encoder_layer(
            layer, x, heads=cfg.num_heads, act=cfg.hidden_act, mask=causal, policy=policy
        )

    last_full = layers.layer_norm(params["final_layer_norm"], x, policy=policy)
    last = (
        last_full if not clip_skip
        else layers.layer_norm(params["final_layer_norm"], skip_hidden, policy=policy)
    )

    # EOS pooling: first position holding the EOS token id.
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = jnp.take_along_axis(last_full, eos_pos[:, None, None], axis=1)[:, 0]

    out = {"penultimate": penultimate, "last": last, "pooled": pooled}
    if "text_projection" in params:
        out["projected"] = layers.linear(params["text_projection"], pooled, policy=policy)
    return out


def extend_token_embeddings(params, cfg: CLIPTextConfig, new_rows):
    """Append learned embedding rows to the token table (textual
    inversion): returns ``(new_params, new_cfg, first_new_id)``. The rest
    of the tree is shared (no copies of the transformer weights)."""
    import dataclasses as _dc

    import numpy as np

    table = params["embeddings"]["token_embedding"]["weight"]
    rows = np.asarray(new_rows)
    if rows.ndim == 1:
        rows = rows[None]
    if rows.shape[-1] != table.shape[-1]:
        raise ValueError(
            f"embedding dim {rows.shape[-1]} != tower hidden {table.shape[-1]}"
        )
    table_np = np.asarray(table)
    new_table = np.concatenate([table_np, rows.astype(table_np.dtype)], axis=0)
    new_params = dict(params)
    new_params["embeddings"] = dict(params["embeddings"])
    new_params["embeddings"]["token_embedding"] = {"weight": new_table}
    new_cfg = _dc.replace(cfg, vocab_size=int(new_table.shape[0]))
    return new_params, new_cfg, int(table_np.shape[0])


def encode_for_sdxl(params_l, cfg_l, params_g, cfg_g, ids_l, ids_g, *,
                    policy=dtypes.DEFAULT, clip_skip: int = 0):
    """The SDXL dual-tower conditioning: concat penultimates (768+1280→2048)
    + projected pooled from tower 2 (reference train.py:660-666)."""
    out_l = apply(params_l, cfg_l, ids_l, policy=policy, clip_skip=clip_skip)
    out_g = apply(params_g, cfg_g, ids_g, policy=policy, clip_skip=clip_skip)
    context = jnp.concatenate([out_l["penultimate"], out_g["penultimate"]], axis=-1)
    return context, out_g["projected"]
