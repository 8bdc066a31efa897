"""ControlNet for the SDXL/SD1.5 UNet families.

The reference supports ControlNet by swapping CNAttnProcessors onto
``pipe.controlnet`` (reference ip_adapter/ip_adapter.py:128-133) — the CN
variant simply truncates the image-prompt tokens and attends to text only
(reference attention_processor.py:502-503,583-584). In this framework that
behavior is the default: the ControlNet branch just never receives
``ip_tokens``, no processor classes needed.

Architecture: the UNet's conv_in + time/addition embeddings + down blocks +
mid block, plus a conditioning-image embedder and zero-initialized 1×1
output convs per residual (so a freshly initialized ControlNet is an exact
no-op on the base model). Outputs feed unet.apply via
``down_block_additional_residuals`` / ``mid_block_additional_residual``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import unet as unet_lib
from imagharmony_tpu.nn import layers, prng, transformer


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    base: unet_lib.UNetConfig = dataclasses.field(default_factory=unet_lib.UNetConfig)
    conditioning_channels: int = 3
    conditioning_embedding_channels: Tuple[int, ...] = (16, 32, 96, 256)


def tiny_config(**overrides) -> ControlNetConfig:
    base = dict(
        base=unet_lib.tiny_config(),
        conditioning_embedding_channels=(8, 16),
    )
    base.update(overrides)
    return ControlNetConfig(**base)


def _zero_conv(in_ch, out_ch, *, dtype):
    return {
        "weight": np.zeros((1, 1, in_ch, out_ch), dtype),
        "bias": np.zeros((out_ch,), dtype),
    }


def init(key, cfg: ControlNetConfig, *, dtype=jnp.float32):
    u = cfg.base
    k = iter(prng.split(key, 64))
    ch = u.block_out_channels
    temb_dim = u.time_embed_dim

    # reuse the UNet init for the shared trunk, then drop the up path
    trunk = unet_lib.init(next(k), u, dtype=dtype)
    params = {
        "conv_in": trunk["conv_in"],
        "time_embedding": trunk["time_embedding"],
        "down_blocks": trunk["down_blocks"],
        "mid_block": trunk["mid_block"],
    }
    if "add_embedding" in trunk:
        params["add_embedding"] = trunk["add_embedding"]

    # conditioning image embedder (stride-2 pyramid down to latent res)
    cc = cfg.conditioning_embedding_channels
    emb = {
        "conv_in": layers.conv2d_init(next(k), cfg.conditioning_channels, cc[0], 3, dtype=dtype),
        "blocks": [],
        "conv_out": _zero_conv(cc[-1], ch[0], dtype=dtype) | {
            "weight": np.zeros((3, 3, cc[-1], ch[0]), dtype)
        },
    }
    for i in range(len(cc) - 1):
        emb["blocks"].append(layers.conv2d_init(next(k), cc[i], cc[i], 3, dtype=dtype))
        emb["blocks"].append(layers.conv2d_init(next(k), cc[i], cc[i + 1], 3, dtype=dtype))
    params["controlnet_cond_embedding"] = emb

    # zero 1x1 convs: one per down residual + one for mid
    n_res = 1  # conv_in sample
    zero_convs = [_zero_conv(ch[0], ch[0], dtype=dtype)]
    out_c = ch[0]
    for i in range(len(u.down_block_types)):
        out_c = ch[i]
        for _ in range(u.layers_per_block):
            zero_convs.append(_zero_conv(out_c, out_c, dtype=dtype))
        if i < len(u.down_block_types) - 1:
            zero_convs.append(_zero_conv(out_c, out_c, dtype=dtype))
    params["controlnet_down_blocks"] = zero_convs
    params["controlnet_mid_block"] = _zero_conv(ch[-1], ch[-1], dtype=dtype)
    return params


def apply(
    params,
    cfg: ControlNetConfig,
    sample,
    timesteps,
    encoder_hidden_states,
    controlnet_cond,
    *,
    pooled_text_embeds=None,
    time_ids=None,
    conditioning_scale=1.0,
    backend=None,
    policy: dtypes.Policy = dtypes.DEFAULT,
):
    """-> (down_residuals tuple, mid_residual), scaled by conditioning_scale.

    controlnet_cond: conditioning image in [0, 1] at
    latent_res * 2^(len(conditioning_embedding_channels)-1) per side
    (= 8x latents for the SDXL config, i.e. full image resolution).
    Text-only conditioning (no ip_tokens) — the CNAttnProcessor contract.
    """
    u = cfg.base
    g = u.norm_num_groups
    ts = jnp.asarray(timesteps)
    if ts.ndim == 0:
        ts = jnp.broadcast_to(ts, (sample.shape[0],))

    t_emb = layers.timestep_embedding(ts, u.block_out_channels[0])
    temb = layers.linear(params["time_embedding"]["linear_1"], t_emb, policy=policy)
    temb = layers.linear(params["time_embedding"]["linear_2"], jax.nn.silu(temb), policy=policy)
    if u.addition_embed_type == "text_time" and "add_embedding" in params:
        tid_emb = layers.timestep_embedding(
            time_ids.reshape(-1), u.addition_time_embed_dim
        ).reshape(ts.shape[0], -1)
        add_embeds = jnp.concatenate(
            [pooled_text_embeds.astype(jnp.float32), tid_emb], axis=-1
        )
        aug = layers.linear(params["add_embedding"]["linear_1"], add_embeds, policy=policy)
        aug = layers.linear(params["add_embedding"]["linear_2"], jax.nn.silu(aug), policy=policy)
        temb = temb + aug

    ctx = policy.cast(encoder_hidden_states)

    # conditioning embedder
    emb = params["controlnet_cond_embedding"]
    c = layers.conv2d(emb["conv_in"], policy.cast(controlnet_cond), policy=policy)
    c = jax.nn.silu(c)
    for i, block in enumerate(emb["blocks"]):
        stride = 2 if i % 2 == 1 else 1
        c = jax.nn.silu(layers.conv2d(block, c, stride=stride, policy=policy))
    c = layers.conv2d(emb["conv_out"], c, policy=policy)

    h = layers.conv2d(params["conv_in"], policy.cast(sample), policy=policy) + c
    res_stack = [h]
    for i, block in enumerate(params["down_blocks"]):
        for j, res in enumerate(block["resnets"]):
            h = unet_lib.resnet_block(res, h, temb, num_groups=g, policy=policy)
            if block["attentions"]:
                h = transformer.transformer_2d(
                    block["attentions"][j], h, heads=u.heads_for(i), context=ctx,
                    backend=backend, policy=policy,
                )
            res_stack.append(h)
        if block["downsamplers"]:
            h = unet_lib.downsample(block["downsamplers"][0], h, policy=policy)
            res_stack.append(h)

    mid = params["mid_block"]
    h = unet_lib.resnet_block(mid["resnets"][0], h, temb, num_groups=g, policy=policy)
    h = transformer.transformer_2d(
        mid["attentions"][0], h, heads=u.heads_for(len(u.block_out_channels) - 1),
        context=ctx, backend=backend, policy=policy,
    )
    h = unet_lib.resnet_block(mid["resnets"][1], h, temb, num_groups=g, policy=policy)

    scale = conditioning_scale
    down_res = tuple(
        layers.conv2d(zc, r, padding=0, policy=policy) * scale
        for zc, r in zip(params["controlnet_down_blocks"], res_stack)
    )
    mid_res = layers.conv2d(params["controlnet_mid_block"], h, padding=0, policy=policy) * scale
    return down_res, mid_res
