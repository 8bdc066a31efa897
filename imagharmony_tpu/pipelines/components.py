"""The SDXL + adapters model bundle a pipeline operates on.

One dataclass holding every sub-model config plus one params dict — the
explicit-state equivalent of the reference's pile of module attributes
(reference test.py:66-104 builds pipe/HA/IPAdapterXL by hand; here a single
``Components`` travels through jitted functions as a pytree).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from imagharmony_tpu.adapters import harmony, projections, resampler
from imagharmony_tpu.models import clip_text, clip_vision, controlnet as controlnet_lib, unet, vae


@dataclasses.dataclass(frozen=True)
class ComponentConfigs:
    unet: unet.UNetConfig
    vae: vae.VAEConfig
    # first tower is absent for the refiner (bigG only)
    text_l: Optional[clip_text.CLIPTextConfig]
    # second tower is SDXL-only; None for the SD1.5 family
    text_g: Optional[clip_text.CLIPTextConfig]
    # None for families without an image prompt (sdxl_refiner)
    vision: Optional[clip_vision.CLIPVisionConfig]
    # HA module is the SDXL QL-Edit head; None for plain SD1.5 IP-Adapter
    harmony: Optional[harmony.HarmonyConfig]
    # "image_proj" (IPAdapter/XL), "resampler" (IPAdapterPlus/PlusXL),
    # "mlp_proj" (IPAdapterFull), or "none" (no image prompt — refiner)
    proj_kind: str = "image_proj"
    resampler: Optional[resampler.ResamplerConfig] = None
    num_ip_tokens: int = 4
    # "sdxl" (dual towers, micro-conditioning), "sd15" (single tower), or
    # "sdxl_refiner" (bigG tower only, aesthetic-score micro-conditioning)
    family: str = "sdxl"
    # optional ControlNet branch (reference wires CNAttnProcessors onto
    # pipe.controlnet, ip_adapter/ip_adapter.py:128-133)
    controlnet: Optional["controlnet_lib.ControlNetConfig"] = None


def sdxl_configs(harmony_cfg: Optional[harmony.HarmonyConfig] = None) -> ComponentConfigs:
    """Full-size SDXL-base + ViT-bigG image encoder + shipped HA dims."""
    return ComponentConfigs(
        unet=unet.UNetConfig(),
        vae=vae.VAEConfig(),
        text_l=clip_text.clip_l_config(),
        text_g=clip_text.clip_bigg_config(),
        vision=clip_vision.CLIPVisionConfig(),
        harmony=harmony_cfg or harmony.HarmonyConfig(),
    )


def sdxl_refiner_configs() -> ComponentConfigs:
    """SDXL-refiner-1.0: the low-noise specialist of the SDXL
    mixture-of-denoisers (consumes a base run's denoising_end latents via
    generate(latents=..., denoising_start=...), or plain img2img). Single
    bigG text tower, aesthetic-score micro-conditioning, no image prompt /
    HA head (the image prompt conditions the base stage)."""
    return ComponentConfigs(
        unet=unet.sdxl_refiner_config(),
        vae=vae.VAEConfig(),
        text_l=None,
        text_g=clip_text.clip_bigg_config(),
        vision=None,
        harmony=None,
        proj_kind="none",
        family="sdxl_refiner",
    )


def sdxl_refiner_tiny_configs(vocab_size=1000) -> ComponentConfigs:
    """Topology-faithful miniature refiner (4 stages, cross-attn on the
    middle two only, aesthetic time-ids)."""
    u = unet.sdxl_refiner_config(
        sample_size=8,
        block_out_channels=(16, 32, 64, 64),
        transformer_layers_per_block=(1, 1, 2, 2),
        num_attention_heads=(1, 2, 4, 4),
        attention_head_dim=16,
        cross_attention_dim=40,
        norm_num_groups=8,
        addition_time_embed_dim=16,
        projection_class_embeddings_input_dim=16 * 5 + 40,
    )
    tg = clip_text.tiny_config(
        vocab_size=vocab_size, hidden_size=40, num_heads=4, projection_dim=40
    )
    return ComponentConfigs(
        unet=u, vae=vae.tiny_config(), text_l=None, text_g=tg,
        vision=None, harmony=None, proj_kind="none", family="sdxl_refiner",
    )


def sd15_configs() -> ComponentConfigs:
    """SD1.5 + vanilla IP-Adapter (the reference's non-XL family:
    IPAdapter over StableDiffusionPipeline, ip_adapter/ip_adapter.py:69-245;
    image encoder = CLIP ViT-H, IP branch on every cross-attn layer)."""
    return ComponentConfigs(
        unet=unet.sd15_config(),
        vae=vae.VAEConfig(scaling_factor=0.18215),
        text_l=clip_text.clip_l_config(),
        text_g=None,
        vision=clip_vision.vit_h_config(),
        harmony=None,
        family="sd15",
    )


def sd15_tiny_configs(vocab_size=1000) -> ComponentConfigs:
    u = unet.sd15_config(
        block_out_channels=(32, 64, 128, 128),
        cross_attention_dim=24,
        num_attention_heads=(4, 4, 4, 4),
        norm_num_groups=8,
    )
    tl = clip_text.tiny_config(vocab_size=vocab_size, hidden_size=24, num_heads=4)
    # SD1.5 conditions on CLIP-L's LAST hidden state (dim == cross_attention_dim)
    vis = clip_vision.tiny_config(projection_dim=20)
    return ComponentConfigs(
        unet=u, vae=vae.tiny_config(scaling_factor=0.18215), text_l=tl,
        text_g=None, vision=vis, harmony=None, family="sd15",
    )


def tiny_configs(vocab_size=1000, *, proj_kind="image_proj") -> ComponentConfigs:
    """Topology-faithful miniature for tests/demos (compiles in seconds)."""
    u = unet.tiny_config()
    tl = clip_text.tiny_config(vocab_size=vocab_size, hidden_size=24, num_heads=4)
    # SD1.5 conditions on CLIP-L's LAST hidden state (dim == cross_attention_dim)
    tg = clip_text.tiny_config(
        vocab_size=vocab_size, hidden_size=40, num_heads=4, projection_dim=32
    )
    vis = clip_vision.tiny_config(projection_dim=32)
    ha = harmony.tiny_config(
        image_hidden_size=32, text_context_dim=tl.hidden_size + tg.hidden_size
    )
    rs = resampler.tiny_config(
        embedding_dim=vis.hidden_size, output_dim=u.cross_attention_dim, num_queries=4
    )
    return ComponentConfigs(
        unet=u, vae=vae.tiny_config(), text_l=tl, text_g=tg, vision=vis,
        harmony=ha, proj_kind=proj_kind, resampler=rs,
    )


def init_params(key, cfgs: ComponentConfigs, *, dtype=jnp.float32) -> Dict[str, Any]:
    from imagharmony_tpu.nn import prng

    k = prng.split(key, 8)
    params = {
        "unet": unet.init(k[0], cfgs.unet, dtype=dtype),
        "vae": vae.init(k[1], cfgs.vae, dtype=dtype),
    }
    if cfgs.text_l is not None:
        params["text_encoder"] = clip_text.init(k[2], cfgs.text_l, dtype=dtype)
    if cfgs.vision is not None:
        params["image_encoder"] = clip_vision.init(k[4], cfgs.vision, dtype=dtype)
    if cfgs.text_g is not None:
        params["text_encoder_2"] = clip_text.init(k[3], cfgs.text_g, dtype=dtype)
    if cfgs.harmony is not None:
        params["harmony"] = harmony.init(k[5], cfgs.harmony, dtype=dtype)
    if cfgs.controlnet is not None:
        params["controlnet"] = controlnet_lib.init(k[7], cfgs.controlnet, dtype=dtype)
    if cfgs.proj_kind == "none":
        return params
    if cfgs.proj_kind == "image_proj":
        params["image_proj"] = projections.image_proj_init(
            k[6],
            clip_embed_dim=cfgs.vision.projection_dim,
            cross_attention_dim=cfgs.unet.cross_attention_dim,
            num_tokens=cfgs.num_ip_tokens,
            dtype=dtype,
        )
    elif cfgs.proj_kind == "resampler":
        params["image_proj"] = resampler.init(k[6], cfgs.resampler, dtype=dtype)
    elif cfgs.proj_kind == "mlp_proj":
        params["image_proj"] = projections.mlp_proj_init(
            k[6],
            clip_hidden_dim=cfgs.vision.hidden_size,
            cross_attention_dim=cfgs.unet.cross_attention_dim,
            dtype=dtype,
        )
    else:
        raise ValueError(cfgs.proj_kind)
    return params


def project_image_embeds(params, cfgs: ComponentConfigs, vision_out, *, policy):
    """CLIP vision output -> image prompt tokens, per proj_kind.

    image_proj consumes the projected pooled embedding (reference
    ip_adapter.py:164,175); resampler/mlp_proj consume penultimate patch
    features (reference ip_adapter.py:369,411)."""
    if cfgs.proj_kind == "image_proj":
        return projections.image_proj(
            params["image_proj"], vision_out["projected"],
            num_tokens=cfgs.num_ip_tokens, policy=policy,
        )
    if cfgs.proj_kind == "resampler":
        return resampler.apply(
            params["image_proj"], cfgs.resampler, vision_out["penultimate"], policy=policy
        )
    return projections.mlp_proj(params["image_proj"], vision_out["penultimate"], policy=policy)
