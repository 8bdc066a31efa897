"""SDXL AutoencoderKL (VAE), TPU-native.

Covers the reference's VAE uses: fp32-stable encode for training latents
(reference train.py:628-630), decode at the end of the denoise loop
(custom_pipelines.py:365-377), and *tiled* decode for memory headroom at
1024² (pipe.enable_vae_tiling(), reference test.py:73, demo.py:53).

On TPU bf16's fp32 exponent range removes the fp16 overflow that forced the
reference's fp32 VAE upcast; the policy is still configurable for parity
testing.

NHWC layout; attention in the mid block is single-head over (H*W) tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import layers, prng


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Defaults = SDXL-base-1.0 vae/config.json."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def tiny_config(**overrides) -> VAEConfig:
    base = dict(block_out_channels=(16, 32), norm_num_groups=8, scaling_factor=0.13025)
    base.update(overrides)
    return VAEConfig(**base)


def config_from_diffusers(d: dict, **overrides) -> VAEConfig:
    """VAEConfig from a diffusers AutoencoderKL ``config.json`` dict —
    notably ``scaling_factor``, which differs across model families
    (SDXL 0.13025, SD1.5/2.x 0.18215, others vary) and silently corrupts
    every latent if assumed."""
    lpb = d.get("layers_per_block", 2)
    cfg = dict(
        in_channels=int(d.get("in_channels", 3)),
        out_channels=int(d.get("out_channels", 3)),
        latent_channels=int(d.get("latent_channels", 4)),
        block_out_channels=tuple(int(c) for c in d.get(
            "block_out_channels", (128, 256, 512, 512)
        )),
        layers_per_block=int(lpb),
        norm_num_groups=int(d.get("norm_num_groups", 32)),
        scaling_factor=float(d.get("scaling_factor", 0.13025)),
    )
    cfg.update(overrides)
    return VAEConfig(**cfg)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _res_init(key, in_ch, out_ch, *, dtype):
    k = prng.split(key, 3)
    p = {
        "norm1": layers.group_norm_init(in_ch, dtype=dtype),
        "conv1": layers.conv2d_init(k[0], in_ch, out_ch, 3, dtype=dtype),
        "norm2": layers.group_norm_init(out_ch, dtype=dtype),
        "conv2": layers.conv2d_init(k[1], out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = layers.conv2d_init(k[2], in_ch, out_ch, 1, dtype=dtype)
    return p


def _res_apply(p, x, *, groups, policy):
    h = layers.group_norm(p["norm1"], x, num_groups=groups, eps=1e-6, policy=policy)
    h = layers.conv2d(p["conv1"], jax.nn.silu(h), policy=policy)
    h = layers.group_norm(p["norm2"], h, num_groups=groups, eps=1e-6, policy=policy)
    h = layers.conv2d(p["conv2"], jax.nn.silu(h), policy=policy)
    if "conv_shortcut" in p:
        x = layers.conv2d(p["conv_shortcut"], x, padding=0, policy=policy)
    return x + h


def _attn_init(key, ch, *, dtype):
    k = prng.split(key, 4)
    return {
        "group_norm": layers.group_norm_init(ch, dtype=dtype),
        "to_q": layers.linear_init(k[0], ch, ch, dtype=dtype),
        "to_k": layers.linear_init(k[1], ch, ch, dtype=dtype),
        "to_v": layers.linear_init(k[2], ch, ch, dtype=dtype),
        "to_out": layers.linear_init(k[3], ch, ch, dtype=dtype),
    }


def _attn_apply(p, x, *, groups, policy):
    b, hh, ww, c = x.shape
    h = layers.group_norm(p["group_norm"], x, num_groups=groups, eps=1e-6, policy=policy)
    h = h.reshape(b, hh * ww, c)
    q = layers.linear(p["to_q"], h, policy=policy)
    k = layers.linear(p["to_k"], h, policy=policy)
    v = layers.linear(p["to_v"], h, policy=policy)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (c**-0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v)
    o = layers.linear(p["to_out"], o, policy=policy)
    return x + o.reshape(b, hh, ww, c)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key, cfg: VAEConfig, *, dtype=jnp.float32):
    k = iter(prng.split(key, 128))
    ch = cfg.block_out_channels

    # Encoder
    enc = {
        "conv_in": layers.conv2d_init(next(k), cfg.in_channels, ch[0], 3, dtype=dtype),
        "down_blocks": [],
        "mid_block": None,
        "conv_norm_out": layers.group_norm_init(ch[-1], dtype=dtype),
        "conv_out": layers.conv2d_init(next(k), ch[-1], 2 * cfg.latent_channels, 3, dtype=dtype),
    }
    out_c = ch[0]
    for i in range(len(ch)):
        in_c, out_c = out_c, ch[i]
        block = {"resnets": [], "downsamplers": None}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(_res_init(next(k), in_c if j == 0 else out_c, out_c, dtype=dtype))
        if i < len(ch) - 1:
            block["downsamplers"] = [
                {"conv": layers.conv2d_init(next(k), out_c, out_c, 3, dtype=dtype)}
            ]
        enc["down_blocks"].append(block)
    enc["mid_block"] = {
        "resnets": [_res_init(next(k), ch[-1], ch[-1], dtype=dtype),
                    _res_init(next(k), ch[-1], ch[-1], dtype=dtype)],
        "attentions": [_attn_init(next(k), ch[-1], dtype=dtype)],
    }

    # Decoder
    dec = {
        "conv_in": layers.conv2d_init(next(k), cfg.latent_channels, ch[-1], 3, dtype=dtype),
        "mid_block": {
            "resnets": [_res_init(next(k), ch[-1], ch[-1], dtype=dtype),
                        _res_init(next(k), ch[-1], ch[-1], dtype=dtype)],
            "attentions": [_attn_init(next(k), ch[-1], dtype=dtype)],
        },
        "up_blocks": [],
        "conv_norm_out": layers.group_norm_init(ch[0], dtype=dtype),
        "conv_out": layers.conv2d_init(next(k), ch[0], cfg.out_channels, 3, dtype=dtype),
    }
    rev = list(reversed(ch))
    prev_c = rev[0]
    for i in range(len(ch)):
        out_c = rev[i]
        block = {"resnets": [], "upsamplers": None}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(_res_init(next(k), prev_c if j == 0 else out_c, out_c, dtype=dtype))
        if i < len(ch) - 1:
            block["upsamplers"] = [
                {"conv": layers.conv2d_init(next(k), out_c, out_c, 3, dtype=dtype)}
            ]
        dec["up_blocks"].append(block)
        prev_c = out_c

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": layers.conv2d_init(
            next(k), 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1, dtype=dtype
        ),
        "post_quant_conv": layers.conv2d_init(
            next(k), cfg.latent_channels, cfg.latent_channels, 1, dtype=dtype
        ),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def encode_moments(params, cfg: VAEConfig, images, *, policy=dtypes.FP32):
    """images (B,H,W,3) in [-1,1] -> (mean, logvar) each (B,h,w,4)."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    h = layers.conv2d(enc["conv_in"], policy.cast(images), policy=policy)
    for block in enc["down_blocks"]:
        for res in block["resnets"]:
            h = _res_apply(res, h, groups=g, policy=policy)
        if block["downsamplers"]:
            # diffusers uses asymmetric (0,1)x(0,1) padding for VAE downsample
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = layers.conv2d(block["downsamplers"][0]["conv"], h, stride=2, padding=0, policy=policy)
    mid = enc["mid_block"]
    h = _res_apply(mid["resnets"][0], h, groups=g, policy=policy)
    h = _attn_apply(mid["attentions"][0], h, groups=g, policy=policy)
    h = _res_apply(mid["resnets"][1], h, groups=g, policy=policy)
    h = layers.group_norm(enc["conv_norm_out"], h, num_groups=g, eps=1e-6, policy=policy)
    h = layers.conv2d(enc["conv_out"], jax.nn.silu(h), policy=policy)
    moments = layers.conv2d(params["quant_conv"], h, padding=0, policy=policy)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def encode(params, cfg: VAEConfig, images, rng=None, *, sample=True, policy=dtypes.FP32):
    """Encode to scaled latents (the form the diffusion loop consumes)."""
    mean, logvar = encode_moments(params, cfg, images, policy=policy)
    if sample and rng is not None:
        mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
    return mean * cfg.scaling_factor


def decode(params, cfg: VAEConfig, latents, *, policy=dtypes.FP32, scaled=True):
    """Scaled latents (B,h,w,4) -> images (B,H,W,3) in [-1,1]."""
    if scaled:
        latents = latents / cfg.scaling_factor
    g = cfg.norm_num_groups
    dec = params["decoder"]
    z = layers.conv2d(params["post_quant_conv"], policy.cast(latents), padding=0, policy=policy)
    h = layers.conv2d(dec["conv_in"], z, policy=policy)
    mid = dec["mid_block"]
    h = _res_apply(mid["resnets"][0], h, groups=g, policy=policy)
    h = _attn_apply(mid["attentions"][0], h, groups=g, policy=policy)
    h = _res_apply(mid["resnets"][1], h, groups=g, policy=policy)
    for block in dec["up_blocks"]:
        for res in block["resnets"]:
            h = _res_apply(res, h, groups=g, policy=policy)
        if block["upsamplers"]:
            # nearest-2x + 3x3 conv, fused on bf16 (layers.upsample2x_conv)
            h = layers.upsample2x_conv(
                block["upsamplers"][0]["conv"], h, policy=policy
            )
    h = layers.group_norm(dec["conv_norm_out"], h, num_groups=g, eps=1e-6, policy=policy)
    return layers.conv2d(dec["conv_out"], jax.nn.silu(h), policy=policy)


def decode_tiled(
    params,
    cfg: VAEConfig,
    latents,
    *,
    tile_latent_size=64,
    overlap=16,
    policy=dtypes.FP32,
):
    """Tiled decode with blended seams (equivalent of enable_vae_tiling,
    reference test.py:73). Tiles are decoded independently (static shapes —
    each tile is the same jitted decode) and linearly blended in overlap
    regions. Memory drops from O(HW) to O(tile²) activations."""
    b, h, w, c = latents.shape
    if h <= tile_latent_size and w <= tile_latent_size:
        return decode(params, cfg, latents, policy=policy)

    stride = tile_latent_size - overlap
    scale = cfg.downscale
    out_h, out_w = h * scale, w * scale
    rows = max(1, -(-(h - overlap) // stride))
    cols = max(1, -(-(w - overlap) // stride))

    canvas = jnp.zeros((b, out_h, out_w, cfg.out_channels), jnp.float32)
    weight = jnp.zeros((1, out_h, out_w, 1), jnp.float32)

    ramp = scale * overlap
    win_h = _blend_window(tile_latent_size * scale, ramp)
    win = win_h[:, None] * win_h[None, :]

    for r in range(rows):
        for cidx in range(cols):
            y = min(r * stride, h - tile_latent_size)
            x = min(cidx * stride, w - tile_latent_size)
            tile = jax.lax.dynamic_slice(
                latents, (0, y, x, 0), (b, tile_latent_size, tile_latent_size, c)
            )
            img = decode(params, cfg, tile, policy=policy).astype(jnp.float32)
            wimg = win[None, :, :, None]
            canvas = jax.lax.dynamic_update_slice(
                canvas,
                jax.lax.dynamic_slice(
                    canvas, (0, y * scale, x * scale, 0), img.shape
                )
                + img * wimg,
                (0, y * scale, x * scale, 0),
            )
            weight = jax.lax.dynamic_update_slice(
                weight,
                jax.lax.dynamic_slice(weight, (0, y * scale, x * scale, 0), (1,) + img.shape[1:3] + (1,))
                + wimg,
                (0, y * scale, x * scale, 0),
            )
    return (canvas / jnp.maximum(weight, 1e-8)).astype(policy.compute_dtype)


def _blend_window(size, ramp):
    if ramp <= 0:
        return jnp.ones((size,), jnp.float32)
    edge = (jnp.arange(ramp, dtype=jnp.float32) + 1.0) / (ramp + 1.0)
    mid = jnp.ones((size - 2 * ramp,), jnp.float32)
    return jnp.concatenate([edge, mid, edge[::-1]])
