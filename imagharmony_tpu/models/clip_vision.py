"""CLIP vision encoder with projection, TPU-native.

The reference's frozen image tower (CLIPVisionModelWithProjection,
reference train.py:512,648; ip_adapter/ip_adapter.py:81-84,164). Outputs:

* ``projected`` — the pooled, projected image embedding the IP-Adapter /
  HarmonyAttention path consumes (1280-d for the SDXL ViT-bigG encoder);
* ``penultimate`` — the hidden_states[-2] patch sequence the
  Resampler-based IPAdapterPlus variants consume
  (reference ip_adapter.py:369,411).

Param keys mirror the HF vision_model.* checkpoint tree.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import attention as attn_lib
from imagharmony_tpu.nn import layers, prng


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """Defaults = the IP-Adapter SDXL image encoder (OpenCLIP ViT-bigG-14)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1664
    num_layers: int = 48
    num_heads: int = 16
    intermediate_size: int = 8192
    projection_dim: int = 1280
    hidden_act: str = "gelu"

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


def vit_h_config() -> CLIPVisionConfig:
    """CLIP ViT-H/14 (the SD1.5 IP-Adapter image encoder)."""
    return CLIPVisionConfig(
        hidden_size=1280,
        num_layers=32,
        num_heads=16,
        intermediate_size=5120,
        projection_dim=1024,
    )


def tiny_config(**overrides) -> CLIPVisionConfig:
    base = dict(
        image_size=28,
        patch_size=7,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        projection_dim=24,
    )
    base.update(overrides)
    return CLIPVisionConfig(**base)


def init(key, cfg: CLIPVisionConfig, *, dtype=jnp.float32):
    from imagharmony_tpu.models.clip_text import _encoder_layer_init

    k = prng.split(key, cfg.num_layers + 5)
    return {
        "embeddings": {
            "class_embedding": k[0].normal((cfg.hidden_size,), dtype),
            # stored HWIO like every conv in this framework
            "patch_embedding": {
                "weight": k[1].normal(
                    (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size), dtype,
                    stddev=0.02,
                )
            },
            "position_embedding": layers.embedding_init(
                k[2], cfg.num_positions, cfg.hidden_size, dtype=dtype
            ),
        },
        "pre_layrnorm": layers.layer_norm_init(cfg.hidden_size, dtype=dtype),
        "encoder_layers": [
            _encoder_layer_init(k[5 + i], cfg.hidden_size, cfg.intermediate_size, dtype=dtype)
            for i in range(cfg.num_layers)
        ],
        "post_layernorm": layers.layer_norm_init(cfg.hidden_size, dtype=dtype),
        "visual_projection": layers.linear_init(
            k[3], cfg.hidden_size, cfg.projection_dim, bias=False, dtype=dtype
        ),
    }


def apply(params, cfg: CLIPVisionConfig, pixel_values, *, policy: dtypes.Policy = dtypes.DEFAULT):
    """pixel_values (B, H, W, 3), CLIP-normalized. Returns dict with
    penultimate (B, 1+P, D), last (B, 1+P, D), pooled (B, D),
    projected (B, projection_dim)."""
    from imagharmony_tpu.models.clip_text import _encoder_layer

    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        policy.cast(pixel_values),
        policy.cast(params["embeddings"]["patch_embedding"]["weight"]),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        policy.cast(params["embeddings"]["class_embedding"])[None, None],
        (b, 1, cfg.hidden_size),
    )
    x = jnp.concatenate([cls, patches], axis=1)
    pos = layers.embedding(
        params["embeddings"]["position_embedding"], jnp.arange(x.shape[1]), policy=policy
    )
    x = x + pos[None]
    x = layers.layer_norm(params["pre_layrnorm"], x, policy=policy)

    penultimate = None
    for i, layer in enumerate(params["encoder_layers"]):
        if i == cfg.num_layers - 1:
            penultimate = x
        x = _encoder_layer(
            layer, x, heads=cfg.num_heads, act=cfg.hidden_act, mask=None, policy=policy
        )

    pooled = layers.layer_norm(params["post_layernorm"], x[:, 0], policy=policy)
    projected = layers.linear(params["visual_projection"], pooled, policy=policy)
    return {
        "penultimate": penultimate,
        "last": x,
        "pooled": pooled,
        "projected": projected,
    }


# CLIP preprocessing constants (CLIPImageProcessor defaults the reference
# relies on, ip_adapter.py:163): resize shortest side to 224 bicubic,
# center-crop 224, scale 1/255, normalize with these stats.
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_numpy(images, image_size=224):
    """Host-side CLIP preprocessing: PIL image(s) / uint8 arrays ->
    (B, H, W, 3) float32 normalized. Bit-compatible with
    CLIPImageProcessor's resize(bicubic, shortest-edge)+center-crop path."""
    import numpy as np
    from PIL import Image

    if not isinstance(images, (list, tuple)):
        images = [images]
    out = []
    for im in images:
        if isinstance(im, np.ndarray):
            im = Image.fromarray(im.astype(np.uint8))
        im = im.convert("RGB")
        w, h = im.size
        # shortest-edge resize with HF's truncating long-side arithmetic
        if w <= h:
            nw, nh = image_size, int(image_size * h / w)
        else:
            nw, nh = int(image_size * w / h), image_size
        im = im.resize((nw, nh), Image.BICUBIC)
        left = (nw - image_size) // 2
        top = (nh - image_size) // 2
        im = im.crop((left, top, left + image_size, top + image_size))
        arr = np.asarray(im, dtype=np.float32) / 255.0
        arr = (arr - np.array(IMAGE_MEAN, np.float32)) / np.array(IMAGE_STD, np.float32)
        out.append(arr)
    return np.stack(out)
