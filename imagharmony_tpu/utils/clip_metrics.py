"""CLIP-space quality metrics (CLIP-T / CLIP-I) via the pipeline's own towers.

The IMAGHarmony paper evaluates QL-Edit with CLIP-T (edited image vs target
prompt) and CLIP-I (edited image vs reference image) on HarmonyBench; the
reference repo ships NO eval code (SURVEY.md §4 — qualitative images only).
These helpers provide that protocol on the bundle's own CLIP towers: the
bigG joint space for image↔text (the same scorer PNS uses,
pipelines/pns.py) and the vision tower's projected space for image↔image.

With real weights these are the actual CLIP similarity spaces; with random
weights they serve as drill/smoke metrics (relative comparisons only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu.models import clip_vision


def image_embeds(pipe, raw) -> np.ndarray:
    """L2-normalized CLIP image embeddings for raw decoded images.

    ``raw``: (K, H, W, 3) float in [-1, 1] (pipe.generate output_type="raw")
    or uint8 in [0, 255].
    """
    imgs = jnp.asarray(raw)
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) / 127.5 - 1.0
    size = pipe.cfgs.vision.image_size
    imgs = jax.image.resize(
        imgs.astype(jnp.float32), (imgs.shape[0], size, size, 3), "bilinear"
    )
    x01 = jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)
    mean = jnp.asarray(clip_vision.IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(clip_vision.IMAGE_STD, jnp.float32)
    emb = clip_vision.apply(
        pipe.params["image_encoder"], pipe.cfgs.vision, (x01 - mean) / std,
        policy=pipe.policy,
    )["projected"].astype(jnp.float32)
    return np.asarray(emb / jnp.linalg.norm(emb, axis=-1, keepdims=True))


def clip_i(pipe, edited_raw, reference_raw) -> np.ndarray:
    """CLIP-I: cosine between edited and reference images, (K,) per row."""
    a = image_embeds(pipe, edited_raw)
    b = image_embeds(pipe, reference_raw)
    if b.shape[0] == 1 and a.shape[0] > 1:
        b = np.broadcast_to(b, a.shape)
    return (a * b).sum(-1)


def clip_t(pipe, edited_raw, prompt: str) -> np.ndarray:
    """CLIP-T: bigG joint-space similarity of each image to ``prompt``."""
    from imagharmony_tpu.pipelines import pns

    if "text_encoder_2" not in pipe.params:
        raise ValueError("CLIP-T needs the bigG tower (SDXL bundles)")
    ids_g = pipe._tokenize(prompt)[1]
    imgs = jnp.asarray(edited_raw)
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) / 127.5 - 1.0
    scores = pns.clip_scores(
        pipe.params, pipe.cfgs, imgs, jnp.asarray(ids_g), policy=pipe.policy
    )
    return np.asarray(scores)
