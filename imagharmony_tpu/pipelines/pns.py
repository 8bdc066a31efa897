"""Preference-guided noise selection (PNS).

Advertised by the reference README but absent from its code (SURVEY.md §5:
"not implemented anywhere in the reference"); BASELINE.json names it a
target config, so it is built fresh here, TPU-style:

* K candidate seeds are denoised as ONE batch (2K rows with the CFG pair
  packed) — on a mesh this is exactly the data-parallel fan-out axis;
* every candidate is scored for semantic alignment with the target prompt
  using the OpenCLIP-bigG text/image pair the bundle already carries
  (text_encoder_2.projected vs image_encoder.projected — a genuine shared
  embedding space);
* the argmax candidate is returned (scores exposed for inspection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import clip_text, clip_vision


@functools.partial(jax.jit, static_argnames=("cfgs", "policy"))
def clip_scores(params, cfgs, images, ids_g, *, policy: dtypes.Policy = dtypes.DEFAULT):
    """Cosine similarity between decoded images (K, H, W, 3) in [-1, 1] and
    a prompt (1, S) in the bigG joint space -> (K,) scores."""
    size = cfgs.vision.image_size
    k = images.shape[0]
    imgs = jax.image.resize(
        images.astype(jnp.float32), (k, size, size, 3), method="bilinear"
    )
    x01 = jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)
    mean = jnp.asarray(clip_vision.IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(clip_vision.IMAGE_STD, jnp.float32)
    pixels = (x01 - mean) / std

    img_emb = clip_vision.apply(
        params["image_encoder"], cfgs.vision, pixels, policy=policy
    )["projected"].astype(jnp.float32)
    txt_emb = clip_text.apply(
        params["text_encoder_2"], cfgs.text_g, ids_g, policy=policy
    )["projected"].astype(jnp.float32)

    img_emb = img_emb / jnp.linalg.norm(img_emb, axis=-1, keepdims=True)
    txt_emb = txt_emb / jnp.linalg.norm(txt_emb, axis=-1, keepdims=True)
    return img_emb @ txt_emb[0]


def generate_with_pns(
    pipe,
    pil_image,
    *,
    num_seeds: int = 8,
    seed: int = 0,
    prompt: str = None,
    return_all: bool = False,
    **generate_kw,
):
    """Denoise ``num_seeds`` candidates in one batch, score, keep the best.

    Returns the winning image (same output_type semantics as
    pipe.generate), or (best, images, scores) if return_all.
    """
    generate_kw.pop("num_samples", None)
    output_type = generate_kw.pop("output_type", "pil")

    decoded = pipe.generate(
        pil_image=pil_image,
        prompt=prompt,
        num_samples=num_seeds,
        seed=seed,
        output_type="raw",  # decoded float images in [-1,1], NOT latents
        **generate_kw,
    )  # (K, H, W, 3) float in [-1,1]

    ids_g = pipe._tokenize(prompt or "")[1]
    scores = clip_scores(
        pipe.params, pipe.cfgs, jnp.asarray(decoded), ids_g, policy=pipe.policy
    )
    scores = np.asarray(scores)
    best = int(np.argmax(scores))

    from imagharmony_tpu.pipelines.harmony_edit import to_uint8

    arr = to_uint8(decoded)
    if output_type == "pil":
        from PIL import Image

        images = [Image.fromarray(a) for a in arr]
    else:
        images = arr
    if return_all:
        return images[best], images, scores
    return images[best]
