"""Encoder-output caching for adapter training.

The reference re-runs every frozen encoder inside the hot loop under
no_grad (reference train.py:626-673: VAE encode, CLIP image embed, four
text-encoder passes — every step, every epoch). The trainable surface
never feeds back into those encoders, so on TPU we precompute once:

* VAE posterior moments (mean, logvar) per record — the step still draws a
  fresh latent sample per visit, matching latent_dist.sample() semantics;
* dual-tower context + pooled embeds for ``text`` AND for the empty prompt
  (so CFG text dropout is a cached-row swap, reference train.py:101-103);
* extra_text context (never dropped, reference train.py:96-104);
* the CLIP image embedding (image dropout is zeroing, train.py:651-657).

After precompute the text/vision/VAE towers can leave device memory
entirely: the train step holds only the UNet + adapters (+5.4 GB HBM freed
at SDXL scale, and the per-step encoder FLOPs disappear).

Requires center-crop preprocessing (the reference's training default) —
random crops would invalidate cached VAE moments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import clip_text, clip_vision, vae


def precompute(params, cfgs, dataset, *, batch_size=8, policy=dtypes.DEFAULT):
    """-> dict of stacked arrays over all dataset records + empty-prompt row.

    dataset: HarmonyDataset with center_crop=True.
    """
    assert dataset.center_crop, "encoder cache requires center_crop"
    rng = np.random.default_rng(0)

    @jax.jit
    def encode(images, clip_pixels, ids_l, ids_g, extra_l, extra_g):
        mean, logvar = vae.encode_moments(
            params["vae"], cfgs.vae, images, policy=dtypes.FP32
        )
        ctx, pooled = clip_text.encode_for_sdxl(
            params["text_encoder"], cfgs.text_l,
            params["text_encoder_2"], cfgs.text_g,
            ids_l, ids_g, policy=policy,
        )
        extra_ctx, _ = clip_text.encode_for_sdxl(
            params["text_encoder"], cfgs.text_l,
            params["text_encoder_2"], cfgs.text_g,
            extra_l, extra_g, policy=policy,
        )
        img = clip_vision.apply(
            params["image_encoder"], cfgs.vision, clip_pixels, policy=policy
        )["projected"]
        return mean, logvar, ctx, pooled, extra_ctx, img

    max_pos = cfgs.text_l.max_position_embeddings

    rows = {k: [] for k in (
        "latent_mean", "latent_logvar", "context", "pooled", "extra_context",
        "image_embeds", "original_size", "crop_coords", "target_size",
    )}
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        # no dropout during caching: raw text always encoded
        saved = (dataset.i_drop_rate, dataset.t_drop_rate, dataset.ti_drop_rate)
        dataset.i_drop_rate = dataset.t_drop_rate = dataset.ti_drop_rate = 0.0
        batch = dataset.make_batch(idx, rng)
        dataset.i_drop_rate, dataset.t_drop_rate, dataset.ti_drop_rate = saved
        mean, logvar, ctx, pooled, extra_ctx, img = encode(
            jnp.asarray(batch["images"]), jnp.asarray(batch["clip_pixels"]),
            jnp.asarray(batch["ids_l"][:, :max_pos]), jnp.asarray(batch["ids_g"][:, :max_pos]),
            jnp.asarray(batch["extra_l"][:, :max_pos]), jnp.asarray(batch["extra_g"][:, :max_pos]),
        )
        rows["latent_mean"].append(np.asarray(mean, np.float32))
        rows["latent_logvar"].append(np.asarray(logvar, np.float32))
        rows["context"].append(np.asarray(ctx, np.float32))
        rows["pooled"].append(np.asarray(pooled, np.float32))
        rows["extra_context"].append(np.asarray(extra_ctx, np.float32))
        rows["image_embeds"].append(np.asarray(img, np.float32))
        rows["original_size"].append(batch["original_size"])
        rows["crop_coords"].append(batch["crop_coords"])
        rows["target_size"].append(batch["target_size"])

    cache = {k: np.concatenate(v) for k, v in rows.items()}

    # empty-prompt row for CFG text dropout
    el, eg = dataset.tokenizers("")
    ectx, epooled = jax.jit(
        lambda l, g: clip_text.encode_for_sdxl(
            params["text_encoder"], cfgs.text_l,
            params["text_encoder_2"], cfgs.text_g, l, g, policy=policy)
    )(jnp.asarray(el[:, :max_pos]), jnp.asarray(eg[:, :max_pos]))
    cache["empty_context"] = np.asarray(ectx, np.float32)
    cache["empty_pooled"] = np.asarray(epooled, np.float32)
    return cache


def batches_from_cache(cache, batch_size, *, seed=0, epochs=None,
                       i_drop_rate=0.05, t_drop_rate=0.05, ti_drop_rate=0.05,
                       drop_remainder=True):
    """Yield train-step batches with CFG condition dropout applied as cached
    row swaps / zeroing (same probabilities as the live dataset)."""
    rng = np.random.default_rng(seed)
    n = cache["latent_mean"].shape[0]
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size]
            if len(idx) < batch_size and drop_remainder:
                continue
            b = {k: cache[k][idx] for k in (
                "latent_mean", "latent_logvar", "context", "pooled",
                "extra_context", "image_embeds", "original_size",
                "crop_coords", "target_size")}
            drop_image = np.zeros(len(idx), np.float32)
            for i in range(len(idx)):
                r = rng.random()
                if r < i_drop_rate:
                    drop_image[i] = 1.0
                elif r < i_drop_rate + t_drop_rate:
                    b["context"][i] = cache["empty_context"][0]
                    b["pooled"][i] = cache["empty_pooled"][0]
                elif r < i_drop_rate + t_drop_rate + ti_drop_rate:
                    b["context"][i] = cache["empty_context"][0]
                    b["pooled"][i] = cache["empty_pooled"][0]
                    drop_image[i] = 1.0
            b["drop_image"] = drop_image
            yield b
        epoch += 1
