"""IP cross-attention map observability.

The reference harvests per-layer IP attention probabilities via forward
hooks + a stored ``processor.attn_map`` (reference ip_adapter/utils.py:6-79,
attention_processor.py:222,443-444), upscales them to image size and
averages into a heatmap. Here the probes are a *return value* of the jitted
UNet call (no hooks, no module state): one call yields every active IP
layer's (B, heads, Sq, num_ip_tokens) tensor.

Note the reference's 2_0 path computes its stored map as
``query @ key.T.softmax(-1)`` — softmax over the key projection, an
operator-precedence bug (SURVEY.md §2). We compute the actual attention
probabilities.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import clip_vision, unet
from imagharmony_tpu.pipelines import components as comp
from imagharmony_tpu.pipelines.harmony_edit import encode_texts, image_prompt_tokens
from imagharmony_tpu.schedulers import diffusion as sched


@functools.partial(jax.jit, static_argnames=("cfgs", "timestep", "latent_size", "policy"))
def _probe_jit(params, cfgs, ids, pixel_values, noise, *, timestep, latent_size, policy):
    context, pooled = encode_texts(params, cfgs, ids["pos_l"], ids["pos_g"], policy=policy)
    extra_ctx = None
    if "extra_l" in ids:
        extra_ctx, _ = encode_texts(params, cfgs, ids["extra_l"], ids["extra_g"], policy=policy)
    ip_cond, _ = image_prompt_tokens(params, cfgs, pixel_values, extra_ctx, policy=policy)

    acp = sched.alphas_cumprod(sched.NoiseScheduleConfig())
    # probe on a mid-schedule noisy latent of pure noise (x_T-ish state)
    latents = noise
    time_ids = jnp.array(
        [[latent_size * 8.0, latent_size * 8.0, 0, 0, latent_size * 8.0, latent_size * 8.0]]
    )
    probs = []
    unet.apply(
        params["unet"], cfgs.unet, latents, jnp.array([float(timestep)]), context,
        pooled_text_embeds=pooled, time_ids=time_ids, ip_tokens=ip_cond,
        policy=policy, collect_ip_probs=probs,
    )
    return tuple(probs)


def ip_attention_maps(pipe, pil_image, *, prompt, extra_text=None, timestep=500,
                      latent_size=64, seed=0):
    """-> (num_ip_tokens, latent_size*8, latent_size*8) float heatmaps in
    [0, 1], averaged over the target block's layers and heads."""
    pixel_values = jnp.asarray(
        clip_vision.preprocess_numpy(pil_image, image_size=pipe.cfgs.vision.image_size)[:1]
    )
    ids = {}
    ids["pos_l"], ids["pos_g"] = pipe._tokenize(prompt)
    if extra_text is not None:
        ids["extra_l"], ids["extra_g"] = pipe._tokenize(extra_text)
    noise = jax.random.normal(
        jax.random.PRNGKey(seed), (1, latent_size, latent_size, 4), jnp.float32
    )
    probs = _probe_jit(
        pipe.params, pipe.cfgs, ids, pixel_values, noise,
        timestep=timestep, latent_size=latent_size, policy=pipe.policy,
    )
    # each: (1, heads, Sq, T_ip); layers may differ in Sq — upscale each
    per_layer = [np.asarray(p, dtype=np.float32)[0] for p in probs]
    return postprocess_ip_probs(per_layer, latent_size * 8)


def postprocess_ip_probs(probs_list, out_size, *, token_softmax=False,
                         minmax=True):
    """Per-layer (heads, Sq, T) attention probabilities -> (T, out, out)
    heatmaps: mean over heads, tokens-first transpose, square-grid reshape,
    bilinear upscale (half-pixel centers, torch align_corners=False
    semantics), mean over layers.

    This is the reference's upscale/get_net_attn_map composition
    (ip_adapter/utils.py:22-59) with one DELIBERATE divergence: the
    reference applies a per-layer softmax over the TOKEN axis after the
    upscale (utils.py:44) — a cross-token renormalization of what are
    already per-query probabilities — and returns un-normalized means; we
    keep the averaged probabilities and min-max normalize each token map
    to [0, 1] for rendering. ``token_softmax=True`` reproduces the
    reference composition exactly (used by the reference-oracle test).
    """
    maps = []
    for p in probs_list:
        p = np.asarray(p, dtype=np.float32)              # (heads, Sq, T)
        hw = int(round(p.shape[1] ** 0.5))
        m = p.mean(axis=0).T.reshape(-1, hw, hw)         # (T, h, w)
        m = jax.image.resize(jnp.asarray(m), (m.shape[0], out_size, out_size), "bilinear")
        if token_softmax:  # reference utils.py:44 (see docstring)
            m = jax.nn.softmax(m, axis=0)
        maps.append(np.asarray(m))
    avg = np.mean(maps, axis=0)
    if not minmax:
        return avg
    lo, hi = avg.min(axis=(1, 2), keepdims=True), avg.max(axis=(1, 2), keepdims=True)
    return (avg - lo) / np.maximum(hi - lo, 1e-8)


def heatmap_to_pil(maps, base_image=None, alpha=0.5):
    """Render token heatmaps to PIL images, optionally blended over the
    input (the reference's attnmaps2images + blend path, utils.py:61-79)."""
    from PIL import Image

    out = []
    for m in maps:
        gray = (m * 255).astype(np.uint8)
        im = Image.fromarray(gray).convert("RGB")
        if base_image is not None:
            base = base_image.convert("RGB").resize(im.size)
            im = Image.blend(base, im, alpha)
        out.append(im)
    return out
