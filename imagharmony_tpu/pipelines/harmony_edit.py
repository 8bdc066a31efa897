"""The QL-Edit pipeline: reference image + prompt + extra_text → edited image.

TPU-native rebuild of the reference's main inference path
(IPAdapterXL.generate → StableDiffusionXLCustomPipeline.__call__,
reference ip_adapter/ip_adapter.py:257-340 + custom_pipelines.py:304-394).
Design departures, all deliberate:

* The entire generate body after host preprocessing is ONE jitted function:
  text encoders → vision encoder → HA fusion → image proj → a ``lax.scan``
  denoise loop with the CFG pair packed on the batch axis → VAE decode.
  (The reference runs a Python for-loop launching per-step kernels,
  custom_pipelines.py:325.)
* The per-step IP-scale window (control_guidance_start/end,
  custom_pipelines.py:319-329) is a precomputed (steps,) array consumed
  inside the scan — no attention-processor mutation mid-loop.
* CFG pairs: batch is [uncond | cond] (matching custom_pipelines.py:296
  ordering) so one UNet call serves both branches.
* extra_text is optional here; the reference requires it de facto
  (undefined-variable path at ip_adapter.py:285-300 when None).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.adapters import harmony
from imagharmony_tpu.models import clip_text, clip_vision, unet, vae
from imagharmony_tpu.pipelines import components as comp
from imagharmony_tpu.schedulers import diffusion as sched

DEFAULT_NEGATIVE = "monochrome, lowres, bad anatomy, worst quality, low quality"
DEFAULT_PROMPT = "best quality, high quality"


@dataclasses.dataclass(frozen=True)
class EditOptions:
    """Static knobs of one edit call (hashable → part of the jit key)."""

    height: int = 1024
    width: int = 1024
    num_inference_steps: int = 30
    scheduler: str = "euler"
    # "leading" (SDXL shipped config) | "trailing" | "linspace". Trailing
    # includes t≈999 and is markedly better at low step counts
    # (arXiv 2305.08891 §4.2) — the basis of the --fast preset.
    timestep_spacing: str = "leading"
    # Karras rho=7 sigma spacing (arXiv 2206.00364; euler/dpm++ only)
    use_karras: bool = False
    guidance_scale: float = 5.0
    ip_scale: float = 1.0
    control_guidance_start: float = 0.0
    control_guidance_end: float = 1.0
    use_harmony: bool = True
    tile_vae: bool = False
    # CFG rescaling per arXiv 2305.08891 §3.4 (reference custom_pipelines.py:352-354)
    guidance_rescale: float = 0.0
    # stop at a fraction of the schedule (mixture-of-denoisers handoff,
    # reference custom_pipelines.py:308-316)
    denoising_end: Optional[float] = None
    # refiner side of the handoff: skip the first fraction and consume
    # already-noisy input latents (generate(latents=..., denoising_start=x))
    denoising_start: Optional[float] = None
    # skip the VAE and return pre-decode latents (B, h, w, 4) — the
    # reference pipeline's output_type="latent" split
    # (custom_pipelines.py:361-377)
    return_latents: bool = False
    # img2img (beyond the reference — diffusers Img2ImgPipeline semantics):
    # skip the first N schedule steps and start from the init image noised
    # to step N; set via generate(init_image=..., strength=...)
    img2img_skip: int = 0
    # SDXL micro-conditioning overrides ((h, w) / (top, left) tuples;
    # None -> output size / zero crop; reference custom_pipelines.py:48-53)
    original_size: Optional[tuple] = None
    crops_coords_top_left: tuple = (0, 0)
    target_size: Optional[tuple] = None
    negative_original_size: Optional[tuple] = None
    negative_crops_coords_top_left: Optional[tuple] = None
    negative_target_size: Optional[tuple] = None
    controlnet_scale: float = 1.0
    # decode the whole batch in one VAE call even when >2 rows: right on a
    # device mesh (rows are sharded, per-row lax.map would serialize the
    # fan-out); single-chip >2-row batches default to per-row decode
    # (a 4-row 1024² batched decode OOMs a 16 GB chip)
    batched_decode: bool = False
    # encoder propagation (Faster Diffusion, arXiv 2312.09608): run the
    # UNet encoder every k-th step only, reuse its features in between.
    # 1 = exact (default); >1 changes outputs — gated behind --turbo.
    encoder_interval: int = 1
    # UNet output parametrization: "epsilon" (SDXL/SD1.5) | "v_prediction"
    # (SD2.x-style models) | "sample". Converted to epsilon inside the
    # scheduler step (schedulers/diffusion.to_epsilon).
    prediction_type: str = "epsilon"
    # zero terminal SNR beta rescale (arXiv 2305.08891 §3.1) — for
    # v-prediction models trained with it; pair with trailing spacing
    rescale_zero_snr: bool = False
    # aesthetic-score micro-conditioning (SDXL refiner,
    # requires_aesthetics_score=True — diffusers XLImg2Img defaults)
    aesthetic_score: float = 6.0
    negative_aesthetic_score: float = 2.5
    # condition on an earlier text-encoder layer (diffusers clip_skip)
    clip_skip: int = 0

    def time_ids(self, negative=False, aesthetic=False):
        osz = self.original_size or (self.height, self.width)
        tsz = self.target_size or (self.height, self.width)
        crop = self.crops_coords_top_left
        if negative:
            osz = self.negative_original_size or osz
            tsz = self.negative_target_size or tsz
            crop = self.negative_crops_coords_top_left or crop
        head = [float(osz[0]), float(osz[1]), float(crop[0]), float(crop[1])]
        if aesthetic:
            # refiner micro-conditioning: original + crop + aesthetic score
            # (no target_size — diffusers _get_add_time_ids with
            # requires_aesthetics_score)
            score = self.negative_aesthetic_score if negative else self.aesthetic_score
            return head + [float(score)]
        return head + [float(tsz[0]), float(tsz[1])]


def rescale_noise_cfg(eps_cfg, eps_text, rescale):
    """arXiv 2305.08891 eq. 16: rein in CFG-induced overexposure."""
    axes = tuple(range(1, eps_text.ndim))
    std_text = jnp.std(eps_text.astype(jnp.float32), axis=axes, keepdims=True)
    std_cfg = jnp.std(eps_cfg.astype(jnp.float32), axis=axes, keepdims=True)
    rescaled = eps_cfg * (std_text / jnp.maximum(std_cfg, 1e-8)).astype(eps_cfg.dtype)
    return rescale * rescaled + (1.0 - rescale) * eps_cfg


def sched_config(opts: EditOptions) -> sched.NoiseScheduleConfig:
    """The NoiseScheduleConfig an EditOptions implies (single source of
    truth for the one-jit, chunked and serving paths)."""
    return sched.NoiseScheduleConfig(
        timestep_spacing=opts.timestep_spacing,
        use_karras_sigmas=opts.use_karras,
        prediction_type=opts.prediction_type,
        rescale_betas_zero_snr=opts.rescale_zero_snr,
    )


def ancestral_key(scheduler: str, seeds):
    """Host-side PRNG key for the stochastic schedulers' per-step noise
    (euler_a's ancestral draws, lcm's re-noising), derived from the run's
    seed(s) on a stream disjoint from the init-noise draw (a fixed tag
    folded into the seed key). None for the deterministic schedulers — the
    jit signature then carries no key operand."""
    if scheduler not in ("euler_a", "euler_ancestral", "lcm"):
        return None
    k = jax.random.PRNGKey(int(seeds[0]))
    for s_ in seeds[1:]:
        k = jax.random.fold_in(k, int(s_))
    return jax.random.fold_in(k, 0xA9CE57)


def ip_scale_schedule(opts: EditOptions) -> np.ndarray:
    """Per-step IP scale: 0 outside the [start, end) window
    (reference custom_pipelines.py:326-329)."""
    n = opts.num_inference_steps
    i = np.arange(n, dtype=np.float32)
    on = (i / n >= opts.control_guidance_start) & ((i + 1) / n <= opts.control_guidance_end)
    return np.where(on, opts.ip_scale, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Jitted core
# ---------------------------------------------------------------------------


def encode_texts(params, cfgs: comp.ComponentConfigs, ids_l, ids_g, *, policy,
                 clip_skip: int = 0):
    """Text conditioning: dual-tower concat for SDXL; single CLIP-L
    last-hidden-state for the SD1.5 family (pooled is None there); bigG
    penultimate + projected-pooled alone for the refiner (diffusers
    XLImg2Img encode_prompt with one tower). clip_skip conditions on an
    earlier encoder layer (diffusers clip_skip semantics)."""
    if cfgs.family == "sd15":
        out = clip_text.apply(params["text_encoder"], cfgs.text_l, ids_l,
                              policy=policy, clip_skip=clip_skip)
        return out["last"], None
    if cfgs.family == "sdxl_refiner":
        out = clip_text.apply(params["text_encoder_2"], cfgs.text_g, ids_g,
                              policy=policy, clip_skip=clip_skip)
        return out["penultimate"], out["projected"]
    return clip_text.encode_for_sdxl(
        params["text_encoder"], cfgs.text_l,
        params["text_encoder_2"], cfgs.text_g,
        ids_l, ids_g, policy=policy, clip_skip=clip_skip,
    )


def image_prompt_tokens(params, cfgs, pixel_values, extra_context, *, policy):
    """CLIP vision → (HA fuse with extra_text) → prompt tokens; plus the
    unconditional tokens from a zeroed embedding
    (reference ip_adapter.py:158-177)."""
    vision_out = clip_vision.apply(params["image_encoder"], cfgs.vision, pixel_values, policy=policy)
    if cfgs.proj_kind == "image_proj":
        embeds = vision_out["projected"]
        if extra_context is not None and cfgs.harmony is not None:
            embeds = harmony.fuse_image_embeds(
                params["harmony"], cfgs.harmony, extra_context, embeds, policy=policy
            )
        cond = comp.project_image_embeds(
            params, cfgs, {**vision_out, "projected": embeds}, policy=policy
        )
        uncond = comp.project_image_embeds(
            params, cfgs, {**vision_out, "projected": jnp.zeros_like(embeds)}, policy=policy
        )
    else:
        # Plus variants: tokens from penultimate patches; uncond from a
        # black image's features (reference ip_adapter.py:371-374).
        cond = comp.project_image_embeds(params, cfgs, vision_out, policy=policy)
        zero_out = clip_vision.apply(
            params["image_encoder"], cfgs.vision, jnp.zeros_like(pixel_values), policy=policy
        )
        uncond = comp.project_image_embeds(params, cfgs, zero_out, policy=policy)
    return cond, uncond


def build_conditioning(params, cfgs: comp.ComponentConfigs, opts: EditOptions,
                       ids, pixel_values, *, num_samples, policy):
    """All CFG-packed conditioning tensors for a denoise run.

    Returns (context2, pooled2, time_ids, ip2), each (2·B·num_samples, ...)
    in [uncond | cond] row order (pooled2/time_ids are None for SD1.5).
    Shared by the one-jit edit path and the chunked/continuous runner.
    """
    # --- text conditioning: [neg | pos] rows in one encoder batch ---
    # B independent requests are supported: every ids entry is (B, 77).
    breq = ids["pos_l"].shape[0]
    ids_l = jnp.concatenate([ids["neg_l"], ids["pos_l"]], axis=0)
    ids_g = jnp.concatenate([ids["neg_g"], ids["pos_g"]], axis=0)
    context, pooled = encode_texts(params, cfgs, ids_l, ids_g, policy=policy,
                                   clip_skip=opts.clip_skip)
    neg_ctx, pos_ctx = context[:breq], context[breq:]
    if pooled is None:
        neg_pooled = pos_pooled = None
    else:
        neg_pooled, pos_pooled = pooled[:breq], pooled[breq:]

    # prompt-attention weights (utils/prompts.py, opt-in): scale each
    # token's context embedding, then restore the per-row mean (the A1111
    # application rule). Applied to the combined context so both towers'
    # halves scale together; pooled embeds stay unweighted.
    def apply_w(ctx, w):
        z = ctx.astype(jnp.float32)
        mean0 = z.mean(axis=(1, 2), keepdims=True)
        z = z * w[:, :, None]
        mean1 = z.mean(axis=(1, 2), keepdims=True)
        ratio = jnp.where(jnp.abs(mean1) < 1e-7, 1.0, mean0 / mean1)
        return (z * ratio).astype(ctx.dtype)

    if "pos_w" in ids:
        pos_ctx = apply_w(pos_ctx, ids["pos_w"])
    if "neg_w" in ids:
        neg_ctx = apply_w(neg_ctx, ids["neg_w"])

    extra_ctx = None
    if opts.use_harmony and "extra_l" in ids:
        extra_ctx, _ = encode_texts(params, cfgs, ids["extra_l"], ids["extra_g"],
                                    policy=policy, clip_skip=opts.clip_skip)

    # --- CFG packing, repeated to num_samples ---
    def rep(x):
        return jnp.repeat(x, num_samples, axis=0)

    # --- image prompt tokens (absent for the refiner — proj_kind "none" —
    # and for plain text-to-image runs, where no reference image is given
    # and the IP branch stays off) ---
    if cfgs.proj_kind == "none" or pixel_values is None:
        ip2 = None
    else:
        ip_cond, ip_uncond = image_prompt_tokens(
            params, cfgs, pixel_values, extra_ctx, policy=policy
        )
        ip2 = jnp.concatenate([rep(ip_uncond), rep(ip_cond)], axis=0)

    context2 = jnp.concatenate([rep(neg_ctx), rep(pos_ctx)], axis=0)
    pooled2 = (
        None if pos_pooled is None
        else jnp.concatenate([rep(neg_pooled), rep(pos_pooled)], axis=0)
    )

    # SDXL micro-conditioning: (orig_h, orig_w, crop_t, crop_l, tgt_h, tgt_w),
    # or (orig, crop, aesthetic_score) for the refiner
    if cfgs.family == "sd15":
        time_ids = None
    else:
        aes = cfgs.family == "sdxl_refiner"
        tid_pos = jnp.tile(
            jnp.array([opts.time_ids(aesthetic=aes)], jnp.float32), (breq, 1)
        )
        tid_neg = jnp.tile(
            jnp.array([opts.time_ids(negative=True, aesthetic=aes)], jnp.float32),
            (breq, 1),
        )
        time_ids = jnp.concatenate([rep(tid_neg), rep(tid_pos)], axis=0)
    return context2, pooled2, time_ids, ip2


def denoise(
    params_unet,
    unet_cfg: unet.UNetConfig,
    latents,
    context,
    pooled,
    time_ids,
    ip_tokens,
    schedule: sched.Schedule,
    ip_scales,
    *,
    guidance_scale,
    guidance_rescale=0.0,
    controlnet=None,
    encoder_interval: int = 1,
    prediction_type: str = "epsilon",
    inpaint=None,
    ancestral_rng=None,
    policy,
    backend=None,
):
    """lax.scan denoise loop. latents (B,h,w,4); context/pooled/time_ids/
    ip_tokens are CFG-packed (2B, ...) [uncond | cond].

    controlnet: optional (params, cfg, cond_2B, scale) — the branch runs
    each step on the same CFG-packed inputs (text-only conditioning) and
    its residuals steer the UNet.

    encoder_interval > 1 enables encoder propagation (Faster Diffusion,
    arXiv 2312.09608): the UNet encoder (+ ControlNet branch) runs only at
    every ``encoder_interval``-th step and its features are reused in
    between — an output-changing approximation, gated behind --turbo.

    inpaint: optional (mask, image_latents, noise) — masked editing
    (diffusers InpaintPipeline latent-blend semantics, beyond the
    reference): after every scheduler step the kept region (mask == 0) is
    replaced by the init image's latents re-noised to the NEXT step's
    level with the run's initial noise; the final step blends the clean
    latents. mask is (B, h, w, 1) float {0 = keep, 1 = repaint}.

    guidance_scale <= 1 disables classifier-free guidance entirely
    (diffusers do_classifier_free_guidance): the uncond rows are sliced
    away here and every UNet/ControlNet eval runs at batch B instead of
    2B — the fast path for guidance-distilled/turbo-style checkpoints."""
    b = latents.shape[0]
    xs = sched.scan_constants(schedule) + (jnp.asarray(ip_scales),)
    kind = schedule.kind
    xs = xs + (_inpaint_blend_levels(schedule),)

    use_cfg = guidance_scale > 1.0
    if not use_cfg:
        def half(a):
            return None if a is None else a[a.shape[0] // 2:]

        context, pooled, time_ids, ip_tokens = (
            half(context), half(pooled), half(time_ids), half(ip_tokens)
        )
        if controlnet is not None:
            cn_p, cn_c, cn_cond, cn_s = controlnet
            controlnet = (cn_p, cn_c, half(cn_cond), cn_s)

    if encoder_interval > 1:
        return _denoise_encoder_prop(
            params_unet, unet_cfg, latents, context, pooled, time_ids,
            ip_tokens, schedule, ip_scales,
            guidance_scale=guidance_scale, guidance_rescale=guidance_rescale,
            controlnet=controlnet, encoder_interval=encoder_interval,
            prediction_type=prediction_type, inpaint=inpaint,
            ancestral_rng=ancestral_rng,
            policy=policy, backend=backend,
        )

    rows = 2 * b if use_cfg else b

    def body(carry, x):
        lat, solver_state = carry
        t, sigma, sigma_next, ip_s, blend_lv = x
        lat_in = jnp.concatenate([lat, lat], axis=0) if use_cfg else lat
        lat_in = sched.scale_model_input_c(kind, sigma, lat_in)
        down_res = mid_res = None
        if controlnet is not None:
            from imagharmony_tpu.models import controlnet as controlnet_lib

            cn_params, cn_cfg, cn_cond, cn_scale = controlnet
            down_res, mid_res = controlnet_lib.apply(
                cn_params, cn_cfg, lat_in, jnp.broadcast_to(t, (rows,)),
                context, cn_cond,
                pooled_text_embeds=pooled, time_ids=time_ids,
                conditioning_scale=cn_scale, backend=backend, policy=policy,
            )
        eps = unet.apply(
            params_unet,
            unet_cfg,
            lat_in,
            jnp.broadcast_to(t, (rows,)),
            context,
            pooled_text_embeds=pooled,
            time_ids=time_ids,
            ip_tokens=ip_tokens,
            ip_scale=ip_s,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res,
            policy=policy,
            backend=backend,
        )
        if use_cfg:
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps_g = eps_u + guidance_scale * (eps_c - eps_u)
            if guidance_rescale > 0.0:
                eps_g = rescale_noise_cfg(eps_g, eps_c, guidance_rescale)
        else:
            eps_g = eps
        lat, solver_state = sched.step_s(
            kind, sigma, sigma_next, eps_g, lat, solver_state, prediction_type,
            timestep=t,
        )
        if inpaint is not None:
            lat = _inpaint_blend(kind, blend_lv, lat, inpaint)
        return (lat, solver_state), ()

    (latents, _), _ = jax.lax.scan(
        body, (latents, sched.init_solver_state(kind, latents, ancestral_rng)), xs
    )
    return latents


def _inpaint_blend_levels(schedule: sched.Schedule):
    """Per-step re-noise levels for the inpaint blend: the NEXT step's
    schedule entry, except the final step blends the CLEAN init latents
    (diffusers InpaintPipeline: the last blend uses init_latents, not
    add_noise). Clean == sigma 0 for euler/dpm++, alpha-cumprod 1 for ddim
    (noise_to_level returns the latents exactly at those values)."""
    clean = 1.0 if schedule.kind in ("ddim", "lcm") else 0.0
    tail = schedule.sigmas[1:]
    if schedule.num_steps == 0:  # zero-denoise img2img (strength < 1/n)
        return tail
    return tail.at[-1].set(clean)


def _inpaint_blend(kind, level, lat, inpaint):
    """mask==1 keeps the denoised value, mask==0 restores the init image's
    latents re-noised to ``level`` (fp32 blend, cast back)."""
    mask, img_lat, noise = inpaint
    keep = sched.noise_to_level(kind, level, img_lat, noise)
    out = mask * lat.astype(jnp.float32) + (1.0 - mask) * keep
    return out.astype(lat.dtype)


def _denoise_encoder_prop(
    params_unet, unet_cfg, latents, context, pooled, time_ids, ip_tokens,
    schedule, ip_scales, *, guidance_scale, guidance_rescale, controlnet,
    encoder_interval, prediction_type="epsilon", inpaint=None,
    ancestral_rng=None, policy, backend,
):
    """Denoise with the UNet encoder evaluated every ``encoder_interval``-th
    step and reused in between (Faster Diffusion, arXiv 2312.09608 — the
    encoder's features drift slowly across adjacent steps, the decoder does
    the denoising work). The cache is zero-initialised and the whole loop is
    one scan-of-cond: step 0 is a key step, so the cond's full branch
    overwrites the zeros before any reuse step reads them. Keeping EVERY key
    step on the identical cond program (instead of peeling step 0 as
    straight-line code) is what makes this path bit-equal to the chunked
    runner on TPU — a peeled step compiles to different fusions."""
    b = latents.shape[0]
    kind = schedule.kind
    n = schedule.num_steps
    ts_a, sig_a, sign_a = sched.scan_constants(schedule)
    ip_arr = jnp.asarray(ip_scales)
    blend_arr = _inpaint_blend_levels(schedule)
    use_cfg = guidance_scale > 1.0  # conditioning pre-sliced by denoise()
    rows = 2 * b if use_cfg else b

    def eps_at(lat, t, sigma, ip_s, *, enc=None, mid_res=None, want_enc=False):
        """One CFG-pair UNet eval. On key steps (enc is None) the ControlNet
        branch runs and produces both residual sets; on reuse steps the
        cached ``enc`` already bakes in the down-block residuals, and the
        key-step ``mid_res`` must be re-applied explicitly — the mid-block
        addition happens after the cached encoder point (unet.apply:407)."""
        lat_in = jnp.concatenate([lat, lat], axis=0) if use_cfg else lat
        lat_in = sched.scale_model_input_c(kind, sigma, lat_in)
        down_res = None
        if controlnet is not None and enc is None:
            from imagharmony_tpu.models import controlnet as controlnet_lib

            cn_params, cn_cfg, cn_cond, cn_scale = controlnet
            down_res, mid_res = controlnet_lib.apply(
                cn_params, cn_cfg, lat_in, jnp.broadcast_to(t, (rows,)),
                context, cn_cond, pooled_text_embeds=pooled,
                time_ids=time_ids, conditioning_scale=cn_scale,
                backend=backend, policy=policy,
            )
        out = unet.apply(
            params_unet, unet_cfg, lat_in, jnp.broadcast_to(t, (rows,)),
            context, pooled_text_embeds=pooled, time_ids=time_ids,
            ip_tokens=ip_tokens, ip_scale=ip_s,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res,
            policy=policy, backend=backend,
            return_encoder=want_enc, encoder_override=enc,
        )
        if want_enc:
            eps, enc_out = out
            return eps, enc_out, mid_res
        return out

    def guide_step(lat, eps, t, sigma, sigma_next, solver_state):
        if use_cfg:
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps_g = eps_u + guidance_scale * (eps_c - eps_u)
            if guidance_rescale > 0.0:
                eps_g = rescale_noise_cfg(eps_g, eps_c, guidance_rescale)
        else:
            eps_g = eps
        return sched.step_s(kind, sigma, sigma_next, eps_g, lat, solver_state,
                            prediction_type, timestep=t)

    enc_s, mid_s = jax.eval_shape(
        lambda lat: eps_at(lat, ts_a[0], sig_a[0], ip_arr[0], want_enc=True),
        latents,
    )[1:]
    zeros = lambda tree: jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), tree)
    enc, mid_res = zeros(enc_s), zeros(mid_s)

    def body(carry, i):
        lat, enc, mid_res, solver_state = carry
        t, sig, sig_n, ip_s = ts_a[i], sig_a[i], sign_a[i], ip_arr[i]
        is_key = (i % encoder_interval) == 0

        def full(lat_):
            return eps_at(lat_, t, sig, ip_s, want_enc=True)

        def reuse(lat_):
            return eps_at(lat_, t, sig, ip_s, enc=enc, mid_res=mid_res), enc, mid_res

        eps, enc_new, mid_new = jax.lax.cond(is_key, full, reuse, lat)
        lat, solver_state = guide_step(lat, eps, t, sig, sig_n, solver_state)
        if inpaint is not None:
            lat = _inpaint_blend(kind, blend_arr[i], lat, inpaint)
        return (lat, enc_new, mid_new, solver_state), ()

    (latents, _, _, _), _ = jax.lax.scan(
        body,
        (latents, enc, mid_res,
         sched.init_solver_state(kind, latents, ancestral_rng)),
        jnp.arange(n),
    )
    return latents


@functools.partial(
    jax.jit,
    static_argnames=("cfgs", "opts", "policy", "backend", "num_samples"),
)
def _edit_jit(
    params,
    cfgs: comp.ComponentConfigs,
    opts: EditOptions,
    ids,            # dict of token-id arrays, each (1, 77)
    pixel_values,   # (1, H, W, 3) CLIP-preprocessed
    noise,          # (num_samples, h, w, 4)
    control_cond=None,  # (1, Hc, Wc, 3) in [0,1] for the ControlNet branch
    init_pixels=None,   # (1, H, W, 3) in [-1,1] — img2img starting image
    mask=None,          # (1, h, w, 1) float {0=keep, 1=repaint} — inpainting
    ancestral_rng=None, # PRNG key for euler_a/lcm per-step noise
    *,
    num_samples: int,
    policy: dtypes.Policy = dtypes.DEFAULT,
    backend: Optional[str] = None,
):
    cfg_sched = sched_config(opts)
    schedule = sched.make(
        opts.scheduler, opts.num_inference_steps, cfg_sched,
        denoising_end=opts.denoising_end, denoising_start=opts.denoising_start,
        skip_steps=opts.img2img_skip,
    )
    n_skip = opts.img2img_skip
    if opts.denoising_start is not None and 0.0 < opts.denoising_start < 1.0:
        n_skip += sched.steps_for_denoising_end(
            opts.num_inference_steps, opts.denoising_start, cfg_sched
        )
    ip_scales = ip_scale_schedule(opts)[n_skip: n_skip + schedule.num_steps]

    context2, pooled2, time_ids, ip2 = build_conditioning(
        params, cfgs, opts, ids, pixel_values, num_samples=num_samples, policy=policy
    )

    cn = None
    if control_cond is not None and cfgs.controlnet is not None:
        # rows must match the latent batch (num_samples per request, or one
        # control image per request in generate_batch), then the CFG pair
        b_total = noise.shape[0]
        cond_rows = jnp.repeat(
            policy.cast(control_cond), b_total // control_cond.shape[0], axis=0
        )
        cond2 = jnp.concatenate([cond_rows, cond_rows], axis=0)
        cn = (params["controlnet"], cfgs.controlnet, cond2, opts.controlnet_scale)

    img_lat = None
    if init_pixels is not None:
        # img2img (diffusers Img2ImgPipeline semantics): deterministic VAE
        # posterior mean of the init image, noised to the tail schedule's
        # first step. bf16 encode mirrors the bf16 decode rationale below.
        enc_policy = (
            policy if policy.compute_dtype == jnp.bfloat16
            else dtypes.Policy(compute_dtype=jnp.float32)
        )
        img_lat = vae.encode(
            params["vae"], cfgs.vae, init_pixels, sample=False, policy=enc_policy
        ).astype(jnp.float32)
        img_lat = jnp.repeat(img_lat, noise.shape[0] // img_lat.shape[0], axis=0)
    if img_lat is not None and not (mask is not None and opts.img2img_skip == 0):
        # inpainting at strength 1.0 (skip == 0) starts from PURE noise
        # (diffusers InpaintPipeline is_strength_max); every other init
        # starts from the noised image latents
        latents = sched.img2img_init(schedule, img_lat, noise)
        latents = latents.astype(policy.compute_dtype)
    else:
        latents = (noise * schedule.init_noise_sigma).astype(policy.compute_dtype)
    inpaint = None
    if mask is not None:
        mask_rows = jnp.repeat(
            mask.astype(jnp.float32), noise.shape[0] // mask.shape[0], axis=0
        )
        inpaint = (mask_rows, img_lat, noise.astype(jnp.float32))
    latents = denoise(
        params["unet"], cfgs.unet, latents, context2, pooled2, time_ids, ip2,
        schedule, ip_scales, guidance_scale=opts.guidance_scale,
        guidance_rescale=opts.guidance_rescale,
        controlnet=cn,
        encoder_interval=opts.encoder_interval,
        prediction_type=opts.prediction_type,
        inpaint=inpaint,
        ancestral_rng=ancestral_rng,
        policy=policy, backend=backend,
    )

    if opts.denoising_end is not None or opts.return_latents:
        # mixture-of-denoisers handoff / output_type="latent": return the
        # pre-VAE latents (B, h, w, 4) for a refiner or external decode
        return latents

    # bf16 VAE decode on TPU: bf16 keeps fp32 exponent range, so the fp16
    # overflow the reference upcasts around (custom_pipelines.py:365-377)
    # cannot happen; fp32 stays available via policy for parity testing.
    vae_policy = policy if policy.compute_dtype == jnp.bfloat16 else dtypes.Policy(compute_dtype=jnp.float32)
    if opts.tile_vae:
        images = vae.decode_tiled(params["vae"], cfgs.vae, latents, policy=vae_policy)
    elif latents.shape[0] > 2 and not opts.batched_decode:
        # packed serving / PNS fan-out: a >2-row 1024² batch decode OOMs a
        # 16 GB chip (decoder activations scale with batch); decode rows
        # sequentially — exact, and small next to the 30-step denoise
        images = jax.lax.map(
            lambda l: vae.decode(params["vae"], cfgs.vae, l[None], policy=vae_policy)[0],
            latents,
        )
    else:
        images = vae.decode(params["vae"], cfgs.vae, latents, policy=vae_policy)
    return images  # (num_samples, H, W, 3) in [-1, 1]


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


def to_uint8(images) -> np.ndarray:
    arr = np.asarray(images, dtype=np.float32)
    return (np.clip(arr / 2 + 0.5, 0.0, 1.0) * 255).round().astype(np.uint8)


def preprocess_control(cfgs, control_image, height, width):
    """Resize + [0,1]-normalize one control image to the ControlNet cond
    resolution: latent size × 2^(stride-2 convs in the cond embedding).
    Returns (1, Hc, Wc, 3) float32. Shared by the one-jit, batched and
    continuous paths (reference pins cond to the pixel resolution the
    conditioning_embedding downsamples back to latent size)."""
    from PIL import Image as _Image

    if isinstance(control_image, np.ndarray):
        control_image = _Image.fromarray(control_image.astype(np.uint8))
    scale_px = 2 ** (len(cfgs.controlnet.conditioning_embedding_channels) - 1)
    down = cfgs.vae.downscale
    ch, cw = (height // down) * scale_px, (width // down) * scale_px
    arr = np.asarray(
        control_image.convert("RGB").resize((cw, ch)), np.float32
    ) / 255.0
    return arr[None]


def preprocess_init_image(image, height, width):
    """Resize one RGB image (PIL or HWC uint8 array) to the output
    resolution, [-1,1] NHWC float32 — the VAE encoder's input contract
    (img2img starting image)."""
    from PIL import Image as _Image

    if isinstance(image, np.ndarray):
        image = _Image.fromarray(image.astype(np.uint8))
    arr = np.asarray(image.convert("RGB").resize((width, height)), np.float32)
    return (arr / 127.5 - 1.0)[None]


def preprocess_mask(mask_image, height, width, downscale):
    """One inpaint mask (PIL, HW/HWC array, or (h, w)/(h, w, 1) float
    array in [0,1]) → (1, h_lat, w_lat, 1) float32 {0, 1}; white/1 =
    repaint (diffusers mask convention). Nearest-neighbor to latent
    resolution, binarized at 0.5."""
    from PIL import Image as _Image

    hl, wl = height // downscale, width // downscale
    if isinstance(mask_image, np.ndarray) and mask_image.dtype != np.uint8:
        arr = np.squeeze(np.asarray(mask_image, np.float32))
        mask_image = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    if isinstance(mask_image, np.ndarray):
        mask_image = _Image.fromarray(mask_image)
    m = mask_image.convert("L").resize((wl, hl), _Image.NEAREST)
    arr = (np.asarray(m, np.float32) >= 127.5).astype(np.float32)
    return arr[None, :, :, None]


class HarmonyPipeline:
    """Host-side front end: tokenization + CLIP preprocessing + PRNG, then
    one jitted device program per (shape, options) signature.

    API mirrors the reference entry point (IPAdapterXL.generate,
    reference ip_adapter.py:257-268): generate(pil_image, prompt,
    negative_prompt, extra_text, scale, num_samples, seed, ...).
    """

    def __init__(self, params, cfgs: comp.ComponentConfigs, tokenizers=None, *,
                 policy: dtypes.Policy = dtypes.DEFAULT, backend: Optional[str] = None):
        # pin params to device once — host (numpy) param trees would
        # otherwise re-transfer on every jitted call (0.24 GB/s through a
        # tunneled TPU makes that catastrophic)
        self.params = jax.device_put(params)
        self.cfgs = cfgs
        self.tokenizers = tokenizers
        self.policy = policy
        if backend is None:
            # Pallas fused attention on TPU; XLA elsewhere (kernels check
            # shapes and fall back themselves, this just sets the default).
            backend = "pallas" if jax.devices()[0].platform in ("tpu", "axon") else "xla"
        self.backend = backend

    # -- constructors ------------------------------------------------------

    @classmethod
    def random_tiny(cls, seed=0, **kw):
        """Random-weight miniature pipeline (tests, demos, benches)."""
        from imagharmony_tpu.models import tokenizer as tok_lib

        toy = tok_lib.build_toy_tokenizer()
        cfgs = comp.tiny_configs(vocab_size=len(toy.encoder), **kw)
        params = comp.init_params(jax.random.PRNGKey(seed), cfgs)
        toks = tok_lib.SDXLTokenizers(toy, toy)
        return cls(params, cfgs, toks)

    @classmethod
    def random_full(cls, seed=0, *, dtype=None):
        """Full-size random-weight SDXL pipeline (e2e benches, preset
        validation drills): real SDXL/CLIP dims, toy tokenizer (random
        weights make the vocab contents irrelevant — ids just index the
        full-size embedding tables). bf16 storage on TPU by default."""
        import jax.numpy as jnp

        from imagharmony_tpu.models import tokenizer as tok_lib

        if dtype is None:
            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            dtype = jnp.bfloat16 if on_tpu else jnp.float32
        toy = tok_lib.build_toy_tokenizer()
        cfgs = comp.sdxl_configs()
        params = comp.init_params(jax.random.PRNGKey(seed), cfgs, dtype=dtype)
        policy = dtypes.Policy(param_dtype=dtype, compute_dtype=jnp.bfloat16)
        return cls(params, cfgs, tok_lib.SDXLTokenizers(toy, toy), policy=policy)

    @classmethod
    def random_tiny_refiner(cls, seed=0):
        """Random-weight miniature SDXL-refiner pipeline (single bigG
        tower, aesthetic-score micro-conditioning, no image prompt)."""
        from imagharmony_tpu.models import tokenizer as tok_lib

        toy = tok_lib.build_toy_tokenizer()
        cfgs = comp.sdxl_refiner_tiny_configs(vocab_size=len(toy.encoder))
        params = comp.init_params(jax.random.PRNGKey(seed), cfgs)
        return cls(params, cfgs, tok_lib.SDXLTokenizers(toy, toy))

    @classmethod
    def random_tiny_sd15(cls, seed=0):
        """Random-weight miniature SD1.5 pipeline (single text tower,
        vanilla IP-Adapter on all layers, no HA)."""
        from imagharmony_tpu.models import tokenizer as tok_lib

        toy = tok_lib.build_toy_tokenizer()
        cfgs = comp.sd15_tiny_configs(vocab_size=len(toy.encoder))
        params = comp.init_params(jax.random.PRNGKey(seed), cfgs)
        toks = tok_lib.SDXLTokenizers(toy, toy)
        return cls(params, cfgs, toks)

    def with_mesh(self, mesh, *, tensor_parallel=False):
        """Data-parallel clone over a device mesh: params replicated, the
        request batch (noise rows) sharded over the ``data`` axis, so the
        K-seed PNS fan-out and packed serving batches ride ICI as pure DP —
        the reference's only parallelism strategy (accelerate DDP, reference
        train.py:492-496) applied to inference (SURVEY.md §2).

        ``tensor_parallel=True`` additionally shards the attention/FFN
        projections over the ``model`` axis (parallel/tp_rules.py) — GSPMD
        splits every matmul across chips and all-reduces the row-parallel
        outputs over ICI, cutting SINGLE-image latency instead of only
        throughput (beyond the reference, which has no TP).
        """
        from imagharmony_tpu.parallel import mesh as mesh_lib
        from imagharmony_tpu.parallel import tp_rules

        clone = object.__new__(HarmonyPipeline)
        clone.__dict__.update(self.__dict__)
        clone.params = (
            tp_rules.shard_params_tp(mesh, self.params)
            if tensor_parallel
            else mesh_lib.replicate(mesh, self.params)
        )
        clone._mesh = mesh
        clone._tp = tensor_parallel
        return clone

    def with_textual_inversion(self, source, token=None):
        """Clone with a learned textual-inversion embedding installed
        (diffusers load_textual_inversion role, beyond the reference):
        the placeholder ``token`` becomes a literal tokenizer token whose
        id rows are appended to the text tower's embedding table; a
        multi-vector embedding's single prompt token expands to its n ids.

        ``source`` is a safetensors path or a ``{key: (n, D) array}`` dict:
        SDXL uses the dual-tower format ``{"clip_l": ..., "clip_g": ...}``;
        single-tower families (SD1.5 / refiner) take one entry whose key is
        the token name (or pass ``token=`` explicitly). Chainable — call
        once per concept."""
        import copy

        import numpy as np

        if isinstance(source, (str, bytes)):
            name = source.decode() if isinstance(source, bytes) else source
            if name.endswith((".pt", ".bin")):
                # A1111-style torch embedding: {"string_to_param": {"*": t}}
                # (+ optional "name"), or a bare {token: tensor} torch dict
                from imagharmony_tpu.io import torch_pickle

                obj = torch_pickle.load(name)
                if isinstance(obj, dict) and "string_to_param" in obj:
                    vec = next(iter(obj["string_to_param"].values()))
                    if token is None and isinstance(obj.get("name"), str):
                        token = obj["name"]
                    tensors = {token or "<concept>": np.asarray(vec)}
                else:
                    tensors = {
                        k: np.asarray(v) for k, v in obj.items()
                        if hasattr(v, "shape")
                    }
            else:
                from imagharmony_tpu.io import safetensors_io

                tensors, _meta = safetensors_io.load(source)
        else:
            tensors = dict(source)

        dual = "clip_l" in tensors and "clip_g" in tensors
        if not dual and len(tensors) != 1:
            raise ValueError(
                "expected {'clip_l','clip_g'} (SDXL) or a single "
                f"token-keyed entry, got keys {sorted(tensors)}"
            )
        if token is None:
            token = "<concept>" if dual else next(iter(tensors))
        token = token.lower()

        # (param_key, cfg_field, tokenizer_attr, rows) per tower
        jobs = []
        if self.cfgs.family == "sd15":
            rows = tensors[next(iter(tensors))]
            jobs.append(("text_encoder", "text_l", "tok1", rows))
        elif self.cfgs.family == "sdxl_refiner":
            rows = tensors["clip_g"] if dual else tensors[next(iter(tensors))]
            jobs.append(("text_encoder_2", "text_g", "tok2", rows))
        else:
            if not dual:
                raise ValueError(
                    "SDXL textual inversion needs the dual-tower format "
                    "{'clip_l': (n, 768), 'clip_g': (n, 1280)}"
                )
            jobs.append(("text_encoder", "text_l", "tok1", tensors["clip_l"]))
            jobs.append(("text_encoder_2", "text_g", "tok2", tensors["clip_g"]))

        import dataclasses as _dc

        clone = object.__new__(HarmonyPipeline)
        clone.__dict__.update(self.__dict__)
        clone.params = dict(self.params)
        cfgs = self.cfgs
        toks = {
            "tok1": copy.copy(self.tokenizers.tok1),
            "tok2": copy.copy(self.tokenizers.tok2),
        }
        # independent added-token maps even when tok1 is tok2 (toy setups)
        for t in toks.values():
            t.added_tokens = dict(t.added_tokens)

        n_vec = None
        for pkey, cfield, tattr, rows in jobs:
            rows = np.atleast_2d(np.asarray(rows, np.float32))
            if n_vec is None:
                n_vec = rows.shape[0]
            elif rows.shape[0] != n_vec:
                raise ValueError("clip_l/clip_g vector counts differ")
            params_host = jax.device_get(self.params[pkey])
            new_p, new_c, first = clip_text.extend_token_embeddings(
                params_host, getattr(cfgs, cfield), rows
            )
            clone.params[pkey] = jax.device_put(new_p)
            cfgs = _dc.replace(cfgs, **{cfield: new_c})
            toks[tattr].add_token(token, range(first, first + rows.shape[0]))
        clone.cfgs = cfgs
        from imagharmony_tpu.models import tokenizer as tok_lib

        clone.tokenizers = tok_lib.SDXLTokenizers(toks["tok1"], toks["tok2"])
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            return clone.with_mesh(mesh, tensor_parallel=getattr(self, "_tp", False))
        return clone

    def with_lora(self, lora, *, scale=1.0, lora_cfg=None):
        """Clone with LoRA factors merged into the UNet weights (exact:
        ``W + scale*(alpha/r)*A@B``, adapters/lora.py — zero runtime cost
        after the merge). ``lora`` is a ``save_lora`` file path or a factor
        pytree (then pass ``lora_cfg``); ``scale`` blends the adaptation
        (0 → base model). Beyond the reference, whose UNet is immutable."""
        from imagharmony_tpu.adapters import lora as lora_lib

        if isinstance(lora, (str, bytes)):
            lora, lora_cfg = lora_lib.load_lora(lora)
        elif lora_cfg is None:
            raise ValueError("pass lora_cfg when giving a factor tree")
        clone = object.__new__(HarmonyPipeline)
        clone.__dict__.update(self.__dict__)
        clone.params = dict(self.params)
        clone.params["unet"] = lora_lib.apply_lora(
            self.params["unet"], lora, lora_cfg, scale=scale
        )
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            # re-establish the mesh placement the merge destroyed (merged
            # leaves land on the default device otherwise)
            return clone.with_mesh(mesh, tensor_parallel=getattr(self, "_tp", False))
        clone.params["unet"] = jax.device_put(clone.params["unet"])
        return clone

    def _use_batched_decode(self, rows: int) -> bool:
        """Batched VAE decode is right only when each chip decodes ≤2 rows:
        a non-divisible (replicated) batch or >2 rows per shard hits the
        same 16 GB decoder-activation wall as single-chip."""
        mesh = getattr(self, "_mesh", None)
        if mesh is None:
            return False
        from imagharmony_tpu.parallel import mesh as mesh_lib

        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        return rows % n_data == 0 and rows // n_data <= 2

    def _place_request(self, noise, ids, pixel_values, control_cond=None,
                       init_pixels=None):
        """On a mesh clone: shard noise rows over ``data`` (when the row
        count divides), replicate the small conditioning inputs. No-op on
        a single-device pipeline."""
        mesh = getattr(self, "_mesh", None)
        if mesh is None:
            return noise, ids, pixel_values, control_cond, init_pixels
        from imagharmony_tpu.parallel import mesh as mesh_lib

        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        if noise.shape[0] % n_data == 0:
            noise = jax.device_put(noise, mesh_lib.data_sharded(mesh, noise.ndim))
        else:
            noise = jax.device_put(noise, mesh_lib.replicated(mesh))
        rep = lambda x: jax.device_put(x, mesh_lib.replicated(mesh))
        ids = {k: rep(v) for k, v in ids.items()}
        if pixel_values is not None:
            pixel_values = rep(pixel_values)
        if control_cond is not None:
            control_cond = rep(control_cond)
        if init_pixels is not None:
            init_pixels = rep(init_pixels)
        return noise, ids, pixel_values, control_cond, init_pixels

    # -- pieces ------------------------------------------------------------

    def _tokenize(self, text):
        ids1, ids2 = self.tokenizers(text or "")
        tcfg = self.cfgs.text_l or self.cfgs.text_g
        max_l = tcfg.max_position_embeddings
        return jnp.asarray(ids1[:, :max_l]), jnp.asarray(ids2[:, :max_l])

    def _tokenize_weighted(self, text):
        """Tokenize with the A1111 ``(word:1.5)`` attention grammar
        (utils/prompts.py): returns ``(ids_l, ids_g, weights|None)``.
        weights is None when the prompt carries no weighting syntax — the
        ids then equal the plain ``_tokenize`` output exactly. Weighted
        prompts are tokenized fragment-wise so the weight vector aligns
        with the ids by construction (the A1111 chunking rule)."""
        from imagharmony_tpu.utils import prompts

        frags = prompts.parse_prompt_attention(text or "")
        if not prompts.is_weighted(frags):
            return self._tokenize(prompts.plain_text(frags)) + (None,)
        tcfg = self.cfgs.text_l or self.cfgs.text_g
        max_l = tcfg.max_position_embeddings

        def build(tok):
            toks, ws = [], []
            for frag, w in frags:
                fids = tok.encode(frag, pad_to_max=False)[1:-1]
                toks.extend(fids)
                ws.extend([w] * len(fids))
            toks, ws = toks[: max_l - 2], ws[: max_l - 2]
            ids = [tok.bos_token_id] + toks + [tok.eos_token_id]
            ids += [tok.pad_token_id] * (max_l - len(ids))
            ws = [1.0] + ws + [1.0] * (max_l - 1 - len(ws))
            return np.asarray([ids], np.int32), np.asarray([ws], np.float32)

        i1, w1 = build(self.tokenizers.tok1)
        i2, w2 = build(self.tokenizers.tok2)
        if not np.array_equal(w1, w2):  # same BPE -> same counts; guard
            raise ValueError(
                "the two text towers tokenize the weighted prompt to "
                "different lengths — prompt weighting needs aligned tokens"
            )
        return jnp.asarray(i1), jnp.asarray(i2), w1

    def set_scale(self, scale: float):
        """Kept for API familiarity (reference ip_adapter.py:179-182);
        prefer passing scale= to generate()."""
        self._default_scale = scale

    # -- main entry ----------------------------------------------------------

    def generate(
        self,
        pil_image=None,
        *,
        pixel_values=None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        extra_text: Optional[str] = None,
        scale: float = 1.0,
        num_samples: int = 1,
        seed: Optional[int] = None,
        guidance_scale: float = 5.0,
        num_inference_steps: int = 30,
        height: int = 1024,
        width: int = 1024,
        scheduler: str = "euler",
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 1.0,
        tile_vae: bool = False,
        control_image=None,
        controlnet_conditioning_scale: float = 1.0,
        guidance_rescale: float = 0.0,
        denoising_end: Optional[float] = None,
        denoising_start: Optional[float] = None,
        latents=None,
        init_image=None,
        mask_image=None,
        strength: Optional[float] = None,
        timestep_spacing: str = "leading",
        use_karras_sigmas: bool = False,
        original_size=None,
        crops_coords_top_left=(0, 0),
        target_size=None,
        negative_original_size=None,
        negative_crops_coords_top_left=None,
        negative_target_size=None,
        output_type: str = "np",
        callback_on_step_end=None,
        chunk_steps: Optional[int] = None,
        encoder_interval: int = 1,
        prediction_type: str = "epsilon",
        rescale_zero_snr: bool = False,
        aesthetic_score: float = 6.0,
        negative_aesthetic_score: float = 2.5,
        clip_skip: int = 0,
        prompt_weighting: bool = False,
    ):
        if callback_on_step_end is not None or chunk_steps is not None:
            if prompt_weighting:
                raise ValueError(
                    "prompt_weighting is not supported on the chunked/"
                    "continuous runner; use the one-jit path"
                )
            # progress-callback path: chunked runner (same math, one extra
            # dispatch per chunk; reference demo.py:112,127 progress role)
            from imagharmony_tpu.pipelines import continuous

            if latents is not None or denoising_start is not None:
                raise ValueError(
                    "callback_on_step_end/chunk_steps does not support the "
                    "refiner-stage inputs (latents=, denoising_start=); use "
                    "the one-jit path for the handoff consumer"
                )
            if scheduler in ("euler_a", "euler_ancestral", "lcm"):
                raise ValueError(
                    f"{scheduler} is not supported on the chunked/continuous "
                    "runner (its rows sit at different schedule positions "
                    "and cannot share one per-step noise key stream); use "
                    "the one-jit path"
                )
            if init_image is not None or mask_image is not None:
                raise ValueError(
                    "callback_on_step_end/chunk_steps does not support "
                    "img2img/inpainting (init_image=/mask_image=); use the "
                    "one-jit path"
                )
            return continuous.generate_chunked(
                self, pil_image=pil_image, prompt=prompt,
                negative_prompt=negative_prompt, extra_text=extra_text,
                seed=seed, num_samples=num_samples,
                chunk_steps=chunk_steps or 5,
                callback_on_step_end=callback_on_step_end,
                output_type=output_type,
                scale=scale, guidance_scale=guidance_scale,
                num_inference_steps=num_inference_steps,
                height=height, width=width, scheduler=scheduler,
                timestep_spacing=timestep_spacing,
                use_karras=use_karras_sigmas,
                control_guidance_start=control_guidance_start,
                control_guidance_end=control_guidance_end,
                guidance_rescale=guidance_rescale, tile_vae=tile_vae,
                control_image=control_image,
                controlnet_scale=controlnet_conditioning_scale,
                denoising_end=denoising_end,
                encoder_interval=encoder_interval,
                prediction_type=prediction_type,
                rescale_zero_snr=rescale_zero_snr,
                clip_skip=clip_skip,
                original_size=tuple(original_size) if original_size else None,
                crops_coords_top_left=tuple(crops_coords_top_left),
                target_size=tuple(target_size) if target_size else None,
                negative_original_size=tuple(negative_original_size)
                if negative_original_size else None,
                negative_crops_coords_top_left=tuple(negative_crops_coords_top_left)
                if negative_crops_coords_top_left else None,
                negative_target_size=tuple(negative_target_size)
                if negative_target_size else None,
            )
        prompt = prompt or DEFAULT_PROMPT
        negative_prompt = negative_prompt or DEFAULT_NEGATIVE

        init_pixels = None
        mask = None
        img2img_skip = 0
        if mask_image is not None and init_image is None:
            raise ValueError("mask_image= requires init_image= (the image "
                             "whose unmasked region is kept)")
        if strength is None:
            # img2img defaults to diffusers' 0.8; inpainting to a full
            # repaint of the masked region (diffusers InpaintPipeline ~1.0)
            strength = 1.0 if mask_image is not None else 0.8
        if init_image is not None:
            # img2img (beyond the reference; diffusers Img2ImgPipeline
            # get_timesteps semantics): start from the init image noised
            # to step skip = n - int(n*strength)
            if latents is not None or denoising_start is not None:
                raise ValueError(
                    "init_image= cannot combine with the refiner-stage "
                    "inputs (latents=, denoising_start=)"
                )
            img2img_skip = sched.img2img_skip_steps(num_inference_steps, strength)
            init_pixels = jnp.asarray(
                preprocess_init_image(init_image, height, width)
            )
        if mask_image is not None:
            mask = jnp.asarray(preprocess_mask(
                mask_image, height, width, self.cfgs.vae.downscale
            ))

        if self.cfgs.vision is None:
            # no image prompt on this family (refiner): text-only conditioning
            if pil_image is not None or pixel_values is not None:
                raise ValueError(
                    "this pipeline has no image encoder (family="
                    f"{self.cfgs.family}); pass init_image=/latents= to "
                    "refine an image, not pil_image="
                )
        elif pil_image is None and pixel_values is None:
            # plain text-to-image: no reference image, IP branch off
            # (diffusers StableDiffusionXLPipeline role — beyond the
            # reference, whose generate() requires the image prompt)
            pass
        else:
            if pixel_values is None:
                pixel_values = clip_vision.preprocess_numpy(
                    pil_image, image_size=self.cfgs.vision.image_size
                )
            pixel_values = jnp.asarray(pixel_values[:1])

        ids = {}
        if prompt_weighting:
            ids["pos_l"], ids["pos_g"], w_pos = self._tokenize_weighted(prompt)
            ids["neg_l"], ids["neg_g"], w_neg = self._tokenize_weighted(negative_prompt)
            if w_pos is not None:
                ids["pos_w"] = jnp.asarray(w_pos)
            if w_neg is not None:
                ids["neg_w"] = jnp.asarray(w_neg)
        else:
            ids["pos_l"], ids["pos_g"] = self._tokenize(prompt)
            ids["neg_l"], ids["neg_g"] = self._tokenize(negative_prompt)
        if extra_text is not None:
            ids["extra_l"], ids["extra_g"] = self._tokenize(extra_text)

        opts = EditOptions(
            height=height,
            width=width,
            num_inference_steps=num_inference_steps,
            scheduler=scheduler,
            guidance_scale=guidance_scale,
            ip_scale=scale,
            control_guidance_start=control_guidance_start,
            control_guidance_end=control_guidance_end,
            use_harmony=extra_text is not None,
            tile_vae=tile_vae,
            guidance_rescale=guidance_rescale,
            denoising_end=denoising_end,
            denoising_start=denoising_start,
            timestep_spacing=timestep_spacing,
            use_karras=use_karras_sigmas,
            original_size=tuple(original_size) if original_size else None,
            crops_coords_top_left=tuple(crops_coords_top_left),
            target_size=tuple(target_size) if target_size else None,
            negative_original_size=tuple(negative_original_size)
            if negative_original_size else None,
            negative_crops_coords_top_left=tuple(negative_crops_coords_top_left)
            if negative_crops_coords_top_left else None,
            negative_target_size=tuple(negative_target_size)
            if negative_target_size else None,
            controlnet_scale=controlnet_conditioning_scale,
            img2img_skip=img2img_skip,
            return_latents=output_type == "latent",
            batched_decode=self._use_batched_decode(num_samples),
            encoder_interval=encoder_interval,
            prediction_type=prediction_type,
            rescale_zero_snr=rescale_zero_snr,
            aesthetic_score=aesthetic_score,
            negative_aesthetic_score=negative_aesthetic_score,
            clip_skip=clip_skip,
        )

        down = self.cfgs.vae.downscale
        lat_shape = (1, height // down, width // down, 4)
        if latents is not None:
            # refiner-stage input: already-noisy latents from a base run with
            # denoising_end (reference custom_pipelines.py:308-316 handoff);
            # the tail schedule applies no init_noise_sigma scaling
            assert denoising_start is not None, (
                "latents= requires denoising_start= (the base run's denoising_end)"
            )
            noise = jnp.asarray(latents)
        elif isinstance(seed, (list, tuple)):
            # per-sample seed list (reference get_generator semantics,
            # ip_adapter/utils.py:83-93)
            assert len(seed) == num_samples, "len(seed) must equal num_samples"
            noise = jnp.concatenate([
                jax.random.normal(jax.random.PRNGKey(int(s_)), lat_shape, jnp.float32)
                for s_ in seed
            ])
        else:
            key = jax.random.PRNGKey(0 if seed is None else seed)
            noise = jax.random.normal(
                key, (num_samples,) + lat_shape[1:], jnp.float32
            )

        control_cond = None
        if control_image is not None:
            control_cond = jnp.asarray(
                preprocess_control(self.cfgs, control_image, height, width)
            )

        noise, ids, pixel_values, control_cond, init_pixels = self._place_request(
            noise, ids, pixel_values, control_cond, init_pixels
        )
        anc = ancestral_key(
            scheduler,
            list(seed) if isinstance(seed, (list, tuple))
            else [0 if seed is None else int(seed)],
        )
        if getattr(self, "_mesh", None) is not None:
            from imagharmony_tpu.parallel import mesh as mesh_lib

            repl = mesh_lib.replicated(self._mesh)
            if mask is not None:
                mask = jax.device_put(mask, repl)
            if anc is not None:
                anc = jax.device_put(anc, repl)
        images = _edit_jit(
            self.params, self.cfgs, opts, ids, pixel_values, noise, control_cond,
            init_pixels, mask, anc,
            num_samples=num_samples, policy=self.policy, backend=self.backend,
        )
        if output_type == "latent" or denoising_end is not None:
            # true pre-VAE latents (num_samples, h, w, 4)
            return images
        if output_type == "raw":
            # decoded float images in [-1, 1] (num_samples, H, W, 3)
            return images
        arr = to_uint8(images)
        if output_type == "pil":
            from PIL import Image

            return [Image.fromarray(a) for a in arr]
        return arr

    # convenience alias matching the task phrasing
    def edit(self, image, prompt, extra_text=None, **kw):
        return self.generate(pil_image=image, prompt=prompt, extra_text=extra_text, **kw)

    def generate_batch(
        self,
        images,
        prompts,
        *,
        extra_texts=None,
        negative_prompts=None,
        seeds=None,
        control_images=None,
        output_type="np",
        **shared_kw,
    ):
        """Pack B independent edit requests into ONE device program.

        All static options (size/steps/scheduler/guidance) are shared; each
        request contributes its own image, prompt, extra_text, control image
        (when a ControlNet is configured — all-or-none per batch) and seed row.
        This is the serving fast path: the CFG-packed UNet batch becomes
        2B and the per-request host/dispatch overhead is paid once.
        """
        b = len(images) if images is not None else len(prompts)
        prompts = [p or DEFAULT_PROMPT for p in prompts]
        negative_prompts = [
            n or DEFAULT_NEGATIVE for n in (negative_prompts or [None] * b)
        ]
        if extra_texts is None:
            extra_texts = [None] * b
        use_extra = all(e is not None for e in extra_texts)
        seeds = seeds or list(range(b))

        if self.cfgs.vision is None:
            # no image prompt on this family (refiner): text-only rows
            if images is not None and any(im is not None for im in images):
                raise ValueError(
                    "this pipeline has no image encoder (family="
                    f"{self.cfgs.family}); pass images=None"
                )
            pixel_values = None
        elif images is None or all(im is None for im in images):
            # plain text-to-image rows (IP branch off for the whole batch)
            pixel_values = None
        else:
            pixel_values = jnp.asarray(
                np.concatenate(
                    [
                        clip_vision.preprocess_numpy(im, image_size=self.cfgs.vision.image_size)
                        for im in images
                    ]
                )
            )

        def tok_rows(texts):
            l = np.concatenate([np.asarray(self._tokenize(t)[0]) for t in texts])
            g = np.concatenate([np.asarray(self._tokenize(t)[1]) for t in texts])
            return jnp.asarray(l), jnp.asarray(g)

        ids = {}
        ids["pos_l"], ids["pos_g"] = tok_rows(prompts)
        ids["neg_l"], ids["neg_g"] = tok_rows(negative_prompts)
        if use_extra:
            ids["extra_l"], ids["extra_g"] = tok_rows(extra_texts)

        height = shared_kw.pop("height", 1024)
        width = shared_kw.pop("width", 1024)
        opts = EditOptions(
            height=height,
            width=width,
            num_inference_steps=shared_kw.pop("num_inference_steps", 30),
            scheduler=shared_kw.pop("scheduler", "euler"),
            guidance_scale=shared_kw.pop("guidance_scale", 5.0),
            ip_scale=shared_kw.pop("scale", 1.0),
            use_harmony=use_extra,
            batched_decode=self._use_batched_decode(b),
            **shared_kw,
        )
        down = self.cfgs.vae.downscale
        noise = jnp.concatenate(
            [
                jax.random.normal(
                    jax.random.PRNGKey(int(s)), (1, height // down, width // down, 4), jnp.float32
                )
                for s in seeds
            ]
        )
        control_cond = None
        if control_images is not None:
            if any(c is None for c in control_images):
                raise ValueError(
                    "control_images must be all-or-none within a packed batch"
                )
            control_cond = jnp.asarray(np.concatenate([
                preprocess_control(self.cfgs, c, height, width)
                for c in control_images
            ]))
        noise, ids, pixel_values, control_cond, _ = self._place_request(
            noise, ids, pixel_values, control_cond
        )
        anc = ancestral_key(opts.scheduler, seeds)
        if anc is not None and getattr(self, "_mesh", None) is not None:
            from imagharmony_tpu.parallel import mesh as mesh_lib

            anc = jax.device_put(anc, mesh_lib.replicated(self._mesh))
        images_out = _edit_jit(
            self.params, self.cfgs, opts, ids, pixel_values, noise, control_cond,
            None, None, anc,
            num_samples=1, policy=self.policy, backend=self.backend,
        )
        arr = to_uint8(images_out)
        if output_type == "pil":
            from PIL import Image

            return [Image.fromarray(a) for a in arr]
        return arr
