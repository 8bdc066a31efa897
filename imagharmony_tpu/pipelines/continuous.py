"""Chunked denoising: progress callbacks + continuous (rolling) batching.

The production edit path is ONE jitted program (harmony_edit._edit_jit) —
fastest p50, but all-or-nothing: no progress feedback (reference
demo.py:112,127 streams a per-step Gradio callback) and no way for a new
request to join a running batch (a request arriving 0.1 s into a 4 s batch
waits the full program).

This module splits the device work into three jitted stages sharing the
math (and therefore the outputs) of the one-jit path:

1. ``prep``   — conditioning tensors for one request
   (harmony_edit.build_conditioning, the same trace);
2. ``chunk``  — K denoise steps with PER-ROW schedule positions: every
   latent row carries its own step index, so rows at different denoise
   depths share one UNet batch. Finished/empty rows are masked;
3. ``decode`` — VAE decode of finished rows.

On top sits ``SlotEngine``: S device-resident request slots; at every
chunk boundary finished slots are decoded + freed and waiting requests are
admitted into free slots *mid-flight* — continuous batching at denoise-step
granularity (the TPU analog of rolling admission in LLM serving).

The per-row step math is bit-identical to the scan pipeline: the same
sched.scale_model_input_c / sched.step_c run on (B,1,1,1)-broadcast
constants gathered per row.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import clip_vision, unet, vae
from imagharmony_tpu.pipelines import components as comp
from imagharmony_tpu.pipelines import harmony_edit as he
from imagharmony_tpu.schedulers import diffusion as sched


@functools.partial(
    jax.jit, static_argnames=("cfgs", "opts", "num_samples", "policy")
)
def _prep_jit(params, cfgs, opts, ids, pixel_values, *, num_samples, policy):
    ctx2, pooled2, time_ids, ip2 = he.build_conditioning(
        params, cfgs, opts, ids, pixel_values, num_samples=num_samples, policy=policy
    )
    return {"context": ctx2, "pooled": pooled2, "time_ids": time_ids, "ip": ip2}


@functools.partial(
    jax.jit, static_argnames=("cfgs", "opts", "chunk", "policy", "backend"),
)
def _chunk_jit(params, cfgs, opts, latents, step_idx, solver_state, bundle, *,
               chunk: int, policy, backend=None):
    """Run ``chunk`` denoise steps; each row advances from its own step_idx.

    latents: (S, h, w, 4); step_idx: (S,) int32 — rows with
    step_idx >= num_steps are frozen (finished or empty slots).
    solver_state: multistep-solver history (sched.init_solver_state) carried
    ACROSS chunk boundaries — per-row, frozen rows keep theirs; () for
    single-step schedulers.
    bundle: conditioning dict with (2S, ...) rows in [uncond | cond] order;
    an optional "control" entry (2S, Hc, Wc, 3) runs the ControlNet branch
    per step (per-row control images, CFG-duplicated like the other rows).
    """
    schedule = sched.make(
        opts.scheduler, opts.num_inference_steps, he.sched_config(opts),
        denoising_end=opts.denoising_end,
    )
    n = schedule.num_steps
    ts = schedule.timesteps
    sigmas = schedule.sigmas
    ip_arr = jnp.asarray(he.ip_scale_schedule(opts)[:n])
    kind = schedule.kind
    s = latents.shape[0]

    def eps_at(lat, idx, *, enc=None, mid_res=None, want_enc=False):
        """One CFG-pair UNet eval on per-row step positions. ``enc``/
        ``mid_res`` mirror the one-jit encoder-propagation cache contract
        (harmony_edit._denoise_encoder_prop.eps_at): enc is None on key
        steps (encoder + ControlNet run, cache returned when want_enc); on
        reuse steps the cached enc bakes the down-block residuals in and
        the key-step mid_res is re-applied explicitly."""
        ci = jnp.clip(idx, 0, n - 1)
        t = jnp.take(ts, ci)                      # (S,)
        sig = jnp.take(sigmas, ci)
        ip_s = jnp.take(ip_arr, ci)

        r2 = lambda x: jnp.concatenate([x, x]).reshape(2 * s, 1, 1, 1)
        lat_in = jnp.concatenate([lat, lat], axis=0)
        lat_in = sched.scale_model_input_c(kind, r2(sig), lat_in)
        t2 = jnp.concatenate([t, t])
        down_res = None
        if "control" in bundle and enc is None:
            from imagharmony_tpu.models import controlnet as controlnet_lib

            down_res, mid_res = controlnet_lib.apply(
                params["controlnet"], cfgs.controlnet, lat_in, t2,
                bundle["context"], bundle["control"],
                pooled_text_embeds=bundle["pooled"],
                time_ids=bundle["time_ids"],
                conditioning_scale=opts.controlnet_scale,
                backend=backend, policy=policy,
            )
        out = unet.apply(
            params["unet"], cfgs.unet, lat_in,
            t2,
            bundle["context"],
            pooled_text_embeds=bundle["pooled"],
            time_ids=bundle["time_ids"],
            ip_tokens=bundle["ip"],
            ip_scale=r2(ip_s),
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res,
            policy=policy,
            backend=backend,
            return_encoder=want_enc,
            encoder_override=enc,
        )
        if want_enc:
            eps, enc_out = out
            return eps, enc_out, mid_res
        return out

    def apply_step(lat, idx, st, eps):
        """CFG combine + scheduler step + per-row freeze, advancing idx.
        Frozen rows keep latents AND solver state (the same where-mask)."""
        active = idx < n
        ci = jnp.clip(idx, 0, n - 1)
        sig = jnp.take(sigmas, ci)
        sig_n = jnp.take(sigmas, ci + 1)
        r1 = lambda x: x.reshape(s, 1, 1, 1)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps_g = eps_u + opts.guidance_scale * (eps_c - eps_u)
        if opts.guidance_rescale > 0.0:
            eps_g = he.rescale_noise_cfg(eps_g, eps_c, opts.guidance_rescale)
        stepped, st_new = sched.step_s(
            kind, r1(sig), r1(sig_n), eps_g, lat, st, opts.prediction_type
        )
        lat = jnp.where(r1(active), stepped, lat)
        st = jax.tree.map(
            lambda new, old: jnp.where(r1(active), new, old), st_new, st
        )
        idx = idx + active.astype(idx.dtype)
        return lat, idx, st

    interval = opts.encoder_interval
    if interval <= 1:
        def body(carry, _):
            lat, idx, st = carry
            lat, idx, st = apply_step(lat, idx, st, eps_at(lat, idx))
            return (lat, idx, st), ()

        (latents, step_idx, solver_state), _ = jax.lax.scan(
            body, (latents, step_idx, solver_state), None, length=chunk
        )
        return latents, step_idx, solver_state

    # --- encoder propagation (--turbo) on the per-row chunk -----------------
    # Rows only ever enter a chunk at a schedule position ≡ 0 (mod interval):
    # admission happens at chunk boundaries at position 0 and every chunk
    # advances active rows by exactly ``chunk`` steps, with chunk % interval
    # == 0 enforced by SlotEngine. So the LOCAL key-step pattern (local step
    # j is a key step iff j % interval == 0) equals the one-jit path's global
    # pattern for every row, and the cache never needs to cross a chunk
    # boundary. The cache is zero-initialised and local step 0 (always a key
    # step) overwrites it via the cond's full branch — the same uniform
    # scan-of-cond program as the one-jit turbo path, which is what makes
    # the two paths bit-equal on TPU (a peeled straight-line first step
    # compiles to different fusions).
    if chunk % interval != 0:
        raise ValueError(
            f"chunk={chunk} must be a multiple of encoder_interval={interval}"
        )
    enc_s, mid_s = jax.eval_shape(
        lambda l, i: eps_at(l, i, want_enc=True), latents, step_idx
    )[1:]
    zeros = lambda tree: jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), tree)

    def body(carry, j):
        lat, idx, enc, mid_res, st = carry
        is_key = (j % interval) == 0

        def full(lat_):
            return eps_at(lat_, idx, want_enc=True)

        def reuse(lat_):
            return eps_at(lat_, idx, enc=enc, mid_res=mid_res), enc, mid_res

        eps, enc, mid_res = jax.lax.cond(is_key, full, reuse, lat)
        lat, idx, st = apply_step(lat, idx, st, eps)
        return (lat, idx, enc, mid_res, st), ()

    (latents, step_idx, _, _, solver_state), _ = jax.lax.scan(
        body,
        (latents, step_idx, zeros(enc_s), zeros(mid_s), solver_state),
        jnp.arange(chunk),
    )
    return latents, step_idx, solver_state


@functools.partial(jax.jit, static_argnames=("cfgs", "opts", "policy"))
def _decode_jit(params, cfgs, opts, latents, *, policy):
    vae_policy = (
        policy if policy.compute_dtype == jnp.bfloat16
        else dtypes.Policy(compute_dtype=jnp.float32)
    )
    if opts.tile_vae:
        return vae.decode_tiled(params["vae"], cfgs.vae, latents, policy=vae_policy)
    if latents.shape[0] > 2:
        # same guard as _edit_jit: a >2-row 1024² batched decode OOMs a
        # 16 GB chip — decode rows sequentially (exact)
        return jax.lax.map(
            lambda l: vae.decode(params["vae"], cfgs.vae, l[None], policy=vae_policy)[0],
            latents,
        )
    return vae.decode(params["vae"], cfgs.vae, latents, policy=vae_policy)


@jax.jit
def _write_slot(latents, step_idx, solver_state, bundle, lat1, bundle1, i):
    """Install a prepared request into slot i (device-side row writes).
    The slot's multistep solver history resets to zeros — the admitted
    row's first step is first-order, exactly like step 0 of a solo run."""
    s = latents.shape[0]
    latents = latents.at[i].set(lat1[0])
    step_idx = step_idx.at[i].set(0)
    solver_state = jax.tree.map(lambda a: a.at[i].set(0), solver_state)

    def wr(dst, src):
        dst = dst.at[i].set(src[0])
        return dst.at[s + i].set(src[1])

    bundle = jax.tree.map(wr, bundle, bundle1)
    return latents, step_idx, solver_state, bundle


@dataclasses.dataclass
class _Slot:
    request: object = None  # opaque caller token
    started: float = 0.0


class SlotEngine:
    """S device-resident request slots advanced K steps at a time.

    All admitted requests share the static EditOptions (the serving layer
    groups by batch key exactly as before); rows differ in conditioning,
    noise and schedule position. Empty slots run masked (their rows compute
    but don't advance) — the price of a static batch shape.
    """

    def __init__(self, pipe, opts: he.EditOptions, *, slots: int = 4,
                 chunk: int = 5, use_controlnet: Optional[bool] = None):
        # The CN branch is a static per-engine choice (a static UNet batch
        # can't skip it per row); requests admitted without a control image
        # run on an all-zero cond — document, don't silently diverge.
        self.use_controlnet = (
            pipe.cfgs.controlnet is not None
            if use_controlnet is None else use_controlnet
        )
        if self.use_controlnet and pipe.cfgs.controlnet is None:
            raise ValueError("use_controlnet=True but the pipeline has no ControlNet")
        self.pipe = pipe
        self.opts = opts
        self.num_slots = slots
        self.chunk = chunk
        _schedule = sched.make(
            opts.scheduler, opts.num_inference_steps, he.sched_config(opts),
            denoising_end=opts.denoising_end,
        )
        self.num_steps = _schedule.num_steps
        self._kind = _schedule.kind
        if opts.encoder_interval > 1 and chunk % opts.encoder_interval != 0:
            # the turbo×chunked equality argument needs every row to enter a
            # chunk at a position ≡ 0 (mod interval) — see _chunk_jit
            raise ValueError(
                f"chunk={chunk} must be a multiple of "
                f"encoder_interval={opts.encoder_interval}"
            )
        self.slots: List[_Slot] = [_Slot() for _ in range(slots)]

        down = pipe.cfgs.vae.downscale
        h, w = opts.height // down, opts.width // down
        dt = pipe.policy.compute_dtype
        self.latents = jnp.zeros((slots, h, w, 4), dt)
        # empty slots sit at num_steps (finished ≡ frozen)
        self.step_idx = jnp.full((slots,), self.num_steps, jnp.int32)
        # per-row multistep solver history, carried across chunk boundaries
        # (() for single-step schedulers)
        self.solver_state = sched.init_solver_state(self._kind, self.latents)
        self.bundle = None  # allocated on first admit (shapes from prep)

    # -- request lifecycle ---------------------------------------------------

    def prepare(self, *, pil_image=None, prompt=None, negative_prompt=None,
                extra_text=None, seed=0, control_image=None, noise=None):
        """Host prep for one request -> (lat1, bundle1) device values.

        noise: optional (1, h, w, 4) float32 initial-noise row; when given it
        overrides ``seed`` — used by generate_chunked to reproduce the one-jit
        path's noise exactly (scalar seed there draws all rows from a single
        PRNGKey rather than per-row keys)."""
        pipe, opts = self.pipe, self.opts
        prompt = prompt or he.DEFAULT_PROMPT
        negative_prompt = negative_prompt or he.DEFAULT_NEGATIVE
        if pil_image is None:
            pil_image = np.zeros((64, 64, 3), np.uint8)
        pixel_values = jnp.asarray(
            clip_vision.preprocess_numpy(
                pil_image, image_size=pipe.cfgs.vision.image_size
            )[:1]
        )
        ids = {}
        ids["pos_l"], ids["pos_g"] = pipe._tokenize(prompt)
        ids["neg_l"], ids["neg_g"] = pipe._tokenize(negative_prompt)
        use_harmony = extra_text is not None
        if use_harmony:
            ids["extra_l"], ids["extra_g"] = pipe._tokenize(extra_text)
        opts1 = dataclasses.replace(opts, use_harmony=use_harmony)
        bundle1 = _prep_jit(
            pipe.params, pipe.cfgs, opts1, ids, pixel_values,
            num_samples=1, policy=pipe.policy,
        )
        if self.use_controlnet:
            if control_image is not None:
                cond = he.preprocess_control(
                    pipe.cfgs, control_image, opts.height, opts.width
                )
            else:
                scale_px = 2 ** (
                    len(pipe.cfgs.controlnet.conditioning_embedding_channels) - 1
                )
                d = pipe.cfgs.vae.downscale
                cond = np.zeros(
                    (1, (opts.height // d) * scale_px,
                     (opts.width // d) * scale_px, 3), np.float32,
                )
            cond = pipe.policy.cast(jnp.asarray(cond))
            bundle1 = dict(bundle1, control=jnp.concatenate([cond, cond]))
        down = pipe.cfgs.vae.downscale
        if noise is None:
            noise = jax.random.normal(
                jax.random.PRNGKey(int(seed)),
                (1, opts.height // down, opts.width // down, 4), jnp.float32,
            )
        else:
            noise = jnp.asarray(noise, jnp.float32)
        schedule = sched.make(
            opts.scheduler, opts.num_inference_steps, he.sched_config(opts),
            denoising_end=opts.denoising_end,
        )
        lat1 = (noise * schedule.init_noise_sigma).astype(pipe.policy.compute_dtype)
        return lat1, bundle1

    def free_slots(self) -> List[int]:
        return [i for i, sl in enumerate(self.slots) if sl.request is None]

    def active(self) -> int:
        return sum(1 for sl in self.slots if sl.request is not None)

    def admit(self, request_token, *, pil_image=None, prompt=None,
              negative_prompt=None, extra_text=None, seed=0,
              control_image=None, noise=None) -> int:
        """Place a request into a free slot (mid-flight is fine). Returns
        the slot index; raises if no slot is free."""
        free = self.free_slots()
        if not free:
            raise RuntimeError("no free slot")
        i = free[0]
        lat1, bundle1 = self.prepare(
            pil_image=pil_image, prompt=prompt,
            negative_prompt=negative_prompt, extra_text=extra_text, seed=seed,
            control_image=control_image, noise=noise,
        )
        if self.bundle is None:
            # allocate the slot-bundle from the first request's shapes
            def alloc(x):
                return jnp.zeros((2 * self.num_slots,) + x.shape[1:], x.dtype)

            self.bundle = jax.tree.map(alloc, bundle1)
        self.latents, self.step_idx, self.solver_state, self.bundle = _write_slot(
            self.latents, self.step_idx, self.solver_state, self.bundle,
            lat1, bundle1, jnp.int32(i),
        )
        self.slots[i] = _Slot(request=request_token, started=time.time())
        return i

    def run_chunk(self):
        """Advance every active row by up to ``chunk`` steps."""
        self.latents, self.step_idx, self.solver_state = _chunk_jit(
            self.pipe.params, self.pipe.cfgs, self.opts,
            self.latents, self.step_idx, self.solver_state, self.bundle,
            chunk=self.chunk, policy=self.pipe.policy, backend=self.pipe.backend,
        )

    def progress(self) -> np.ndarray:
        """Per-slot step position (host fetch)."""
        return np.asarray(self.step_idx)

    def harvest(self):
        """Decode + free finished slots. Returns [(request_token, uint8 img)]."""
        idx = self.progress()
        done = [
            i for i, sl in enumerate(self.slots)
            if sl.request is not None and idx[i] >= self.num_steps
        ]
        out = []
        for i in done:
            img = _decode_jit(
                self.pipe.params, self.pipe.cfgs, self.opts,
                self.latents[i:i + 1], policy=self.pipe.policy,
            )
            out.append((self.slots[i].request, he.to_uint8(img)[0]))
            self.slots[i] = _Slot()
        return out


def generate_chunked(pipe, *, pil_image=None, prompt=None, negative_prompt=None,
                     extra_text=None, seed=0, num_samples=1,
                     chunk_steps=5,
                     callback_on_step_end: Optional[Callable] = None,
                     output_type="np", control_image=None, **opts_kw):
    """generate() through the chunked runner: same math as the one-jit path,
    plus a host callback(step_index, latents) at every chunk boundary — the
    TPU equivalent of the reference's per-step Gradio progress callback
    (reference demo.py:112,127).
    """
    opts = he.EditOptions(
        use_harmony=extra_text is not None,
        ip_scale=opts_kw.pop("scale", 1.0),
        num_inference_steps=opts_kw.pop("num_inference_steps", 30),
        **opts_kw,
    )
    if opts.encoder_interval > 1 and chunk_steps % opts.encoder_interval:
        # round the chunk up to the encoder key-step quantum (chunking
        # granularity never changes outputs, so this is output-invariant)
        chunk_steps += opts.encoder_interval - (chunk_steps % opts.encoder_interval)
    eng = SlotEngine(pipe, opts, slots=num_samples, chunk=chunk_steps,
                     use_controlnet=control_image is not None)
    # draw the initial noise EXACTLY as the one-jit path (harmony_edit
    # generate): scalar seed -> one PRNGKey for all rows; seed list -> one
    # key per row (reference get_generator semantics, ip_adapter/utils.py:83-93)
    down = pipe.cfgs.vae.downscale
    row_shape = (opts.height // down, opts.width // down, 4)
    if isinstance(seed, (list, tuple)):
        if len(seed) != num_samples:
            raise ValueError(
                f"len(seed)={len(seed)} must equal num_samples={num_samples}"
            )
        noise_rows = [
            jax.random.normal(jax.random.PRNGKey(int(s)), (1,) + row_shape,
                              jnp.float32)
            for s in seed
        ]
    else:
        key = jax.random.PRNGKey(0 if seed is None else int(seed))
        block = jax.random.normal(key, (num_samples,) + row_shape, jnp.float32)
        noise_rows = [block[i:i + 1] for i in range(num_samples)]
    for i, nr in enumerate(noise_rows):
        eng.admit(i, pil_image=pil_image, prompt=prompt,
                  negative_prompt=negative_prompt, extra_text=extra_text,
                  noise=nr, control_image=control_image)
    n = eng.num_steps
    done = 0
    while done < n:
        eng.run_chunk()
        done = int(eng.progress().min())
        if callback_on_step_end is not None:
            callback_on_step_end(done, eng.latents)
    if output_type == "latent" or opts.denoising_end is not None:
        # handoff / external-decode contract of the one-jit path: true
        # pre-VAE latents (B, h, w, 4), no decode
        return eng.latents
    images = _decode_jit(
        pipe.params, pipe.cfgs, opts, eng.latents, policy=pipe.policy
    )
    if output_type == "raw":
        return images
    arr = he.to_uint8(images)
    if output_type == "pil":
        from PIL import Image

        return [Image.fromarray(a) for a in arr]
    return arr
