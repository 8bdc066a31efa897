"""Numerical-parity harness.

BASELINE.json's north star is ≥0.999 per-step cosine similarity against the
diffusers reference. diffusers can't run in this environment, so parity is
a two-sided protocol:

1. ``tools/capture_reference.py`` (a standalone script, run it in any
   torch+diffusers env) dumps the initial noise + per-step latents for a
   fixed seed+prompt into an .npz;
2. ``run_capture`` here produces the same trace from this framework,
   *reusing the reference's initial noise* so the trajectories share x_T;
3. ``compare`` scores per-step cosine similarity between the two.

One-command driver: ``imagharmony parity --theirs ref.npz --model-dir ...``
(see cli.cmd_parity).

Also provides the self-consistency check that runs everywhere:
bf16-vs-fp32 pipeline cosine (numerical-discipline canary — if our own
bf16 path drifts from our fp32 path, reference parity is hopeless).
"""

from __future__ import annotations

import numpy as np


def cosine(a, b) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    return float(a @ b / denom) if denom else 0.0


def run_capture(pipe, pil_image, *, prompt, extra_text=None, steps=8, height=256,
                width=256, seed=0, scheduler="euler", noise=None,
                guidance_scale=5.0, negative_prompt=None, ip_scale=1.0, **kw):
    """Run an edit and capture every intermediate latent.

    Returns dict: noise, latents (steps+1, ...), image.
    Uses the python-loop path (not the scan) so intermediates are visible;
    math is identical to the scanned pipeline (same schedule/step fns).

    ``noise``: optional (1, h, w, 4) NHWC initial N(0,1) latents — pass the
    reference capture's ``noise`` so both trajectories share x_T.
    ``ip_scale=0`` turns the IP branch off for plain-SDXL parity against a
    stock diffusers capture (tools/capture_reference.py).
    """
    import jax
    import jax.numpy as jnp

    from imagharmony_tpu.pipelines import harmony_edit as he
    from imagharmony_tpu.schedulers import diffusion as sched

    cfgs, params, policy = pipe.cfgs, pipe.params, pipe.policy
    from imagharmony_tpu.models import clip_vision, unet, vae

    pixel_values = jnp.asarray(
        clip_vision.preprocess_numpy(pil_image, image_size=cfgs.vision.image_size)[:1]
    )
    ids = {}
    ids["pos_l"], ids["pos_g"] = pipe._tokenize(prompt)
    ids["neg_l"], ids["neg_g"] = pipe._tokenize(
        he.DEFAULT_NEGATIVE if negative_prompt is None else negative_prompt
    )
    context, pooled = he.encode_texts(
        params, cfgs, jnp.concatenate([ids["neg_l"], ids["pos_l"]]),
        jnp.concatenate([ids["neg_g"], ids["pos_g"]]), policy=policy)
    extra_ctx = None
    if extra_text is not None:
        el, eg = pipe._tokenize(extra_text)
        extra_ctx, _ = he.encode_texts(params, cfgs, el, eg, policy=policy)
    ip_cond, ip_uncond = he.image_prompt_tokens(params, cfgs, pixel_values, extra_ctx, policy=policy)
    ip2 = jnp.concatenate([ip_uncond, ip_cond])

    schedule = sched.make(scheduler, steps)
    down = cfgs.vae.downscale
    if noise is None:
        noise = jax.random.normal(
            jax.random.PRNGKey(seed), (1, height // down, width // down, 4), jnp.float32
        )
    else:
        noise = jnp.asarray(noise, jnp.float32)
    lat = (noise * schedule.init_noise_sigma).astype(policy.compute_dtype)
    tid = jnp.array([[height, width, 0, 0, height, width]], jnp.float32)
    time_ids = jnp.concatenate([tid, tid])

    traj = [np.asarray(lat, np.float32)]
    step_fn = jax.jit(
        lambda p, l, t, s, sn: sched.step_c(
            schedule.kind, s, sn,
            _cfg_eps(p, cfgs, l, t, s, context, pooled, time_ids, ip2, schedule.kind,
                     policy, pipe.backend, guidance_scale, ip_scale),
            l,
        )
    )
    for i in range(schedule.num_steps):
        t, s, sn = (schedule.timesteps[i], schedule.sigmas[i], schedule.sigmas[i + 1])
        lat = step_fn(params, lat, t, s, sn)
        traj.append(np.asarray(lat, np.float32))

    img = vae.decode(params["vae"], cfgs.vae, lat, policy=policy)
    return {
        "noise": np.asarray(noise),
        "latents": np.stack(traj),
        "image": np.asarray(img, np.float32),
    }


def _cfg_eps(params, cfgs, lat, t, sigma, context, pooled, time_ids, ip2, kind,
             policy, backend, guidance_scale, ip_scale):
    import jax.numpy as jnp

    from imagharmony_tpu.models import unet
    from imagharmony_tpu.schedulers import diffusion as sched

    lat_in = jnp.concatenate([lat, lat])
    lat_in = sched.scale_model_input_c(kind, sigma, lat_in)
    eps = unet.apply(
        params["unet"], cfgs.unet, lat_in, jnp.broadcast_to(t, (2,)), context,
        pooled_text_embeds=pooled, time_ids=time_ids, ip_tokens=ip2,
        ip_scale=ip_scale, policy=policy, backend=backend,
    )
    eps_u, eps_c = jnp.split(eps, 2)
    return eps_u + guidance_scale * (eps_c - eps_u)


def compare(capture_a, capture_b):
    """Per-step cosine table between two captures (ours vs reference or
    ours-fp32 vs ours-bf16).

    Alignment: our captures store steps+1 latents (x_T first); diffusers'
    per-step callback yields only the post-step latents. When lengths differ
    by one, the longer trace drops its x_T entry so step i matches step i.
    """
    la, lb = capture_a["latents"], capture_b["latents"]
    if len(la) == len(lb) + 1:
        la = la[1:]
    elif len(lb) == len(la) + 1:
        lb = lb[1:]
    n = min(len(la), len(lb))
    per_step = [cosine(la[i], lb[i]) for i in range(n)]
    return {
        "per_step_cosine": per_step,
        "min_cosine": min(per_step),
        "image_cosine": cosine(capture_a["image"], capture_b["image"]),
    }


def save(path, capture):
    np.savez_compressed(path, **capture)


def load(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def reference_capture_script() -> str:
    """The diffusers-side capture script, shipped as a real runnable file at
    ``tools/capture_reference.py`` (kept out of the package so this module
    stays torch-free)."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tools",
        "capture_reference.py",
    )
    with open(path) as f:
        return f.read()
