"""Stateless diffusion schedulers (DDPM add-noise, DDIM, Euler discrete,
DPM-Solver++ 2M, Euler-ancestral, LCM).

The reference delegates to diffusers' DDPMScheduler for training
(reference train.py:505,644) and the pipeline's scheduler (SDXL ships
EulerDiscreteScheduler) for inference (custom_pipelines.py:334,357).
DPM-Solver++ 2M (Lu et al., arXiv 2211.01095 — diffusers'
DPMSolverMultistepScheduler, the most common scheduler swap for SDXL),
Euler-ancestral, and the LCM consistency sampler (Luo et al.,
arXiv 2310.04378 — diffusers' LCMScheduler, the few-step sampler for
LCM/LCM-LoRA distilled checkpoints) are provided beyond the reference.

TPU-first design: a schedule is a bundle of *precomputed per-step arrays*
(timesteps, sigmas / alpha-cumprods), so the denoise loop is a
``lax.scan`` over stacked step constants — no Python state, no
data-dependent shapes, trivially vmappable over PNS seed batches.
Multistep solvers carry their history (previous x0 prediction + log-sigma)
as an explicit scan state (``init_solver_state`` / ``step_s``) instead of
mutable scheduler attributes, so the same step function serves the one-jit
scan, the per-row chunked runner (each row at its own schedule position),
and mid-flight admission (a freshly admitted row's state resets to
"no history" and its first step is first-order, exactly like step 0 of a
solo run).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseScheduleConfig:
    """Defaults = SDXL scheduler_config.json (scaled_linear betas)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    timestep_spacing: str = "leading"
    prediction_type: str = "epsilon"
    # DDIM final alpha_prev: SD1.5/SDXL ship set_alpha_to_one=False
    # (final_alpha_cumprod = alphas_cumprod[0] ≈ 0.9991); True uses 1.0
    # (plain DDIM paper behavior, lands exactly on x0).
    set_alpha_to_one: bool = False
    # Karras et al. 2022 (arXiv 2206.00364 eq. 5) rho=7 sigma spacing —
    # diffusers' use_karras_sigmas option: concentrates steps at low noise.
    # Supported by euler and dpm++ (diffusers DDIM has no karras option).
    use_karras_sigmas: bool = False
    # Zero terminal SNR (arXiv 2305.08891 §3.1 / diffusers
    # rescale_betas_zero_snr): shift+rescale sqrt(alphas_cumprod) so the
    # last timestep is pure noise. Meant for v-prediction models trained
    # with it (e.g. SD2.1-style fine-tunes); epsilon prediction is
    # undefined at SNR=0.
    rescale_betas_zero_snr: bool = False


def alphas_cumprod(cfg: NoiseScheduleConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(cfg.beta_schedule)
    acp = np.cumprod(1.0 - betas)
    if cfg.rescale_betas_zero_snr:
        # diffusers rescale_zero_terminal_snr: operate on sqrt(acp) — pin
        # the first entry, shift the last to exactly 0
        sa = np.sqrt(acp)
        sa0, saT = sa[0], sa[-1]
        sa = (sa - saT) * (sa0 / (sa0 - saT))
        acp = sa**2
    return acp.astype(np.float32)


# ---------------------------------------------------------------------------
# DDPM forward process (training)
# ---------------------------------------------------------------------------


def add_noise(acp, latents, noise, timesteps):
    """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps (training forward,
    reference train.py:644)."""
    a = jnp.take(jnp.asarray(acp), timesteps)
    shape = (-1,) + (1,) * (latents.ndim - 1)
    sa = jnp.sqrt(a).reshape(shape).astype(latents.dtype)
    sb = jnp.sqrt(1.0 - a).reshape(shape).astype(latents.dtype)
    return sa * latents + sb * noise


def velocity_target(acp, latents, noise, timesteps):
    """v-prediction target (supported for completeness)."""
    a = jnp.take(jnp.asarray(acp), timesteps)
    shape = (-1,) + (1,) * (latents.ndim - 1)
    sa = jnp.sqrt(a).reshape(shape).astype(latents.dtype)
    sb = jnp.sqrt(1.0 - a).reshape(shape).astype(latents.dtype)
    return sa * noise - sb * latents


# ---------------------------------------------------------------------------
# Inference schedules
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Per-step constants, all shaped (num_steps,) (+1 where noted).

    kind:          "euler" | "ddim" | "dpm++"
    timesteps:     UNet conditioning timesteps
    sigmas:        (num_steps + 1,) for euler/dpm++ (last entry 0); for ddim
                   these are alpha-cumprods at each step with a trailing
                   final alpha (=1.0 → x0 at the end)
    init_noise_sigma: multiply initial N(0,1) latents by this
    """

    kind: str
    timesteps: jnp.ndarray
    sigmas: jnp.ndarray
    init_noise_sigma: float

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def step_constants(self, i):
        """Gather the constants the i-th denoise step needs (jit-safe)."""
        return self.timesteps[i], self.sigmas[i], self.sigmas[i + 1]


def _spaced_timesteps(num_steps, cfg: NoiseScheduleConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
        ratio = n // num_steps
        ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.float32)
        ts += cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        ratio = n / num_steps
        ts = np.arange(n, 0, -ratio).round().astype(np.float32) - 1
    else:  # linspace
        ts = np.linspace(0, n - 1, num_steps)[::-1].round().astype(np.float32)
    return ts


def _sigma_to_t(sigmas, log_sigmas):
    """Invert the trained sigma curve at the given sigmas by piecewise-
    linear interpolation in log-sigma (diffusers EulerDiscrete._sigma_to_t),
    yielding fractional conditioning timesteps for Karras-spaced sigmas."""
    log_sigma = np.log(np.maximum(sigmas, 1e-10))
    dists = log_sigma[None, :] - log_sigmas[:, None]
    low_idx = np.cumsum(dists >= 0, axis=0).argmax(axis=0)
    low_idx = np.clip(low_idx, 0, len(log_sigmas) - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0.0, 1.0)
    return ((1.0 - w) * low_idx + w * high_idx).astype(np.float32)


def euler_schedule(num_steps, cfg: NoiseScheduleConfig = NoiseScheduleConfig()) -> Schedule:
    acp = alphas_cumprod(cfg)
    # at zero terminal SNR acp[-1]==0 → infinite sigma; diffusers
    # EulerDiscrete substitutes 2^-24 there (no-op otherwise)
    acp = np.maximum(acp, np.float32(2.0**-24))
    all_sigmas = ((1.0 - acp) / acp) ** 0.5
    ts = _spaced_timesteps(num_steps, cfg)
    sigmas = np.interp(ts, np.arange(len(all_sigmas)), all_sigmas)
    if cfg.use_karras_sigmas:
        # rho=7 ramp between the spaced grid's sigma_max and sigma_min
        # (arXiv 2206.00364 eq. 5 / diffusers _convert_to_karras), then
        # recover the matching fractional timesteps from the trained curve
        rho = 7.0
        smax, smin = sigmas[0], sigmas[-1]
        ramp = np.linspace(0.0, 1.0, num_steps)
        sigmas = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
        ts = _sigma_to_t(sigmas, np.log(all_sigmas))
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    # diffusers EulerDiscreteScheduler.init_noise_sigma: plain max sigma for
    # linspace/trailing spacing, sqrt(max^2+1) for the leading default
    if cfg.timestep_spacing in ("linspace", "trailing"):
        init_sigma = float(sigmas.max())
    else:
        init_sigma = float((sigmas.max() ** 2 + 1.0) ** 0.5)
    return Schedule(
        kind="euler",
        timesteps=jnp.asarray(ts),
        sigmas=jnp.asarray(sigmas),
        init_noise_sigma=init_sigma,
    )


def ddim_schedule(num_steps, cfg: NoiseScheduleConfig = NoiseScheduleConfig()) -> Schedule:
    if cfg.use_karras_sigmas:
        raise ValueError("use_karras_sigmas is not supported for ddim "
                         "(matching diffusers DDIMScheduler)")
    acp = alphas_cumprod(cfg)
    ts = _spaced_timesteps(num_steps, cfg).astype(np.int64)
    alphas = acp[ts]
    prev_ts = ts - cfg.num_train_timesteps // num_steps
    final_alpha = 1.0 if cfg.set_alpha_to_one else float(acp[0])
    alphas_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], final_alpha)
    # store as (num_steps+1,): alpha_t at i, alpha_prev as the i+1 entry
    seq = np.concatenate([alphas, alphas_prev[-1:]]).astype(np.float32)
    return Schedule(
        kind="ddim",
        timesteps=jnp.asarray(ts.astype(np.float32)),
        sigmas=jnp.asarray(seq),
        init_noise_sigma=1.0,
    )


def dpmpp_schedule(num_steps, cfg: NoiseScheduleConfig = NoiseScheduleConfig()) -> Schedule:
    """DPM-Solver++ 2M. Same spaced-timestep/interpolated-sigma grid as
    euler (diffusers DPMSolverMultistepScheduler.set_timesteps uses the
    identical np.interp over the trained sigmas, final sigma 0), but the
    sample is carried at VP scale (x = alpha_t*x0 + sigma_t*eps stays
    ~N(0,1)): init_noise_sigma is 1.0 and scale_model_input is identity.

    Note: latent handoffs (denoising_end -> denoising_start, output_type
    "latent") must use the same scheduler kind on both sides — euler
    carries latents at VE scale (x0 + sigma*eps), dpm++ at VP scale."""
    s = euler_schedule(num_steps, cfg)
    return Schedule(
        kind="dpm++", timesteps=s.timesteps, sigmas=s.sigmas,
        init_noise_sigma=1.0,
    )


def lcm_schedule(num_steps, cfg: NoiseScheduleConfig = NoiseScheduleConfig(),
                 original_inference_steps: int = 50) -> Schedule:
    """LCM consistency sampling grid (diffusers LCMScheduler.set_timesteps):
    the distillation's ``original_inference_steps`` (default 50) evenly
    spaced origin timesteps ``k·i − 1`` (k = train_steps/50), from which
    ``num_steps`` are subsampled by floor-linspace over the descending
    order. Storage scale is VP (like ddim): the sigmas array holds the
    alpha-cumprod at each step, with a trailing 1.0 — the final step's
    "re-noise to alpha=1" is exactly the clean denoised output, so the
    step function needs no last-step special case."""
    if cfg.use_karras_sigmas:
        raise ValueError("use_karras_sigmas is not supported for lcm "
                         "(matching diffusers LCMScheduler)")
    k = cfg.num_train_timesteps // original_inference_steps
    if num_steps > original_inference_steps:
        raise ValueError(
            f"lcm supports at most original_inference_steps="
            f"{original_inference_steps} steps, got {num_steps}"
        )
    acp = alphas_cumprod(cfg)
    origin = (np.arange(1, original_inference_steps + 1) * k - 1)[::-1]
    idx = np.floor(
        np.linspace(0.0, len(origin), num_steps, endpoint=False)
    ).astype(np.int64)
    ts = origin[idx]
    seq = np.concatenate([acp[ts], [1.0]]).astype(np.float32)
    return Schedule(
        kind="lcm",
        timesteps=jnp.asarray(ts.astype(np.float32)),
        sigmas=jnp.asarray(seq),
        init_noise_sigma=1.0,
    )


# LCM boundary-condition constants (Song et al. consistency models /
# diffusers LCMScheduler defaults: sigma_data=0.5, timestep_scaling=10).
LCM_SIGMA_DATA = 0.5
LCM_TIMESTEP_SCALING = 10.0


def scale_model_input(schedule: Schedule, i, sample):
    """Pre-UNet input scaling (reference custom_pipelines.py:334)."""
    if schedule.kind in ("euler", "euler_a"):
        sigma = schedule.sigmas[i]
        return sample / jnp.sqrt(sigma**2 + 1.0).astype(sample.dtype)
    return sample


def step(schedule: Schedule, i, model_output, sample, prediction_type: str = "epsilon"):
    """One reverse-diffusion step x_t -> x_{t-1} (Schedule-indexed)."""
    return step_c(
        schedule.kind, schedule.sigmas[i], schedule.sigmas[i + 1],
        model_output, sample, prediction_type,
    )


def scale_model_input_c(kind: str, sigma, sample):
    """scale_model_input from explicit per-step constants (scan-friendly)."""
    if kind in ("euler", "euler_a"):
        return sample / jnp.sqrt(sigma**2 + 1.0).astype(sample.dtype)
    return sample


def to_epsilon(kind: str, sigma, model_output, sample, prediction_type: str):
    """Convert a UNet output in any parametrization to epsilon at the
    current step, so every solver below runs its (exact) epsilon form.

    prediction_type: "epsilon" | "v_prediction" | "sample" (diffusers
    names). ``sigma`` is the step's alpha-cumprod for ddim, the karras
    sigma for euler/dpm++; ``sample`` is at the kind's storage scale (VP
    for ddim/dpm++, VE for euler). The v-prediction formulas are
    division-free, so they remain finite at zero terminal SNR (where
    alpha_cumprod == 0 and epsilon itself is undefined).

    With x = a·x0 + s·eps (a²+s²=1) and v = a·eps − s·x0:
    eps = s·x + a·v exactly (expand: s·a·x0 + s²eps + a²eps − a·s·x0).
    """
    if prediction_type == "epsilon":
        return model_output
    m32 = model_output.astype(jnp.float32)
    s32 = sample.astype(jnp.float32)
    if kind in ("ddim", "lcm"):
        a = jnp.sqrt(jnp.asarray(sigma, jnp.float32))       # sqrt(acp_t)
        s = jnp.sqrt(1.0 - jnp.asarray(sigma, jnp.float32))
        if prediction_type == "v_prediction":
            return s * s32 + a * m32
        if prediction_type == "sample":
            return (s32 - a * m32) / s  # s = sqrt(1-acp) > 0 for acp < 1
        raise ValueError(prediction_type)
    # euler (VE storage x_ve = x0 + sigma·eps) and dpm++ (VP storage
    # x_vp = alpha·x_ve): VP coefficients a = alpha = 1/sqrt(sigma²+1),
    # s = sigma·alpha
    sig = jnp.asarray(sigma, jnp.float32)
    alpha = 1.0 / jnp.sqrt(sig**2 + 1.0)
    x_vp = s32 * alpha if kind in ("euler", "euler_a") else s32
    if prediction_type == "v_prediction":
        return (sig * alpha) * x_vp + alpha * m32
    if prediction_type == "sample":
        return (x_vp - alpha * m32) / (sig * alpha)
    raise ValueError(prediction_type)


def step_c(kind: str, sigma, sigma_next, model_output, sample,
           prediction_type: str = "epsilon"):
    """Reverse step from explicit per-step constants (scan-friendly).
    For ddim, (sigma, sigma_next) are (alpha_t, alpha_prev). Multistep
    kinds (dpm++) must go through ``step_s`` (they carry history)."""
    if kind == "dpm++":
        raise ValueError("dpm++ is multistep — use step_s with a solver state")
    if kind in ("euler_a", "lcm"):
        raise ValueError(f"{kind} is stochastic — use step_s with an rng-"
                         "carrying solver state")
    dtype = sample.dtype
    s32 = sample.astype(jnp.float32)
    eps = to_epsilon(kind, sigma, model_output, sample, prediction_type).astype(jnp.float32)
    if kind == "euler":
        denoised = s32 - sigma * eps
        derivative = (s32 - denoised) / sigma
        return (s32 + derivative * (sigma_next - sigma)).astype(dtype)
    # ddim: compute x0 division-free for v/sample predictions (the epsilon
    # form divides by sqrt(alpha_t), which is 0 at zero terminal SNR)
    if prediction_type == "v_prediction":
        a = jnp.sqrt(jnp.asarray(sigma, jnp.float32))
        x0 = a * s32 - jnp.sqrt(1.0 - sigma) * model_output.astype(jnp.float32)
    elif prediction_type == "sample":
        x0 = model_output.astype(jnp.float32)
    else:
        x0 = (s32 - jnp.sqrt(1.0 - sigma) * eps) / jnp.sqrt(sigma)
    dir_xt = jnp.sqrt(1.0 - sigma_next) * eps
    return (jnp.sqrt(sigma_next) * x0 + dir_xt).astype(dtype)


def init_solver_state(kind: str, latents, key=None):
    """Per-batch multistep solver history for ``step_s``. Single-step kinds
    (euler/ddim) carry an empty tuple — zero cost in the scan carry.

    For dpm++: x0 = previous step's converted model output (fp32), lam =
    -log(sigma) at that step, valid = 1.0 once history exists. All three are
    per-row ((B,...) leading axis) so the chunked runner's rows — each at
    its own schedule position — keep independent histories, and a row reset
    to zeros behaves exactly like step 0 of a fresh run (first-order).

    For the stochastic kinds (euler_a ancestral noise, lcm's per-step
    re-noising) the state carries the PRNG ``key`` the fresh noise is drawn
    from (one key for the whole batch; rows get independent rows of each
    draw). It must be supplied — the chunked/continuous runner, whose rows
    sit at different schedule positions, cannot share one key stream and
    rejects these kinds."""
    if kind in ("euler_a", "lcm"):
        if key is None:
            raise ValueError(
                f"{kind} needs an rng key for its per-step noise — "
                "supported on the one-jit generate path only (not the "
                "chunked/continuous runner)"
            )
        return {"key": key}
    if kind != "dpm++":
        return ()
    b1 = (latents.shape[0],) + (1,) * (latents.ndim - 1)
    return {
        "x0": jnp.zeros(latents.shape, jnp.float32),
        "lam": jnp.zeros(b1, jnp.float32),
        "valid": jnp.zeros(b1, jnp.float32),
    }


def step_s(kind: str, sigma, sigma_next, model_output, sample, state,
           prediction_type: str = "epsilon", timestep=None):
    """State-carrying reverse step: returns ``(new_sample, new_state)``.

    euler/ddim delegate to ``step_c`` with an empty state. dpm++ is the
    DPM-Solver++ 2M multistep update (arXiv 2211.01095 eq. 4.6 / diffusers
    multistep_dpm_solver_second_order_update with algorithm_type
    "dpmsolver++", epsilon prediction, final sigma 0): data-prediction
    midpoint rule over log-SNR (lambda = -log sigma in the karras
    sigma parametrization). The first step of a run (state.valid == 0) and
    the final step (sigma_next == 0, where the second-order coefficients
    diverge — diffusers forces lower_order_final for final_sigmas_type
    "zero") use the first-order update, which for epsilon prediction is
    exactly the DDIM (eta=0) step.

    sigma/sigma_next may be scalars (lockstep scan) or (B,1,1,1) per-row
    constants (chunked runner); both broadcast against the state.

    ``timestep`` is required for lcm only: its boundary-condition scalings
    c_skip/c_out depend on the (scaled) conditioning timestep, not on the
    alpha-cumprods.
    """
    if kind == "lcm":
        # LCM consistency step (diffusers LCMScheduler.step): map the UNet
        # output to a predicted x0, apply the consistency-function boundary
        # scalings, then re-noise to the NEXT inference timestep's
        # alpha-cumprod with fresh noise. (sigma, sigma_next) are
        # (alpha_cumprod_t, alpha_cumprod_next); the trailing schedule entry
        # is 1.0, making the final step exactly the clean denoised output.
        if timestep is None:
            raise ValueError("lcm's boundary scalings need the timestep — "
                             "pass step_s(..., timestep=t)")
        dtype = sample.dtype
        s32 = sample.astype(jnp.float32)
        m32 = model_output.astype(jnp.float32)
        a = jnp.asarray(sigma, jnp.float32)
        if prediction_type == "v_prediction":
            x0 = jnp.sqrt(a) * s32 - jnp.sqrt(1.0 - a) * m32
        elif prediction_type == "sample":
            x0 = m32
        else:
            x0 = (s32 - jnp.sqrt(1.0 - a) * m32) / jnp.sqrt(a)
        st = jnp.asarray(timestep, jnp.float32) * LCM_TIMESTEP_SCALING
        sd2 = LCM_SIGMA_DATA**2
        c_skip = sd2 / (st**2 + sd2)
        c_out = st / jnp.sqrt(st**2 + sd2)
        denoised = c_out * x0 + c_skip * s32
        a_n = jnp.asarray(sigma_next, jnp.float32)
        key, sub = jax.random.split(state["key"])
        z = jax.random.normal(sub, sample.shape, jnp.float32)
        out = jnp.sqrt(a_n) * denoised + jnp.sqrt(1.0 - a_n) * z
        return out.astype(dtype), {"key": key}
    if kind == "euler_a":
        # Euler-ancestral (k-diffusion sample_euler_ancestral / diffusers
        # EulerAncestralDiscreteScheduler, beyond the reference): the
        # deterministic euler move to sigma_down plus fresh noise at
        # sigma_up, with sigma_down² + sigma_up² = sigma_next². The final
        # sigma_next == 0 step is noise-free and lands on the denoised x0.
        dtype = sample.dtype
        s32 = sample.astype(jnp.float32)
        eps = to_epsilon(kind, sigma, model_output, sample,
                         prediction_type).astype(jnp.float32)
        sig = jnp.asarray(sigma, jnp.float32)
        sig_n = jnp.asarray(sigma_next, jnp.float32)
        var_up = sig_n**2 * (sig**2 - sig_n**2) / sig**2
        sigma_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sig_n**2 - var_up, 0.0))
        out = s32 + eps * (sigma_down - sig)
        key, sub = jax.random.split(state["key"])
        z = jax.random.normal(sub, sample.shape, jnp.float32)
        return (out + sigma_up * z).astype(dtype), {"key": key}
    if kind != "dpm++":
        return step_c(kind, sigma, sigma_next, model_output, sample,
                      prediction_type), state
    dtype = sample.dtype
    s32 = sample.astype(jnp.float32)
    eps = to_epsilon(kind, sigma, model_output, sample, prediction_type).astype(jnp.float32)
    sig = jnp.asarray(sigma, jnp.float32)
    sig_n = jnp.asarray(sigma_next, jnp.float32)

    # VP parametrization from the karras sigma: alpha = 1/sqrt(sig^2+1),
    # sigma_vp = sig*alpha, lambda = log(alpha/sigma_vp) = -log(sig)
    alpha = 1.0 / jnp.sqrt(sig**2 + 1.0)
    alpha_n = 1.0 / jnp.sqrt(sig_n**2 + 1.0)
    x0 = s32 * jnp.sqrt(sig**2 + 1.0) - sig * eps  # (sample - sigma_vp*eps)/alpha
    ratio_vp = (sig_n * alpha_n) / (sig * alpha)   # sigma_vp_next / sigma_vp
    ehm1 = sig_n / sig - 1.0                       # exp(-h) - 1, exact at sig_n=0

    first = ratio_vp * s32 - alpha_n * ehm1 * x0

    # second order needs h = log(sig/sig_next); guard sig_next=0 (that step
    # is first-order anyway — the where() below discards this branch)
    lam = -jnp.log(sig)
    h = -jnp.log(jnp.maximum(sig_n, 1e-10)) - lam  # lambda_next - lambda
    h0 = lam - state["lam"]                                   # lambda - lambda_prev
    d1 = (x0 - state["x0"]) * (h / jnp.maximum(h0, 1e-10))
    second = ratio_vp * s32 - alpha_n * ehm1 * (x0 + 0.5 * d1)

    use_first = jnp.logical_or(state["valid"] == 0.0, sig_n == 0.0)
    out = jnp.where(use_first, first, second).astype(dtype)
    new_state = {
        "x0": x0,
        "lam": jnp.broadcast_to(lam, state["lam"].shape).astype(jnp.float32),
        "valid": jnp.ones_like(state["valid"]),
    }
    return out, new_state


def scan_constants(schedule: Schedule):
    """Stacked (num_steps, 3) per-step xs for lax.scan:
    (timestep, sigma_i, sigma_{i+1})."""
    return (
        schedule.timesteps,
        schedule.sigmas[:-1],
        schedule.sigmas[1:],
    )


def steps_for_denoising_end(num_steps, denoising_end, cfg: NoiseScheduleConfig = NoiseScheduleConfig()):
    """How many of num_steps to run when stopping at ``denoising_end`` of
    the noise schedule (reference custom_pipelines.py:308-316)."""
    ts = _spaced_timesteps(num_steps, cfg)
    cutoff = round(cfg.num_train_timesteps - denoising_end * cfg.num_train_timesteps)
    return int((ts >= cutoff).sum())


def _truncate(schedule: Schedule, n: int) -> Schedule:
    return Schedule(
        kind=schedule.kind,
        timesteps=schedule.timesteps[:n],
        sigmas=schedule.sigmas[: n + 1],
        init_noise_sigma=schedule.init_noise_sigma,
    )


def _tail(schedule: Schedule, n_skip: int) -> Schedule:
    """Drop the first n_skip steps — the refiner side of a
    denoising_end/denoising_start handoff (the input latents are already at
    the sigma level of step n_skip, so init_noise_sigma must not be applied)."""
    return Schedule(
        kind=schedule.kind,
        timesteps=schedule.timesteps[n_skip:],
        sigmas=schedule.sigmas[n_skip:],
        init_noise_sigma=1.0,
    )


def img2img_skip_steps(num_steps: int, strength: float) -> int:
    """diffusers img2img timestep mapping (StableDiffusionXLImg2ImgPipeline
    get_timesteps): run the LAST ``int(num_steps*strength)`` steps, starting
    from the input image noised to that step's level."""
    if not 0.0 < strength <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    init_steps = min(int(num_steps * strength), num_steps)
    return max(num_steps - init_steps, 0)


def noise_to_level(kind: str, level, image_latents, noise):
    """q(x_level | x0) at one schedule entry, at the kind's storage scale
    (VE for euler, VP for dpm++; for ddim ``level`` is the alpha-cumprod).
    level == 0 sigma (euler/dpm++) or alpha == 1 (ddim) returns the clean
    latents exactly. Used by img2img (initial noising) and inpainting
    (re-noising the kept region to each step's level)."""
    x = image_latents.astype(jnp.float32)
    eps = noise.astype(jnp.float32)
    if kind in ("euler", "euler_a"):
        return x + level * eps
    if kind == "dpm++":
        alpha = 1.0 / jnp.sqrt(jnp.asarray(level, jnp.float32) ** 2 + 1.0)
        return alpha * (x + level * eps)
    # ddim / lcm: level is an alpha-cumprod
    a = jnp.asarray(level, jnp.float32)
    return jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * eps


def img2img_init(schedule: Schedule, image_latents, noise):
    """Noise scaled image latents to the schedule's FIRST step — the
    img2img starting point (diffusers scheduler.add_noise at
    timesteps[t_start]); pass the result as generate(latents=...) would be,
    at the storage scale of the schedule's kind (VE for euler, VP for
    dpm++/ddim)."""
    return noise_to_level(schedule.kind, schedule.sigmas[0], image_latents, noise)


def make(kind: str, num_steps: int, cfg: NoiseScheduleConfig = NoiseScheduleConfig(),
         *, denoising_end=None, denoising_start=None, skip_steps: int = 0) -> Schedule:
    if kind == "euler":
        s = euler_schedule(num_steps, cfg)
    elif kind in ("euler_a", "euler_ancestral"):
        # same grid/init-sigma rules as euler (diffusers
        # EulerAncestralDiscreteScheduler shares EulerDiscrete's
        # set_timesteps; it ships no karras option)
        if cfg.use_karras_sigmas:
            raise ValueError("use_karras_sigmas is not supported for euler_a "
                             "(matching diffusers EulerAncestralDiscreteScheduler)")
        e = euler_schedule(num_steps, cfg)
        s = Schedule(kind="euler_a", timesteps=e.timesteps, sigmas=e.sigmas,
                     init_noise_sigma=e.init_noise_sigma)
    elif kind == "ddim":
        s = ddim_schedule(num_steps, cfg)
    elif kind in ("dpm++", "dpmpp"):
        s = dpmpp_schedule(num_steps, cfg)
    elif kind == "lcm":
        if denoising_end is not None or denoising_start is not None:
            raise ValueError(
                "denoising_end/denoising_start are not supported for lcm "
                "(its timestep grid is the distillation's origin grid, not "
                "the base/refiner split's spaced grid)"
            )
        s = lcm_schedule(num_steps, cfg)
    else:
        raise ValueError(f"unknown scheduler kind {kind!r}")
    if denoising_end is not None and 0.0 < denoising_end < 1.0:
        s = _truncate(s, steps_for_denoising_end(num_steps, denoising_end, cfg))
    if denoising_start is not None and 0.0 < denoising_start < 1.0:
        # the complement split: a base run with denoising_end=x ran the first
        # steps_for_denoising_end(x) steps; the refiner runs the rest
        s = _tail(s, steps_for_denoising_end(num_steps, denoising_start, cfg))
    if skip_steps:
        # img2img: start from the input image noised to step ``skip_steps``
        s = _tail(s, skip_steps)
    return s
