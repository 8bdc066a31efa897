"""Stateless diffusion schedulers (DDPM add-noise, DDIM, Euler discrete).

The reference delegates to diffusers' DDPMScheduler for training
(reference train.py:505,644) and the pipeline's scheduler (SDXL ships
EulerDiscreteScheduler) for inference (custom_pipelines.py:334,357).

TPU-first design: a schedule is a bundle of *precomputed per-step arrays*
(timesteps, sigmas / alpha-cumprods), so the denoise loop is a
``lax.scan`` over stacked step constants — no Python state, no
data-dependent shapes, trivially vmappable over PNS seed batches.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

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
    return np.cumprod(1.0 - betas).astype(np.float32)


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

    kind:          "euler" | "ddim"
    timesteps:     UNet conditioning timesteps
    sigmas:        (num_steps + 1,) for euler (last entry 0); for ddim these
                   are alpha-cumprods at each step with a trailing final
                   alpha (=1.0 → x0 at the end)
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


def euler_schedule(num_steps, cfg: NoiseScheduleConfig = NoiseScheduleConfig()) -> Schedule:
    acp = alphas_cumprod(cfg)
    all_sigmas = ((1.0 - acp) / acp) ** 0.5
    ts = _spaced_timesteps(num_steps, cfg)
    sigmas = np.interp(ts, np.arange(len(all_sigmas)), all_sigmas)
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


def scale_model_input(schedule: Schedule, i, sample):
    """Pre-UNet input scaling (reference custom_pipelines.py:334)."""
    if schedule.kind == "euler":
        sigma = schedule.sigmas[i]
        return sample / jnp.sqrt(sigma**2 + 1.0).astype(sample.dtype)
    return sample


def step(schedule: Schedule, i, model_output, sample):
    """One reverse-diffusion step x_t -> x_{t-1} (epsilon prediction)."""
    dtype = sample.dtype
    s32 = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    if schedule.kind == "euler":
        sigma = schedule.sigmas[i]
        sigma_next = schedule.sigmas[i + 1]
        denoised = s32 - sigma * eps
        derivative = (s32 - denoised) / sigma
        return (s32 + derivative * (sigma_next - sigma)).astype(dtype)
    # DDIM (eta=0)
    alpha_t = schedule.sigmas[i]
    alpha_prev = schedule.sigmas[i + 1]
    x0 = (s32 - jnp.sqrt(1.0 - alpha_t) * eps) / jnp.sqrt(alpha_t)
    dir_xt = jnp.sqrt(1.0 - alpha_prev) * eps
    return (jnp.sqrt(alpha_prev) * x0 + dir_xt).astype(dtype)


def scale_model_input_c(kind: str, sigma, sample):
    """scale_model_input from explicit per-step constants (scan-friendly)."""
    if kind == "euler":
        return sample / jnp.sqrt(sigma**2 + 1.0).astype(sample.dtype)
    return sample


def step_c(kind: str, sigma, sigma_next, model_output, sample):
    """Reverse step from explicit per-step constants (scan-friendly).
    For ddim, (sigma, sigma_next) are (alpha_t, alpha_prev)."""
    dtype = sample.dtype
    s32 = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    if kind == "euler":
        denoised = s32 - sigma * eps
        derivative = (s32 - denoised) / sigma
        return (s32 + derivative * (sigma_next - sigma)).astype(dtype)
    x0 = (s32 - jnp.sqrt(1.0 - sigma) * eps) / jnp.sqrt(sigma)
    dir_xt = jnp.sqrt(1.0 - sigma_next) * eps
    return (jnp.sqrt(sigma_next) * x0 + dir_xt).astype(dtype)


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


def make(kind: str, num_steps: int, cfg: NoiseScheduleConfig = NoiseScheduleConfig(),
         *, denoising_end=None, denoising_start=None) -> Schedule:
    if kind == "euler":
        s = euler_schedule(num_steps, cfg)
    elif kind == "ddim":
        s = ddim_schedule(num_steps, cfg)
    else:
        raise ValueError(f"unknown scheduler kind {kind!r}")
    if denoising_end is not None and 0.0 < denoising_end < 1.0:
        s = _truncate(s, steps_for_denoising_end(num_steps, denoising_end, cfg))
    if denoising_start is not None and 0.0 < denoising_start < 1.0:
        # the complement split: a base run with denoising_end=x ran the first
        # steps_for_denoising_end(x) steps; the refiner runs the rest
        s = _tail(s, steps_for_denoising_end(num_steps, denoising_start, cfg))
    return s
