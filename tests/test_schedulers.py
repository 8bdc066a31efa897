"""Scheduler invariants (numpy-oracle, no diffusers dependency)."""

import jax.numpy as jnp
import numpy as np

from imagharmony_tpu.schedulers import diffusion as sched


def test_alphas_cumprod_monotone():
    acp = sched.alphas_cumprod(sched.NoiseScheduleConfig())
    assert acp.shape == (1000,)
    assert (np.diff(acp) < 0).all()
    assert 0 < acp[-1] < acp[0] < 1


def test_add_noise_endpoints():
    acp = sched.alphas_cumprod(sched.NoiseScheduleConfig())
    x0 = jnp.ones((2, 4, 4, 4))
    eps = jnp.full((2, 4, 4, 4), 2.0)
    t0 = sched.add_noise(acp, x0, eps, jnp.array([0, 0]))
    # at t=0 almost all signal
    np.testing.assert_allclose(np.asarray(t0), np.sqrt(acp[0]) * 1 + np.sqrt(1 - acp[0]) * 2, rtol=1e-5)
    t999 = sched.add_noise(acp, x0, eps, jnp.array([999, 999]))
    assert np.asarray(t999).mean() > 1.5  # mostly noise (eps=2)


def test_euler_schedule_shapes_and_recovery():
    s = sched.euler_schedule(30)
    assert s.timesteps.shape == (30,)
    assert s.sigmas.shape == (31,)
    assert float(s.sigmas[-1]) == 0.0
    assert 10 < s.init_noise_sigma < 15  # SDXL sigma at t=958 ~11.5

    # Euler parametrization: x_t = x0 + sigma * eps. A perfect eps-model
    # must land exactly on x0 after the full loop.
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    x = jnp.array(x0 + float(s.sigmas[0]) * eps)
    for i in range(s.num_steps):
        scaled = sched.scale_model_input(s, i, x)
        assert np.isfinite(np.asarray(scaled)).all()
        x = sched.step(s, i, jnp.array(eps), x)
    np.testing.assert_allclose(np.asarray(x), x0, rtol=1e-3, atol=1e-3)


def test_ddim_schedule_recovery():
    # set_alpha_to_one=True → final alpha_prev = 1 → exact x0 recovery
    s = sched.ddim_schedule(10, sched.NoiseScheduleConfig(set_alpha_to_one=True))
    assert s.timesteps.shape == (10,)
    assert float(s.sigmas[-1]) == 1.0

    # DDPM parametrization: x_t = sqrt(a) x0 + sqrt(1-a) eps; perfect model
    # recovers x0 through the DDIM (eta=0) chain.
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    a0 = float(s.sigmas[0])
    x = jnp.array(np.sqrt(a0) * x0 + np.sqrt(1 - a0) * eps)
    for i in range(s.num_steps):
        x = sched.step(s, i, jnp.array(eps), x)
    np.testing.assert_allclose(np.asarray(x), x0, rtol=1e-3, atol=1e-3)


def test_scheduler_constants_match_diffusers_published_values():
    """Anchor the schedule math to LITERAL constants from the diffusers
    ecosystem (not derived from this module): the scaled_linear
    0.00085→0.012 schedule's sigma_max=14.6146 / sigma_min=0.0292 are the
    published k-diffusion/SDXL values; alphas_cumprod[0]=0.99915 is exactly
    1-beta_start; EulerDiscreteScheduler's init_noise_sigma is plain
    max-sigma for linspace/trailing spacing and sqrt(max²+1) for leading."""
    cfg = sched.NoiseScheduleConfig()
    acp = np.asarray(sched.alphas_cumprod(cfg), np.float64)
    assert abs(acp[0] - 0.99915) < 1e-6
    sigmas = np.sqrt((1.0 - acp) / acp)
    np.testing.assert_allclose(sigmas[-1], 14.6146, atol=5e-4)
    np.testing.assert_allclose(sigmas[0], 0.0292, atol=5e-5)

    # linspace spacing includes t=999 → init_noise_sigma = sigma_max itself
    s_lin = sched.euler_schedule(30, sched.NoiseScheduleConfig(timestep_spacing="linspace"))
    ts = np.asarray(s_lin.timesteps)
    assert ts[0] == 999.0 and ts[-1] == 0.0
    np.testing.assert_allclose(ts[1], 965.0)  # round(999*28/29)
    np.testing.assert_allclose(s_lin.init_noise_sigma, 14.6146, atol=5e-4)

    # SDXL ships leading spacing + steps_offset=1: 30-step grid [958..1]/33
    s_lead = sched.euler_schedule(30, cfg)
    ts = np.asarray(s_lead.timesteps)
    assert ts[0] == 958.0 and ts[-1] == 1.0
    assert np.all(np.diff(ts) == -33.0)
    np.testing.assert_allclose(
        s_lead.init_noise_sigma, (np.max(np.asarray(s_lead.sigmas)) ** 2 + 1) ** 0.5
    )

    # DDIM 30-step leading grid is the same [958..1] sequence
    s_ddim = sched.ddim_schedule(30, cfg)
    np.testing.assert_array_equal(np.asarray(s_ddim.timesteps), ts)


def test_ddim_default_final_alpha_matches_shipped_configs():
    """SD1.5/SDXL DDIM configs ship set_alpha_to_one=False: the trailing
    alpha_prev is alphas_cumprod[0], not 1.0 (diffusers
    DDIMScheduler.final_alpha_cumprod semantics)."""
    cfg = sched.NoiseScheduleConfig()
    acp = sched.alphas_cumprod(cfg)
    s = sched.ddim_schedule(10, cfg)
    np.testing.assert_allclose(float(s.sigmas[-1]), float(acp[0]), rtol=1e-6)
    # perfect-model chain lands on q(x_{t0}|x0) with the first alpha, not x0
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    a0 = float(s.sigmas[0])
    x = jnp.array(np.sqrt(a0) * x0 + np.sqrt(1 - a0) * eps)
    for i in range(s.num_steps):
        x = sched.step(s, i, jnp.array(eps), x)
    af = float(acp[0])
    expect = np.sqrt(af) * x0 + np.sqrt(1 - af) * eps
    np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-3, atol=1e-3)


def test_leading_spacing_offset():
    s = sched.euler_schedule(30)
    ts = np.asarray(s.timesteps)
    assert ts[0] == 1000 // 30 * 29 + 1  # leading spacing + steps_offset 1
    assert ts[-1] == 1.0
    assert (np.diff(ts) < 0).all()


def test_trailing_and_linspace_spacings():
    for spacing in ("trailing", "linspace"):
        cfg = sched.NoiseScheduleConfig(timestep_spacing=spacing)
        s = sched.euler_schedule(10, cfg)
        ts = np.asarray(s.timesteps)
        assert ts.shape == (10,)
        assert (np.diff(ts) < 0).all()
        assert ts.max() <= 999


def test_linear_beta_schedule():
    cfg = sched.NoiseScheduleConfig(beta_schedule="linear")
    acp = sched.alphas_cumprod(cfg)
    assert acp.shape == (1000,)
    assert (np.diff(acp) < 0).all()


def test_velocity_target_identity():
    """v = sqrt(a) eps - sqrt(1-a) x0; at a->1 it's eps, at a->0 it's -x0."""
    acp = np.array([0.999999, 1e-6], np.float32)
    x0 = jnp.ones((2, 1, 1, 1))
    eps = jnp.full((2, 1, 1, 1), 2.0)
    v = sched.velocity_target(acp, x0, eps, jnp.array([0, 1]))
    np.testing.assert_allclose(float(v[0, 0, 0, 0]), 2.0, atol=1e-2)
    np.testing.assert_allclose(float(v[1, 0, 0, 0]), -1.0, atol=1e-2)
