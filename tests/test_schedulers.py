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


# ---------------------------------------------------------------------------
# DPM-Solver++ 2M (kind="dpm++", beyond the reference — diffusers'
# DPMSolverMultistepScheduler is the most common SDXL scheduler swap)
# ---------------------------------------------------------------------------


def test_dpmpp_schedule_grid():
    """Same spaced-timestep/interpolated-sigma grid as euler (that is what
    diffusers' set_timesteps computes), VP-scale sample carry: init 1.0."""
    s = sched.make("dpm++", 30)
    e = sched.make("euler", 30)
    np.testing.assert_array_equal(np.asarray(s.timesteps), np.asarray(e.timesteps))
    np.testing.assert_array_equal(np.asarray(s.sigmas), np.asarray(e.sigmas))
    assert s.init_noise_sigma == 1.0 and s.kind == "dpm++"
    assert sched.make("dpmpp", 30).kind == "dpm++"  # alias
    # scale_model_input is identity (VP carry)
    x = jnp.ones((1, 2, 2, 4))
    np.testing.assert_array_equal(
        np.asarray(sched.scale_model_input_c("dpm++", s.sigmas[0], x)), np.asarray(x)
    )


def test_dpmpp_first_order_step_equals_ddim():
    """The DPM-Solver++ first-order update (used at step 0 and at the final
    sigma=0 step) is mathematically the DDIM (eta=0) step for epsilon
    prediction — pin our step_s against our DDIM step_c on the same
    underlying alpha-cumprods (which test_scheduler_constants_* pins
    against diffusers' published values)."""
    cfg = sched.NoiseScheduleConfig()
    acp = sched.alphas_cumprod(cfg)
    rng = np.random.default_rng(0)
    x_vp = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    for t_cur, t_prev in ((801, 601), (967, 500), (101, 3)):
        a_c, a_p = float(acp[t_cur]), float(acp[t_prev])
        sig_c = ((1 - a_c) / a_c) ** 0.5
        sig_p = ((1 - a_p) / a_p) ** 0.5
        state = sched.init_solver_state("dpm++", x_vp)
        out, st = sched.step_s("dpm++", sig_c, sig_p, eps, x_vp, state)
        ref = sched.step_c("ddim", jnp.float32(a_c), jnp.float32(a_p), eps, x_vp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        assert float(st["valid"].min()) == 1.0
        np.testing.assert_allclose(float(st["lam"].max()), -np.log(sig_c), rtol=1e-4)


def test_dpmpp_perfect_model_recovery():
    """Point-mass oracle (eps exact for a fixed x0): every dpm++ step lands
    exactly back on the trajectory, and the sigma=0 final step returns x0 —
    the multistep terms vanish (x0 predictions are constant)."""
    s = sched.make("dpm++", 10)
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    sig_top = float(s.sigmas[0])
    alpha_top = 1.0 / np.sqrt(sig_top**2 + 1.0)
    x = jnp.asarray(alpha_top * (x0 + sig_top * eps0))  # VP-scale start
    st = sched.init_solver_state("dpm++", x)
    sa = np.asarray(s.sigmas)
    for i in range(s.num_steps):
        x, st = sched.step_s(
            "dpm++", jnp.float32(sa[i]), jnp.float32(sa[i + 1]), jnp.asarray(eps0), x, st
        )
    np.testing.assert_allclose(np.asarray(x), x0, rtol=1e-3, atol=1e-3)


def test_dpmpp_second_order_convergence():
    """On a sigma-dependent oracle (x0 drifts with sigma), dpm++ 2M converges
    at second order: doubling steps cuts the error far faster than euler's
    first order, and at n=20 dpm++ beats euler by >5x. Integrated over a
    zero-free sigma range against a 2000-step euler reference (the final
    sigma->0 collapse is shared by all solvers and would mask the order)."""
    rng = np.random.default_rng(0)
    v = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)

    def eps_model(x_vp, sig):
        alpha = 1.0 / np.sqrt(sig**2 + 1.0)
        return (x_vp - alpha * v * np.cos(sig)) / (sig * alpha)

    def run(kind, grid):
        sig0 = float(grid[0])
        alpha0 = 1.0 / np.sqrt(sig0**2 + 1.0)
        x = jnp.asarray((alpha0 if kind != "euler" else 1.0) * v * np.cos(sig0))
        st = sched.init_solver_state(kind, x)
        for i in range(len(grid) - 1):
            sig = float(grid[i])
            alpha = 1.0 / np.sqrt(sig**2 + 1.0)
            x_vp = (alpha * x) if kind == "euler" else x
            e_in = jnp.asarray(np.asarray(eps_model(np.asarray(x_vp), sig)))
            x, st = sched.step_s(kind, jnp.float32(sig), jnp.float32(grid[i + 1]), e_in, x, st)
        sig_end = float(grid[-1])
        alpha_end = 1.0 / np.sqrt(sig_end**2 + 1.0)
        return np.asarray((alpha_end * x) if kind == "euler" else x)

    ref = run("euler", np.linspace(14.0, 1.0, 2001))
    errs = {}
    for n in (10, 20):
        grid = np.linspace(14.0, 1.0, n + 1)
        errs[("euler", n)] = np.abs(run("euler", grid) - ref).max()
        errs[("dpm++", n)] = np.abs(run("dpm++", grid) - ref).max()
    # first order: ~2x per doubling; second order: >>4x
    assert errs[("euler", 10)] / errs[("euler", 20)] < 4.0
    assert errs[("dpm++", 10)] / errs[("dpm++", 20)] > 8.0
    assert errs[("dpm++", 20)] * 5.0 < errs[("euler", 20)]


def test_dpmpp_step_c_rejected():
    """dpm++ carries history — the single-step entry must refuse it."""
    import pytest

    with pytest.raises(ValueError, match="multistep"):
        sched.step_c("dpm++", 1.0, 0.5, jnp.zeros((1, 2, 2, 4)), jnp.zeros((1, 2, 2, 4)))


def test_karras_sigmas():
    """use_karras_sigmas (arXiv 2206.00364 eq. 5, rho=7): same endpoints as
    the spaced grid, monotone decreasing, concentrated at low noise, and
    the recovered fractional timesteps invert the trained sigma curve."""
    import pytest

    base = sched.euler_schedule(10)
    cfg = sched.NoiseScheduleConfig(use_karras_sigmas=True)
    k = sched.euler_schedule(10, cfg)
    bs, ks = np.asarray(base.sigmas), np.asarray(k.sigmas)
    np.testing.assert_allclose(ks[0], bs[0], rtol=1e-5)    # sigma_max kept
    np.testing.assert_allclose(ks[-2], bs[-2], rtol=1e-5)  # sigma_min kept
    assert ks[-1] == 0.0
    assert (np.diff(ks[:-1]) < 0).all()
    # rho=7 concentrates steps at LOW noise: the median sigma drops
    assert np.median(ks[:-1]) < np.median(bs[:-1])
    # timesteps invert the trained curve: exp(interp(t, log all_sigmas)) == sigma
    acp = sched.alphas_cumprod(cfg)
    log_all = np.log(((1.0 - acp) / acp) ** 0.5)
    ts = np.asarray(k.timesteps)
    recovered = np.exp(np.interp(ts, np.arange(len(log_all)), log_all))
    np.testing.assert_allclose(recovered, ks[:-1], rtol=1e-3)
    # init_noise_sigma rule unchanged (leading spacing -> sqrt(max^2+1))
    np.testing.assert_allclose(
        k.init_noise_sigma, float((ks[:-1].max() ** 2 + 1.0) ** 0.5), rtol=1e-6
    )
    # dpm++ inherits the karras grid; ddim rejects it (as diffusers)
    kd = sched.make("dpm++", 10, cfg)
    np.testing.assert_array_equal(np.asarray(kd.sigmas), ks)
    with pytest.raises(ValueError, match="karras"):
        sched.make("ddim", 10, cfg)


# ---------------------------------------------------------------------------
# Prediction types (v_prediction / sample — SD2.x-style models) + zero
# terminal SNR (arXiv 2305.08891 §3.1)
# ---------------------------------------------------------------------------


def _vp_coeffs(kind, const):
    """(a, s) with x_vp = a·x0 + s·eps for the step constant of each kind."""
    if kind == "ddim":
        return np.sqrt(const), np.sqrt(1.0 - const)
    alpha = 1.0 / np.sqrt(const**2 + 1.0)
    return alpha, const * alpha


def test_prediction_type_step_identities():
    """A v/sample prediction derived from (x, eps) must produce the exact
    same step as the epsilon prediction — pure parametrization changes."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    cases = [
        ("euler", 6.0, 2.5),
        ("euler", 0.4, 0.1),
        ("ddim", 0.8, 0.95),   # (alpha_t, alpha_prev)
        ("ddim", 0.1, 0.4),
        ("dpm++", 6.0, 2.5),
        ("dpm++", 0.4, 0.1),
    ]
    for kind, c, c_next in cases:
        a, s = _vp_coeffs(kind, c)
        if kind == "euler":
            x0 = x - c * eps                      # VE storage
        elif kind == "dpm++":
            x0 = x * np.sqrt(c**2 + 1.0) - c * eps  # VP storage
        else:
            x0 = (x - s * eps) / a
        v = a * eps - s * x0

        st = sched.init_solver_state(kind, jnp.asarray(x))
        ref, _ = sched.step_s(kind, c, c_next, jnp.asarray(eps), jnp.asarray(x), st)
        for pred, m in (("v_prediction", v), ("sample", x0)):
            st = sched.init_solver_state(kind, jnp.asarray(x))
            out, _ = sched.step_s(
                kind, c, c_next, jnp.asarray(m), jnp.asarray(x), st, pred
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5,
                err_msg=f"{kind}/{pred}",
            )
    # dpm++ second-order step: run two steps so history engages
    kind = "dpm++"
    st_e = sched.init_solver_state(kind, jnp.asarray(x))
    st_v = sched.init_solver_state(kind, jnp.asarray(x))
    xe, xv = jnp.asarray(x), jnp.asarray(x)
    for c, c_next in ((8.0, 4.0), (4.0, 1.5)):
        a, s = _vp_coeffs(kind, c)
        x0e = np.asarray(xe) * np.sqrt(c**2 + 1.0) - c * eps
        ve = a * eps - s * x0e
        x0v = np.asarray(xv) * np.sqrt(c**2 + 1.0) - c * eps
        vv = a * eps - s * x0v
        del x0v  # same x as xe on the first iteration; diverges only by error
        xe, st_e = sched.step_s(kind, c, c_next, jnp.asarray(eps), xe, st_e)
        xv, st_v = sched.step_s(kind, c, c_next, jnp.asarray(vv), xv, st_v, "v_prediction")
        del ve
    np.testing.assert_allclose(np.asarray(xv), np.asarray(xe), rtol=1e-4, atol=1e-5)


def test_zero_terminal_snr_rescale():
    """rescale_betas_zero_snr: last alpha-cumprod exactly 0, first pinned;
    euler sigmas stay finite (diffusers' 2^-24 substitution)."""
    cfg = sched.NoiseScheduleConfig(rescale_betas_zero_snr=True)
    acp = sched.alphas_cumprod(cfg)
    base = sched.alphas_cumprod(sched.NoiseScheduleConfig())
    assert acp[-1] == 0.0
    np.testing.assert_allclose(acp[0], base[0], rtol=1e-6)
    assert (np.diff(acp) < 0).all()

    s = sched.euler_schedule(
        10, sched.NoiseScheduleConfig(
            rescale_betas_zero_snr=True, timestep_spacing="trailing"
        )
    )
    assert np.isfinite(np.asarray(s.sigmas)).all()
    assert float(s.sigmas[0]) > 1000  # sigma at SNR ~2^-24 is huge


def test_zero_snr_vpred_ddim_chain():
    """The zero-SNR + trailing + v-prediction combination (the arXiv
    2305.08891 recipe): at t=999 alpha==0, x_t IS the noise, and a perfect
    v model still recovers x0 through the division-free DDIM chain."""
    cfg = sched.NoiseScheduleConfig(
        rescale_betas_zero_snr=True, timestep_spacing="trailing",
        set_alpha_to_one=True,
    )
    acp = sched.alphas_cumprod(cfg)
    s = sched.ddim_schedule(10, cfg)
    assert float(s.sigmas[0]) == 0.0  # trailing includes t=999 → SNR 0

    rng = np.random.default_rng(3)
    x0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    x = jnp.asarray(eps)  # x_999 = 0·x0 + 1·eps
    sa = np.asarray(s.sigmas)
    for i in range(s.num_steps):
        a, sg = np.sqrt(sa[i]), np.sqrt(1.0 - sa[i])
        v = a * eps - sg * x0
        x = sched.step(s, i, jnp.asarray(v), x, "v_prediction")
    np.testing.assert_allclose(np.asarray(x), x0, rtol=1e-3, atol=1e-3)


def test_to_epsilon_finite_at_snr_zero():
    """v-prediction conversion is division-free: at alpha_cumprod == 0 the
    implied epsilon is the sample itself and x0 == -v."""
    x = jnp.full((1, 2, 2, 4), 3.0)
    v = jnp.full((1, 2, 2, 4), 0.5)
    eps = sched.to_epsilon("ddim", 0.0, v, x, "v_prediction")
    np.testing.assert_allclose(np.asarray(eps), np.asarray(x), atol=1e-6)
    out = sched.step_c("ddim", 0.0, 0.9, v, x, "v_prediction")
    expect = np.sqrt(0.9) * (-np.asarray(v, np.float32)) + np.sqrt(0.1) * np.asarray(x, np.float32)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


# ---------------------------------------------------------------------------
# Euler-ancestral (euler_a — k-diffusion sample_euler_ancestral / diffusers
# EulerAncestralDiscreteScheduler, beyond the reference)
# ---------------------------------------------------------------------------


def test_euler_a_schedule_shares_euler_grid():
    import pytest
    import jax

    e = sched.make("euler", 10)
    a = sched.make("euler_a", 10)
    assert a.kind == "euler_a"
    np.testing.assert_array_equal(np.asarray(a.timesteps), np.asarray(e.timesteps))
    np.testing.assert_array_equal(np.asarray(a.sigmas), np.asarray(e.sigmas))
    assert float(a.init_noise_sigma) == float(e.init_noise_sigma)
    # no karras option (matching diffusers EulerAncestralDiscreteScheduler)
    with pytest.raises(ValueError, match="karras"):
        sched.make("euler_a", 10,
                   sched.NoiseScheduleConfig(use_karras_sigmas=True))
    # stochastic kind: the stateless step and a key-less state are rejected
    x = jnp.zeros((1, 2, 2, 4), jnp.float32)
    with pytest.raises(ValueError, match="euler_a"):
        sched.step_c("euler_a", 2.0, 1.0, x, x)
    with pytest.raises(ValueError, match="rng"):
        sched.init_solver_state("euler_a", x)
    del jax


def test_euler_a_step_math():
    """One ancestral step == euler move to sigma_down plus fresh noise at
    sigma_up (independent numpy recomputation of the k-diffusion formulas,
    with the draw replayed from the same key); the final sigma_next == 0
    step is noise-free and lands exactly on the denoised x0."""
    import jax

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    sig, sig_n = 6.0, 2.5
    key = jax.random.PRNGKey(42)

    st = sched.init_solver_state("euler_a", jnp.asarray(x), key)
    out, st2 = sched.step_s("euler_a", sig, sig_n, jnp.asarray(eps),
                            jnp.asarray(x), st)

    var_up = sig_n**2 * (sig**2 - sig_n**2) / sig**2
    sigma_up = np.sqrt(var_up)
    sigma_down = np.sqrt(sig_n**2 - var_up)
    k2, sub = jax.random.split(key)
    z = np.asarray(jax.random.normal(sub, x.shape, jnp.float32))
    expect = x + eps * (sigma_down - sig) + sigma_up * z
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(st2["key"]), np.asarray(k2))

    # determinism given the key; a different key draws different noise
    st = sched.init_solver_state("euler_a", jnp.asarray(x), key)
    again, _ = sched.step_s("euler_a", sig, sig_n, jnp.asarray(eps),
                            jnp.asarray(x), st)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(out))
    st_b = sched.init_solver_state("euler_a", jnp.asarray(x),
                                   jax.random.PRNGKey(43))
    other, _ = sched.step_s("euler_a", sig, sig_n, jnp.asarray(eps),
                            jnp.asarray(x), st_b)
    assert not np.array_equal(np.asarray(other), np.asarray(out))

    # final step: sigma_next == 0 → sigma_up == 0, lands on the denoised x0
    st = sched.init_solver_state("euler_a", jnp.asarray(x), key)
    final, _ = sched.step_s("euler_a", sig, 0.0, jnp.asarray(eps),
                            jnp.asarray(x), st)
    np.testing.assert_allclose(np.asarray(final), x - sig * eps,
                               rtol=1e-5, atol=1e-6)

    # v-prediction parametrization produces the identical step (same key):
    # with VP coefficients a = alpha, s = sig·alpha, v = a·eps − s·x0
    alpha = 1.0 / np.sqrt(sig**2 + 1.0)
    x0 = x - sig * eps
    v = alpha * eps - (sig * alpha) * x0
    st = sched.init_solver_state("euler_a", jnp.asarray(x), key)
    out_v, _ = sched.step_s("euler_a", sig, sig_n, jnp.asarray(v),
                            jnp.asarray(x), st, "v_prediction")
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# LCM (consistency sampling — diffusers LCMScheduler, beyond the reference;
# the few-step sampler for LCM / LCM-LoRA distilled checkpoints)
# ---------------------------------------------------------------------------


def test_lcm_schedule_grid():
    """Timestep selection pinned to diffusers LCMScheduler.set_timesteps:
    origin grid k·i−1 (k = 1000/50 = 20) descending, subsampled by
    floor-linspace. Storage is VP alpha-cumprods with a trailing 1.0."""
    import pytest

    s4 = sched.make("lcm", 4)
    assert s4.kind == "lcm"
    np.testing.assert_array_equal(
        np.asarray(s4.timesteps), np.array([999, 759, 499, 259], np.float32)
    )
    s8 = sched.make("lcm", 8)
    np.testing.assert_array_equal(
        np.asarray(s8.timesteps),
        np.array([999, 879, 759, 639, 499, 379, 259, 139], np.float32),
    )
    acp = sched.alphas_cumprod(sched.NoiseScheduleConfig())
    np.testing.assert_allclose(
        np.asarray(s4.sigmas),
        np.concatenate([acp[[999, 759, 499, 259]], [1.0]]).astype(np.float32),
        rtol=1e-6,
    )
    assert float(s4.init_noise_sigma) == 1.0
    # identity input scaling (VP storage)
    x = jnp.full((1, 2, 2, 4), 3.0)
    np.testing.assert_array_equal(
        np.asarray(sched.scale_model_input_c("lcm", s4.sigmas[0], x)), np.asarray(x)
    )

    with pytest.raises(ValueError, match="karras"):
        sched.make("lcm", 4, sched.NoiseScheduleConfig(use_karras_sigmas=True))
    with pytest.raises(ValueError, match="original_inference_steps"):
        sched.make("lcm", 51)
    with pytest.raises(ValueError, match="denoising"):
        sched.make("lcm", 4, denoising_end=0.8)
    # stochastic kind: stateless step, key-less state, missing timestep
    with pytest.raises(ValueError, match="lcm"):
        sched.step_c("lcm", 0.5, 0.7, x, x)
    with pytest.raises(ValueError, match="rng"):
        sched.init_solver_state("lcm", x)


def test_lcm_step_math():
    """One LCM step == boundary-scaled consistency output re-noised to the
    next timestep's alpha-cumprod (independent numpy recomputation with the
    draw replayed from the same key); the final step (trailing alpha 1.0)
    is noise-free and returns the denoised output exactly."""
    import jax
    import pytest

    acp = sched.alphas_cumprod(sched.NoiseScheduleConfig())
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    t = 499.0
    a, a_n = float(acp[499]), float(acp[259])
    key = jax.random.PRNGKey(11)

    st = sched.init_solver_state("lcm", jnp.asarray(x), key)
    out, st2 = sched.step_s("lcm", a, a_n, jnp.asarray(eps), jnp.asarray(x),
                            st, timestep=t)

    x0 = (x - np.sqrt(1.0 - a) * eps) / np.sqrt(a)
    ts = t * sched.LCM_TIMESTEP_SCALING
    sd2 = sched.LCM_SIGMA_DATA**2
    c_skip = sd2 / (ts**2 + sd2)
    c_out = ts / np.sqrt(ts**2 + sd2)
    denoised = c_out * x0 + c_skip * x
    k2, sub = jax.random.split(key)
    z = np.asarray(jax.random.normal(sub, x.shape, jnp.float32))
    expect = np.sqrt(a_n) * denoised + np.sqrt(1.0 - a_n) * z
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(st2["key"]), np.asarray(k2))

    # final step: trailing alpha 1.0 → exactly the denoised output
    st = sched.init_solver_state("lcm", jnp.asarray(x), key)
    final, _ = sched.step_s("lcm", a, 1.0, jnp.asarray(eps), jnp.asarray(x),
                            st, timestep=t)
    np.testing.assert_allclose(np.asarray(final), denoised, rtol=1e-5, atol=1e-6)

    # t=0 boundary: c_skip→1, c_out→0 — the consistency function is the
    # identity there (its anchor constraint), so denoised == sample
    st = sched.init_solver_state("lcm", jnp.asarray(x), key)
    anchor, _ = sched.step_s("lcm", float(acp[0]), 1.0, jnp.asarray(eps),
                             jnp.asarray(x), st, timestep=0.0)
    np.testing.assert_allclose(np.asarray(anchor), x, rtol=1e-5, atol=1e-6)

    # v-prediction parametrization produces the identical step (same key):
    # v = sqrt(a)·eps − sqrt(1−a)·x0
    v = np.sqrt(a) * eps - np.sqrt(1.0 - a) * x0
    st = sched.init_solver_state("lcm", jnp.asarray(x), key)
    out_v, _ = sched.step_s("lcm", a, a_n, jnp.asarray(v), jnp.asarray(x),
                            st, "v_prediction", timestep=t)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out),
                               rtol=1e-4, atol=1e-5)

    # the timestep is mandatory for lcm
    with pytest.raises(ValueError, match="timestep"):
        sched.step_s("lcm", a, a_n, jnp.asarray(eps), jnp.asarray(x), st)

    # img2img init noising at VP scale: level == alpha-cumprod
    lv = sched.noise_to_level("lcm", a, jnp.asarray(x), jnp.asarray(eps))
    np.testing.assert_allclose(
        np.asarray(lv), np.sqrt(a) * x + np.sqrt(1.0 - a) * eps, rtol=1e-5
    )
