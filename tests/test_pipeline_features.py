"""Pipeline feature coverage: guidance rescale, denoising_end handoff,
micro-conditioning overrides, all-layers IP mode, SD1.5 UNet family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import unet
from imagharmony_tpu.pipelines import HarmonyPipeline
from imagharmony_tpu.pipelines.harmony_edit import rescale_noise_cfg
from imagharmony_tpu.schedulers import diffusion as sched

FP32 = dtypes.FP32


@pytest.fixture(scope="module")
def pipe():
    return HarmonyPipeline.random_tiny(seed=0)


@pytest.fixture(scope="module")
def ref_image():
    return np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)


def _gen(pipe, ref_image, **kw):
    base = dict(prompt="a dog", extra_text="six dogs", num_inference_steps=2,
                height=32, width=32, seed=7, output_type="np")
    base.update(kw)
    return pipe.generate(pil_image=ref_image, **base)


def test_guidance_rescale_changes_output(pipe, ref_image):
    a = _gen(pipe, ref_image, guidance_rescale=0.0)
    b = _gen(pipe, ref_image, guidance_rescale=0.7)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_rescale_noise_cfg_math():
    rng = np.random.default_rng(1)
    eps_c = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
    eps_g = eps_c * 3.0  # CFG inflated std
    out = rescale_noise_cfg(eps_g, eps_c, 1.0)
    # full rescale restores the text-branch std
    np.testing.assert_allclose(
        np.std(np.asarray(out), axis=(1, 2, 3)),
        np.std(np.asarray(eps_c), axis=(1, 2, 3)),
        rtol=1e-4,
    )
    # zero rescale is identity
    np.testing.assert_allclose(np.asarray(rescale_noise_cfg(eps_g, eps_c, 0.0)),
                               np.asarray(eps_g), rtol=1e-6)


def test_denoising_end_returns_latents(pipe, ref_image):
    lat = _gen(pipe, ref_image, num_inference_steps=4, denoising_end=0.5)
    # latent handoff for a refiner stage: (B, h, w, 4) floats
    assert lat.shape[-1] == 4


def test_output_type_latent_returns_true_latents(pipe, ref_image):
    """output_type='latent' must skip the VAE: (B, h, w, 4) pre-decode
    latents (reference custom_pipelines.py:361-377 output split)."""
    down = pipe.cfgs.vae.downscale
    lat = _gen(pipe, ref_image, output_type="latent")
    assert lat.shape == (1, 32 // down, 32 // down, 4)
    # and 'raw' returns decoded float images in [-1, 1]
    raw = _gen(pipe, ref_image, output_type="raw")
    assert raw.shape == (1, 32, 32, 3)
    arr = np.asarray(raw, np.float32)
    assert arr.min() >= -1.5 and arr.max() <= 1.5  # decoded image range
    # uint8 path unchanged
    img = _gen(pipe, ref_image, output_type="np")
    assert img.dtype == np.uint8
    assert lat.dtype != np.uint8


def test_denoising_end_step_count():
    assert sched.steps_for_denoising_end(30, 0.8) < 30
    s = sched.make("euler", 30, denoising_end=0.8)
    assert s.num_steps == sched.steps_for_denoising_end(30, 0.8)
    assert s.sigmas.shape[0] == s.num_steps + 1


def test_micro_conditioning_changes_output(pipe, ref_image):
    a = _gen(pipe, ref_image)
    b = _gen(pipe, ref_image, original_size=(2048, 2048), crops_coords_top_left=(7, 3))
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_ip_all_layers_mode():
    """ip_layers=ip_all_layers() activates the decoupled branch everywhere —
    the vanilla IP-Adapter (reference ip_adapter_origin.py:110-118)."""
    cfg_one = unet.tiny_config()
    cfg_all = unet.tiny_config(ip_layers=unet.UNetConfig.ip_all_layers())
    params = unet.init(0, cfg_one)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    sample = jax.random.normal(ks[0], (1, 16, 16, 4))
    ctx = jax.random.normal(ks[1], (1, 8, cfg_one.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (1, 32))
    tids = jnp.array([[16.0, 16, 0, 0, 16, 16]])
    ip = jax.random.normal(ks[3], (1, 4, cfg_one.cross_attention_dim))

    def run(cfg):
        return np.asarray(unet.apply(
            params, cfg, sample, jnp.array([9]), ctx, pooled_text_embeds=pooled,
            time_ids=tids, ip_tokens=ip, policy=FP32))

    assert np.abs(run(cfg_one) - run(cfg_all)).max() > 1e-6


def test_sd15_unet_forward():
    """SD1.5 family: 4 blocks, 768-d context, no add-embeds."""
    cfg = unet.sd15_config(
        block_out_channels=(32, 64, 128, 128),
        cross_attention_dim=48,
        num_attention_heads=(4, 4, 4, 4),
        norm_num_groups=8,
    )
    params = unet.init(0, cfg)
    assert "add_embedding" not in params
    sample = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 48))
    out = unet.apply(params, cfg, sample, jnp.array([100]), ctx, policy=FP32)
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out)).all()

    # with IP tokens on all layers (SD1.5 vanilla IP-Adapter)
    ip = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 48))
    out_ip = unet.apply(params, cfg, sample, jnp.array([100]), ctx,
                        ip_tokens=ip, policy=FP32)
    assert np.abs(np.asarray(out_ip) - np.asarray(out)).max() > 1e-6


def test_legacy_composed_key_import():
    from imagharmony_tpu.adapters import harmony as harmony_lib
    from imagharmony_tpu.io import checkpoints, hf_import

    cfg = harmony_lib.legacy_composed_config(
        image_hidden_size=16, text_context_dim=24, inter_dim=32,
        reshape_blocks=4, cross_heads=2, cross_value_dim=4,
    )
    params = harmony_lib.init(0, cfg)
    flat = hf_import.export_tree(params)
    # simulate the legacy naming (shared_models.py:90 "cross_attention.")
    legacy = {k.replace("fusion_text_image.", "cross_attention."): v for k, v in flat.items()}
    back = checkpoints.import_harmony(params, legacy)
    np.testing.assert_allclose(
        np.asarray(back["fusion_text_image"]["to_q"]["weight"]),
        np.asarray(params["fusion_text_image"]["to_q"]["weight"]), rtol=1e-6)


def test_seed_list_per_sample(pipe, ref_image):
    """Per-sample seed lists (the reference's get_generator accepts seed
    lists, ip_adapter/utils.py:83-93): sample i from seeds [a,b] equals the
    single-seed run with noise seeded at that value."""
    out = _gen(pipe, ref_image, num_samples=2, seed=[11, 12])
    assert out.shape[0] == 2
    assert np.abs(out[0].astype(int) - out[1].astype(int)).max() > 0
    again = _gen(pipe, ref_image, num_samples=2, seed=[11, 12])
    np.testing.assert_array_equal(out, again)


def test_timestep_spacing_fast_preset(pipe, ref_image):
    """--fast preset basis: trailing spacing runs end-to-end, starts the
    schedule at t≈999 (vs 958 for leading), and changes outputs."""
    from imagharmony_tpu.schedulers import diffusion as sched

    lead = sched.make("euler", 15, sched.NoiseScheduleConfig(timestep_spacing="leading"))
    trail = sched.make("euler", 15, sched.NoiseScheduleConfig(timestep_spacing="trailing"))
    assert float(trail.timesteps[0]) == 999.0
    assert float(lead.timesteps[0]) < 999.0
    # trailing includes the max-noise step -> init sigma is the global max
    assert trail.init_noise_sigma > lead.init_noise_sigma

    a = _gen(pipe, ref_image, timestep_spacing="leading")
    b = _gen(pipe, ref_image, timestep_spacing="trailing")
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_denoising_start_refiner_handoff(pipe, ref_image):
    """Base run with denoising_end hands latents to a refiner-style run with
    denoising_start; the composition equals the single full run exactly
    (reference custom_pipelines.py:308-316 mixture-of-denoisers split)."""
    kw = dict(prompt="a dog", extra_text="six dogs", num_inference_steps=4,
              height=32, width=32, seed=7)
    full = pipe.generate(pil_image=ref_image, output_type="np", **kw)
    lat = pipe.generate(pil_image=ref_image, denoising_end=0.5,
                        output_type="latent", **kw)
    assert lat.shape[-1] == 4  # pre-VAE latents
    out = pipe.generate(pil_image=ref_image, latents=lat, denoising_start=0.5,
                        output_type="np", **kw)
    np.testing.assert_array_equal(full, out)


def test_encoder_split_is_exact():
    """unet.apply(return_encoder=True) -> feeding those features back via
    encoder_override at the SAME step reproduces the full forward exactly
    (the encoder/decoder split itself introduces no approximation)."""
    cfg = unet.tiny_config()
    params = unet.init(0, cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    kw = dict(
        pooled_text_embeds=jax.random.normal(ks[0], (2, 32)),
        time_ids=jnp.tile(jnp.array([[32.0, 32, 0, 0, 32, 32]]), (2, 1)),
        ip_tokens=jax.random.normal(ks[1], (2, 4, cfg.cross_attention_dim)),
        policy=FP32,
    )
    sample = jax.random.normal(ks[2], (2, 8, 8, 4))
    t = jnp.array([500, 500])
    ctx = jax.random.normal(ks[3], (2, 9, cfg.cross_attention_dim))
    full = unet.apply(params, cfg, sample, t, ctx, **kw)
    out, enc = unet.apply(params, cfg, sample, t, ctx, return_encoder=True, **kw)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))
    reused = unet.apply(params, cfg, sample, t, ctx, encoder_override=enc, **kw)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(reused))


def test_encoder_split_mid_residual_semantics():
    """The cached encoder features bake in DOWN-block residuals but not the
    mid-block residual (applied after the cache point, unet.apply): reuse
    with encoder_override must re-pass mid_block_additional_residual to
    reproduce the full forward — dropping it (the round-2 --turbo+ControlNet
    bug) gives a different output."""
    cfg = unet.tiny_config()
    params = unet.init(0, cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    kw = dict(
        pooled_text_embeds=jax.random.normal(ks[0], (2, 32)),
        time_ids=jnp.tile(jnp.array([[32.0, 32, 0, 0, 32, 32]]), (2, 1)),
        ip_tokens=jax.random.normal(ks[1], (2, 4, cfg.cross_attention_dim)),
        policy=FP32,
    )
    sample = jax.random.normal(ks[2], (2, 8, 8, 4))
    t = jnp.array([500, 500])
    ctx = jax.random.normal(ks[3], (2, 9, cfg.cross_attention_dim))
    # mid-block spatial dims: 8 // 2^(n_downsamples); tiny_config has
    # len(block_out_channels)-1 downsamples
    probe = unet.apply(params, cfg, sample, t, ctx, return_encoder=True, **kw)
    mid_shape = probe[1][1].shape
    mid = 0.1 * jax.random.normal(ks[4], mid_shape)
    full = unet.apply(
        params, cfg, sample, t, ctx, mid_block_additional_residual=mid, **kw
    )
    out, enc = unet.apply(
        params, cfg, sample, t, ctx, mid_block_additional_residual=mid,
        return_encoder=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))
    with_mid = unet.apply(
        params, cfg, sample, t, ctx, encoder_override=enc,
        mid_block_additional_residual=mid, **kw,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(with_mid))
    without_mid = unet.apply(params, cfg, sample, t, ctx, encoder_override=enc, **kw)
    assert np.abs(np.asarray(full) - np.asarray(without_mid)).max() > 0


def test_encoder_propagation_turbo_controlnet(ref_image):
    """--turbo with a live ControlNet: the mid-block residual is carried
    through the scan and applied on reuse steps — the control signal must
    steer the turbo output (scale 0 vs 1 differ), run deterministically,
    and a pure-reuse schedule (steps=2, interval=2: step 1 reuses) must
    still see the mid residual (differs from mid-zeroed params)."""
    import copy
    import dataclasses

    from imagharmony_tpu.models import controlnet as cn_lib
    from imagharmony_tpu.models import tokenizer as tok_lib
    from imagharmony_tpu.pipelines import components as comp

    toy = tok_lib.build_toy_tokenizer()
    base = comp.tiny_configs(vocab_size=len(toy.encoder))
    ccfg = cn_lib.ControlNetConfig(
        base=base.unet, conditioning_embedding_channels=(8, 16)
    )
    cfgs = dataclasses.replace(base, controlnet=ccfg)
    params = comp.init_params(0, cfgs)
    emb_out = params["controlnet"]["controlnet_cond_embedding"]["conv_out"]
    emb_out["weight"] = np.full_like(emb_out["weight"], 0.01)
    # ONLY the mid zero-conv is live: any control influence flows through
    # mid_block_additional_residual, so reuse steps dropping it would show
    mid_zc = params["controlnet"]["controlnet_mid_block"]
    mid_zc["weight"] = np.full_like(mid_zc["weight"], 0.05)
    cn = HarmonyPipeline(params, cfgs, tok_lib.SDXLTokenizers(toy, toy))

    cond = np.random.default_rng(3).integers(0, 255, (32, 32, 3), np.uint8)
    kw = dict(prompt="a dog", num_inference_steps=2, height=32, width=32,
              seed=7, output_type="np", encoder_interval=2)
    steered = cn.generate(pil_image=ref_image, control_image=cond, **kw)
    unsteered = cn.generate(pil_image=ref_image, control_image=cond,
                            controlnet_conditioning_scale=0.0, **kw)
    assert np.abs(steered.astype(int) - unsteered.astype(int)).max() > 0
    again = cn.generate(pil_image=ref_image, control_image=cond, **kw)
    np.testing.assert_array_equal(steered, again)

    # dead mid zero-conv ⇒ no residual anywhere ⇒ must match scale=0 exactly
    params2 = copy.deepcopy(params)
    params2["controlnet"]["controlnet_mid_block"]["weight"][...] = 0.0
    cn2 = HarmonyPipeline(params2, cfgs, tok_lib.SDXLTokenizers(toy, toy))
    dead = cn2.generate(pil_image=ref_image, control_image=cond, **kw)
    np.testing.assert_array_equal(dead, unsteered)


def test_encoder_propagation_turbo(pipe, ref_image):
    """encoder_interval=2 (the --turbo preset, arXiv 2312.09608): runs,
    differs from the exact schedule, stays structurally close, and is
    deterministic. (Composition with the chunked runner is covered by
    test_continuous.py::test_chunked_turbo_matches_one_jit.)"""
    from imagharmony_tpu.utils.parity import cosine

    exact = _gen(pipe, ref_image, num_inference_steps=4, output_type="raw")
    turbo = _gen(pipe, ref_image, num_inference_steps=4, output_type="raw",
                 encoder_interval=2)
    assert turbo.shape == exact.shape
    a, b = np.asarray(exact, np.float32), np.asarray(turbo, np.float32)
    assert np.abs(a - b).max() > 0  # it IS an approximation
    assert cosine(a, b) > 0.95, cosine(a, b)
    again = _gen(pipe, ref_image, num_inference_steps=4, output_type="raw",
                 encoder_interval=2)
    np.testing.assert_array_equal(np.asarray(turbo), np.asarray(again))


def test_dpmpp_scheduler_generate(pipe, ref_image):
    """scheduler="dpm++" (DPM-Solver++ 2M, beyond the reference): runs
    through the full pipeline, is deterministic, differs from euler and
    ddim, and stays structurally close to euler at equal steps (same noise,
    same model — only the solver changes)."""
    from imagharmony_tpu.utils.parity import cosine

    kw = dict(num_inference_steps=4, output_type="raw")
    d = _gen(pipe, ref_image, scheduler="dpm++", **kw)
    e = _gen(pipe, ref_image, scheduler="euler", **kw)
    i = _gen(pipe, ref_image, scheduler="ddim", **kw)
    assert np.isfinite(np.asarray(d)).all()
    assert not np.array_equal(np.asarray(d), np.asarray(e))
    assert not np.array_equal(np.asarray(d), np.asarray(i))
    assert cosine(np.asarray(d), np.asarray(e)) > 0.95
    again = _gen(pipe, ref_image, scheduler="dpm++", **kw)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(again))


def test_img2img_strength(pipe, ref_image):
    """img2img (init_image=/strength=, beyond the reference — diffusers
    Img2ImgPipeline get_timesteps semantics): runs on every scheduler,
    deterministic, anchored to the init image. Low strength keeps the
    output closer to the init image's VAE round-trip than high strength,
    and a strength below 1/n (zero denoise steps) IS the exact VAE
    round-trip of the init image."""
    import jax.numpy as jnp

    from imagharmony_tpu import dtypes
    from imagharmony_tpu.models import vae
    from imagharmony_tpu.pipelines import harmony_edit as he
    from imagharmony_tpu.utils.parity import cosine

    rng = np.random.default_rng(5)
    init = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    kw = dict(num_inference_steps=4, output_type="raw")

    base = np.asarray(_gen(pipe, ref_image, **kw))
    for schd in ("euler", "ddim", "dpm++"):
        low = np.asarray(_gen(pipe, ref_image, scheduler=schd,
                              init_image=init, strength=0.5, **kw))
        assert np.isfinite(low).all()
        assert not np.array_equal(low, np.asarray(
            _gen(pipe, ref_image, scheduler=schd, **kw)))
        again = np.asarray(_gen(pipe, ref_image, scheduler=schd,
                                init_image=init, strength=0.5, **kw))
        np.testing.assert_array_equal(low, again)

    # zero-step strength == exact VAE round-trip (the img2img_init at
    # sigma=0 is the image latents themselves). Exact oracle on an fp32
    # clone of the pipeline (in bf16 the one-jit vs two-jit XLA fusion
    # split alone moves the deep decoder's output by ~1e-1 on random
    # weights, which would test fusion luck, not the img2img math).
    from imagharmony_tpu.pipelines import HarmonyPipeline

    pipe32 = HarmonyPipeline(pipe.params, pipe.cfgs, pipe.tokenizers,
                             policy=dtypes.FP32, backend=pipe.backend)
    recon = np.asarray(_gen(pipe32, ref_image, init_image=init, strength=0.2, **kw))
    pix = jnp.asarray(he.preprocess_init_image(init, 32, 32))
    pol = dtypes.Policy(compute_dtype=jnp.float32)
    lat = vae.encode(pipe.params["vae"], pipe.cfgs.vae, pix, sample=False,
                     policy=pol).astype(jnp.float32)
    manual = np.asarray(vae.decode(pipe.params["vae"], pipe.cfgs.vae, lat, policy=pol))
    assert cosine(recon, manual) > 0.9999
    np.testing.assert_allclose(recon, manual, atol=1e-3)

    # the diffusers get_timesteps mapping, exact
    assert sched.img2img_skip_steps(4, 1.0) == 0
    assert sched.img2img_skip_steps(4, 0.5) == 2
    assert sched.img2img_skip_steps(4, 0.2) == 4  # zero denoise steps
    assert sched.img2img_skip_steps(30, 0.8) == 6

    with pytest.raises(ValueError, match="strength"):
        _gen(pipe, ref_image, init_image=init, strength=1.5, **kw)


def test_karras_sigmas_generate(pipe, ref_image):
    """use_karras_sigmas=True through the pipeline: runs on euler and
    dpm++, deterministic, differs from the default spacing, and is
    bit-equal between the one-jit and chunked paths."""
    kw = dict(num_inference_steps=4, output_type="np")
    for schd in ("euler", "dpm++"):
        k = _gen(pipe, ref_image, scheduler=schd, use_karras_sigmas=True, **kw)
        base = _gen(pipe, ref_image, scheduler=schd, **kw)
        assert not np.array_equal(k, base)
        again = _gen(pipe, ref_image, scheduler=schd, use_karras_sigmas=True, **kw)
        np.testing.assert_array_equal(k, again)
    chunked = _gen(pipe, ref_image, scheduler="dpm++", use_karras_sigmas=True,
                   chunk_steps=2, **kw)
    one_jit = _gen(pipe, ref_image, scheduler="dpm++", use_karras_sigmas=True, **kw)
    np.testing.assert_array_equal(chunked, one_jit)
    with pytest.raises(ValueError, match="karras"):
        _gen(pipe, ref_image, scheduler="ddim", use_karras_sigmas=True, **kw)


def test_prediction_type_generate(pipe, ref_image):
    """prediction_type="v_prediction" (SD2.x-style parametrization, beyond
    the reference): runs on every scheduler, deterministic, differs from
    epsilon, and is bit-equal between the one-jit and chunked paths."""
    kw = dict(num_inference_steps=4, output_type="np")
    for schd in ("euler", "ddim", "dpm++"):
        v = _gen(pipe, ref_image, scheduler=schd,
                 prediction_type="v_prediction", **kw)
        base = _gen(pipe, ref_image, scheduler=schd, **kw)
        assert np.isfinite(v).all()
        assert not np.array_equal(v, base)
        again = _gen(pipe, ref_image, scheduler=schd,
                     prediction_type="v_prediction", **kw)
        np.testing.assert_array_equal(v, again)
    chunked = _gen(pipe, ref_image, scheduler="dpm++",
                   prediction_type="v_prediction", chunk_steps=2, **kw)
    one_jit = _gen(pipe, ref_image, scheduler="dpm++",
                   prediction_type="v_prediction", **kw)
    np.testing.assert_array_equal(chunked, one_jit)


def test_zero_snr_vpred_generate(pipe, ref_image):
    """The arXiv 2305.08891 recipe end-to-end: zero terminal SNR + trailing
    spacing + v_prediction. The first step sits at SNR exactly 0 (ddim) /
    sigma ~4096 (euler) and the pipeline stays finite and deterministic."""
    kw = dict(num_inference_steps=4, output_type="np",
              timestep_spacing="trailing", prediction_type="v_prediction",
              rescale_zero_snr=True)
    for schd in ("euler", "ddim"):
        out = _gen(pipe, ref_image, scheduler=schd, **kw)
        assert np.isfinite(out.astype(np.float32)).all()
        again = _gen(pipe, ref_image, scheduler=schd, **kw)
        np.testing.assert_array_equal(out, again)
        assert not np.array_equal(
            out, _gen(pipe, ref_image, scheduler=schd,
                      timestep_spacing="trailing",
                      prediction_type="v_prediction",
                      num_inference_steps=4, output_type="np"))


def test_inpainting(pipe, ref_image):
    """Masked editing (mask_image=/init_image=, beyond the reference —
    diffusers InpaintPipeline latent-blend semantics): per-step the kept
    region is restored from the init image's latents re-noised to the next
    step's level; the final step blends the clean init latents.

    Invariants: an all-repaint mask at strength 1.0 equals the plain
    generate bit-for-bit (blend with mask==1 is the identity); an all-keep
    mask reproduces the init image's VAE round-trip; a half mask keeps the
    masked half anchored to the round-trip while the other half repaints."""
    import jax.numpy as jnp

    from imagharmony_tpu import dtypes
    from imagharmony_tpu.models import vae
    from imagharmony_tpu.pipelines import HarmonyPipeline
    from imagharmony_tpu.pipelines import harmony_edit as he

    rng = np.random.default_rng(9)
    init = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    kw = dict(num_inference_steps=3, output_type="raw")

    # fp32 clone: the oracle comparisons below are against an fp32 VAE
    # round-trip (same rationale as test_img2img_strength)
    pipe32 = HarmonyPipeline(pipe.params, pipe.cfgs, pipe.tokenizers,
                             policy=dtypes.FP32, backend=pipe.backend)
    pix = jnp.asarray(he.preprocess_init_image(init, 32, 32))
    pol = dtypes.Policy(compute_dtype=jnp.float32)
    lat = vae.encode(pipe.params["vae"], pipe.cfgs.vae, pix, sample=False,
                     policy=pol).astype(jnp.float32)
    roundtrip = np.asarray(
        vae.decode(pipe.params["vae"], pipe.cfgs.vae, lat, policy=pol)
    )

    ones = np.ones((32, 32), np.float32)
    for schd in ("euler", "ddim", "dpm++"):
        # all-repaint at strength 1.0 == the plain pipeline. The blend with
        # mask==1 is the identity, but its presence in the graph changes
        # XLA's fusion of the surrounding fp32 ops — compare at 1-ulp
        # pixel tolerance (measured maxdiff 7.2e-7), not bit-for-bit.
        full = np.asarray(_gen(pipe32, ref_image, scheduler=schd,
                               init_image=init, mask_image=ones, **kw))
        plain = np.asarray(_gen(pipe32, ref_image, scheduler=schd, **kw))
        np.testing.assert_allclose(full, plain, atol=1e-6)

        # all-keep == the init image's VAE round-trip
        keep = np.asarray(_gen(pipe32, ref_image, scheduler=schd,
                               init_image=init, mask_image=0 * ones, **kw))
        np.testing.assert_allclose(keep, roundtrip, atol=1e-3)

        # half mask, checked in LATENT space (the decoder's receptive field
        # legitimately spreads the repainted region's influence across the
        # boundary in pixels — the algorithm's exact contract is on
        # latents): kept columns == the init latents bit-for-bit (the final
        # blend restores the CLEAN latents there), repainted columns differ
        half = ones.copy()
        half[:, :16] = 0.0  # left half kept → latent columns 0-1
        lat_np = np.asarray(lat)
        out_lat = np.asarray(_gen(pipe32, ref_image, scheduler=schd,
                                  init_image=init, mask_image=half,
                                  num_inference_steps=3, output_type="latent"))
        # in-graph VAE encode vs the two-jit oracle encode differ by ~1 ulp
        # (different XLA fusions of the same fp32 math)
        np.testing.assert_allclose(out_lat[:, :, :2, :], lat_np[:, :, :2, :],
                                   atol=1e-6)
        assert np.abs(out_lat[:, :, 2:, :] - lat_np[:, :, 2:, :]).max() > 0.05
        # deterministic
        again = np.asarray(_gen(pipe32, ref_image, scheduler=schd,
                                init_image=init, mask_image=half,
                                num_inference_steps=3, output_type="latent"))
        np.testing.assert_array_equal(out_lat, again)

    # composes with partial strength (img2img start) and with --turbo's
    # encoder propagation (one-jit path) — same latent-space anchor
    soft = np.asarray(_gen(pipe32, ref_image, init_image=init,
                           mask_image=half, strength=0.7,
                           num_inference_steps=3, output_type="latent"))
    np.testing.assert_allclose(soft[:, :, :2, :], lat_np[:, :, :2, :], atol=1e-6)
    turbo = np.asarray(_gen(pipe32, ref_image, init_image=init,
                            mask_image=half, encoder_interval=2,
                            num_inference_steps=4, output_type="latent"))
    assert np.isfinite(turbo).all()
    np.testing.assert_allclose(turbo[:, :, :2, :], lat_np[:, :, :2, :], atol=1e-6)

    # guards: mask without init image; chunked path
    with pytest.raises(ValueError, match="init_image"):
        _gen(pipe, ref_image, mask_image=ones, **kw)
    with pytest.raises(ValueError, match="chunk_steps"):
        _gen(pipe, ref_image, init_image=init, mask_image=ones,
             chunk_steps=2, **kw)


def test_preprocess_mask():
    from imagharmony_tpu.pipelines.harmony_edit import preprocess_mask

    # float array in [0,1], nearest-resized to latent res, binarized
    m = np.zeros((64, 64), np.float32)
    m[:, 32:] = 1.0
    out = preprocess_mask(m, 64, 64, 8)
    assert out.shape == (1, 8, 8, 1)
    assert set(np.unique(out)) <= {0.0, 1.0}
    np.testing.assert_array_equal(out[0, :, :4, 0], np.zeros((8, 4)))
    np.testing.assert_array_equal(out[0, :, 4:, 0], np.ones((8, 4)))
    # uint8 image path
    out2 = preprocess_mask((m * 255).astype(np.uint8), 64, 64, 8)
    np.testing.assert_array_equal(out, out2)


def test_euler_ancestral_generate(pipe, ref_image):
    """scheduler="euler_a" (beyond the reference — diffusers
    EulerAncestralDiscreteScheduler role): stochastic sampler whose
    ancestral noise stream is derived from the run's seed — deterministic
    given the seed, different from plain euler at the same seed, and
    composes with seed lists / generate_batch. Chunked runner and karras
    sigmas are rejected."""
    kw = dict(num_inference_steps=4, output_type="np")
    a = _gen(pipe, ref_image, scheduler="euler_a", **kw)
    again = _gen(pipe, ref_image, scheduler="euler_a", **kw)
    np.testing.assert_array_equal(a, again)
    base = _gen(pipe, ref_image, scheduler="euler", **kw)
    assert not np.array_equal(a, base)
    other = _gen(pipe, ref_image, scheduler="euler_a", seed=8, **kw)
    assert not np.array_equal(a, other)

    # per-sample seed list + img2img compose; turbo (encoder_interval) too
    init = np.random.default_rng(2).integers(0, 255, (64, 64, 3), np.uint8)
    ls = _gen(pipe, ref_image, scheduler="euler_a", seed=[3, 4],
              num_samples=2, init_image=init, strength=0.8, **kw)
    assert ls.shape[0] == 2 and np.isfinite(ls.astype(np.float32)).all()
    tb = _gen(pipe, ref_image, scheduler="euler_a", encoder_interval=2, **kw)
    assert np.isfinite(tb.astype(np.float32)).all()
    assert not np.array_equal(tb, a)

    # packed batch path carries the ancestral stream too
    pb = pipe.generate_batch(
        [ref_image, ref_image], ["a dog", "a cat"],
        extra_texts=["six dogs", "six cats"], seeds=[3, 4],
        scheduler="euler_a", height=32, width=32,
        num_inference_steps=4, output_type="np",
    )
    assert pb.shape[0] == 2

    with pytest.raises(ValueError, match="euler_a"):
        _gen(pipe, ref_image, scheduler="euler_a", chunk_steps=2, **kw)
    with pytest.raises(ValueError, match="karras"):
        _gen(pipe, ref_image, scheduler="euler_a", use_karras_sigmas=True, **kw)


def test_no_cfg_fast_path(pipe, ref_image):
    """guidance_scale <= 1 disables classifier-free guidance (diffusers
    do_classifier_free_guidance): the uncond rows are sliced away and every
    UNet eval runs at batch B instead of 2B. Semantics check: at scale
    1 + epsilon the CFG combine is eps_u + ~1·(eps_c − eps_u) ≈ eps_c, so
    the doubled-batch path must agree with the cond-only path to fp32
    tolerance."""
    from imagharmony_tpu import dtypes
    from imagharmony_tpu.pipelines import HarmonyPipeline

    pipe32 = HarmonyPipeline(pipe.params, pipe.cfgs, pipe.tokenizers,
                             policy=dtypes.FP32, backend=pipe.backend)
    kw = dict(num_inference_steps=3, output_type="raw")
    fast = np.asarray(_gen(pipe32, ref_image, guidance_scale=1.0, **kw))
    assert np.isfinite(fast).all()
    again = np.asarray(_gen(pipe32, ref_image, guidance_scale=1.0, **kw))
    np.testing.assert_array_equal(fast, again)
    # CFG path at scale 1+1e-6 computes ≈ eps_c through the 2B batch
    cfg1 = np.asarray(_gen(pipe32, ref_image, guidance_scale=1.0 + 1e-6, **kw))
    np.testing.assert_allclose(fast, cfg1, atol=1e-3)
    # and both differ from real guidance
    assert np.abs(fast - np.asarray(_gen(pipe32, ref_image, **kw))).max() > 1e-3

    # composes with turbo's encoder propagation and with euler_a
    tb = _gen(pipe, ref_image, guidance_scale=1.0, encoder_interval=2,
              num_inference_steps=4, output_type="np")
    assert np.isfinite(tb.astype(np.float32)).all()
    ea = _gen(pipe, ref_image, guidance_scale=1.0, scheduler="euler_a",
              num_inference_steps=3, output_type="np")
    assert np.isfinite(ea.astype(np.float32)).all()


def test_lcm_generate(pipe, ref_image):
    """scheduler="lcm" (beyond the reference — diffusers LCMScheduler role,
    the few-step consistency sampler for LCM/LCM-LoRA distilled
    checkpoints): deterministic given the seed, stochastic stream derived
    from it, canonical at guidance_scale=1.0 (the no-CFG fast path — one
    UNet eval per step at batch B). Composes with img2img; chunked runner,
    karras and the refiner handoff are rejected."""
    kw = dict(num_inference_steps=4, guidance_scale=1.0, output_type="np")
    a = _gen(pipe, ref_image, scheduler="lcm", **kw)
    again = _gen(pipe, ref_image, scheduler="lcm", **kw)
    np.testing.assert_array_equal(a, again)
    other = _gen(pipe, ref_image, scheduler="lcm", seed=8, **kw)
    assert not np.array_equal(a, other)
    # CFG (gs>1) still runs (LCM-LoRA on a standard UNet accepts mild CFG)
    cfg = _gen(pipe, ref_image, scheduler="lcm", num_inference_steps=4,
               guidance_scale=2.0, output_type="np")
    assert not np.array_equal(a, cfg)

    # img2img + seed lists compose (VP-scale noising of the init image)
    init = np.random.default_rng(2).integers(0, 255, (64, 64, 3), np.uint8)
    ls = _gen(pipe, ref_image, scheduler="lcm", seed=[3, 4], num_samples=2,
              init_image=init, strength=0.5, **kw)
    assert ls.shape[0] == 2 and np.isfinite(ls.astype(np.float32)).all()

    # packed serving path carries the noise stream too
    pb = pipe.generate_batch(
        [ref_image, ref_image], ["a dog", "a cat"],
        extra_texts=["six dogs", "six cats"], seeds=[3, 4],
        scheduler="lcm", height=32, width=32,
        num_inference_steps=4, guidance_scale=1.0, output_type="np",
    )
    assert pb.shape[0] == 2

    import pytest
    with pytest.raises(ValueError, match="lcm"):
        _gen(pipe, ref_image, scheduler="lcm", chunk_steps=2, **kw)
    with pytest.raises(ValueError, match="karras"):
        _gen(pipe, ref_image, scheduler="lcm", use_karras_sigmas=True, **kw)
    with pytest.raises(ValueError, match="denoising"):
        _gen(pipe, ref_image, scheduler="lcm", denoising_end=0.8, **kw)


def test_clip_skip_generate(ref_image):
    """clip_skip=1 (condition on an earlier text-encoder layer — diffusers
    clip_skip, for checkpoints fine-tuned that way) changes the output and
    threads through the one-jit path; out-of-range values raise."""
    import dataclasses as dc

    from imagharmony_tpu.models import tokenizer as tok_lib
    from imagharmony_tpu.pipelines import components as comp

    toy = tok_lib.build_toy_tokenizer()
    cfgs = comp.tiny_configs(vocab_size=len(toy.encoder))
    cfgs = dc.replace(
        cfgs,
        text_l=dc.replace(cfgs.text_l, num_layers=3),
        text_g=dc.replace(cfgs.text_g, num_layers=3),
    )
    params = comp.init_params(0, cfgs)
    deep = HarmonyPipeline(params, cfgs, tok_lib.SDXLTokenizers(toy, toy))

    kw = dict(pil_image=ref_image, prompt="a dog", extra_text="six dogs",
              num_inference_steps=2, height=32, width=32, seed=7,
              output_type="np")
    a = deep.generate(**kw)
    b = deep.generate(clip_skip=1, **kw)
    assert a.shape == b.shape == (1, 32, 32, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0
    np.testing.assert_array_equal(b, deep.generate(clip_skip=1, **kw))

    with pytest.raises(ValueError, match="clip_skip"):
        deep.generate(clip_skip=2, **kw)


def test_parse_prompt_attention():
    """The A1111 attention grammar: (x) = 1.1, [x] = 1/1.1, (x:w) = w,
    nesting multiplies, escapes stay literal, unmatched closers are
    literal, unclosed openers apply to the tail."""
    from imagharmony_tpu.utils import prompts

    pa = prompts.parse_prompt_attention
    assert pa("a dog") == [["a dog", 1.0]]
    assert pa("a (dog)") == [["a ", 1.0], ["dog", 1.1]]
    assert pa("a (dog:1.5) c") == [["a ", 1.0], ["dog", 1.5], [" c", 1.0]]
    assert pa("[dog]") == [["dog", 1.0 / 1.1]]
    ((frag, w),) = pa("((dog))")
    assert frag == "dog" and abs(w - 1.21) < 1e-9
    assert pa(r"\(literal\)") == [["(literal)", 1.0]]
    assert pa("a )") == [["a )", 1.0]]          # unmatched closer: literal
    assert pa("(tail") == [["tail", 1.1]]        # unclosed opener: to end
    ((f1, w1), (f2, w2)) = pa("(a (b:2))")
    assert (f1, round(w1, 3)) == ("a ", 1.1) and (f2, w2) == ("b", 2.2)
    assert pa("") == [["", 1.0]]
    assert not prompts.is_weighted(pa("plain"))
    assert prompts.is_weighted(pa("(x)"))
    assert prompts.plain_text(pa("a (dog:1.5) c")) == "a dog c"


def test_prompt_weighting_generate(pipe, ref_image):
    """Opt-in prompt weighting: no syntax -> bit-identical to the flag-off
    path (no weight operands enter the jit); weighted prompts change the
    output monotonically with the weight; chunked runner rejects it."""
    kw = dict(num_inference_steps=2, output_type="np")
    plain = _gen(pipe, ref_image, **kw)
    flag_on = _gen(pipe, ref_image, prompt_weighting=True, **kw)
    np.testing.assert_array_equal(plain, flag_on)

    up = _gen(pipe, ref_image, prompt="a (dog:2.0)", prompt_weighting=True, **kw)
    assert np.abs(up.astype(int) - plain.astype(int)).max() > 0
    # without the flag the brackets are literal tokens — different from both
    lit = _gen(pipe, ref_image, prompt="a (dog:2.0)", **kw)
    assert np.abs(lit.astype(int) - up.astype(int)).max() > 0

    # weighting the negative prompt also threads through
    negw = _gen(pipe, ref_image, negative_prompt="(low quality:1.8)",
                prompt_weighting=True, **kw)
    assert np.abs(negw.astype(int) - plain.astype(int)).max() > 0

    import pytest
    with pytest.raises(ValueError, match="prompt_weighting"):
        _gen(pipe, ref_image, prompt="a (dog:2.0)", prompt_weighting=True,
             chunk_steps=2, **kw)


def test_tokenize_weighted_alignment(pipe):
    """The weight vector aligns with the fragment-wise ids: BOS/EOS/pad
    carry weight 1, the weighted fragment's tokens carry its weight."""
    ids_l, ids_g, w = pipe._tokenize_weighted("a (dog:1.5)")
    assert w is not None and w.shape == (1, ids_l.shape[1])
    tok = pipe.tokenizers.tok1
    n_a = len(tok.encode("a ", pad_to_max=False)) - 2
    n_dog = len(tok.encode("dog", pad_to_max=False)) - 2
    expect = [1.0] + [1.0] * n_a + [1.5] * n_dog
    np.testing.assert_allclose(w[0, : len(expect)], expect)
    assert (w[0, len(expect):] == 1.0).all()
    # ids equal the plain tokenization of the cleaned prompt here (the
    # fragment boundary falls on a word boundary)
    pl, pg = pipe._tokenize("a dog")
    np.testing.assert_array_equal(np.asarray(ids_l), np.asarray(pl))
    # no syntax -> weights None and ids equal the plain path
    il, ig, w0 = pipe._tokenize_weighted("a dog")
    assert w0 is None
    np.testing.assert_array_equal(np.asarray(il), np.asarray(pl))


def test_text_to_image_mode(pipe, ref_image):
    """No reference image -> plain text-to-image (diffusers
    StableDiffusionXLPipeline role, beyond the reference whose generate()
    requires the image prompt): the IP branch is off, output is
    deterministic per seed and differs from the image-prompted edit."""
    kw = dict(prompt="a dog", num_inference_steps=2, height=32, width=32,
              seed=7, output_type="np")
    t2i = pipe.generate(**kw)
    assert t2i.shape == (1, 32, 32, 3)
    np.testing.assert_array_equal(t2i, pipe.generate(**kw))
    edited = pipe.generate(pil_image=ref_image, **kw)
    assert np.abs(t2i.astype(int) - edited.astype(int)).max() > 0
    # scale-0 edit is mathematically t2i (the IP branch multiplies to
    # zero) but compiles to a different program (the ip subgraph still
    # exists), so assert near-equality, not bit-equality
    off = pipe.generate(pil_image=ref_image, scale=0.0, **kw)
    assert np.abs(t2i.astype(int) - off.astype(int)).max() <= 2

    # batched t2i rows
    pb = pipe.generate_batch(
        None, ["a dog", "a cat"], seeds=[1, 2], height=32, width=32,
        num_inference_steps=2, output_type="np",
    )
    assert pb.shape[0] == 2
