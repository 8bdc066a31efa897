"""ControlNet: zero-init no-op property, conditioning sensitivity, UNet wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import controlnet, unet

FP32 = dtypes.FP32


def _setup():
    ccfg = controlnet.tiny_config()
    ucfg = ccfg.base
    cparams = controlnet.init(0, ccfg)
    uparams = unet.init(1, ucfg)
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    inp = dict(
        sample=jax.random.normal(ks[0], (1, 16, 16, 4)),
        t=jnp.array([300]),
        ctx=jax.random.normal(ks[1], (1, 9, ucfg.cross_attention_dim)),
        pooled=jax.random.normal(ks[2], (1, 32)),
        tids=jnp.array([[16.0, 16, 0, 0, 16, 16]]),
        # cond resolution = latent * 2^(len(cc)-1); tiny cc has 1 stride-2
        cond=jax.random.uniform(ks[3], (1, 32, 32, 3)),
    )
    return ccfg, ucfg, cparams, uparams, inp


def test_residual_shapes_match_skips():
    ccfg, ucfg, cparams, uparams, inp = _setup()
    down, mid = controlnet.apply(
        cparams, ccfg, inp["sample"], inp["t"], inp["ctx"], inp["cond"],
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"], policy=FP32,
    )
    # residual count = conv_in + 2 per block + downsamplers (tiny: 3 blocks)
    assert len(down) == 1 + 2 * 3 + 2
    assert mid.shape[-1] == ucfg.block_out_channels[-1]


def test_zero_init_is_noop_on_unet():
    """Freshly initialized ControlNet must leave the UNet output unchanged
    (zero convs)."""
    ccfg, ucfg, cparams, uparams, inp = _setup()
    down, mid = controlnet.apply(
        cparams, ccfg, inp["sample"], inp["t"], inp["ctx"], inp["cond"],
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"], policy=FP32,
    )
    base = unet.apply(
        uparams, ucfg, inp["sample"], inp["t"], inp["ctx"],
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"], policy=FP32,
    )
    with_cn = unet.apply(
        uparams, ucfg, inp["sample"], inp["t"], inp["ctx"],
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"],
        down_block_additional_residuals=down, mid_block_additional_residual=mid,
        policy=FP32,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_cn), atol=1e-6)


def test_nonzero_convs_steer_unet():
    ccfg, ucfg, cparams, uparams, inp = _setup()
    # simulate a trained ControlNet: non-zero output convs
    for zc in cparams["controlnet_down_blocks"]:
        zc["weight"] = np.full_like(zc["weight"], 0.05)
    cparams["controlnet_mid_block"]["weight"] = np.full_like(
        cparams["controlnet_mid_block"]["weight"], 0.05
    )
    # cond-embedder output conv is also zero-init; make it live
    emb_out = cparams["controlnet_cond_embedding"]["conv_out"]
    emb_out["weight"] = np.full_like(emb_out["weight"], 0.01)
    down, mid = controlnet.apply(
        cparams, ccfg, inp["sample"], inp["t"], inp["ctx"], inp["cond"],
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"], policy=FP32,
    )
    base = unet.apply(
        uparams, ucfg, inp["sample"], inp["t"], inp["ctx"],
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"], policy=FP32,
    )
    steered = unet.apply(
        uparams, ucfg, inp["sample"], inp["t"], inp["ctx"],
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"],
        down_block_additional_residuals=down, mid_block_additional_residual=mid,
        policy=FP32,
    )
    assert np.abs(np.asarray(base) - np.asarray(steered)).max() > 1e-5

    # conditioning image changes the residuals (cond embedder is live)
    down2, _ = controlnet.apply(
        cparams, ccfg, inp["sample"], inp["t"], inp["ctx"], inp["cond"] * 0.0,
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"], policy=FP32,
    )
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max() for a, b in zip(down, down2)]
    assert max(diffs) > 1e-6


def test_conditioning_scale():
    ccfg, ucfg, cparams, uparams, inp = _setup()
    for zc in cparams["controlnet_down_blocks"]:
        zc["weight"] = np.full_like(zc["weight"], 0.05)
    d1, m1 = controlnet.apply(
        cparams, ccfg, inp["sample"], inp["t"], inp["ctx"], inp["cond"],
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"],
        conditioning_scale=1.0, policy=FP32,
    )
    d2, m2 = controlnet.apply(
        cparams, ccfg, inp["sample"], inp["t"], inp["ctx"], inp["cond"],
        pooled_text_embeds=inp["pooled"], time_ids=inp["tids"],
        conditioning_scale=0.5, policy=FP32,
    )
    np.testing.assert_allclose(np.asarray(d2[3]), 0.5 * np.asarray(d1[3]), rtol=1e-5, atol=1e-7)


def test_controlnet_pipeline_end_to_end():
    """generate(control_image=...) runs the CN branch inside the scan and
    zero-init CN reproduces the no-CN output exactly."""
    import dataclasses

    from imagharmony_tpu.models import controlnet as cn_lib
    from imagharmony_tpu.models import tokenizer as tok_lib
    from imagharmony_tpu.pipelines import HarmonyPipeline, components as comp

    toy = tok_lib.build_toy_tokenizer()
    base = comp.tiny_configs(vocab_size=len(toy.encoder))
    ccfg = cn_lib.ControlNetConfig(
        base=base.unet, conditioning_embedding_channels=(8, 16)
    )
    cfgs = dataclasses.replace(base, controlnet=ccfg)
    params = comp.init_params(0, cfgs)
    toks = tok_lib.SDXLTokenizers(toy, toy)
    pipe = HarmonyPipeline(params, cfgs, toks)

    rng = np.random.default_rng(0)
    ref = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    cond = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    kw = dict(prompt="a dog", extra_text="six dogs", num_inference_steps=2,
              height=32, width=32, seed=7)

    with_cn = pipe.generate(pil_image=ref, control_image=cond, **kw)
    without = pipe.generate(pil_image=ref, **kw)
    # zero-init output convs: exact no-op
    np.testing.assert_array_equal(with_cn, without)

    # live CN steers the output
    for zc in params["controlnet"]["controlnet_down_blocks"]:
        zc["weight"] = np.full_like(zc["weight"], 0.05)
    emb_out = params["controlnet"]["controlnet_cond_embedding"]["conv_out"]
    emb_out["weight"] = np.full_like(emb_out["weight"], 0.01)
    pipe2 = HarmonyPipeline(params, cfgs, toks)
    steered = pipe2.generate(pil_image=ref, control_image=cond, **kw)
    assert np.abs(steered.astype(int) - without.astype(int)).max() > 0

    # conditioning scale knob
    half = pipe2.generate(pil_image=ref, control_image=cond,
                          controlnet_conditioning_scale=0.5, **kw)
    assert np.abs(half.astype(int) - steered.astype(int)).max() > 0

    # num_samples > 1: control rows broadcast across the sample batch
    multi = pipe2.generate(pil_image=ref, control_image=cond, num_samples=2, **kw)
    assert multi.shape[0] == 2


def test_controlnet_hf_key_roundtrip():
    """Param tree round-trips through the flat HF-style key space
    (structural compatibility with diffusers ControlNetModel trees)."""
    from imagharmony_tpu.io import hf_import
    from imagharmony_tpu.models import controlnet as cn_lib

    ccfg = cn_lib.tiny_config()
    params = cn_lib.init(0, ccfg)
    flat = hf_import.export_tree(params)
    assert "controlnet_cond_embedding.conv_in.weight" in flat
    assert "controlnet_down_blocks.0.weight" in flat
    assert "controlnet_mid_block.weight" in flat
    back = hf_import.import_tree(params, flat)
    np.testing.assert_allclose(
        np.asarray(back["conv_in"]["weight"]),
        np.asarray(params["conv_in"]["weight"]), rtol=1e-6)
