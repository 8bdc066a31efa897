"""SDXL UNet structural tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import unet

CFG = unet.tiny_config()
FP32 = dtypes.FP32


def _inputs(batch=2, res=16):
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    return dict(
        sample=jax.random.normal(ks[0], (batch, res, res, 4)),
        timesteps=jnp.array([10, 500][:batch]),
        encoder_hidden_states=jax.random.normal(ks[1], (batch, 12, CFG.cross_attention_dim)),
        pooled_text_embeds=jax.random.normal(ks[2], (batch, 32)),
        time_ids=jnp.tile(jnp.array([[16.0, 16, 0, 0, 16, 16]]), (batch, 1)),
        ip_tokens=jax.random.normal(ks[3], (batch, 4, CFG.cross_attention_dim)),
    )


def test_unet_forward_shape_and_jit():
    params = unet.init(jax.random.PRNGKey(0), CFG)
    inp = _inputs()

    fn = jax.jit(
        lambda p, i: unet.apply(
            p, CFG, i["sample"], i["timesteps"], i["encoder_hidden_states"],
            pooled_text_embeds=i["pooled_text_embeds"], time_ids=i["time_ids"],
            ip_tokens=i["ip_tokens"], ip_scale=1.0, policy=FP32,
        )
    )
    out = fn(params, inp)
    assert out.shape == inp["sample"].shape
    assert np.isfinite(np.asarray(out)).all()


def test_ip_scale_zero_equals_ip_off():
    """With ip_scale=0 the decoupled branch must be a no-op — this pins the
    additive structure out = text_attn + scale*ip_attn."""
    params = unet.init(jax.random.PRNGKey(0), CFG)
    inp = _inputs(batch=1)
    base = unet.apply(
        params, CFG, inp["sample"], inp["timesteps"][:1], inp["encoder_hidden_states"],
        pooled_text_embeds=inp["pooled_text_embeds"], time_ids=inp["time_ids"],
        ip_tokens=None, policy=FP32,
    )
    zero = unet.apply(
        params, CFG, inp["sample"], inp["timesteps"][:1], inp["encoder_hidden_states"],
        pooled_text_embeds=inp["pooled_text_embeds"], time_ids=inp["time_ids"],
        ip_tokens=inp["ip_tokens"], ip_scale=0.0, policy=FP32,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(zero), rtol=1e-5, atol=1e-5)


def test_ip_tokens_change_output_only_via_target_layer():
    """IP tokens must influence the output (target block active), and a config
    with no ip_layers must ignore them entirely — the static analog of the
    reference's skip=True processors (train.py:563-564)."""
    params = unet.init(jax.random.PRNGKey(0), CFG)
    inp = _inputs(batch=1)

    def run(cfg, ip, scale=1.0):
        return np.asarray(
            unet.apply(
                params, cfg, inp["sample"], inp["timesteps"][:1], inp["encoder_hidden_states"],
                pooled_text_embeds=inp["pooled_text_embeds"], time_ids=inp["time_ids"],
                ip_tokens=ip, ip_scale=scale, policy=FP32,
            )
        )

    on = run(CFG, inp["ip_tokens"])
    other = run(CFG, inp["ip_tokens"] * 2.0)
    assert np.abs(on - other).max() > 1e-6

    no_ip_cfg = unet.tiny_config(ip_layers=())
    off_a = run(no_ip_cfg, inp["ip_tokens"])
    off_b = run(no_ip_cfg, inp["ip_tokens"] * 2.0)
    np.testing.assert_allclose(off_a, off_b, rtol=0, atol=0)


def test_collect_ip_probs():
    params = unet.init(jax.random.PRNGKey(0), CFG)
    inp = _inputs(batch=1)
    probs = []
    unet.apply(
        params, CFG, inp["sample"], inp["timesteps"][:1], inp["encoder_hidden_states"],
        pooled_text_embeds=inp["pooled_text_embeds"], time_ids=inp["time_ids"],
        ip_tokens=inp["ip_tokens"], policy=FP32, collect_ip_probs=probs,
    )
    # tiny cfg: down_blocks.2.attentions.1 has transformer_layers_per_block[2]=2
    assert len(probs) == 2
    for p in probs:
        assert p.shape[-1] == 4  # num ip tokens
