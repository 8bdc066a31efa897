"""Adapter-layer tests: projections, resampler, HarmonyAttention fusions.

Golden comparisons use numpy oracles written from the published math, plus
torch.nn.TransformerEncoderLayer as the oracle for the QFormer layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from imagharmony_tpu import dtypes
from imagharmony_tpu.adapters import harmony, projections, resampler

FP32 = dtypes.FP32


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


# ---------------------------------------------------------------------------
# projections
# ---------------------------------------------------------------------------


def test_image_proj_shapes_and_norm():
    p = projections.image_proj_init(
        jax.random.PRNGKey(0), clip_embed_dim=24, cross_attention_dim=16, num_tokens=4
    )
    emb = jax.random.normal(jax.random.PRNGKey(1), (3, 24))
    out = projections.image_proj(p, emb, num_tokens=4, policy=FP32)
    assert out.shape == (3, 4, 16)
    # LayerNorm: per-token mean ~0 (weight=1, bias=0 at init)
    np.testing.assert_allclose(np.asarray(out).mean(-1), 0.0, atol=1e-5)


def test_image_proj_numpy_oracle():
    p = projections.image_proj_init(
        jax.random.PRNGKey(2), clip_embed_dim=8, cross_attention_dim=6, num_tokens=2
    )
    emb = np.random.default_rng(0).normal(size=(2, 8)).astype(np.float32)
    ours = np.asarray(projections.image_proj(p, jnp.array(emb), num_tokens=2, policy=FP32))
    w = np.asarray(p["proj"]["weight"])
    b = np.asarray(p["proj"]["bias"])
    x = (emb @ w + b).reshape(2, 2, 6)
    mu, var = x.mean(-1, keepdims=True), x.var(-1, keepdims=True)
    expected = (x - mu) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_mlp_proj_shape():
    p = projections.mlp_proj_init(jax.random.PRNGKey(0), clip_hidden_dim=12, cross_attention_dim=20)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 12))
    out = projections.mlp_proj(p, x, policy=FP32)
    assert out.shape == (2, 5, 20)


# ---------------------------------------------------------------------------
# resampler
# ---------------------------------------------------------------------------


def test_resampler_output_shape():
    """The reference's only test checks exactly this contract
    (reference ip_adapter/test_resampler.py:32-40)."""
    cfg = resampler.tiny_config(num_latents_mean_pooled=2, apply_pos_emb=True)
    p = resampler.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, cfg.embedding_dim))
    out = resampler.apply(p, cfg, x, policy=FP32)
    assert out.shape == (3, cfg.num_queries + 2, cfg.output_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_resampler_perceiver_attention_oracle():
    """One attention block vs a numpy oracle of the perceiver math:
    K/V over concat(x, latents), (q*s)(k*s)^T with s=d^-1/4."""
    cfg = resampler.tiny_config(depth=1)
    p = resampler.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, cfg.embedding_dim)).astype(np.float32)

    ours = np.asarray(resampler.apply(p, cfg, jnp.array(x), policy=FP32))

    def ln(v, w, b):
        mu, var = v.mean(-1, keepdims=True), v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * w + b

    lat = np.broadcast_to(np.asarray(p["latents"]), (2, cfg.num_queries, cfg.dim))
    xs = x @ np.asarray(p["proj_in"]["weight"]) + np.asarray(p["proj_in"]["bias"])

    layer = p["layers"][0]
    ap = layer["0"]
    xn = ln(xs, np.asarray(ap["norm1"]["weight"]), np.asarray(ap["norm1"]["bias"]))
    lnorm = ln(lat, np.asarray(ap["norm2"]["weight"]), np.asarray(ap["norm2"]["bias"]))
    q = lnorm @ np.asarray(ap["to_q"]["weight"])
    kv = np.concatenate([xn, lnorm], axis=1) @ np.asarray(ap["to_kv"]["weight"])
    k, v = np.split(kv, 2, axis=-1)
    h, dh = cfg.heads, cfg.dim_head

    def hf(t):
        return t.reshape(2, t.shape[1], h, dh).transpose(0, 2, 1, 3)

    s = dh**-0.25
    w = (hf(q) * s) @ (hf(k) * s).transpose(0, 1, 3, 2)
    o = _softmax(w) @ hf(v)
    o = o.transpose(0, 2, 1, 3).reshape(2, cfg.num_queries, h * dh)
    lat2 = o @ np.asarray(ap["to_out"]["weight"]) + lat

    fp = layer["1"]
    hdd = ln(lat2, np.asarray(fp["0"]["weight"]), np.asarray(fp["0"]["bias"]))
    hdd = hdd @ np.asarray(fp["1"]["weight"])
    from scipy.special import erf

    hdd = hdd * 0.5 * (1 + erf(hdd / np.sqrt(2)))
    lat3 = hdd @ np.asarray(fp["3"]["weight"]) + lat2

    out = lat3 @ np.asarray(p["proj_out"]["weight"]) + np.asarray(p["proj_out"]["bias"])
    expected = ln(out, np.asarray(p["norm_out"]["weight"]), np.asarray(p["norm_out"]["bias"]))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# HarmonyAttention
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", harmony.FUSION_METHODS)
def test_harmony_all_fusion_methods(method):
    cfg = harmony.tiny_config(fusion_method=method)
    p = harmony.init(jax.random.PRNGKey(0), cfg)
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 7, cfg.text_context_dim))
    img = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.image_hidden_size))
    out = harmony.apply(p, cfg, text, img, policy=FP32)
    assert out.shape == (2, cfg.image_hidden_size)
    assert np.isfinite(np.asarray(out)).all()
    # scale multiplies the delta (reference train.py:264)
    cfg2 = harmony.tiny_config(fusion_method=method, scale=0.5)
    out2 = harmony.apply(p, cfg2, text, img, policy=FP32)
    np.testing.assert_allclose(np.asarray(out2), 0.5 * np.asarray(out), rtol=1e-5, atol=1e-6)


def test_harmony_cross_attention_oracle():
    """Full HA forward (cross_attention fusion) vs numpy oracle, including
    the sqrt(head_dim) divisor and separately-sized value dim."""
    cfg = harmony.tiny_config()
    p = harmony.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(2)
    text = rng.normal(size=(2, 5, cfg.text_context_dim)).astype(np.float32)
    img = rng.normal(size=(2, cfg.image_hidden_size)).astype(np.float32)

    ours = np.asarray(harmony.apply(p, cfg, jnp.array(text), jnp.array(img), policy=FP32))

    x = img @ np.asarray(p["fc1"]["weight"]) + np.asarray(p["fc1"]["bias"])
    x = x.reshape(2, cfg.reshape_blocks, cfg.query_dim)
    f = p["fusion_text_image"]
    h = cfg.cross_heads
    hd = cfg.query_dim // h
    vd = cfg.cross_value_dim
    q = (x @ np.asarray(f["to_q"]["weight"]) + np.asarray(f["to_q"]["bias"])).reshape(
        2, -1, h, hd
    ).transpose(0, 2, 1, 3)
    k = (text @ np.asarray(f["to_k"]["weight"]) + np.asarray(f["to_k"]["bias"])).reshape(
        2, -1, h, hd
    ).transpose(0, 2, 1, 3)
    v = (text @ np.asarray(f["to_v"]["weight"]) + np.asarray(f["to_v"]["bias"])).reshape(
        2, -1, h, vd
    ).transpose(0, 2, 1, 3)
    probs = _softmax(q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd))
    o = (probs @ v).transpose(0, 2, 1, 3).reshape(2, cfg.reshape_blocks, h * vd)
    o = o @ np.asarray(f["out_proj"]["weight"]) + np.asarray(f["out_proj"]["bias"])
    flat = o.reshape(2, -1)
    mu, var = flat.mean(-1, keepdims=True), flat.var(-1, keepdims=True)
    nrm = (flat - mu) / np.sqrt(var + 1e-5) * np.asarray(p["ln"]["weight"]) + np.asarray(
        p["ln"]["bias"]
    )
    expected = (nrm @ np.asarray(p["fc2"]["weight"]) + np.asarray(p["fc2"]["bias"])) * cfg.scale
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_qformer_layer_matches_torch_encoder_layer():
    cfg = harmony.tiny_config(fusion_method="qformer")
    d, heads, ff = cfg.query_dim, cfg.cross_heads, cfg.qformer_ff_dim
    p = harmony.init(jax.random.PRNGKey(4), cfg)
    lp = p["fusion_text_image"]["transformer"]["layers"][0]

    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=heads, dim_feedforward=ff, batch_first=True, dropout=0.0
    ).eval()
    with torch.no_grad():
        t_layer.self_attn.in_proj_weight.copy_(
            torch.tensor(np.asarray(lp["self_attn"]["in_proj"]["weight"]).T)
        )
        t_layer.self_attn.in_proj_bias.copy_(
            torch.tensor(np.asarray(lp["self_attn"]["in_proj"]["bias"]))
        )
        t_layer.self_attn.out_proj.weight.copy_(
            torch.tensor(np.asarray(lp["self_attn"]["out_proj"]["weight"]).T)
        )
        t_layer.self_attn.out_proj.bias.copy_(
            torch.tensor(np.asarray(lp["self_attn"]["out_proj"]["bias"]))
        )
        t_layer.linear1.weight.copy_(torch.tensor(np.asarray(lp["linear1"]["weight"]).T))
        t_layer.linear1.bias.copy_(torch.tensor(np.asarray(lp["linear1"]["bias"])))
        t_layer.linear2.weight.copy_(torch.tensor(np.asarray(lp["linear2"]["weight"]).T))
        t_layer.linear2.bias.copy_(torch.tensor(np.asarray(lp["linear2"]["bias"])))
        t_layer.norm1.weight.copy_(torch.tensor(np.asarray(lp["norm1"]["weight"])))
        t_layer.norm1.bias.copy_(torch.tensor(np.asarray(lp["norm1"]["bias"])))
        t_layer.norm2.weight.copy_(torch.tensor(np.asarray(lp["norm2"]["weight"])))
        t_layer.norm2.bias.copy_(torch.tensor(np.asarray(lp["norm2"]["bias"])))

    x = np.random.default_rng(5).normal(size=(2, 9, d)).astype(np.float32)
    ours = np.asarray(harmony._qformer_layer(lp, jnp.array(x), heads, policy=FP32))
    with torch.no_grad():
        theirs = t_layer(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_fuse_image_embeds_is_additive():
    cfg = harmony.tiny_config()
    p = harmony.init(jax.random.PRNGKey(0), cfg)
    text = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.text_context_dim))
    img = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.image_hidden_size))
    delta = harmony.apply(p, cfg, text, img, policy=FP32)
    fused = harmony.fuse_image_embeds(p, cfg, text, img, policy=FP32)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(img + delta), rtol=1e-6)


def test_harmony_config_roundtrip():
    cfg = harmony.legacy_composed_config(fusion_method="mlp")
    d = cfg.to_dict()
    assert harmony.HarmonyConfig.from_dict(d) == cfg


def test_plus_config_presets():
    """IPAdapterPlus/PlusXL resampler presets match the reference dims
    (reference ip_adapter/ip_adapter.py:350-359, 392-402)."""
    c = resampler.plus_config()
    assert (c.dim, c.depth, c.heads, c.num_queries) == (768, 4, 12, 16)
    cx = resampler.plus_xl_config()
    assert (cx.dim, cx.heads, cx.output_dim, cx.embedding_dim) == (1280, 20, 2048, 1664)
