"""Unit tests for nn primitives against torch-CPU oracles.

torch here is a test oracle only — the framework itself is torch-free.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import attention as attn_lib
from imagharmony_tpu.nn import layers

FP32 = dtypes.FP32
RTOL = 2e-5
ATOL = 2e-5


def _np(x):
    return np.asarray(x)


def test_linear_matches_torch():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(16, 24)).astype(np.float32)
    b = rng.normal(size=(24,)).astype(np.float32)
    x = rng.normal(size=(3, 16)).astype(np.float32)
    ours = layers.linear({"weight": jnp.array(w), "bias": jnp.array(b)}, jnp.array(x), policy=FP32)
    theirs = tF.linear(torch.tensor(x), torch.tensor(w.T), torch.tensor(b)).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=ATOL)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    g = rng.normal(size=(32,)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    ours = layers.layer_norm({"weight": jnp.array(g), "bias": jnp.array(b)}, jnp.array(x), policy=FP32)
    theirs = tF.layer_norm(torch.tensor(x), (32,), torch.tensor(g), torch.tensor(b)).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=ATOL)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 6, 6, 32)).astype(np.float32)
    g = rng.normal(size=(32,)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    ours = layers.group_norm(
        {"weight": jnp.array(g), "bias": jnp.array(b)}, jnp.array(x), num_groups=8, policy=FP32
    )
    # torch GroupNorm is NCHW
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    theirs = tF.group_norm(xt, 8, torch.tensor(g), torch.tensor(b)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 1), (1, 0)])
def test_conv2d_matches_torch(stride, padding):
    rng = np.random.default_rng(3)
    w = rng.normal(size=(3, 3, 8, 12), scale=0.1).astype(np.float32)  # HWIO
    b = rng.normal(size=(12,)).astype(np.float32)
    x = rng.normal(size=(2, 9, 9, 8)).astype(np.float32)
    ours = conv = layers.conv2d(
        {"weight": jnp.array(w), "bias": jnp.array(b)},
        jnp.array(x),
        stride=stride,
        padding=padding,
        policy=FP32,
    )
    wt = torch.tensor(w).permute(3, 2, 0, 1)  # OIHW
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    theirs = tF.conv2d(xt, wt, torch.tensor(b), stride=stride, padding=padding)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=1e-4, atol=1e-4)


def test_sdpa_matches_torch():
    rng = np.random.default_rng(4)
    q = rng.normal(size=(2, 4, 10, 16)).astype(np.float32)
    k = rng.normal(size=(2, 4, 7, 16)).astype(np.float32)
    v = rng.normal(size=(2, 4, 7, 16)).astype(np.float32)
    ours = attn_lib.sdpa(jnp.array(q), jnp.array(k), jnp.array(v), backend="xla")
    theirs = tF.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v)
    ).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=1e-4, atol=1e-4)


def test_timestep_embedding_matches_diffusers_semantics():
    # Golden formula check: half dims cos then sin (flip_sin_to_cos=True).
    ts = jnp.array([0.0, 1.0, 999.0])
    emb = layers.timestep_embedding(ts, 8)
    assert emb.shape == (3, 8)
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(ts)[:, None] * freqs[None, :]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(_np(emb), expected, rtol=1e-3, atol=1e-4)


def test_decoupled_ip_attention_math():
    """out == text_attn + scale * ip_attn (reference attention_processor.py:450)."""
    key = jax.random.PRNGKey(0)
    params = attn_lib.attention_init(key, 32, heads=4, context_dim=48, with_ip=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 48))
    ipc = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 48))

    full = attn_lib.attention(
        params, x, heads=4, context=ctx, ip_context=ipc, ip_scale=0.7, policy=FP32
    )
    text_only = attn_lib.attention(params, x, heads=4, context=ctx, policy=FP32)

    # Manually compute the ip branch contribution.
    q = layers.linear(params["to_q"], x, policy=FP32).reshape(2, 6, 4, 8).transpose(0, 2, 1, 3)
    k_ip = layers.linear(params["to_k_ip"], ipc, policy=FP32).reshape(2, 4, 4, 8).transpose(0, 2, 1, 3)
    v_ip = layers.linear(params["to_v_ip"], ipc, policy=FP32).reshape(2, 4, 4, 8).transpose(0, 2, 1, 3)
    ip_out = attn_lib.sdpa(q, k_ip, v_ip, backend="xla")
    ip_out = ip_out.transpose(0, 2, 1, 3).reshape(2, 6, 32)
    # to_out is affine, so full - text_only = scale * (ip_out @ W_out).
    pre_text = full - text_only
    lin_ip = 0.7 * (ip_out @ params["to_out"]["weight"])
    np.testing.assert_allclose(_np(pre_text), _np(lin_ip), rtol=1e-4, atol=1e-4)


def test_ip_probs_shape():
    key = jax.random.PRNGKey(0)
    params = attn_lib.attention_init(key, 32, heads=4, context_dim=48, with_ip=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 48))
    ipc = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 48))
    _, probs = attn_lib.attention(
        params, x, heads=4, context=ctx, ip_context=ipc, return_ip_probs=True, policy=FP32
    )
    assert probs.shape == (2, 4, 6, 4)
    np.testing.assert_allclose(_np(probs.sum(-1)), 1.0, rtol=1e-5, atol=1e-5)


def test_pack_inference_params_equivalence():
    """Packed qkv/kv projections must reproduce the unpacked outputs."""
    key = jax.random.PRNGKey(0)
    # self-attention block
    p_self = attn_lib.attention_init(key, 32, heads=4)
    # cross-attention block with ip
    p_cross = attn_lib.attention_init(key, 32, heads=4, context_dim=48, with_ip=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 48))
    ipc = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 48))

    tree = {"a": {"attn1": p_self, "attn2": p_cross}}
    packed = attn_lib.pack_inference_params(tree)
    assert "to_qkv" in packed["a"]["attn1"]
    assert "to_kv" in packed["a"]["attn2"]
    assert "to_k" not in packed["a"]["attn2"]
    # ip projections untouched
    assert "to_k_ip" in packed["a"]["attn2"]

    a1 = attn_lib.attention(tree["a"]["attn1"], x, heads=4, policy=dtypes.FP32)
    b1 = attn_lib.attention(packed["a"]["attn1"], x, heads=4, policy=dtypes.FP32)
    np.testing.assert_allclose(_np(a1), _np(b1), rtol=1e-5, atol=1e-6)

    a2 = attn_lib.attention(tree["a"]["attn2"], x, heads=4, context=ctx,
                            ip_context=ipc, ip_scale=0.5, policy=dtypes.FP32)
    b2 = attn_lib.attention(packed["a"]["attn2"], x, heads=4, context=ctx,
                            ip_context=ipc, ip_scale=0.5, policy=dtypes.FP32)
    np.testing.assert_allclose(_np(a2), _np(b2), rtol=1e-5, atol=1e-6)


def test_conv2d_shifted9_matches_native():
    """The probed shifted-9 dispatch (layers._SHIFTED9_SHAPES) is the same
    math as the native conv — bf16 accumulation-order noise only — and
    triggers exactly on the allowlisted (spatial, cin, cout) shapes."""
    bf16 = dtypes.Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    spatial, cin, cout = sorted(layers._SHIFTED9_SHAPES)[0]
    p = layers.conv2d_init(jax.random.PRNGKey(0), cin, cout, 3, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, spatial, spatial, cin), jnp.bfloat16)
    fast = layers.conv2d(p, x, policy=bf16)
    native = jax.lax.conv_general_dilated(
        x, p["weight"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]
    a = np.asarray(fast, np.float32)
    b = np.asarray(native, np.float32)
    scale = np.abs(b).max()
    assert np.abs(a - b).max() < 0.03 * scale  # bf16 summation-order noise
    # non-listed shape takes the native path bit-exactly
    p2 = layers.conv2d_init(jax.random.PRNGKey(2), 8, 8, 3, dtype=jnp.bfloat16)
    x2 = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 8), jnp.bfloat16)
    y2 = layers.conv2d(p2, x2, policy=bf16)
    n2 = jax.lax.conv_general_dilated(
        x2, p2["weight"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p2["bias"]
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(n2))


def test_upsample2x_conv_matches_literal():
    """The fused subpixel upsample-conv (layers.upsample2x_conv) equals the
    literal nearest-2x resize + 3x3 SAME conv — bf16 accumulation-order
    noise only on the fused path; fp32 takes the fallback bit-exactly."""

    def literal(p, x, policy):
        b, h, w, c = x.shape
        xu = jax.image.resize(
            policy.cast(x), (b, h * 2, w * 2, c), method="nearest"
        )
        return layers.conv2d(p, xu, policy=policy)

    bf16 = dtypes.Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    p = layers.conv2d_init(jax.random.PRNGKey(0), 32, 32, 3, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32), jnp.bfloat16)
    fused = np.asarray(layers.upsample2x_conv(p, x, policy=bf16), np.float32)
    ref = np.asarray(literal(p, x, bf16), np.float32)
    assert fused.shape == (2, 16, 16, 32)
    assert np.abs(fused - ref).max() < 0.03 * np.abs(ref).max()
    # fp32 (non-bf16) input takes the literal path bit-exactly
    p32 = layers.conv2d_init(jax.random.PRNGKey(2), 8, 8, 3)
    x32 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 8), jnp.float32)
    y32 = layers.upsample2x_conv(p32, x32, policy=dtypes.FP32)
    np.testing.assert_array_equal(
        np.asarray(y32), np.asarray(literal(p32, x32, dtypes.FP32))
    )
    # channel-changing conv also falls back (exact vs literal)
    pcc = layers.conv2d_init(jax.random.PRNGKey(4), 8, 16, 3, dtype=jnp.bfloat16)
    ycc = layers.upsample2x_conv(pcc, x32.astype(jnp.bfloat16), policy=bf16)
    np.testing.assert_array_equal(
        np.asarray(ycc),
        np.asarray(literal(pcc, x32.astype(jnp.bfloat16), bf16)),
    )
