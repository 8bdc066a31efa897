"""Spatial transformer used inside the SDXL UNet.

Equivalent surface to diffusers' Transformer2DModel + BasicTransformerBlock
(the modules the reference monkey-patches via unet.set_attn_processor,
reference train.py:533-567) — rebuilt as pure functions with a *static*
per-layer IP flag instead of runtime processor swapping.

Param key names mirror the diffusers checkpoint tree (norm1/attn1/.../ff)
so io/checkpoints.py stays a mechanical re-keying.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import attention as attn_lib
from imagharmony_tpu.nn import layers


from imagharmony_tpu.nn import prng


def basic_transformer_block_init(
    key, dim, *, heads, head_dim, context_dim, with_ip, dtype=jnp.float32
):
    k = prng.split(key, 6)
    ff_inner = dim * 4
    return {
        "norm1": layers.layer_norm_init(dim, dtype=dtype),
        "attn1": attn_lib.attention_init(
            k[0], dim, heads=heads, head_dim=head_dim, dtype=dtype
        ),
        "norm2": layers.layer_norm_init(dim, dtype=dtype),
        "attn2": attn_lib.attention_init(
            k[1],
            dim,
            heads=heads,
            head_dim=head_dim,
            context_dim=context_dim,
            with_ip=with_ip,
            dtype=dtype,
        ),
        "norm3": layers.layer_norm_init(dim, dtype=dtype),
        "ff": {
            # GEGLU: net.0.proj (dim -> 8*dim), net.2 (4*dim -> dim)
            "net_0_proj": layers.linear_init(k[2], dim, ff_inner * 2, dtype=dtype),
            "net_2": layers.linear_init(k[3], ff_inner, dim, dtype=dtype),
        },
    }


def basic_transformer_block(
    params,
    x,
    *,
    heads,
    context,
    ip_context=None,
    ip_scale=1.0,
    backend=None,
    policy: dtypes.Policy = dtypes.DEFAULT,
    collect_ip_probs=None,
):
    h = layers.layer_norm(params["norm1"], x, policy=policy)
    x = x + attn_lib.attention(
        params["attn1"], h, heads=heads, backend=backend, policy=policy
    )

    h = layers.layer_norm(params["norm2"], x, policy=policy)
    want_probs = collect_ip_probs is not None and ip_context is not None
    out = attn_lib.attention(
        params["attn2"],
        h,
        heads=heads,
        context=context,
        ip_context=ip_context,
        ip_scale=ip_scale,
        backend=backend,
        policy=policy,
        return_ip_probs=want_probs,
    )
    if want_probs:
        out, probs = out
        collect_ip_probs.append(probs)
    x = x + out

    h = layers.layer_norm(params["norm3"], x, policy=policy)
    h = layers.geglu(params["ff"]["net_0_proj"], h, policy=policy)
    x = x + layers.linear(params["ff"]["net_2"], h, policy=policy)
    return x


def transformer_2d_init(
    key,
    in_channels,
    *,
    num_layers,
    heads,
    head_dim,
    context_dim,
    with_ip,
    dtype=jnp.float32,
):
    inner = heads * head_dim
    k = prng.split(key, num_layers + 3)
    return {
        "norm": layers.group_norm_init(in_channels, dtype=dtype),
        "proj_in": layers.linear_init(k[0], in_channels, inner, dtype=dtype),
        "transformer_blocks": [
            basic_transformer_block_init(
                k[2 + i],
                inner,
                heads=heads,
                head_dim=head_dim,
                context_dim=context_dim,
                with_ip=with_ip,
                dtype=dtype,
            )
            for i in range(num_layers)
        ],
        "proj_out": layers.linear_init(k[1], inner, in_channels, dtype=dtype),
    }


def transformer_2d(
    params,
    x_nhwc,
    *,
    heads,
    context,
    ip_context=None,
    ip_scale=1.0,
    backend=None,
    policy: dtypes.Policy = dtypes.DEFAULT,
    collect_ip_probs=None,
):
    """SDXL uses use_linear_projection=True: GN -> linear in -> blocks ->
    linear out -> residual. NHWC keeps the (B, H*W, C) flatten free of
    transposes (the NCHW reference pays one per call,
    reference attention_processor.py:380-381)."""
    b, hgt, wid, c = x_nhwc.shape
    residual = x_nhwc
    h = layers.group_norm(params["norm"], x_nhwc, eps=1e-6, policy=policy)
    h = h.reshape(b, hgt * wid, c)
    h = layers.linear(params["proj_in"], h, policy=policy)
    for block in params["transformer_blocks"]:
        h = basic_transformer_block(
            block,
            h,
            heads=heads,
            context=context,
            ip_context=ip_context,
            ip_scale=ip_scale,
            backend=backend,
            policy=policy,
            collect_ip_probs=collect_ip_probs,
        )
    h = layers.linear(params["proj_out"], h, policy=policy)
    return h.reshape(b, hgt, wid, c) + residual
