"""Functional NN primitives over explicit param pytrees.

Every layer is a pair of functions:

    <layer>_init(key, ...) -> params   (nested dict of jnp arrays)
    <layer>(params, x, ...) -> y       (pure; jit/vmap/shard_map friendly)

Param dict key names are chosen to match the HuggingFace checkpoint trees
they ingest (``weight`` / ``bias``), which makes io/checkpoints.py a pure
tree re-keying with no per-layer special cases.

Layout conventions (TPU-first):
  * images are NHWC; conv kernels are HWIO (XLA:TPU's preferred layout —
    the reference's NCHW torch layout would force relayouts around every
    matmul/attention reshape, cf. reference attention_processor.py:380-381).
  * linear weights are stored as (in, out) so application is ``x @ w`` with
    no transpose. Torch checkpoints store (out, in) and are transposed once
    at load time.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.nn import prng


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(key, in_dim, out_dim, *, bias=True, dtype=jnp.float32, scale=None):
    """Kaiming-uniform init matching torch.nn.Linear defaults, so randomly
    initialised modules are statistically comparable with the reference.
    Host-side numpy RNG (see nn/prng.py) — zero XLA compiles."""
    wkey, bkey = prng.ensure(key).split(2)
    bound = scale if scale is not None else 1.0 / math.sqrt(in_dim)
    params = {
        "weight": wkey.uniform((in_dim, out_dim), dtype, minval=-bound, maxval=bound)
    }
    if bias:
        params["bias"] = bkey.uniform((out_dim,), dtype, minval=-bound, maxval=bound)
    return params


def linear(params, x, *, policy: dtypes.Policy = dtypes.DEFAULT):
    w = policy.cast(params["weight"])
    y = jnp.dot(policy.cast(x), w)
    if "bias" in params:
        y = y + policy.cast(params["bias"])
    return y


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------


def layer_norm_init(dim, *, dtype=jnp.float32):
    return {"weight": np.ones((dim,), dtype), "bias": np.zeros((dim,), dtype)}


def layer_norm(params, x, *, eps=1e-5, policy: dtypes.Policy = dtypes.DEFAULT):
    """LayerNorm with fp32 statistics but NO fp32 materialization of x.

    Stats are accumulated in fp32 *inside the reductions* (XLA's
    convert_reduce fusion reads bf16 and accumulates f32); the centering
    and scaling run in the input dtype. Materializing x.astype(f32) was
    measured at several ms/UNet-call of pure HBM traffic (f32 copies in
    the trace) with no accuracy benefit for the bf16 policy.
    """
    dt = x.dtype
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=policy.norm_dtype)
    diff = x - mean.astype(dt)
    var = jnp.mean(jnp.square(diff), axis=-1, keepdims=True, dtype=policy.norm_dtype)
    y = diff * jax.lax.rsqrt(var + eps).astype(dt)
    y = y * params["weight"].astype(dt) + params["bias"].astype(dt)
    return y.astype(policy.compute_dtype)


# ---------------------------------------------------------------------------
# GroupNorm (channels-last)
# ---------------------------------------------------------------------------


def group_norm_init(channels, *, dtype=jnp.float32):
    return {"weight": np.ones((channels,), dtype), "bias": np.zeros((channels,), dtype)}


def group_norm(params, x, *, num_groups=32, eps=1e-5, policy: dtypes.Policy = dtypes.DEFAULT):
    """GroupNorm over an NHWC (or N...C) tensor.

    Same fp32-stats / no-fp32-materialization scheme as layer_norm: the
    reductions accumulate in fp32 over the input dtype; centering/scaling
    stay in the input dtype (the old x.astype(f32) produced multi-MB f32
    copies of every 128x128 feature map in the UNet trace).
    """
    c = x.shape[-1]
    g = num_groups
    dt = x.dtype
    orig_shape = x.shape
    grouped = x.reshape(orig_shape[0], -1, g, c // g)
    mean = jnp.mean(grouped, axis=(1, 3), keepdims=True, dtype=policy.norm_dtype)
    diff = grouped - mean.astype(dt)
    var = jnp.mean(jnp.square(diff), axis=(1, 3), keepdims=True, dtype=policy.norm_dtype)
    y = diff * jax.lax.rsqrt(var + eps).astype(dt)
    y = y.reshape(orig_shape)
    y = y * params["weight"].astype(dt) + params["bias"].astype(dt)
    return y.astype(policy.compute_dtype)


# ---------------------------------------------------------------------------
# Conv2D (NHWC / HWIO)
# ---------------------------------------------------------------------------


def conv2d_init(key, in_ch, out_ch, kernel_size, *, bias=True, dtype=jnp.float32):
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    wkey, bkey = prng.ensure(key).split(2)
    fan_in = in_ch * kernel_size[0] * kernel_size[1]
    bound = 1.0 / math.sqrt(fan_in)
    params = {
        "weight": wkey.uniform(
            (*kernel_size, in_ch, out_ch), dtype, minval=-bound, maxval=bound
        )
    }
    if bias:
        params["bias"] = bkey.uniform((out_ch,), dtype, minval=-bound, maxval=bound)
    return params


# 3x3 SAME stride-1 conv shapes where decomposing into 9 shifted 1x1
# matmuls beats XLA's native conv on v5e (probed on-chip, scan-chained:
# tools/probe_conv_tuning.py — (64², 640→640) −11%, (128², 320→320) −4%;
# the decomposition LOSES on channel-changing/concat shapes, so dispatch is
# an explicit allowlist keyed by (spatial, c_in, c_out), bf16 only).
_SHIFTED9_SHAPES = {
    (32, 1280, 1280),
    (64, 640, 640),
    (64, 1280, 1280),   # up-block upsampler conv
    (128, 320, 320),
    (128, 512, 512),    # VAE decoder mid/up0 resnets (probe −15%; larger
                        # VAE spatials LOSE — see PERF.md levers table)
}


def _conv2d_shifted9(x, w):
    """3x3 SAME conv as 9 shifted pointwise matmuls (exact same math;
    accumulation order differs within bf16 rounding)."""
    b, h, wd, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for i in range(3):
        for j in range(3):
            part = jnp.einsum(
                "bhwc,co->bhwo", xp[:, i:i + h, j:j + wd, :], w[i, j],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


def conv2d(params, x, *, stride=1, padding=1, policy: dtypes.Policy = dtypes.DEFAULT):
    """2D convolution, NHWC input, HWIO kernel."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    w = policy.cast(params["weight"])
    xc = policy.cast(x)
    kh, kw, cin, cout = w.shape
    if (
        (kh, kw) == (3, 3)
        and stride == (1, 1)
        and padding == ((1, 1), (1, 1))
        and xc.dtype == jnp.bfloat16
        and xc.shape[1] == xc.shape[2]
        and (xc.shape[1], cin, cout) in _SHIFTED9_SHAPES
    ):
        y = _conv2d_shifted9(xc, w)
    else:
        y = jax.lax.conv_general_dilated(
            xc,
            w,
            window_strides=stride,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if "bias" in params:
        y = y + policy.cast(params["bias"])
    return y


def _upsample2x_conv_subpixel(x, w):
    """nearest-2x upsample + 3x3 SAME conv, fused as four 2x2-tap subpixel
    convs on the ORIGINAL grid (exact same math; bf16 accumulation order
    differs). For output row p = 2i+a, the three upsampled rows collapse
    onto original rows {i-1: w0, i: w1+w2} (a=0) / {i: w0+w1, i+1: w2}
    (a=1), same for columns — 16 HxW pointwise einsums vs 9 at (2H)x(2W),
    i.e. 4/9 of the MXU work plus no materialized upsampled tensor.
    Probed on v5e (tools/probe_upsample_conv.py): 3.11 -> 1.60 ms at
    32²·1280, 2.79 -> 1.86 ms at 64²·640."""
    b, h, wd, _ = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    row_taps = {
        0: [(-1, w[0]), (0, w[1] + w[2])],
        1: [(0, w[0] + w[1]), (1, w[2])],
    }
    subs = []
    for a in (0, 1):
        for c in (0, 1):
            acc = None
            for dr, wr in row_taps[a]:
                col_taps = {
                    0: [(-1, wr[0]), (0, wr[1] + wr[2])],
                    1: [(0, wr[0] + wr[1]), (1, wr[2])],
                }[c]
                for dc, wc in col_taps:
                    part = jnp.einsum(
                        "bhwc,co->bhwo",
                        xp[:, 1 + dr:1 + dr + h, 1 + dc:1 + dc + wd, :],
                        wc, preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
            subs.append(acc)
    out = jnp.stack(subs).reshape(2, 2, b, h, wd, cout)
    out = out.transpose(2, 3, 0, 4, 1, 5).reshape(b, 2 * h, 2 * wd, cout)
    return out.astype(x.dtype)


def upsample2x_conv(params, x, *, policy: dtypes.Policy = dtypes.DEFAULT):
    """nearest-2x upsample followed by a 3x3 SAME conv (the diffusers
    Upsample2D role, reference UNet up path). On bf16 with a 3x3
    channel-preserving kernel this dispatches to the fused subpixel form
    (probe-won on both SDXL upsampler shapes); otherwise it falls back to
    the literal resize + conv2d."""
    w = policy.cast(params["weight"])
    xc = policy.cast(x)
    kh, kw, cin, cout = w.shape
    if (kh, kw) == (3, 3) and cin == cout and xc.dtype == jnp.bfloat16:
        y = _upsample2x_conv_subpixel(xc, w)
        if "bias" in params:
            y = y + policy.cast(params["bias"])
        return y
    b, h, wd, c = xc.shape
    xu = jax.image.resize(xc, (b, h * 2, wd * 2, c), method="nearest")
    return conv2d(params, xu, policy=policy)


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


def embedding_init(key, num_embeddings, dim, *, dtype=jnp.float32):
    return {"weight": prng.ensure(key).normal((num_embeddings, dim), dtype)}


def embedding(params, ids, *, policy: dtypes.Policy = dtypes.DEFAULT):
    return policy.cast(jnp.take(params["weight"], ids, axis=0))


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    # torch.nn.GELU default = exact erf formulation; matched for parity.
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    # CLIP-L text tower activation (x * sigmoid(1.702 x)).
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(params, x, *, policy: dtypes.Policy = dtypes.DEFAULT, approximate=None):
    """GEGLU used by SDXL transformer FFNs: proj to 2*d then h * gelu(gate).

    Implemented as TWO dots (h columns, gate columns) instead of one dot +
    split: mathematically identical — each output column depends only on its
    own weight column — and measured 1.3-1.9x faster on TPU v5e because XLA
    does not fuse elementwise work into a dot's output; the packed form
    materializes the (M, 2*ffi) intermediate to HBM, re-reads it for the
    split, and pays an expensive erfc on the way back
    (tools/probe_geglu_v2.py: 1.09 ms -> 0.59 ms at the SDXL dim-640 shape).

    approximate=None -> tanh-approx gelu iff the compute dtype is bf16: the
    approximation's 2.6e-3 relative deviation is below bf16 resolution
    (~4e-3) but above fp32, so fp32 paths (parity vs torch, goldens) keep
    the exact erf form.
    """
    w = params["weight"]
    ffi = w.shape[-1] // 2
    xp = policy.cast(x)
    h = jnp.dot(xp, policy.cast(w[:, :ffi]))
    g = jnp.dot(xp, policy.cast(w[:, ffi:]))
    if "bias" in params:
        b = policy.cast(params["bias"])
        h = h + b[:ffi]
        g = g + b[ffi:]
    if approximate is None:
        approximate = policy.compute_dtype == jnp.bfloat16
    return h * jax.nn.gelu(g, approximate=approximate)


ACTIVATIONS = {
    "silu": silu,
    "gelu": gelu,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
}


# ---------------------------------------------------------------------------
# Timestep (sinusoidal) embedding — diffusers get_timestep_embedding semantics
# ---------------------------------------------------------------------------


def timestep_embedding(
    timesteps,
    dim,
    *,
    max_period=10000.0,
    flip_sin_to_cos=True,
    downscale_freq_shift=0.0,
    scale=1.0,
    dtype=jnp.float32,
):
    """Sinusoidal embedding of scalar timesteps -> (..., dim).

    Defaults match SDXL's UNet time/addition embeddings
    (flip_sin_to_cos=True, freq_shift=0).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    args = scale * args
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb.astype(dtype)
