"""Probe: ablation decomposition of the UNet CFG-pair call (round 3).

Times the full-size SDXL UNet forward (CFG pair, 128x128 latents) on the
real chip, then re-times it with pieces stubbed to near-zero cost, giving
an in-graph cost per stage (isolated kernel benches over the tunnel do
not add up — XLA overlaps them differently in the full graph):

  full            the real call
  no-selfattn     self-attention core returns q (projections kept)
  no-crossattn    text/IP cross-attention core returns zeros
  no-ffn          transformer FFN replaced by identity
  no-conv3x3      3x3 stride-1 convs replaced by their [1,1]-tap 1x1 einsum

Run on the real chip: python tools/probe_unet_ablation.py
"""

import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import unet as unet_lib
from imagharmony_tpu.nn import layers, prng


def timed_call(params, cfg, args, iters=10):
    policy = dtypes.BF16_FULL

    def step(p, lat, t, ctx, pooled, tids, ip):
        def body(c, _):
            out = unet_lib.apply(
                p, cfg, c, t, ctx, pooled_text_embeds=pooled,
                time_ids=tids, ip_tokens=ip, policy=policy,
                backend="pallas",
            )
            return out.astype(c.dtype) * 1e-3 + c * 0.5, ()
        out, _ = jax.lax.scan(body, lat, None, length=iters)
        return out[0, :2, :2, :2]

    jl = jax.jit(step)
    np.asarray(jl(params, *args))
    t0 = time.perf_counter()
    np.asarray(jl(params, *args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = unet_lib.UNetConfig()  # default = SDXL
    params = unet_lib.init(prng.abstract_key(), cfg, dtype=jnp.bfloat16)
    from imagharmony_tpu.nn import attention as _attn
    params = _attn.pack_inference_params(params)  # as the pipeline runs it
    params = jax.device_put(jax.tree.map(jnp.asarray, params))

    b = 2
    lat = jnp.zeros((b, 128, 128, cfg.in_channels), jnp.bfloat16)
    t = jnp.array([500, 500], jnp.int32)
    ctx = jnp.zeros((b, 77, cfg.cross_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((b, 1280), jnp.bfloat16)
    tids = jnp.zeros((b, 6), jnp.float32)
    ip = jnp.zeros((b, cfg.num_ip_tokens, cfg.cross_attention_dim), jnp.bfloat16)
    args = (lat, t, ctx, pooled, tids, ip)

    results = {}
    results["full"] = timed_call(params, cfg, args)
    print(f"full: {results['full']:.2f} ms")

    from imagharmony_tpu.nn import attention as attn_mod
    from imagharmony_tpu.kernels import flash_attention as fa

    # self-attention core -> identity on q (kills both pallas paths)
    with mock.patch.object(fa, "flash_attention_nhd",
                           lambda q, k, v, **kw: q), \
         mock.patch.object(fa, "flash_attention",
                           lambda q, k, v, **kw: q):
        results["no-selfattn"] = timed_call(params, cfg, args)
    print(f"no-selfattn: {results['no-selfattn']:.2f} ms "
          f"(self-attn cores ~ {results['full'] - results['no-selfattn']:.2f} ms)")

    # cross-attention core -> zeros (text + IP short-K branches)
    real_sdpa = attn_mod.sdpa
    def fake_sdpa(q, k, v, **kw):
        if k.shape[-2] <= 256:  # short-K = cross branches
            return jnp.zeros_like(q)
        return real_sdpa(q, k, v, **kw)
    with mock.patch.object(attn_mod, "sdpa", fake_sdpa):
        results["no-crossattn"] = timed_call(params, cfg, args)
    print(f"no-crossattn: {results['no-crossattn']:.2f} ms "
          f"(cross cores ~ {results['full'] - results['no-crossattn']:.2f} ms)")

    # FFN -> identity (geglu returns the half-width input projection shape;
    # stub both FFN layers: geglu -> zeros of the out dim, net_2 -> zeros)
    from imagharmony_tpu.nn import transformer as tf_mod
    real_geglu = layers.geglu
    def fake_geglu(p, x, *, policy=dtypes.DEFAULT):
        cout = p["weight"].shape[1] // 2
        return jnp.zeros(x.shape[:-1] + (cout,), x.dtype)
    with mock.patch.object(tf_mod.layers, "geglu", fake_geglu):
        results["no-ffn"] = timed_call(params, cfg, args)
    print(f"no-geglu: {results['no-ffn']:.2f} ms "
          f"(geglu = 2/3 of FFN dots ~ {results['full'] - results['no-ffn']:.2f} ms)")

    # 3x3 stride-1 convs -> their [1,1]-tap 1x1 einsum (channel math kept)
    real_conv = layers.conv2d
    def fake_conv(p, x, *, stride=1, padding=1, policy=dtypes.DEFAULT):
        w = policy.cast(p["weight"])
        st = stride if isinstance(stride, tuple) else (stride, stride)
        if w.shape[0] == 3 and st == (1, 1):
            y = jnp.einsum("bhwc,co->bhwo", policy.cast(x), w[1, 1])
            if "bias" in p:
                y = y + policy.cast(p["bias"])
            return y.astype(policy.compute_dtype)
        return real_conv(p, x, stride=stride, padding=padding, policy=policy)
    with mock.patch.object(unet_lib.layers, "conv2d", fake_conv):
        results["no-conv3x3"] = timed_call(params, cfg, args)
    print(f"no-conv3x3: {results['no-conv3x3']:.2f} ms "
          f"(3x3-over-1x1 extra ~ {results['full'] - results['no-conv3x3']:.2f} ms)")


if __name__ == "__main__":
    main()
