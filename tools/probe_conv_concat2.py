"""Probe follow-up to probe_conv_more.py part b: the REAL composition.

In the UNet the skip-concat feeds GroupNorm+SiLU before conv1
(models/unet.py resnet_block), so the concatenated tensor is materialized
for the norm stats regardless. The remaining question: does slicing the
normalized tensor into its two concat parts and running two convs beat one
wide-cin conv (equal FLOPs, layout effects only)?

Also re-runs part c (conv_in/conv_out channel padding) which timed out.

Run on the real chip: python tools/probe_conv_concat2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_fn(f, args, iters=30, feedback=None):
    def loop(a):
        def body(c, _):
            o = f(c, *a[1:])
            nxt = feedback(o, a[0]) if feedback else o.astype(a[0].dtype)
            return nxt, ()
        out, _ = jax.lax.scan(body, a[0], None, length=iters)
        return out
    jl = jax.jit(loop)
    out = jl(args); out.block_until_ready()
    t0 = time.perf_counter()
    out = jl(args); out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def gn_silu(x, g=32):
    b, h, w, c = x.shape
    xr = x.reshape(b, -1, g, c // g)
    mean = jnp.mean(xr, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    diff = xr - mean.astype(x.dtype)
    var = jnp.mean(jnp.square(diff), axis=(1, 3), keepdims=True, dtype=jnp.float32)
    y = diff * jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
    return jax.nn.silu(y.reshape(b, h, w, c))


def main():
    print("== realistic: concat -> gn+silu -> conv1 ==")
    for (bsz, hw, ca, cb, cout, label) in [
        (2, 32, 1280, 1280, 1280, "up0 32² 2560->1280"),
        (2, 64, 1280, 640, 640, "up1 64² 1920->640"),
        (2, 128, 640, 320, 320, "up2 128² 960->320"),
        (2, 128, 320, 320, 320, "up2 128² 640->320"),
    ]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        a = jax.random.normal(ks[0], (bsz, hw, hw, ca), jnp.bfloat16)
        b = jax.random.normal(ks[1], (bsz, hw, hw, cb), jnp.bfloat16)
        w = (jax.random.normal(ks[2], (3, 3, ca + cb, cout), jnp.bfloat16)
             * (9 * (ca + cb)) ** -0.5)

        def wide(a_, b_, w_):
            y = gn_silu(jnp.concatenate([a_, b_], axis=-1))
            return conv(y, w_)

        def split(a_, b_, w_):
            y = gn_silu(jnp.concatenate([a_, b_], axis=-1))
            return (conv(y[..., :ca], w_[:, :, :ca])
                    + conv(y[..., ca:], w_[:, :, ca:])).astype(a_.dtype)

        base = np.asarray(jax.jit(wide)(a, b, w), np.float32)
        fast = np.asarray(jax.jit(split)(a, b, w), np.float32)
        err = np.abs(fast - base).max() / np.abs(base).max()
        fb = lambda o, a0: jnp.tile(
            o, (1, 1, 1, (a0.shape[-1] + o.shape[-1] - 1) // o.shape[-1])
        )[..., :a0.shape[-1]].astype(a0.dtype)
        t_base = bench_fn(wide, (a, b, w), feedback=fb)
        t_fast = bench_fn(split, (a, b, w), feedback=fb)
        print(f"{label}: wide {t_base:.3f} ms, split {t_fast:.3f} ms, relerr {err:.1e}")

    print("\n== conv_in / conv_out channel padding ==")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x4 = jax.random.normal(ks[0], (2, 128, 128, 4), jnp.bfloat16)
    win = jax.random.normal(ks[1], (3, 3, 4, 320), jnp.bfloat16) * (9 * 4) ** -0.5
    x320 = jax.random.normal(ks[2], (2, 128, 128, 320), jnp.bfloat16)
    wout = jax.random.normal(ks[3], (3, 3, 320, 4), jnp.bfloat16) * (9 * 320) ** -0.5

    def conv_in_pad(x_, w_, to):
        xp = jnp.pad(x_, ((0, 0), (0, 0), (0, 0), (0, to - 4)))
        wp = jnp.pad(w_, ((0, 0), (0, 0), (0, to - 4), (0, 0)))
        return conv(xp, wp)

    def conv_out_pad(x_, w_, to):
        wp = jnp.pad(w_, ((0, 0), (0, 0), (0, 0), (0, to - 4)))
        return conv(x_, wp)[..., :4]

    fb_in = lambda o, x0: o[..., :4].astype(x0.dtype)
    t = bench_fn(lambda a, ww: conv(a, ww), (x4, win), feedback=fb_in)
    print(f"conv_in 4->320 native: {t:.3f} ms")
    for to in (8, 32):
        t = bench_fn(lambda a, ww: conv_in_pad(a, ww, to), (x4, win), feedback=fb_in)
        print(f"conv_in padded to {to}: {t:.3f} ms")
    fb_out = lambda o, x0: jnp.tile(o, (1, 1, 1, 80)).astype(x0.dtype)
    t = bench_fn(lambda a, ww: conv(a, ww), (x320, wout), feedback=fb_out)
    print(f"conv_out 320->4 native: {t:.3f} ms")
    for to in (8, 32):
        t = bench_fn(lambda a, ww: conv_out_pad(a, ww, to), (x320, wout), feedback=fb_out)
        print(f"conv_out padded to {to}: {t:.3f} ms")


if __name__ == "__main__":
    main()
