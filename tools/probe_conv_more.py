"""Probe: three more conv levers on the UNet's remaining conv time.

a) stride-2 3x3 downsample as 9 strided-slice einsums (equal FLOPs to the
   native strided conv; tests whether einsum layout beats XLA's strided
   conv like shifted-9 did on the stride-1 squares).
b) skip-concat resnet conv1 as a split pair: conv(concat(a,b), W) ==
   conv(a, W[:,:,:ca]) + conv(b, W[:,:,ca:]) — avoids materializing the
   concatenated tensor in HBM.
c) conv_in/conv_out channel padding: cin=4 (latents) uses 4/128 MXU lanes;
   pad to 8/32/128 and slice.

Run on the real chip: python tools/probe_conv_more.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_fn(f, args, iters=30, feedback=None):
    """Scan-chained on-device loop; feedback maps output -> next first arg."""
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


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def down_shifted9(x, w):
    """stride-2 3x3 SAME conv as 9 strided-slice einsums."""
    b, h, wd, c = x.shape
    ho, wo = h // 2, wd // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for i in range(3):
        for j in range(3):
            sl = xp[:, i:i + h:2, j:j + wd:2, :]
            part = jnp.einsum("bhwc,co->bhwo", sl, w[i, j],
                              preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


def main():
    print("== a) stride-2 downsample ==")
    for (bsz, hw, c, label) in [
        (2, 128, 320, "down0 128->64 @320"),
        (2, 64, 640, "down1 64->32 @640"),
    ]:
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        x = jax.random.normal(ks[0], (bsz, hw, hw, c), jnp.bfloat16)
        w = (jax.random.normal(ks[1], (3, 3, c, c), jnp.bfloat16)
             * (9 * c) ** -0.5)
        base = np.asarray(jax.jit(lambda a, b_: conv(a, b_, 2))(x, w), np.float32)
        fast = np.asarray(jax.jit(down_shifted9)(x, w), np.float32)
        err = np.abs(fast - base).max() / np.abs(base).max()
        fb = lambda o, x0: jnp.concatenate([o, o], axis=1).repeat(2, axis=2)[
            :, :x0.shape[1], :x0.shape[2], :].astype(x0.dtype)
        t_base = bench_fn(lambda a, ww: conv(a, ww, 2), (x, w), feedback=fb)
        t_fast = bench_fn(down_shifted9, (x, w), feedback=fb)
        print(f"{label}: native {t_base:.3f} ms, shifted9 {t_fast:.3f} ms, relerr {err:.1e}")

    print("\n== b) skip-concat conv1 split ==")
    for (bsz, hw, ca, cb, cout, label) in [
        (2, 32, 1280, 1280, 1280, "up0 resnet0 32² 2560->1280"),
        (2, 64, 1280, 640, 640, "up1 resnet0 64² 1920->640"),
        (2, 128, 640, 320, 320, "up2 resnet0 128² 960->320"),
        (2, 128, 320, 320, 320, "up2 resnet1 128² 640->320"),
    ]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        a = jax.random.normal(ks[0], (bsz, hw, hw, ca), jnp.bfloat16)
        b = jax.random.normal(ks[1], (bsz, hw, hw, cb), jnp.bfloat16)
        w = (jax.random.normal(ks[2], (3, 3, ca + cb, cout), jnp.bfloat16)
             * (9 * (ca + cb)) ** -0.5)

        def cat_conv(a_, b_, w_):
            return conv(jnp.concatenate([a_, b_], axis=-1), w_)

        def split_conv(a_, b_, w_):
            return (conv(a_, w_[:, :, :ca]) + conv(b_, w_[:, :, ca:])).astype(a_.dtype)

        base = np.asarray(jax.jit(cat_conv)(a, b, w), np.float32)
        fast = np.asarray(jax.jit(split_conv)(a, b, w), np.float32)
        err = np.abs(fast - base).max() / np.abs(base).max()
        fb = lambda o, a0: jnp.tile(o, (1, 1, 1, (a0.shape[-1] + o.shape[-1] - 1) // o.shape[-1]))[..., :a0.shape[-1]].astype(a0.dtype)
        t_base = bench_fn(cat_conv, (a, b, w), feedback=fb)
        t_fast = bench_fn(split_conv, (a, b, w), feedback=fb)
        print(f"{label}: concat {t_base:.3f} ms, split {t_fast:.3f} ms, relerr {err:.1e}")

    print("\n== c) conv_in / conv_out channel padding ==")
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
    for to in (8, 32, 128):
        t = bench_fn(lambda a, ww: conv_in_pad(a, ww, to), (x4, win), feedback=fb_in)
        print(f"conv_in padded to {to}: {t:.3f} ms")
    fb_out = lambda o, x0: jnp.tile(o, (1, 1, 1, 80)).astype(x0.dtype)
    t = bench_fn(lambda a, ww: conv(a, ww), (x320, wout), feedback=fb_out)
    print(f"conv_out 320->4 native: {t:.3f} ms")
    for to in (8, 32, 128):
        t = bench_fn(lambda a, ww: conv_out_pad(a, ww, to), (x320, wout), feedback=fb_out)
        print(f"conv_out padded to {to}: {t:.3f} ms")


if __name__ == "__main__":
    main()
