"""Probe: conv layout micro-tuning on the 128² UNet stages (VERDICT r2 #2c).

The spatial convs cost ~19 ms/call (PERF.md §4), dominated by the 320-ch
3x3 convs at 128² (block0/up-block2). Exact-math variants tried here:
  a) baseline lax.conv_general_dilated NHWC/HWIO (what layers.conv2d does)
  b) zero-padded channels to 384/512 (MXU lane alignment; same valid math)
  c) im2col + one big matmul (manual implicit GEMM)
  d) 3x3 as 9 shifted 1x1 matmuls accumulated (tests XLA's fusion of
     pointwise convs, which hit the MXU directly without im2col layout)

Run on the real chip: python tools/probe_conv_tuning.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(f, *args, iters=30):
    def loop(a):
        def body(c, _):
            o = f(c, *a[1:])
            return o.astype(a[0].dtype), ()
        out, _ = jax.lax.scan(body, a[0], None, length=iters)
        return out
    jl = jax.jit(loop)
    out = jl(args)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = jl(args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv_padded(x, w, to):
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, to - cin), (0, to - cout)))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, to - cin)))
    return conv(xp, wp)[..., :cout]


def conv_im2col(x, w):
    b, h, wd, c = x.shape
    kh, kw, _, cout = w.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, i:i + h, j:j + wd, :] for i in range(kh) for j in range(kw)]
    patches = jnp.concatenate(cols, axis=-1).reshape(b * h * wd, kh * kw * c)
    out = patches @ w.reshape(kh * kw * c, cout)
    return out.reshape(b, h, wd, cout).astype(x.dtype)


def conv_shifted(x, w):
    b, h, wd, c = x.shape
    kh, kw, _, cout = w.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for i in range(kh):
        for j in range(kw):
            part = jnp.einsum(
                "bhwc,co->bhwo", xp[:, i:i + h, j:j + wd, :], w[i, j],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


def main():
    import numpy as np

    shapes = [
        (2, 128, 320, 320, "block0 resnet conv"),
        (2, 64, 640, 640, "block1 resnet conv"),
        (2, 128, 640, 320, "up-block2 skip-concat conv"),
    ]
    for b, hw, cin, cout, label in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        x = jax.random.normal(ks[0], (b, hw, hw, cin), jnp.bfloat16)
        w = (jax.random.normal(ks[1], (3, 3, cin, cout), jnp.bfloat16)
             * (9 * cin) ** -0.5)

        base = np.asarray(jax.jit(conv)(x, w), np.float32)
        variants = {
            "baseline": conv,
            "pad384": functools.partial(conv_padded, to=384) if max(cin, cout) <= 384 else None,
            "pad512": functools.partial(conv_padded, to=512) if max(cin, cout) <= 512 else None,
            "im2col": conv_im2col,
            "shifted9": conv_shifted,
        }
        print(f"\n{label} (b{b} {hw}x{hw} {cin}->{cout}):")
        for name, f in variants.items():
            if f is None:
                continue
            out = np.asarray(jax.jit(f)(x, w), np.float32)
            err = np.abs(out - base).max()
            ms = bench(lambda a, ww: f(a, ww)[..., :cin] if f is not conv and out.shape != a.shape else f(a, ww), x, w) \
                if cout == cin else None
            if ms is None:
                # non-square in/out: bench without feeding back
                def once(a, ww):
                    return f(a, ww)
                jf = jax.jit(once)
                jf(x, w).block_until_ready()
                t0 = time.perf_counter()
                for _ in range(20):
                    o = jf(x, w)
                o.block_until_ready()
                ms = (time.perf_counter() - t0) / 20 * 1e3
            print(f"  {name:9s}: {ms:7.3f} ms  maxerr={err:.2e}")


if __name__ == "__main__":
    main()
