"""Probe: fuse nearest-2x upsample + 3x3 SAME conv into subpixel 2x2 convs.

The UNet's two upsamplers (models/unet.py:176, diffusers Upsample2D role)
nearest-upsample then 3x3-conv: every input pixel is duplicated 4x before
the conv reads it, so the conv does 9 taps per output where the distinct
information only needs 4. Algebra: for output row p = 2i+a (a in {0,1}),
the three upsampled rows {p-1, p, p+1} collapse onto original rows
  a=0: {i-1: w0, i: w1+w2}        a=1: {i: w0+w1, i+1: w2}
(and identically for columns), giving four 2x2-tap convs over the
ORIGINAL grid with pre-summed weights, interleaved back as subpixels.
FLOPs: 16 HxW pointwise einsums vs 9 at (2H)x(2W) = 4/9 of the work.
Exact same math (bf16 accumulation order aside).

Shapes probed: the two SDXL upsampler convs (32->64 @1280, 64->128 @640).

Run on the real chip: python tools/probe_upsample_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(f, x, w, iters=30):
    def loop(a):
        def body(c, _):
            o = f(c, a[1])
            # feed back a same-shaped slice so the scan carries a data dep
            return (o[:, ::2, ::2, :]).astype(a[0].dtype), ()
        out, _ = jax.lax.scan(body, a[0], None, length=iters)
        return out
    jl = jax.jit(loop)
    out = jl((x, w)); out.block_until_ready()
    t0 = time.perf_counter()
    out = jl((x, w)); out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def upsample_conv_ref(x, w):
    b, h, wd, c = x.shape
    xu = jax.image.resize(x, (b, h * 2, wd * 2, c), method="nearest")
    return jax.lax.conv_general_dilated(
        xu, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def upsample_conv_subpixel(x, w):
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # row/col tap weights per subpixel parity: lists of (offset, w-slice sum)
    row_taps = {
        0: [(-1, w[0]), (0, w[1] + w[2])],
        1: [(0, w[0] + w[1]), (1, w[2])],
    }
    subs = []
    for a in (0, 1):
        for bb in (0, 1):
            acc = None
            for dr, wr in row_taps[a]:
                col_taps = {
                    0: [(-1, wr[0]), (0, wr[1] + wr[2])],
                    1: [(0, wr[0] + wr[1]), (1, wr[2])],
                }[bb]
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


def main():
    for (bsz, hw, cin, cout, label) in [
        (2, 32, 1280, 1280, "upsampler 32->64 @1280"),
        (2, 64, 640, 640, "upsampler 64->128 @640"),
    ]:
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        x = jax.random.normal(ks[0], (bsz, hw, hw, cin), jnp.bfloat16)
        w = (jax.random.normal(ks[1], (3, 3, cin, cout), jnp.bfloat16)
             * (9 * cin) ** -0.5)
        base = np.asarray(jax.jit(upsample_conv_ref)(x, w), np.float32)
        fused = np.asarray(jax.jit(upsample_conv_subpixel)(x, w), np.float32)
        err = np.abs(fused - base).max()
        rel = err / max(np.abs(base).max(), 1e-9)
        print(f"\n{label} (b{bsz} {hw}x{hw} {cin}->{cout}):")
        print(f"  maxerr={err:.3e} (rel {rel:.2e})")
        print(f"  upsample+conv : {bench(upsample_conv_ref, x, w):7.3f} ms")
        print(f"  subpixel      : {bench(upsample_conv_subpixel, x, w):7.3f} ms")


if __name__ == "__main__":
    main()
