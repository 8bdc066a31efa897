"""Pallas fused attention: interpret-mode parity on CPU + dispatch rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagharmony_tpu.kernels import flash_attention as fa
from imagharmony_tpu.nn import attention as attn_lib


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fa, "_INTERPRET", True)


def _qkv(b=1, h=2, sq=512, sk=512, d=64, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return (
        jax.random.normal(ks[0], (b, h, sq, d), dtype),
        jax.random.normal(ks[1], (b, h, sk, d), dtype),
        jax.random.normal(ks[2], (b, h, sk, d), dtype),
    )


def test_parity_vs_xla(interpret_mode):
    q, k, v = _qkv()
    out = fa.flash_attention(q, k, v, scale=64**-0.5)
    assert out is not None
    ref = attn_lib.sdpa(q, k, v, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_parity_bf16(interpret_mode):
    q, k, v = _qkv(dtype=jnp.bfloat16)
    out = fa.flash_attention(q, k, v, scale=64**-0.5)
    ref = attn_lib.sdpa(q, k, v, backend="xla")
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_gradient_parity(interpret_mode):
    q, k, v = _qkv(sq=256, sk=512)

    def loss_p(q, k, v):
        return (fa.flash_attention(q, k, v, scale=64**-0.5) ** 2).sum()

    def loss_x(q, k, v):
        return (attn_lib.sdpa(q, k, v, backend="xla") ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_dispatch_rules():
    # CPU without interpret: decline (dispatch is platform-aware)
    q, k, v = _qkv()
    assert fa.flash_attention(q, k, v, scale=0.125) is None


def test_dispatch_rules_interpret(interpret_mode):
    # tiny K (text/IP branches): must decline -> caller falls back to XLA
    q, k, v = _qkv(sk=128)
    assert fa.flash_attention(q, k, v, scale=0.125) is None


def test_headdim_pad_parity(interpret_mode):
    """SD1.5 head dims (40/80/160) ride the fused path (Sk >= 2048, where
    the XLA logits materialization hurts) via zero-padding to the 64
    quantum — exact math (zero contraction dims, sliced v columns)."""
    for d in (40, 80, 160):
        q, k, v = _qkv(d=d, sq=256, sk=2048)
        out = fa.flash_attention(q, k, v, scale=d**-0.5)
        assert out is not None and out.shape == q.shape
        ref = attn_lib.sdpa(q, k, v, backend="xla")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )
    # below the 2048 threshold: XLA wins at padded dims (probe) -> decline
    q, k, v = _qkv(d=80, sq=256, sk=512)
    assert fa.flash_attention(q, k, v, scale=80**-0.5) is None


def test_headdim_pad_gradients(interpret_mode):
    q, k, v = _qkv(d=40, sq=256, sk=2048)

    def loss_p(q, k, v):
        return (fa.flash_attention(q, k, v, scale=40**-0.5) ** 2).sum()

    def loss_x(q, k, v):
        return (attn_lib.sdpa(q, k, v, backend="xla") ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_odd_shapes_pad_and_mask(interpret_mode):
    """Non-256-multiple sequences stay on the fused path via padding; the
    masked padded keys must not change the math (the silent-XLA cliff of
    round 1 is gone)."""
    for sq, sk in ((300, 512), (256, 600), (81 * 81, 81 * 81)):
        q, k, v = _qkv(sq=sq, sk=sk)
        out = fa.flash_attention(q, k, v, scale=64**-0.5)
        assert out is not None and out.shape == q.shape
        ref = attn_lib.sdpa(q, k, v, backend="xla")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )


def test_odd_shape_gradients(interpret_mode):
    """Pallas backward under padding: padded keys/queries contribute zero."""
    q, k, v = _qkv(sq=300, sk=520)

    def loss_p(q, k, v):
        return (fa.flash_attention(q, k, v, scale=64**-0.5) ** 2).sum()

    def loss_x(q, k, v):
        return (attn_lib.sdpa(q, k, v, backend="xla") ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_sdpa_backend_pallas_falls_back(interpret_mode):
    """sdpa(backend='pallas') must route through the kernel when eligible
    and produce the same values."""
    q, k, v = _qkv()
    a = attn_lib.sdpa(q, k, v, backend="pallas")
    b = attn_lib.sdpa(q, k, v, backend="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def _packed_qkv(b=1, h=2, s=512, d=64, dtype=jnp.float32, sk=None):
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    sk = sk or s
    return (
        jax.random.normal(ks[0], (b, s, h * d), dtype),
        jax.random.normal(ks[1], (b, sk, h * d), dtype),
        jax.random.normal(ks[2], (b, sk, h * d), dtype),
    )


def _ref_nhd(q, k, v, h, d):
    split = lambda x: x.reshape(x.shape[0], x.shape[1], h, d).transpose(0, 2, 1, 3)
    out = attn_lib.sdpa(split(q), split(k), split(v), backend="xla")
    b, _, s, _ = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def test_nhd_parity_vs_xla(interpret_mode):
    """Packed-layout kernel == head-split XLA attention (2 heads/group)."""
    q, k, v = _packed_qkv(h=4)
    out = fa.flash_attention_nhd(q, k, v, scale=64**-0.5, head_dim=64)
    assert out is not None
    ref = _ref_nhd(q, k, v, 4, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_nhd_kblock_parity(interpret_mode):
    """Sk >= 2048 takes the k-blocked accumulation path (kb=1024)."""
    q, k, v = _packed_qkv(h=2, s=256, sk=2048)
    out = fa.flash_attention_nhd(q, k, v, scale=64**-0.5, head_dim=64)
    assert out is not None
    ref = _ref_nhd(q, k, v, 2, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_nhd_kblock_odd_shape_straddles_block(interpret_mode):
    """kv_valid=2100 lands inside the third k-block (2048..2304 after the
    256-quantum pad): the straddling block is masked, the tail skipped."""
    q, k, v = _packed_qkv(h=2, s=256, sk=2100)
    out = fa.flash_attention_nhd(q, k, v, scale=64**-0.5, head_dim=64)
    assert out is not None
    ref = _ref_nhd(q, k, v, 2, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def loss_p(q, k, v):
        return (fa.flash_attention_nhd(q, k, v, scale=64**-0.5, head_dim=64) ** 2).sum()

    def loss_x(q, k, v):
        return (_ref_nhd(q, k, v, 2, 64) ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_nhd_parity_bf16(interpret_mode):
    q, k, v = _packed_qkv(h=2, dtype=jnp.bfloat16)
    out = fa.flash_attention_nhd(q, k, v, scale=64**-0.5, head_dim=64)
    assert out is not None
    ref = _ref_nhd(q, k, v, 2, 64)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_nhd_gradient_parity(interpret_mode):
    q, k, v = _packed_qkv(h=2, s=256, sk=512)

    def loss_p(q, k, v):
        return (fa.flash_attention_nhd(q, k, v, scale=64**-0.5, head_dim=64) ** 2).sum()

    def loss_x(q, k, v):
        return (_ref_nhd(q, k, v, 2, 64) ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_nhd_dispatch_rules(interpret_mode):
    # head_dim that doesn't divide 128 -> decline (SD1.5's 40/80-wide heads)
    q, k, v = _packed_qkv(h=2, d=80)
    assert fa.flash_attention_nhd(q, k, v, scale=80**-0.5, head_dim=80) is None
    # tiny K declines
    q, k, v = _packed_qkv(h=2, sk=128)
    assert fa.flash_attention_nhd(q, k, v, scale=64**-0.5, head_dim=64) is None


def test_nhd_odd_shapes(interpret_mode):
    """Packed-layout kernel pads odd sequences and masks the padded keys."""
    q, k, v = _packed_qkv(h=2, s=300, sk=600)
    out = fa.flash_attention_nhd(q, k, v, scale=64**-0.5, head_dim=64)
    assert out is not None and out.shape == q.shape
    ref = _ref_nhd(q, k, v, 2, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def loss_p(q, k, v):
        return (fa.flash_attention_nhd(q, k, v, scale=64**-0.5, head_dim=64) ** 2).sum()

    def loss_x(q, k, v):
        return (_ref_nhd(q, k, v, 2, 64) ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_block_size_rules():
    """Block choices divide the (padded) sequence and respect VMEM budgets."""
    for sq in (256, 512, 1024, 4096, 6656):
        for sk in (512, 1024, 4096, 6656):
            bq = fa._fwd_block_q(sq, sk)
            assert sq % bq == 0, (sq, sk, bq)
            # logits-tile budget: whole-row only when <= 8 MB
            assert bq * sk * 4 <= (1 << 23) or bq == 128, (sq, sk, bq)
            bb = fa._bwd_block_q(sq, sk)
            assert sq % bb == 0, (sq, sk, bb)
            assert bb * sk * 4 <= (1 << 21) or bb == 64, (sq, sk, bb)


# ---------------------------------------------------------------------------
# Fused short-K cross attention (text 77 / decoupled text+IP)
# ---------------------------------------------------------------------------


def _packed_ref(q, k, v, heads, scale):
    b, s, hd = q.shape
    d = hd // heads

    def split(x):
        return x.reshape(b, x.shape[1], heads, d).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) * scale
    o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), split(v))
    return o.transpose(0, 2, 1, 3).reshape(b, s, hd)


def _cross_inputs(b=2, sq=1024, skt=77, ski=4, heads=4, d=64, dtype=jnp.float32):
    hd = heads * d
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    return (
        jax.random.normal(ks[0], (b, sq, hd), dtype),
        jax.random.normal(ks[1], (b, skt, hd), dtype),
        jax.random.normal(ks[2], (b, skt, hd), dtype),
        jax.random.normal(ks[3], (b, ski, hd), dtype),
        jax.random.normal(ks[4], (b, ski, hd), dtype),
    )


def test_cross_nhd_parity_vs_xla(interpret_mode):
    q, k, v, _, _ = _cross_inputs()
    out = fa.flash_cross_nhd(q, k, v, scale=64**-0.5, head_dim=64)
    assert out is not None
    ref = _packed_ref(q, k, v, 4, 64**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_cross_nhd_fused_ip_parity(interpret_mode):
    """out == text_attn + ip_scale * ip_attn (pre-scaled v_ip), the
    decoupled semantics of reference attention_processor.py:450 fused in
    one kernel pass."""
    q, k, v, kip, vip = _cross_inputs()
    s = 0.7
    out = fa.flash_cross_nhd(
        q, k, v, scale=64**-0.5, head_dim=64, k_ip=kip, v_ip=vip * s
    )
    assert out is not None
    ref = _packed_ref(q, k, v, 4, 64**-0.5) + s * _packed_ref(q, kip, vip, 4, 64**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_cross_nhd_gradient_parity(interpret_mode):
    q, k, v, kip, vip = _cross_inputs(sq=512)

    def loss_p(*a):
        return (fa.flash_cross_nhd(
            a[0], a[1], a[2], scale=64**-0.5, head_dim=64,
            k_ip=a[3], v_ip=a[4]) ** 2).sum()

    def loss_x(*a):
        return ((_packed_ref(a[0], a[1], a[2], 4, 64**-0.5)
                 + _packed_ref(a[0], a[3], a[4], 4, 64**-0.5)) ** 2).sum()

    gp = jax.grad(loss_p, argnums=tuple(range(5)))(q, k, v, kip, vip)
    gx = jax.grad(loss_x, argnums=tuple(range(5)))(q, k, v, kip, vip)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_no_max_softmax_saturates_without_nan(interpret_mode):
    """The no-max kernel clamps exp2 args at _EXP2_ARG_MAX: logits above
    the clamp (pathological trained-model rows) must saturate to a uniform
    mix over the clamped entries — finite output, never inf/nan."""
    q, k, v = _qkv(sq=256, sk=512)
    big = 600.0  # logits*scale*log2e far above the clamp
    out = fa.flash_attention(q * big, k, v, scale=64**-0.5)
    assert out is not None
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # packed layout too
    b, h, sq, d = q.shape
    pk = (q * big).transpose(0, 2, 1, 3).reshape(b, sq, h * d)
    kk = k.transpose(0, 2, 1, 3).reshape(b, 512, h * d)
    vv = v.transpose(0, 2, 1, 3).reshape(b, 512, h * d)
    out2 = fa.flash_attention_nhd(pk, kk, vv, scale=64**-0.5, head_dim=64)
    assert out2 is not None
    assert np.isfinite(np.asarray(out2, np.float32)).all()


def test_nhd_kblock_long_k(interpret_mode):
    """Sk >= 2048 switches the NHD kernel onto the k-blocked accumulation
    path (kb=1024); parity must hold through the switch."""
    b, h, d = 1, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, 512, h * d))
    k = jax.random.normal(ks[1], (b, 2048, h * d))
    v = jax.random.normal(ks[2], (b, 2048, h * d))
    out = fa.flash_attention_nhd(q, k, v, scale=d**-0.5, head_dim=d)
    assert out is not None
    ref = _packed_ref(q, k, v, h, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_cross_nhd_dispatch_rules(interpret_mode):
    # long K belongs to the self-attention kernels
    q, k, v, _, _ = _cross_inputs(skt=512)
    assert fa.flash_cross_nhd(q, k, v, scale=0.125, head_dim=64) is None
    # short queries: XLA is fine, skip the kernel
    q, k, v, _, _ = _cross_inputs(sq=256)
    assert fa.flash_cross_nhd(q, k, v, scale=0.125, head_dim=64) is None


def test_attention_cross_stays_on_xla(interpret_mode):
    """attention() keeps the short-K cross path on XLA even on
    backend='pallas' — the fused cross kernel measured SLOWER than XLA's
    short-K softmax fusion (PERF.md round-3 levers), so it exists as a
    probed-and-rejected alternative, not a routing target. Outputs must be
    bit-identical across backends for the cross path."""
    from imagharmony_tpu import dtypes

    heads, d = 4, 64
    hd = heads * d
    p = attn_lib.attention_init(
        jax.random.PRNGKey(0), hd, heads=heads, context_dim=48, with_ip=True
    )
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (2, 512, hd))
    ctx = jax.random.normal(ks[1], (2, 77, 48))
    ip = jax.random.normal(ks[2], (2, 4, 48))
    for ip_ctx in (None, ip):
        a = attn_lib.attention(
            p, x, heads=heads, context=ctx, ip_context=ip_ctx, ip_scale=0.6,
            backend="xla", policy=dtypes.FP32,
        )
        b = attn_lib.attention(
            p, x, heads=heads, context=ctx, ip_context=ip_ctx, ip_scale=0.6,
            backend="pallas", policy=dtypes.FP32,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
