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
    # head_dim not a multiple of 64: decline WITH a warning (loud fallback)
    import warnings

    fa._warned.clear()
    q, k, v = _qkv(d=80)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert fa.flash_attention(q, k, v, scale=0.125) is None
    assert any("head_dim" in str(x.message) for x in w)


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
