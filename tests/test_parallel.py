"""Parallel layer: mesh helpers, TP/FSDP shardings, distributed utils."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from imagharmony_tpu.models import unet
from imagharmony_tpu.parallel import (
    distributed,
    fsdp,
    mesh as mesh_lib,
    tp_rules,
)


def test_make_mesh_axes():
    m = mesh_lib.make_mesh()
    assert m.axis_names == ("data", "model")
    assert m.devices.size == 8


def test_fit_data_mesh():
    assert mesh_lib.fit_data_mesh(2).devices.shape == (2, 1)
    assert mesh_lib.fit_data_mesh(8).devices.shape == (8, 1)
    assert mesh_lib.fit_data_mesh(3).devices.shape == (3, 1)
    assert mesh_lib.fit_data_mesh(7).devices.shape == (7, 1)


def test_tp_specs():
    col = tp_rules.tp_spec(("attn1", "to_q", "weight"), np.zeros((8, 16)))
    row = tp_rules.tp_spec(("attn1", "to_out", "weight"), np.zeros((16, 8)))
    rep = tp_rules.tp_spec(("norm1", "weight"), np.zeros((8,)))
    assert col == P(None, "model")
    assert row == P("model", None)
    assert rep == P()
    # conv kernels replicate
    assert tp_rules.tp_spec(("conv1", "weight"), np.zeros((3, 3, 8, 8))) == P()


def test_tp_sharded_unet_matches_replicated():
    """A 2-way TP UNet forward must equal the single-device result (GSPMD
    inserts the all-reduces; values identical up to fp summation order)."""
    cfg = unet.tiny_config()
    params = unet.init(0, cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    sample = jax.random.normal(ks[0], (2, 16, 16, 4))
    ctx = jax.random.normal(ks[1], (2, 8, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (2, 32))
    tids = jnp.tile(jnp.array([[16.0, 16, 0, 0, 16, 16]]), (2, 1))

    from imagharmony_tpu import dtypes

    def fwd(p, s):
        return unet.apply(p, cfg, s, jnp.array([5, 9]), ctx,
                          pooled_text_embeds=pooled, time_ids=tids,
                          policy=dtypes.FP32)

    base = np.asarray(jax.jit(fwd)(params, sample))

    m = mesh_lib.make_mesh(n_data=4, n_model=2)
    with m:
        p_tp = tp_rules.shard_params_tp(m, params)
        out = np.asarray(jax.jit(fwd)(p_tp, sample))
    np.testing.assert_allclose(base, out, rtol=2e-4, atol=2e-4)


def test_distributed_single_host_noop():
    assert distributed.initialize() is False
    assert distributed.is_main_process()
    assert distributed.local_batch_slice(8) == slice(0, 8)


def test_fsdp_spec_rules():
    """Shape-based ZeRO-3 spec: largest divisible free dim takes the data
    axis; composes with TP base specs; small/indivisible leaves replicate."""
    n = 4
    assert fsdp.fsdp_spec(np.zeros((128, 64)), n, min_elems=1) == P("data", None)
    assert fsdp.fsdp_spec(np.zeros((64, 128)), n, min_elems=1) == P(None, "data")
    # composes with a TP column spec: data goes to the largest FREE dim
    assert fsdp.fsdp_spec(
        np.zeros((128, 64)), n, base=P(None, "model"), min_elems=1
    ) == P("data", "model")
    # conv HWIO: channels get the axis, not the 3x3 taps
    assert fsdp.fsdp_spec(np.zeros((3, 3, 16, 64)), n, min_elems=1) == P(
        None, None, None, "data"
    )
    # indivisible and sub-threshold leaves stay at base
    assert fsdp.fsdp_spec(np.zeros((7, 9)), n, min_elems=1) == P()
    assert fsdp.fsdp_spec(np.zeros((32,)), n) == P()  # default MIN_SHARD_ELEMS
    assert fsdp.fsdp_spec(np.zeros(()), n, min_elems=0) == P()
    assert fsdp.fsdp_spec(np.zeros((128,)), 1, min_elems=1) == P()


def test_fsdp_step_matches_replicated():
    """ZeRO-3 train step (params + AdamW moments + frozen towers sharded
    over the data axis) must produce the same numbers as the replicated-DP
    step — GSPMD inserts the gathers/reduce-scatters. Also asserts the
    state is ACTUALLY sharded (the memory win is the point)."""
    from imagharmony_tpu import dtypes
    from imagharmony_tpu.pipelines import components as comp
    from imagharmony_tpu.train import step as train_step_lib

    cfgs = comp.tiny_configs()
    params = comp.init_params(jax.random.PRNGKey(0), cfgs)
    tcfg = train_step_lib.TrainConfig(learning_rate=1e-3, gradient_checkpoint=False)
    state, frozen = train_step_lib.init_state(params, tcfg)
    batch = train_step_lib.dummy_batch(cfgs, batch_size=8)
    rng = jax.random.PRNGKey(1)
    step_fn = train_step_lib.make_train_step(cfgs, tcfg, policy=dtypes.FP32)

    s1, m1 = jax.jit(step_fn)(state, frozen, batch, rng)

    m = mesh_lib.make_mesh()  # 8-way data axis
    min_elems = 64  # tiny-config dims; production default is 2**13
    with m:
        state_sh = fsdp.tree_shardings(m, state, min_elems=min_elems)
        rep = NamedSharding(m, P())
        state_f = fsdp.shard_tree(m, state, min_elems=min_elems)
        frozen_f = fsdp.shard_tree(m, frozen, min_elems=min_elems)
        batch_s = mesh_lib.shard_batch(m, batch)
        fsdp_step = jax.jit(
            step_fn, out_shardings=(state_sh, {"loss": rep, "grad_norm": rep})
        )
        s8, m8 = fsdp_step(state_f, frozen_f, batch_s, rng)

    def n_sharded(tree):
        return sum(
            1
            for x in jax.tree.leaves(tree)
            if x is not None and x.sharding.spec != P() and tuple(x.sharding.spec) != ()
        )

    assert n_sharded(frozen_f) > 20, "frozen towers not sharded"
    assert n_sharded(s8["trainable"]) > 5, "updated trainable not sharded"
    assert n_sharded(s8["opt_state"]) > 5, "AdamW moments not sharded"

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1["trainable"]), jax.tree.leaves(s8["trainable"])):
        if a is not None:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )


def _sdpa_ref(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    return jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), v
    )


def test_pallas_interpret_under_mesh_dp_and_tp(monkeypatch):
    """Pallas flash attention (fwd + custom_vjp bwd) executed UNDER GSPMD
    sharding on the virtual mesh via interpret mode — co-testing the
    partitioning logic with the kernel (round-2 gap: all mesh tests ran
    XLA-only, all Pallas tests single-device). DP shards the batch axis,
    TP the head axis — the two layouts with_mesh / tp_rules produce."""
    from jax.sharding import NamedSharding

    from imagharmony_tpu.kernels import flash_attention as fa

    monkeypatch.setattr(fa, "_INTERPRET", True)
    B, H, S, D = 4, 2, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.float32)
    scale = D**-0.5

    def fwd(a, b, c):
        out = fa.flash_attention(a, b, c, scale=scale)
        assert out is not None, "fell off the pallas path"
        return out

    def loss(a, b, c):
        return jnp.sum(fwd(a, b, c) ** 2)

    ref = np.asarray(_sdpa_ref(q, k, v, scale))
    g_ref = jax.grad(lambda a, b, c: jnp.sum(_sdpa_ref(a, b, c, scale) ** 2),
                     argnums=(0, 1, 2))(q, k, v)

    m = mesh_lib.make_mesh(n_data=4, n_model=2)
    shardings = {
        "dp": NamedSharding(m, P("data")),           # batch rows
        "tp": NamedSharding(m, P(None, "model")),    # head axis
    }
    for name, sh in shardings.items():
        qs, ks_, vs = (jax.device_put(t, sh) for t in (q, k, v))
        out = np.asarray(jax.jit(fwd)(qs, ks_, vs))
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=5e-3, err_msg=name)
        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks_, vs)
        for g, gr, which in zip(grads, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(gr), rtol=2e-2, atol=2e-2,
                err_msg=f"{name} d{which}",
            )
