"""Training-step tests: gradient surface, loss decrease, DP sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.parallel import mesh as mesh_lib
from imagharmony_tpu.pipelines import components as comp
from imagharmony_tpu.train import step as train_step_lib
from imagharmony_tpu.utils import tree as tree_util

FP32 = dtypes.FP32


def _setup(train_image_proj=False):
    cfgs = comp.tiny_configs()
    params = comp.init_params(jax.random.PRNGKey(0), cfgs)
    tcfg = train_step_lib.TrainConfig(
        learning_rate=1e-3, train_image_proj=train_image_proj, gradient_checkpoint=False
    )
    state, frozen = train_step_lib.init_state(params, tcfg)
    return cfgs, tcfg, state, frozen


def test_trainable_surface_matches_reference():
    """Trainable = to_k_ip/to_v_ip everywhere + HA module
    (reference train.py:600-601); base UNet/VAE/CLIP frozen."""
    from imagharmony_tpu.io.hf_import import flatten_tree

    cfgs, tcfg, state, frozen = _setup()
    trainable_paths = [p for p, v in flatten_tree(state["trainable"]) if v is not None]
    assert trainable_paths, "empty trainable surface"
    for p in trainable_paths:
        assert ("to_k_ip" in p) or ("to_v_ip" in p) or p[0] == "harmony", p
    # every cross-attn layer carries ip weights, incl. skip layers
    ip_layers = {p[:-2] for p in trainable_paths if "to_k_ip" in p}
    assert len(ip_layers) > 2  # more than just the target block


def test_split_and_merge_roundtrip():
    cfgs, tcfg, state, frozen = _setup()
    merged = tree_util.merge(state["trainable"], frozen)
    params = comp.init_params(jax.random.PRNGKey(0), cfgs)
    a = jax.tree.leaves(merged)
    b = jax.tree.leaves(params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_trainable_count():
    cfgs, tcfg, state, frozen = _setup()
    n_trainable = tree_util.count_params(
        [x for x in jax.tree.leaves(state["trainable"]) if x is not None]
    )
    n_frozen = tree_util.count_params(
        [x for x in jax.tree.leaves(frozen) if x is not None]
    )
    assert n_trainable > 0
    assert n_frozen > 20 * n_trainable  # adapters are a small fraction


def test_loss_decreases_and_frozen_untouched():
    cfgs, tcfg, state, frozen = _setup()
    step_fn = jax.jit(train_step_lib.make_train_step(cfgs, tcfg, policy=FP32))
    batch = train_step_lib.dummy_batch(cfgs)
    frozen_before = jax.tree.map(lambda x: np.asarray(x).copy() if x is not None else None, frozen)

    losses = []
    rng = jax.random.PRNGKey(42)
    for i in range(8):
        # fixed rng: same noise/timesteps each step → loss must fall
        state, metrics = step_fn(state, frozen, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()

    # frozen params bit-identical
    for a, b in zip(jax.tree.leaves(frozen_before), jax.tree.leaves(frozen)):
        if a is not None:
            np.testing.assert_array_equal(a, np.asarray(b))


def test_inert_ip_weights_not_decayed():
    """Skip-layer to_k_ip/to_v_ip get exactly-zero grads (their branch never
    runs); with the decay mask they must stay bit-identical after a step —
    torch AdamW semantics for None-grad params (reference keeps inert
    adapter weights at their seeded values)."""
    cfgs = comp.tiny_configs()
    params = comp.init_params(jax.random.PRNGKey(0), cfgs)
    tcfg = train_step_lib.TrainConfig(
        learning_rate=1e-2, weight_decay=0.1, gradient_checkpoint=False,
        unet_cfg=cfgs.unet,
    )
    state, frozen = train_step_lib.init_state(params, tcfg)
    step_fn = jax.jit(train_step_lib.make_train_step(cfgs, tcfg, policy=FP32))
    batch = train_step_lib.dummy_batch(cfgs)

    tr = state["trainable"]["unet"]
    # tiny config uses the default single-target ip_layers: mid_block inert
    inert_before = np.asarray(
        tr["mid_block"]["attentions"][0]["transformer_blocks"][0]["attn2"]["to_k_ip"]["weight"]
    ).copy()
    active_before = np.asarray(
        tr["down_blocks"][2]["attentions"][1]["transformer_blocks"][0]["attn2"]["to_k_ip"]["weight"]
    ).copy()

    state, _ = step_fn(state, frozen, batch, jax.random.PRNGKey(3))
    tr = state["trainable"]["unet"]
    inert_after = np.asarray(
        tr["mid_block"]["attentions"][0]["transformer_blocks"][0]["attn2"]["to_k_ip"]["weight"]
    )
    active_after = np.asarray(
        tr["down_blocks"][2]["attentions"][1]["transformer_blocks"][0]["attn2"]["to_k_ip"]["weight"]
    )
    np.testing.assert_array_equal(inert_before, inert_after)
    assert np.abs(active_before - active_after).max() > 0


def test_grad_accum_matches_manual_average():
    """grad_accum=2 must equal: split the batch into contiguous
    microbatches, average per-micro grads (with the same split rngs), one
    optimizer update — exact, not approximate."""
    import optax

    cfgs = comp.tiny_configs()
    params = comp.init_params(jax.random.PRNGKey(0), cfgs)
    tcfg = train_step_lib.TrainConfig(
        learning_rate=1e-3, gradient_checkpoint=False, grad_accum=2
    )
    state, frozen = train_step_lib.init_state(params, tcfg)
    batch = train_step_lib.dummy_batch(cfgs, batch_size=4)
    rng = jax.random.PRNGKey(5)

    s_acc, m_acc = jax.jit(
        train_step_lib.make_train_step(cfgs, tcfg, policy=FP32)
    )(state, frozen, batch, rng)

    # manual: same microbatch slicing + rng split as the scan
    rngs = jax.random.split(rng, 2)
    grad_fn = jax.jit(
        lambda t, mb, r: jax.value_and_grad(train_step_lib.loss_fn)(
            t, frozen, cfgs, tcfg, mb, r, policy=FP32
        )
    )
    micro = [
        {k: v[i * 2:(i + 1) * 2] for k, v in batch.items()} for i in range(2)
    ]
    l0, g0 = grad_fn(state["trainable"], micro[0], rngs[0])
    l1, g1 = grad_fn(state["trainable"], micro[1], rngs[1])
    grads = jax.tree.map(lambda a, b: (a + b) / 2, g0, g1)
    tx = train_step_lib.make_optimizer(tcfg)
    updates, _ = tx.update(grads, state["opt_state"], state["trainable"])
    manual = optax.apply_updates(state["trainable"], updates)

    # loss and grad norm match tightly (catches drop-a-micro / wrong-mean
    # bugs: either would move the norm by O(1))
    np.testing.assert_allclose(
        float(m_acc["loss"]), (float(l0) + float(l1)) / 2, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_acc["grad_norm"]), float(optax.global_norm(grads)), rtol=1e-5
    )
    # params: Adam's step-1 update is ±lr*sign(g) elementwise, so fp32
    # fusion-order noise on near-zero grads legitimately moves single
    # weights by up to 2*lr; a real accumulation bug moves them wholesale
    for a, b in zip(jax.tree.leaves(s_acc["trainable"]), jax.tree.leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)


def test_ema_tracks_trainable():
    """state['ema'] follows e*d + p*(1-d) on the UPDATED params each step."""
    cfgs = comp.tiny_configs()
    params = comp.init_params(jax.random.PRNGKey(0), cfgs)
    tcfg = train_step_lib.TrainConfig(
        learning_rate=1e-2, gradient_checkpoint=False, ema_decay=0.5
    )
    state, frozen = train_step_lib.init_state(params, tcfg)
    assert "ema" in state
    step_fn = jax.jit(train_step_lib.make_train_step(cfgs, tcfg, policy=FP32))
    batch = train_step_lib.dummy_batch(cfgs)

    expect = jax.tree.map(np.asarray, state["ema"])
    rng = jax.random.PRNGKey(9)
    for i in range(2):
        rng, sub = jax.random.split(rng)
        state, _ = step_fn(state, frozen, batch, sub)
        expect = jax.tree.map(
            lambda e, p: e * 0.5 + np.asarray(p) * 0.5,
            expect, state["trainable"],
        )
    for a, b in zip(jax.tree.leaves(state["ema"]), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6, atol=1e-7)


def test_lr_schedules():
    """Warmup ramps 0 → peak; cosine decays peak → ~0 at the horizon."""
    warm = train_step_lib.learning_rate(
        train_step_lib.TrainConfig(learning_rate=1e-3, lr_warmup_steps=10)
    )
    assert float(warm(0)) == 0.0
    np.testing.assert_allclose(float(warm(5)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(warm(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(warm(1000)), 1e-3, rtol=1e-6)

    cos = train_step_lib.learning_rate(
        train_step_lib.TrainConfig(
            learning_rate=1e-3, lr_schedule="cosine",
            lr_warmup_steps=10, lr_total_steps=100,
        )
    )
    assert float(cos(0)) == 0.0
    np.testing.assert_allclose(float(cos(10)), 1e-3, rtol=1e-6)
    assert float(cos(55)) < 1e-3
    assert float(cos(100)) < 1e-5

    # scalar when nothing is configured
    assert train_step_lib.learning_rate(
        train_step_lib.TrainConfig(learning_rate=1e-3)
    ) == 1e-3


def test_dp_sharded_step_matches_single_device():
    """DP over the virtual 8-device mesh must agree with single-device
    (the grad all-reduce is exact for MSE mean loss)."""
    cfgs, tcfg, state, frozen = _setup()
    batch = train_step_lib.dummy_batch(cfgs, batch_size=8)
    rng = jax.random.PRNGKey(1)

    step_fn = train_step_lib.make_train_step(cfgs, tcfg, policy=FP32)

    # single device
    s1, m1 = jax.jit(step_fn)(state, frozen, batch, rng)

    # 8-way DP
    mesh = mesh_lib.make_mesh()
    with mesh:
        state_r = mesh_lib.replicate(mesh, state)
        frozen_r = mesh_lib.replicate(mesh, frozen)
        batch_s = mesh_lib.shard_batch(mesh, batch)
        s8, m8 = jax.jit(step_fn)(state_r, frozen_r, batch_s, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1["trainable"]), jax.tree.leaves(s8["trainable"])):
        if a is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_vpred_training_target():
    """prediction_type="v_prediction" (SD2.x-style, beyond the reference):
    the loss targets sched.velocity_target instead of the noise — a
    different, finite loss whose gradients land on the same trainable
    surface; zero-SNR rescale composes."""
    from imagharmony_tpu.schedulers import diffusion as sched

    cfgs = comp.tiny_configs()
    params = comp.init_params(jax.random.PRNGKey(0), cfgs)
    batch = None
    losses = {}
    for pred in ("epsilon", "v_prediction", "sample"):
        tcfg = train_step_lib.TrainConfig(
            learning_rate=1e-3, gradient_checkpoint=False,
            prediction_type=pred,
            rescale_zero_snr=(pred == "v_prediction"),
        )
        state, frozen = train_step_lib.init_state(params, tcfg)
        if batch is None:
            batch = train_step_lib.dummy_batch(cfgs)
        step_fn = jax.jit(train_step_lib.make_train_step(cfgs, tcfg, policy=FP32))
        rng = jax.random.PRNGKey(7)
        state, metrics = step_fn(state, frozen, batch, rng)
        losses[pred] = float(metrics["loss"])
        assert np.isfinite(losses[pred]), pred
        # the update moved the adapters (grads flow for every target)
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state["trainable"]),
                jax.tree.leaves(train_step_lib.init_state(params, tcfg)[0]["trainable"]),
            )
            if a is not None
        )
        assert moved, pred
    # different parametrization → different loss surface
    assert losses["epsilon"] != losses["v_prediction"] != losses["sample"]
    # forward-process identity: alpha*x_t - sigma_vp*v == x0 on the
    # rescaled schedule too
    acp = sched.alphas_cumprod(
        sched.NoiseScheduleConfig(rescale_betas_zero_snr=True))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    t = jnp.array([999, 400])
    xt = sched.add_noise(acp, x0, eps, t)
    v = sched.velocity_target(acp, x0, eps, t)
    a = jnp.sqrt(jnp.take(jnp.asarray(acp), t)).reshape(-1, 1, 1, 1)
    s = jnp.sqrt(1.0 - jnp.take(jnp.asarray(acp), t)).reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(
        np.asarray(a * xt - s * v), np.asarray(x0), atol=1e-5
    )


def test_min_snr_loss_weighting():
    """--snr_gamma (arXiv 2303.09556, beyond the reference): per-sample MSE
    weighted by min(SNR,γ)/SNR (epsilon) or min(SNR,γ)/(SNR+1) (v_pred).
    gamma above the schedule's max SNR (~1110 for the default betas) makes
    every epsilon weight exactly 1 — the loss must equal the unweighted
    run bit-for-bit; a real gamma (5.0) changes it; v_pred with zero-SNR
    rescale stays finite (weight 0 at SNR 0, not NaN)."""
    cfgs = comp.tiny_configs()
    params = comp.init_params(jax.random.PRNGKey(0), cfgs)
    batch = train_step_lib.dummy_batch(cfgs)
    rng = jax.random.PRNGKey(13)

    def loss_for(**kw):
        tcfg = train_step_lib.TrainConfig(
            learning_rate=1e-3, gradient_checkpoint=False, **kw)
        state, frozen = train_step_lib.init_state(params, tcfg)
        step_fn = jax.jit(train_step_lib.make_train_step(cfgs, tcfg, policy=FP32))
        _, metrics = step_fn(state, frozen, batch, rng)
        return float(metrics["loss"])

    base = loss_for()
    huge = loss_for(snr_gamma=1e9)
    # all weights exactly 1.0 — only the reduction order differs (mean of
    # per-sample means vs one global mean)
    np.testing.assert_allclose(huge, base, rtol=1e-6)
    # weight < 1 needs SNR_t > gamma; a tiny gamma guarantees every sampled
    # timestep is down-weighted (gamma=5.0 only touches t with SNR>5, which
    # a 2-sample draw can easily miss)
    real = loss_for(snr_gamma=1e-3)
    assert np.isfinite(real) and real < 0.5 * base
    vp = loss_for(snr_gamma=5.0, prediction_type="v_prediction",
                  rescale_zero_snr=True)
    assert np.isfinite(vp)
