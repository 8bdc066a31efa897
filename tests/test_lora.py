"""LoRA adaptation of the frozen UNet (adapters/lora.py) — beyond the
reference, whose training surface is exactly the IP projections + HA
(reference train.py:600-601)."""

import os

import jax
import numpy as np
import pytest

from imagharmony_tpu import dtypes
from imagharmony_tpu.adapters import lora as lora_lib
from imagharmony_tpu.pipelines import HarmonyPipeline, components as comp
from imagharmony_tpu.train import step as step_lib

FP32 = dtypes.FP32


@pytest.fixture(scope="module")
def cfgs():
    return comp.tiny_configs()


@pytest.fixture(scope="module")
def params(cfgs):
    return comp.init_params(jax.random.PRNGKey(0), cfgs)


def test_init_structure_and_zero_identity(cfgs, params):
    """B=0 init: apply_lora must return the base weights bit-exactly, and
    factors exist exactly at the targeted attention projections."""
    cfg = lora_lib.LoRAConfig(rank=4)
    tree = lora_lib.init_lora(0, params["unet"], cfg)
    flat = lora_lib.flatten(tree)
    assert flat, "no factors created"
    for k in flat:
        assert k.endswith(("lora_a", "lora_b"))
        parts = k.split(".")  # ... attnX.to_q.weight.lora_a
        assert parts[-2] == "weight"
        assert parts[-3] in cfg.targets
        assert parts[-4] in ("attn1", "attn2")
    # every factored position pairs a/b with matching inner rank
    a_keys = {k[:-7] for k in flat if k.endswith(".lora_a")}
    b_keys = {k[:-7] for k in flat if k.endswith(".lora_b")}
    assert a_keys == b_keys
    for k in a_keys:
        assert flat[k + ".lora_a"].shape[1] == 4
        assert flat[k + ".lora_b"].shape[0] == 4
        assert np.all(flat[k + ".lora_b"] == 0)

    merged = lora_lib.apply_lora(params["unet"], tree, cfg)
    for x, y in zip(jax.tree.leaves(params["unet"]), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_apply_lora_changes_only_targets(cfgs, params):
    cfg = lora_lib.LoRAConfig(rank=2, targets=("to_q",), attn=("attn1",))
    tree = lora_lib.init_lora(1, params["unet"], cfg)
    # make the deltas nonzero
    tree = jax.tree.map(lambda x: x + 0.1, tree)
    merged = lora_lib.apply_lora(params["unet"], tree, cfg)

    def walk(node, ref, path=()):
        if isinstance(node, dict):
            for k in node:
                walk(node[k], ref[k], path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, ref[i], path + (str(i),))
        elif node is not None:
            changed = not np.array_equal(np.asarray(node), np.asarray(ref))
            is_target = lora_lib._is_target(path, cfg)
            assert changed == is_target, path

    walk(merged, params["unet"])


def test_flatten_roundtrip_and_file(tmp_path, cfgs, params):
    cfg = lora_lib.LoRAConfig(rank=4, alpha=8.0, targets=("to_q", "to_out"))
    tree = lora_lib.init_lora(3, params["unet"], cfg)
    rebuilt = lora_lib.unflatten(lora_lib.flatten(tree))
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    path = os.path.join(tmp_path, "lora.safetensors")
    lora_lib.save_lora(path, tree, cfg)
    loaded, lcfg = lora_lib.load_lora(path)
    assert lcfg == cfg
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_with_lora(cfgs, params):
    """One jitted step: loss finite, LoRA B factors move off zero (their
    grad is dLoss/dW @ A — nonzero), base UNet weights in `frozen` stay
    untouched, and the non-LoRA step is unaffected by the extra key."""
    tcfg = step_lib.TrainConfig(
        learning_rate=1e-3, gradient_checkpoint=False, lora_rank=4
    )
    state, frozen = step_lib.init_state(params, tcfg, seed=7)
    assert "lora" in state["trainable"]
    n_lora = lora_lib.num_params(state["trainable"]["lora"])
    assert n_lora > 0

    batch = step_lib.dummy_batch(cfgs, batch_size=2)
    step_fn = jax.jit(step_lib.make_train_step(cfgs, tcfg, policy=FP32))
    new_state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))

    moved = 0
    for k, v in lora_lib.flatten(
        jax.tree.map(np.asarray, new_state["trainable"]["lora"])
    ).items():
        if k.endswith(".lora_b") and np.abs(v).max() > 0:
            moved += 1
    assert moved > 0, "no LoRA B factor received gradient"


def test_lora_step_equals_plain_when_scale_zero(cfgs, params):
    """alpha=0 → the LoRA fold-in is the identity, so loss equals the
    plain adapter step's loss with identical rng/batch."""
    batch = step_lib.dummy_batch(cfgs, batch_size=2)
    rng = jax.random.PRNGKey(4)

    plain = step_lib.TrainConfig(learning_rate=1e-3, gradient_checkpoint=False)
    s0, f0 = step_lib.init_state(params, plain)
    l_plain = float(step_lib.loss_fn(s0["trainable"], f0, cfgs, plain, batch, rng, policy=FP32))

    zl = step_lib.TrainConfig(
        learning_rate=1e-3, gradient_checkpoint=False, lora_rank=4, lora_alpha=0.0
    )
    s1, f1 = step_lib.init_state(params, zl, seed=7)
    l_zero = float(step_lib.loss_fn(s1["trainable"], f1, cfgs, zl, batch, rng, policy=FP32))
    np.testing.assert_allclose(l_plain, l_zero, rtol=1e-6)


def test_pipeline_with_lora(tmp_path):
    """Zero-init LoRA leaves generation bit-identical; a perturbed one
    changes it; scale=0 restores the base output."""
    pipe = HarmonyPipeline.random_tiny(seed=0)
    cfg = lora_lib.LoRAConfig(rank=2)
    tree = lora_lib.init_lora(0, jax.tree.map(np.asarray, pipe.params["unet"]), cfg)
    path = os.path.join(tmp_path, "lora.safetensors")
    lora_lib.save_lora(path, tree, cfg)

    kw = dict(pil_image=np.zeros((32, 32, 3), np.uint8), prompt="a dog",
              num_inference_steps=2, height=32, width=32, seed=1)
    base = pipe.generate(**kw)
    same = pipe.with_lora(path).generate(**kw)
    np.testing.assert_array_equal(base, same)

    bumped = lora_lib.unflatten(
        {k: v + 0.05 for k, v in lora_lib.flatten(tree).items()}
    )
    differs = pipe.with_lora(bumped, lora_cfg=cfg).generate(**kw)
    assert np.abs(differs.astype(int) - base.astype(int)).max() > 0

    back = pipe.with_lora(bumped, lora_cfg=cfg, scale=0.0).generate(**kw)
    np.testing.assert_array_equal(base, back)


def test_with_lora_composes_with_mesh():
    """with_mesh → with_lora must re-establish the mesh placement (the
    merge makes new arrays) and equal the lora → mesh order."""
    from imagharmony_tpu.parallel import mesh as mesh_lib

    pipe = HarmonyPipeline.random_tiny(seed=0)
    cfg = lora_lib.LoRAConfig(rank=2)
    tree = lora_lib.init_lora(0, jax.tree.map(np.asarray, pipe.params["unet"]), cfg)
    bumped = lora_lib.unflatten(
        {k: v + 0.05 for k, v in lora_lib.flatten(tree).items()}
    )
    mesh = mesh_lib.make_mesh()
    kw = dict(pil_image=np.zeros((32, 32, 3), np.uint8), prompt="a dog",
              num_samples=2, num_inference_steps=2, height=32, width=32, seed=1)
    a = pipe.with_mesh(mesh).with_lora(bumped, lora_cfg=cfg).generate(**kw)
    b = pipe.with_lora(bumped, lora_cfg=cfg).with_mesh(mesh).generate(**kw)
    np.testing.assert_array_equal(a, b)


def test_multi_lora_composition(tmp_path, cfgs, params):
    """Chained with_lora merges are additive and order-independent:
    W + s1·ΔW1 + s2·ΔW2 — the multi-LoRA serving path (repeatable --lora
    PATH[:SCALE]). parse_spec handles the optional :SCALE suffix."""
    unet_np = jax.tree.map(np.asarray, params["unet"])
    cfg = lora_lib.LoRAConfig(rank=2)
    t1 = lora_lib.unflatten({
        k: v + 0.03 for k, v in lora_lib.flatten(
            lora_lib.init_lora(0, unet_np, cfg)).items()
    })
    t2 = lora_lib.unflatten({
        k: v - 0.02 for k, v in lora_lib.flatten(
            lora_lib.init_lora(1, unet_np, cfg)).items()
    })

    both = lora_lib.apply_lora(
        lora_lib.apply_lora(params["unet"], t1, cfg, scale=0.7),
        t2, cfg, scale=0.3,
    )
    swapped = lora_lib.apply_lora(
        lora_lib.apply_lora(params["unet"], t2, cfg, scale=0.3),
        t1, cfg, scale=0.7,
    )
    for (ka, va), (kb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(both), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(swapped), key=str),
    ):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-5, atol=1e-6)

    # pipeline chaining == the composed merge
    pipe = HarmonyPipeline.random_tiny(seed=0)
    tree1 = lora_lib.unflatten({
        k: v + 0.05 for k, v in lora_lib.flatten(
            lora_lib.init_lora(0, jax.tree.map(np.asarray, pipe.params["unet"]),
                               cfg)).items()
    })
    tree2 = lora_lib.unflatten({
        k: v - 0.04 for k, v in lora_lib.flatten(
            lora_lib.init_lora(1, jax.tree.map(np.asarray, pipe.params["unet"]),
                               cfg)).items()
    })
    kw = dict(pil_image=np.zeros((32, 32, 3), np.uint8), prompt="a dog",
              num_inference_steps=2, height=32, width=32, seed=1)
    chained = (pipe.with_lora(tree1, lora_cfg=cfg, scale=0.7)
                   .with_lora(tree2, lora_cfg=cfg, scale=0.3))
    out = chained.generate(**kw)
    base = pipe.generate(**kw)
    assert np.abs(out.astype(int) - base.astype(int)).max() > 0
    # scale 0 on both restores the base exactly
    ident = (pipe.with_lora(tree1, lora_cfg=cfg, scale=0.0)
                 .with_lora(tree2, lora_cfg=cfg, scale=0.0)).generate(**kw)
    np.testing.assert_array_equal(base, ident)


def test_parse_spec(tmp_path):
    assert lora_lib.parse_spec("a.safetensors", 1.0) == ("a.safetensors", 1.0)
    assert lora_lib.parse_spec("a.safetensors:0.5", 1.0) == ("a.safetensors", 0.5)
    assert lora_lib.parse_spec("a:b.safetensors", 0.7) == ("a:b.safetensors", 0.7)
    # an existing file whose name contains a colon wins over the suffix read
    p = os.path.join(tmp_path, "w:2.safetensors")
    open(p, "wb").close()
    assert lora_lib.parse_spec(p, 1.0) == (p, 1.0)


def test_load_community_lora_kohya_and_peft(tmp_path):
    """Ecosystem UNet LoRA files load through with_lora: kohya
    (lora_unet_*.lora_down/up + per-module alpha) and diffusers-peft
    (unet.*.lora_A/B) names map onto our factor tree; per-module
    alpha/rank fold into lora_b; non-attention modules skip loudly."""
    from imagharmony_tpu.io import safetensors_io

    pipe = HarmonyPipeline.random_tiny(seed=0)
    unet = pipe.params["unet"]
    w_q = np.asarray(
        unet["down_blocks"][2]["attentions"][1]["transformer_blocks"][0][
            "attn2"]["to_q"]["weight"]
    )
    w_mid = np.asarray(
        unet["mid_block"]["attentions"][0]["transformer_blocks"][0][
            "attn1"]["to_out"]["weight"]
    )
    rng = np.random.default_rng(0)
    r = 4
    down_q = rng.standard_normal((r, w_q.shape[0])).astype(np.float32)
    up_q = rng.standard_normal((w_q.shape[1], r)).astype(np.float32)
    down_m = rng.standard_normal((2, w_mid.shape[0])).astype(np.float32)  # rank 2
    up_m = rng.standard_normal((w_mid.shape[1], 2)).astype(np.float32)
    kohya = {
        "lora_unet_down_blocks_2_attentions_1_transformer_blocks_0_attn2_to_q"
        ".lora_down.weight": down_q,
        "lora_unet_down_blocks_2_attentions_1_transformer_blocks_0_attn2_to_q"
        ".lora_up.weight": up_q,
        "lora_unet_down_blocks_2_attentions_1_transformer_blocks_0_attn2_to_q"
        ".alpha": np.asarray(2.0, np.float32),
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn1_to_out_0"
        ".lora_down.weight": down_m,
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn1_to_out_0"
        ".lora_up.weight": up_m,
        # outside our surface: text encoder + a ff module -> skipped loudly
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_down.weight": down_q,
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_up.weight": up_q,
        "lora_unet_down_blocks_2_attentions_1_transformer_blocks_0_ff_net_0_proj"
        ".lora_down.weight": down_q,
        "lora_unet_down_blocks_2_attentions_1_transformer_blocks_0_ff_net_0_proj"
        ".lora_up.weight": up_q,
    }
    path = os.path.join(tmp_path, "kohya.safetensors")
    safetensors_io.save(path, kohya)

    tree, cfg = lora_lib.load_lora(path)
    assert cfg.scale == 1.0
    merged = lora_lib.apply_lora(pipe.params["unet"], tree, cfg)
    got_q = np.asarray(
        merged["down_blocks"][2]["attentions"][1]["transformer_blocks"][0][
            "attn2"]["to_q"]["weight"]
    )
    # torch semantics: W' = W + (alpha/r) * up @ down, ours transposed
    want_q = w_q + (2.0 / r) * (up_q @ down_q).T
    np.testing.assert_allclose(got_q, want_q, rtol=1e-5, atol=1e-5)
    got_m = np.asarray(
        merged["mid_block"]["attentions"][0]["transformer_blocks"][0][
            "attn1"]["to_out"]["weight"]
    )
    want_m = w_mid + (2.0 / 2.0) * (up_m @ down_m).T  # alpha defaults to r
    np.testing.assert_allclose(got_m, want_m, rtol=1e-5, atol=1e-5)

    # the full pipeline path accepts the file
    out = pipe.with_lora(path).generate(
        pil_image=np.zeros((32, 32, 3), np.uint8), prompt="a dog",
        num_inference_steps=2, height=32, width=32, seed=1)
    base = pipe.generate(
        pil_image=np.zeros((32, 32, 3), np.uint8), prompt="a dog",
        num_inference_steps=2, height=32, width=32, seed=1)
    assert np.abs(out.astype(int) - base.astype(int)).max() > 0

    # peft naming maps to the identical tree (alpha = rank -> scale 1)
    peft = {
        "unet.down_blocks.2.attentions.1.transformer_blocks.0.attn2.to_q"
        ".lora_A.weight": down_q,
        "unet.down_blocks.2.attentions.1.transformer_blocks.0.attn2.to_q"
        ".lora_B.weight": up_q,
        "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_out.0"
        ".lora_A.weight": down_m,
        "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_out.0"
        ".lora_B.weight": up_m,
    }
    tree2, cfg2 = lora_lib.load_community_lora(peft)
    merged2 = lora_lib.apply_lora(pipe.params["unet"], tree2, cfg2)
    got2 = np.asarray(
        merged2["down_blocks"][2]["attentions"][1]["transformer_blocks"][0][
            "attn2"]["to_q"]["weight"]
    )
    np.testing.assert_allclose(
        got2, w_q + (up_q @ down_q).T, rtol=1e-5, atol=1e-5
    )

    # nothing mappable -> loud error
    import pytest
    with pytest.raises(ValueError, match="no UNet attention"):
        lora_lib.load_community_lora({
            "lora_te1_text_model_encoder_layers_0_self_attn_q_proj"
            ".lora_down.weight": down_q,
            "lora_te1_text_model_encoder_layers_0_self_attn_q_proj"
            ".lora_up.weight": up_q,
        })
