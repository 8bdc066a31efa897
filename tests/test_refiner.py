"""SDXL-refiner family (beyond the reference, which drives the base model
only — but its custom pipeline implements exactly the mixture-of-denoisers
handoff the refiner consumes, reference custom_pipelines.py:308-316):
single bigG text tower, aesthetic-score micro-conditioning, no image
prompt. The base→refiner ensemble runs through the existing
denoising_end → (latents=, denoising_start=) plumbing."""

import json
import os

import jax
import numpy as np
import pytest

from imagharmony_tpu.models import unet as unet_lib
from imagharmony_tpu.models import vae as vae_lib
from imagharmony_tpu.models import clip_text
from imagharmony_tpu.pipelines import HarmonyPipeline
from imagharmony_tpu.pipelines import components as comp


@pytest.fixture(scope="module")
def refiner():
    return HarmonyPipeline.random_tiny_refiner(seed=0)


@pytest.fixture(scope="module")
def base():
    return HarmonyPipeline.random_tiny(seed=0)


def test_refiner_unet_forward(refiner):
    """Topology: 4 stages, cross-attn on the middle two only, 5-float
    aesthetic time-ids through the text_time embedding."""
    import jax.numpy as jnp

    cfg = refiner.cfgs.unet
    assert cfg.down_block_types[0] == "DownBlock2D"
    assert cfg.down_block_types[-1] == "DownBlock2D"
    assert cfg.ip_layers == ()
    assert not cfg.is_ip_active("down_blocks.2.attentions.1")
    p = refiner.params["unet"]
    # blocks 0 and 3 carry no attentions; 1 and 2 do
    assert p["down_blocks"][0]["attentions"] == []
    assert p["down_blocks"][3]["attentions"] == []
    assert len(p["down_blocks"][1]["attentions"]) == 2

    x = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    pooled = jnp.zeros((2, refiner.cfgs.text_g.projection_dim))
    tids = jnp.zeros((2, 5))
    out = unet_lib.apply(
        p, cfg, x, jnp.array([1.0, 2.0]), ctx,
        pooled_text_embeds=pooled, time_ids=tids,
    )
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_refiner_generate_img2img(refiner):
    """Plain refiner img2img (diffusers XLImg2ImgPipeline role): no
    pil_image, text + init_image only; aesthetic scores condition the run."""
    init = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    kw = dict(prompt="a dog", num_inference_steps=3, height=32, width=32,
              seed=5, output_type="np", init_image=init, strength=0.8)
    a = refiner.generate(**kw)
    assert a.shape == (1, 32, 32, 3)
    again = refiner.generate(**kw)
    np.testing.assert_array_equal(a, again)
    # aesthetic score is real conditioning: changing it changes the output
    b = refiner.generate(aesthetic_score=2.0, negative_aesthetic_score=5.0, **kw)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0

    # an image prompt is rejected with a clear message
    with pytest.raises(ValueError, match="no image encoder"):
        refiner.generate(pil_image=init, prompt="a dog",
                         num_inference_steps=2, height=32, width=32)


def test_base_refiner_ensemble(base, refiner):
    """The SDXL ensemble-of-denoisers: base runs [0, denoising_end), hands
    latents to the refiner which runs [denoising_start, 1]. Same scheduler
    kind on both sides (latent scale contract)."""
    img = np.random.default_rng(1).integers(0, 255, (40, 40, 3), np.uint8)
    lat = base.generate(
        pil_image=img, prompt="a dog", extra_text="six dogs",
        num_inference_steps=4, height=32, width=32, seed=3,
        denoising_end=0.5,
    )
    assert lat.shape[-1] == 4  # pre-VAE latents
    out = refiner.generate(
        prompt="a dog", latents=np.asarray(lat), denoising_start=0.5,
        num_inference_steps=4, height=32, width=32, seed=3,
        output_type="np",
    )
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out.astype(np.float32)).all()


def test_refiner_generate_batch(refiner):
    out = refiner.generate_batch(
        None, ["a dog", "a cat"], seeds=[1, 2],
        height=32, width=32, num_inference_steps=2, output_type="np",
    )
    assert out.shape[0] == 2


def test_config_from_diffusers_unet():
    """The diffusers config.json → UNetConfig mapping, incl. the
    attention_head_dim-as-heads quirk and refiner-style aesthetic
    conditioning dims; unsupported architecture options raise."""
    d = {
        "sample_size": 128,
        "in_channels": 4,
        "out_channels": 4,
        "block_out_channels": [384, 768, 1536, 1536],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D",
                           "CrossAttnUpBlock2D", "UpBlock2D"],
        "layers_per_block": 2,
        "transformer_layers_per_block": 4,
        "attention_head_dim": [6, 12, 24, 24],  # heads (diffusers quirk)
        "cross_attention_dim": 1280,
        "addition_embed_type": "text_time",
        "addition_time_embed_dim": 256,
        "projection_class_embeddings_input_dim": 2560,
    }
    cfg = unet_lib.config_from_diffusers(d, ip_layers=())
    assert cfg.block_out_channels == (384, 768, 1536, 1536)
    assert cfg.transformer_layers_per_block == (4, 4, 4, 4)
    assert cfg.num_attention_heads == (6, 12, 24, 24)
    assert cfg.attention_head_dim is None
    assert cfg.head_dim_for(0) == 64
    assert cfg.projection_class_embeddings_input_dim == 2560

    # SDXL-base style: attention_head_dim list is the head count
    base = unet_lib.config_from_diffusers({
        "block_out_channels": [320, 640, 1280],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D"],
        "up_block_types": ["CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                           "UpBlock2D"],
        "transformer_layers_per_block": [1, 2, 10],
        "attention_head_dim": [5, 10, 20],
        "cross_attention_dim": 2048,
        "addition_embed_type": "text_time",
        "projection_class_embeddings_input_dim": 2816,
    })
    assert base.num_attention_heads == (5, 10, 20)
    assert base.head_dim_for(2) == 64

    # SD1.5 style: scalar attention_head_dim=8 means 8 heads per block
    sd15 = unet_lib.config_from_diffusers({
        "block_out_channels": [320, 640, 1280, 1280],
        "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        "up_block_types": ["UpBlock2D"] + ["CrossAttnUpBlock2D"] * 3,
        "attention_head_dim": 8,
        "cross_attention_dim": 768,
    })
    assert sd15.num_attention_heads == (8, 8, 8, 8)
    assert sd15.head_dim_for(2) == 160
    assert sd15.addition_embed_type is None

    with pytest.raises(ValueError, match="class_embed_type"):
        unet_lib.config_from_diffusers({**d, "class_embed_type": "projection"})
    with pytest.raises(ValueError, match="down_block_types"):
        unet_lib.config_from_diffusers(
            {**d, "down_block_types": ["AttnDownBlock2D"] * 4}
        )
    with pytest.raises(ValueError, match="num_attention_heads length"):
        unet_lib.config_from_diffusers({**d, "num_attention_heads": [1, 2]})


def test_config_from_diffusers_vae_and_text():
    v = vae_lib.config_from_diffusers({
        "block_out_channels": [128, 256, 512, 512],
        "scaling_factor": 0.18215,
        "latent_channels": 4,
    })
    assert v.scaling_factor == pytest.approx(0.18215)
    assert v.downscale == 8

    t = clip_text.config_from_transformers({
        "vocab_size": 49408,
        "hidden_size": 1280,
        "num_hidden_layers": 32,
        "num_attention_heads": 20,
        "intermediate_size": 5120,
        "hidden_act": "gelu",
        "projection_dim": 1280,
        "architectures": ["CLIPTextModelWithProjection"],
    })
    assert t.num_layers == 32 and t.projection_dim == 1280
    # no WithProjection architecture → projection head off
    t2 = clip_text.config_from_transformers({
        "hidden_size": 768, "projection_dim": 768,
        "architectures": ["CLIPTextModel"],
    })
    assert t2.projection_dim is None


def test_seed_ip_weights():
    """A plain diffusers UNet tree (no to_k_ip/to_v_ip) imports by seeding
    the IP projections from the layer's own to_k/to_v — the reference's
    initialization (train.py:553-560). Present keys are never overwritten."""
    from imagharmony_tpu.io import checkpoints, hf_import

    cfgs = comp.tiny_configs()
    params = comp.init_params(0, cfgs)
    flat = hf_import.export_tree(params["unet"])
    stripped = {k: v for k, v in flat.items() if "_ip." not in k}
    assert len(stripped) < len(flat)  # the tree does carry IP keys

    seeded = checkpoints.seed_ip_weights(stripped)
    tree = hf_import.import_tree(
        jax.eval_shape(lambda: params["unet"]), seeded
    )
    # every seeded IP projection equals the layer's own projection
    k_ip = tree["down_blocks"][2]["attentions"][1]["transformer_blocks"][0][
        "attn2"]["to_k_ip"]["weight"]
    k_txt = tree["down_blocks"][2]["attentions"][1]["transformer_blocks"][0][
        "attn2"]["to_k"]["weight"]
    np.testing.assert_array_equal(np.asarray(k_ip), np.asarray(k_txt))
    # a tree that already carries IP keys is untouched
    kept = checkpoints.seed_ip_weights(flat)
    assert kept.keys() == flat.keys()
    key = next(k for k in flat if k.endswith("to_k_ip.weight"))
    np.testing.assert_array_equal(kept[key], flat[key])


def test_load_refiner_pipeline_dir(tmp_path):
    """A synthesized refiner checkpoint directory (model_index class
    XLImg2Img, tokenizer_2/text_encoder_2 only, per-submodel config.json
    with non-default dims) auto-detects as sdxl_refiner, builds its
    configs FROM the config.json files, and generates — the full
    load_pipeline assembly for the second SDXL family."""
    from imagharmony_tpu.io import checkpoints, hf_import, safetensors_io
    from imagharmony_tpu.models import tokenizer as tok_lib

    root = tmp_path / "refiner_ckpt"
    root.mkdir()
    toy = tok_lib.build_toy_tokenizer()
    cfgs = comp.sdxl_refiner_tiny_configs(vocab_size=len(toy.encoder))
    params = comp.init_params(0, cfgs)

    def write(subdir, flat, fname="diffusion_pytorch_model.safetensors"):
        d = root / subdir
        d.mkdir()
        safetensors_io.save(d / fname, flat)
        return d

    u = cfgs.unet
    ud = write("unet", hf_import.export_tree(params["unet"]))
    (ud / "config.json").write_text(json.dumps({
        "sample_size": u.sample_size,
        "block_out_channels": list(u.block_out_channels),
        "down_block_types": list(u.down_block_types),
        "up_block_types": list(u.up_block_types),
        "layers_per_block": u.layers_per_block,
        "transformer_layers_per_block": list(u.transformer_layers_per_block),
        "num_attention_heads": list(u.num_attention_heads),
        "attention_head_dim": u.attention_head_dim,
        "cross_attention_dim": u.cross_attention_dim,
        "norm_num_groups": u.norm_num_groups,
        "addition_embed_type": "text_time",
        "addition_time_embed_dim": u.addition_time_embed_dim,
        "projection_class_embeddings_input_dim":
            u.projection_class_embeddings_input_dim,
    }))
    v = cfgs.vae
    vd = write("vae", hf_import.export_tree(params["vae"]))
    (vd / "config.json").write_text(json.dumps({
        "block_out_channels": list(v.block_out_channels),
        "layers_per_block": v.layers_per_block,
        "norm_num_groups": v.norm_num_groups,
        "scaling_factor": v.scaling_factor,
        "latent_channels": v.latent_channels,
    }))
    te2 = hf_import.export_tree(params["text_encoder_2"], prefix="text_model.")
    te2 = {
        k.replace("text_model.text_projection", "text_projection"): val
        for k, val in te2.items()
    }
    td = write("text_encoder_2", te2, "model.safetensors")
    t = cfgs.text_g
    (td / "config.json").write_text(json.dumps({
        "vocab_size": t.vocab_size,
        "hidden_size": t.hidden_size,
        "num_hidden_layers": t.num_layers,
        "num_attention_heads": t.num_heads,
        "intermediate_size": t.intermediate_size,
        "max_position_embeddings": t.max_position_embeddings,
        "hidden_act": t.hidden_act,
        "projection_dim": t.projection_dim,
        "eos_token_id": t.eos_token_id,
        "architectures": ["CLIPTextModelWithProjection"],
    }))
    tok_dir = root / "tokenizer_2"
    tok_dir.mkdir()
    (tok_dir / "vocab.json").write_text(json.dumps(toy.encoder))
    merges = sorted(toy.bpe_ranks, key=toy.bpe_ranks.get)
    (tok_dir / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n"
    )
    (root / "model_index.json").write_text(json.dumps({
        "_class_name": "StableDiffusionXLImg2ImgPipeline",
        "requires_aesthetics_score": True,
    }))

    assert checkpoints.detect_family(str(root)) == "sdxl_refiner"
    pipe = checkpoints.load_pipeline(model_dir=str(root))
    assert pipe.cfgs.family == "sdxl_refiner"
    assert pipe.cfgs.unet.block_out_channels == u.block_out_channels
    assert pipe.cfgs.vae.scaling_factor == pytest.approx(v.scaling_factor)

    init = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    out = pipe.generate(prompt="a dog", init_image=init, strength=0.5,
                        num_inference_steps=2, height=32, width=32, seed=1,
                        output_type="np")
    assert out.shape == (1, 32, 32, 3)

    # identical to the directly-constructed pipeline (same params)
    direct = HarmonyPipeline(
        params, cfgs,
        tok_lib.SDXLTokenizers(
            tok_lib.CLIPTokenizer.from_pretrained_dir(str(tok_dir), pad_token="!"),
            tok_lib.CLIPTokenizer.from_pretrained_dir(str(tok_dir), pad_token="!"),
        ),
    )
    np.testing.assert_array_equal(
        out,
        direct.generate(prompt="a dog", init_image=init, strength=0.5,
                        num_inference_steps=2, height=32, width=32, seed=1,
                        output_type="np"),
    )

    # adapter checkpoints don't apply to the refiner
    with pytest.raises(ValueError, match="refiner"):
        checkpoints.load_pipeline(model_dir=str(root), adapter_ckpt="x.bin")
