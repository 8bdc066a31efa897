"""End-to-end checkpoint ingestion: synthesize an HF-style SDXL checkpoint
directory (safetensors + tokenizer files) from a random tiny bundle, load
it through io.checkpoints.load_pipeline, and require bit-identical images
versus the directly-constructed pipeline.

This exercises the entire test.py-equivalent assembly path (reference
test.py:66-104) without needing real SDXL weights.
"""

import json
import os

import numpy as np
import pytest

from imagharmony_tpu.io import checkpoints, hf_import, safetensors_io
from imagharmony_tpu.models import tokenizer as tok_lib
from imagharmony_tpu.pipelines import HarmonyPipeline
from imagharmony_tpu.pipelines import components as comp


@pytest.fixture(scope="module")
def fake_model_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sdxl_ckpt")
    toy = tok_lib.build_toy_tokenizer()
    cfgs = comp.tiny_configs(vocab_size=len(toy.encoder))
    params = comp.init_params(0, cfgs)

    def write(subdir, flat, fname="diffusion_pytorch_model.safetensors"):
        d = root / subdir
        d.mkdir()
        safetensors_io.save(d / fname, flat)

    write("unet", hf_import.export_tree(params["unet"]))
    write("vae", hf_import.export_tree(params["vae"]))
    write(
        "text_encoder",
        hf_import.export_tree(params["text_encoder"], prefix="text_model."),
        "model.safetensors",
    )
    te2 = hf_import.export_tree(params["text_encoder_2"], prefix="text_model.")
    # HF keeps the projection outside the text_model prefix
    te2 = {
        (k.replace("text_model.text_projection", "text_projection")): v
        for k, v in te2.items()
    }
    write("text_encoder_2", te2, "model.safetensors")
    vis = hf_import.export_tree(params["image_encoder"], prefix="vision_model.")
    vis = {
        (k.replace("vision_model.visual_projection", "visual_projection")): v
        for k, v in vis.items()
    }
    write("image_encoder", vis, "model.safetensors")

    # tokenizer dirs (toy vocab)
    for sub in ("tokenizer", "tokenizer_2"):
        d = root / sub
        d.mkdir()
        (d / "vocab.json").write_text(json.dumps(toy.encoder))
        merges = sorted(toy.bpe_ranks, key=toy.bpe_ranks.get)
        (d / "merges.txt").write_text(
            "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n"
        )

    # adapter checkpoint in the 3-dict format
    checkpoints.save_adapter_checkpoint(
        root / "ip_adapter.bin",
        unet_params=params["unet"],
        unet_cfg=cfgs.unet,
        image_proj_params=params["image_proj"],
        harmony_params=params["harmony"],
        harmony_cfg=cfgs.harmony,
    )
    return str(root), cfgs, params, toy


def test_load_pipeline_end_to_end(fake_model_dir):
    root, cfgs, params, toy = fake_model_dir
    pipe = checkpoints.load_pipeline(
        model_dir=root,
        adapter_ckpt=os.path.join(root, "ip_adapter.bin"),
        cfgs=cfgs,
    )
    # direct pipeline with the same params must produce identical pixels
    toks = tok_lib.SDXLTokenizers(
        tok_lib.CLIPTokenizer.from_pretrained_dir(os.path.join(root, "tokenizer")),
        tok_lib.CLIPTokenizer.from_pretrained_dir(
            os.path.join(root, "tokenizer_2"), pad_token="!"
        ),
    )
    # tokenizer files round-trip: same ids as the toy tokenizer
    np.testing.assert_array_equal(
        toks.tok1.encode_batch(["a dog"]), toy.encode_batch(["a dog"])
    )

    direct = HarmonyPipeline(params, cfgs, toks)
    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    kw = dict(prompt="a dog", extra_text="six dogs", num_inference_steps=2,
              height=32, width=32, seed=3, output_type="np")
    a = pipe.generate(pil_image=img, **kw)
    b = direct.generate(pil_image=img, **kw)
    np.testing.assert_array_equal(a, b)


def test_load_pipeline_without_adapter(fake_model_dir):
    root, cfgs, params, toy = fake_model_dir
    pipe = checkpoints.load_pipeline(model_dir=root, cfgs=cfgs)
    img = np.random.default_rng(1).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    out = pipe.generate(pil_image=img, prompt="a dog", num_inference_steps=2,
                        height=32, width=32, seed=1)
    assert out.shape == (1, 32, 32, 3)


@pytest.fixture(scope="module")
def fake_sd15_dir(tmp_path_factory):
    """HF-style SD1.5 + ControlNet checkpoint tree (reference families:
    ip_adapter/ip_adapter.py:69-245 over StableDiffusionPipeline,
    :128-133 ControlNet processor install)."""
    import dataclasses

    from imagharmony_tpu.io import torch_pickle
    from imagharmony_tpu.models import controlnet as cn_lib

    root = tmp_path_factory.mktemp("sd15_ckpt")
    toy = tok_lib.build_toy_tokenizer()
    base = comp.sd15_tiny_configs(vocab_size=len(toy.encoder))
    cfgs = dataclasses.replace(
        base,
        controlnet=cn_lib.ControlNetConfig(
            base=base.unet, conditioning_embedding_channels=(8, 16)
        ),
    )
    params = comp.init_params(0, cfgs)

    (root / "model_index.json").write_text(
        json.dumps({"_class_name": "StableDiffusionPipeline"})
    )

    def write(subdir, flat, fname="diffusion_pytorch_model.safetensors"):
        d = root / subdir
        d.mkdir()
        safetensors_io.save(d / fname, flat)

    write("unet", hf_import.export_tree(params["unet"]))
    write("vae", hf_import.export_tree(params["vae"]))
    write(
        "text_encoder",
        hf_import.export_tree(params["text_encoder"], prefix="text_model."),
        "model.safetensors",
    )
    vis = hf_import.export_tree(params["image_encoder"], prefix="vision_model.")
    vis = {
        (k.replace("vision_model.visual_projection", "visual_projection")): v
        for k, v in vis.items()
    }
    write("image_encoder", vis, "model.safetensors")
    # ControlNet as its own model dir with a diffusers-style config.json
    write("controlnet", hf_import.export_tree(params["controlnet"]))
    (root / "controlnet" / "config.json").write_text(
        json.dumps(
            {
                "_class_name": "ControlNetModel",
                "conditioning_embedding_out_channels": [8, 16],
                "conditioning_channels": 3,
            }
        )
    )

    d = root / "tokenizer"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(toy.encoder))
    merges = sorted(toy.bpe_ranks, key=toy.bpe_ranks.get)
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n"
    )

    # SD1.5 adapter checkpoints carry no composed_adapter (no HA head)
    torch_pickle.save(
        str(root / "ip_adapter.bin"),
        {
            "image_proj": hf_import.export_tree(params["image_proj"]),
            "ip_adapter": checkpoints.extract_adapter_state(params["unet"], cfgs.unet),
        },
    )
    return str(root), cfgs, params, toy


def test_detect_family(fake_model_dir, fake_sd15_dir):
    sdxl_root = fake_model_dir[0]
    sd15_root = fake_sd15_dir[0]
    # SDXL dir has no model_index.json in the fixture -> structural fallback
    assert checkpoints.detect_family(sdxl_root) == "sdxl"
    # SD1.5 dir declares _class_name
    assert checkpoints.detect_family(sd15_root) == "sd15"


def test_load_pipeline_sd15_controlnet(fake_sd15_dir):
    import dataclasses

    root, cfgs, params, toy = fake_sd15_dir
    base_cfgs = dataclasses.replace(cfgs, controlnet=None)
    pipe = checkpoints.load_pipeline(
        model_dir=root,
        adapter_ckpt=os.path.join(root, "ip_adapter.bin"),
        controlnet_dir=os.path.join(root, "controlnet"),
        cfgs=base_cfgs,
    )
    # controlnet config was reconstructed from the dir's config.json
    assert pipe.cfgs.controlnet is not None
    assert pipe.cfgs.controlnet.conditioning_embedding_channels == (8, 16)

    toks = tok_lib.SDXLTokenizers(toy, toy)
    direct = HarmonyPipeline(params, cfgs, toks)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    cond = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    kw = dict(prompt="a dog", num_inference_steps=2, height=32, width=32,
              seed=11, output_type="np", control_image=cond)
    a = pipe.generate(pil_image=img, **kw)
    b = direct.generate(pil_image=img, **kw)
    np.testing.assert_array_equal(a, b)


def test_load_pipeline_sharded_index(fake_model_dir, tmp_path):
    """Index-sharded model dirs (HF's model.safetensors.index.json layout,
    written for models above the per-file shard size) load identically to
    single-file dirs — keys split across shards, resolved via weight_map."""
    import shutil

    root, cfgs, params, toy = fake_model_dir
    sharded = tmp_path / "sdxl_sharded"
    shutil.copytree(root, sharded)

    # re-write the unet as two shards + index, in HF's exact format
    unet_dir = sharded / "unet"
    flat = checkpoints.load_flat(unet_dir / "diffusion_pytorch_model.safetensors")
    (unet_dir / "diffusion_pytorch_model.safetensors").unlink()
    keys = sorted(flat)
    half = len(keys) // 2
    names = ["diffusion_pytorch_model-00001-of-00002.safetensors",
             "diffusion_pytorch_model-00002-of-00002.safetensors"]
    safetensors_io.save(unet_dir / names[0], {k: flat[k] for k in keys[:half]})
    safetensors_io.save(unet_dir / names[1], {k: flat[k] for k in keys[half:]})
    weight_map = {k: names[0] for k in keys[:half]}
    weight_map.update({k: names[1] for k in keys[half:]})
    (unet_dir / "diffusion_pytorch_model.safetensors.index.json").write_text(
        json.dumps({"metadata": {"total_size": 0}, "weight_map": weight_map})
    )

    reloaded = checkpoints.load_sharded_dir(unet_dir)
    assert sorted(reloaded) == keys
    for k in keys:
        np.testing.assert_array_equal(reloaded[k], flat[k])

    pipe = checkpoints.load_pipeline(
        model_dir=str(sharded),
        adapter_ckpt=os.path.join(str(sharded), "ip_adapter.bin"),
        cfgs=cfgs,
    )
    unsharded = checkpoints.load_pipeline(
        model_dir=root,
        adapter_ckpt=os.path.join(root, "ip_adapter.bin"),
        cfgs=cfgs,
    )
    img = np.random.default_rng(2).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    kw = dict(prompt="a dog", extra_text="six dogs", num_inference_steps=2,
              height=32, width=32, seed=3, output_type="np")
    a = pipe.generate(pil_image=img, **kw)
    b = unsharded.generate(pil_image=img, **kw)
    np.testing.assert_array_equal(a, b)


def test_load_pipeline_missing_dir():
    with pytest.raises(Exception):
        checkpoints.load_pipeline(model_dir="/nonexistent/path")
    with pytest.raises(ValueError):
        checkpoints.load_pipeline(model_dir=None)
