"""Adapter checkpoint format: enumeration order, round trips, conversion."""

import jax
import numpy as np

from imagharmony_tpu.adapters import harmony as harmony_lib
from imagharmony_tpu.io import checkpoints, torch_pickle
from imagharmony_tpu.models import unet
from imagharmony_tpu.pipelines import components as comp


def test_attn_processor_enumeration_sdxl_counts():
    """SDXL: 140 processors total (attn1+attn2), 70 carrying IP weights —
    the reference wraps exactly these in its ModuleList (train.py:569)."""
    rows = checkpoints.attn_processor_paths(unet.UNetConfig())
    assert len(rows) == 140
    ip_rows = [r for r in rows if r[1] is not None]
    assert len(ip_rows) == 70
    # order: down_blocks, then up_blocks, then mid_block
    names = [n for n, _ in rows]
    first_up = names.index(next(n for n in names if n.startswith("up_blocks")))
    first_mid = names.index(next(n for n in names if n.startswith("mid_block")))
    assert all(n.startswith("down_blocks") for n in names[:first_up])
    assert all(n.startswith("up_blocks") for n in names[first_up:first_mid])
    assert all(n.startswith("mid_block") for n in names[first_mid:])


def test_adapter_state_roundtrip():
    cfg = unet.tiny_config()
    params = unet.init(jax.random.PRNGKey(0), cfg)
    flat = checkpoints.extract_adapter_state(params, cfg)
    assert all(k.endswith((".to_k_ip.weight", ".to_v_ip.weight")) for k in flat)

    # perturb and re-apply: target tree must carry the new values
    flat2 = {k: v + 1.0 for k, v in flat.items()}
    params2 = checkpoints.apply_adapter_state(params, cfg, flat2)
    flat3 = checkpoints.extract_adapter_state(params2, cfg)
    for k in flat:
        np.testing.assert_allclose(flat3[k], flat[k] + 1.0, rtol=1e-6)
    # non-adapter weights untouched
    np.testing.assert_array_equal(
        np.asarray(params2["conv_in"]["weight"]), np.asarray(params["conv_in"]["weight"])
    )


def _bundle():
    cfgs = comp.tiny_configs()
    params = comp.init_params(jax.random.PRNGKey(0), cfgs)
    return cfgs, params


def _save_load(tmp_path, fname):
    cfgs, params = _bundle()
    path = tmp_path / fname
    checkpoints.save_adapter_checkpoint(
        path,
        unet_params=params["unet"],
        unet_cfg=cfgs.unet,
        image_proj_params=params["image_proj"],
        harmony_params=params["harmony"],
        harmony_cfg=cfgs.harmony,
    )
    return cfgs, params, checkpoints.load_adapter_checkpoint(path)


def test_adapter_checkpoint_bin_roundtrip(tmp_path):
    cfgs, params, (proj_flat, ip_flat, composed_flat, ha_cfg) = _save_load(
        tmp_path, "adapter.bin"
    )
    assert ha_cfg == cfgs.harmony

    # image_proj round trip through hf_import
    template = params["image_proj"]
    from imagharmony_tpu.io import hf_import

    proj2 = hf_import.import_tree(template, proj_flat)
    np.testing.assert_allclose(
        np.asarray(proj2["proj"]["weight"]), np.asarray(params["image_proj"]["proj"]["weight"]),
        rtol=1e-6,
    )

    # ip weights round trip
    unet2 = checkpoints.apply_adapter_state(params["unet"], cfgs.unet, ip_flat)
    a = checkpoints.extract_adapter_state(unet2, cfgs.unet)
    b = checkpoints.extract_adapter_state(params["unet"], cfgs.unet)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6)

    # harmony round trip (incl. qformer-free cross_attention layout)
    ha_template = params["harmony"]
    ha2 = checkpoints.import_harmony(ha_template, composed_flat)
    np.testing.assert_allclose(
        np.asarray(ha2["fc1"]["weight"]), np.asarray(params["harmony"]["fc1"]["weight"]), rtol=1e-6
    )


def test_adapter_checkpoint_safetensors_roundtrip(tmp_path):
    cfgs, params, (proj_flat, ip_flat, composed_flat, ha_cfg) = _save_load(
        tmp_path, "adapter.safetensors"
    )
    assert ha_cfg == cfgs.harmony
    assert any(k.endswith("to_k_ip.weight") for k in ip_flat)


def test_adapter_bin_loads_with_torch(tmp_path):
    """Files we write must load in the reference ecosystem (torch oracle)."""
    import torch

    cfgs, params = _bundle()
    path = tmp_path / "adapter.bin"
    checkpoints.save_adapter_checkpoint(
        path,
        unet_params=params["unet"],
        unet_cfg=cfgs.unet,
        image_proj_params=params["image_proj"],
        harmony_params=params["harmony"],
        harmony_cfg=cfgs.harmony,
    )
    sd = torch.load(path, map_location="cpu", weights_only=False)
    assert set(sd) >= {"image_proj", "ip_adapter", "composed_adapter"}
    # odd indices are attn2 processors (attn1 at even indices carries none)
    assert any(k.endswith("to_k_ip.weight") for k in sd["ip_adapter"])
    # torch tensors, (out,in) layout
    w = sd["image_proj"]["proj.weight"]
    assert tuple(w.shape) == tuple(np.asarray(params["image_proj"]["proj"]["weight"]).shape[::-1])


def test_qformer_harmony_checkpoint_roundtrip(tmp_path):
    """QFormer fusion has the packed in_proj_weight torch naming."""
    cfg = harmony_lib.tiny_config(fusion_method="qformer")
    params = harmony_lib.init(jax.random.PRNGKey(0), cfg)
    from imagharmony_tpu.io import hf_import

    flat = hf_import.export_tree(params)
    flat = {checkpoints._harmony_export_key(k): v for k, v in flat.items()}
    assert any("in_proj_weight" in k for k in flat)
    template = params
    back = checkpoints.import_harmony(template, flat)
    np.testing.assert_allclose(
        np.asarray(back["fusion_text_image"]["query_tokens"]),
        np.asarray(params["fusion_text_image"]["query_tokens"]),
        rtol=1e-6,
    )


def test_convert_training_checkpoints(tmp_path):
    """convert_bin.py-equivalent flow on a synthetic accelerate dump."""
    run = tmp_path / "run1" / "checkpoint-100"
    run.mkdir(parents=True)
    rng = np.random.default_rng(0)
    sd = {
        "image_proj_model.proj.weight": rng.normal(size=(4, 8)).astype(np.float32),
        "adapter_modules.3.to_k_ip.weight": rng.normal(size=(6, 6)).astype(np.float32),
        "composed_modules.fc1.weight": rng.normal(size=(8, 4)).astype(np.float32),
        "unrelated.thing": rng.normal(size=(2,)).astype(np.float32),
    }
    torch_pickle.save(run / "pytorch_model.bin", sd)
    converted = checkpoints.convert_training_checkpoints(tmp_path)
    assert len(converted) == 1
    proj, ip, composed, _ = checkpoints.load_adapter_checkpoint(converted[0])
    np.testing.assert_array_equal(proj["proj.weight"], sd["image_proj_model.proj.weight"])
    np.testing.assert_array_equal(ip["3.to_k_ip.weight"], sd["adapter_modules.3.to_k_ip.weight"])
    np.testing.assert_array_equal(composed["fc1.weight"], sd["composed_modules.fc1.weight"])
    # idempotent (skips existing)
    assert checkpoints.convert_training_checkpoints(tmp_path) == []
