"""CLIP text/vision parity vs transformers (torch CPU oracle).

Random-weight tiny models: the HF state_dict is imported into our pytree via
io.hf_import and outputs must match to fp32 tolerance. This validates both
the model math and the checkpoint-ingestion mapping in one shot.
"""

import jax.numpy as jnp
import numpy as np
import torch
import transformers

from imagharmony_tpu import dtypes
from imagharmony_tpu.io import hf_import
from imagharmony_tpu.models import clip_text, clip_vision

FP32 = dtypes.FP32


def _flat_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _template(tree):
    import jax

    return jax.eval_shape(lambda: tree)


def test_clip_text_tower_parity():
    cfg = clip_text.tiny_config()
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu",
        eos_token_id=cfg.eos_token_id,
        bos_token_id=998,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(hf_cfg).eval()

    import jax

    template = clip_text.init(0, cfg)
    params = hf_import.import_tree(template, _flat_numpy(hf), prefix="text_model.")

    ids = np.array(
        [[998, 5, 6, 7, cfg.eos_token_id] + [0] * 11, [998, 9, cfg.eos_token_id] + [0] * 13],
        dtype=np.int64,
    )
    ours = clip_text.apply(params, cfg, jnp.array(ids), policy=FP32)

    with torch.no_grad():
        theirs = hf(torch.tensor(ids), output_hidden_states=True)

    np.testing.assert_allclose(
        np.asarray(ours["penultimate"]),
        theirs.hidden_states[-2].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["last"]), theirs.last_hidden_state.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["pooled"]), theirs.pooler_output.numpy(), rtol=1e-4, atol=1e-4
    )


def test_clip_text_with_projection_parity():
    cfg = clip_text.tiny_config(projection_dim=24, hidden_act="gelu")
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu",
        projection_dim=24,
        eos_token_id=cfg.eos_token_id,
        bos_token_id=998,
    )
    torch.manual_seed(1)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    import jax

    template = clip_text.init(0, cfg)

    def key_map(k):
        # text_projection sits outside the text_model. prefix in HF
        return k.replace("text_model.text_projection", "text_projection")

    params = hf_import.import_tree(
        template, _flat_numpy(hf), prefix="text_model.", key_map=key_map
    )

    ids = np.array([[998, 4, 11, cfg.eos_token_id] + [0] * 12], dtype=np.int64)
    ours = clip_text.apply(params, cfg, jnp.array(ids), policy=FP32)
    with torch.no_grad():
        theirs = hf(torch.tensor(ids), output_hidden_states=True)

    # reference train.py:664 uses encoder_output_2[0] == text_embeds
    np.testing.assert_allclose(
        np.asarray(ours["projected"]), theirs.text_embeds.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["penultimate"]),
        theirs.hidden_states[-2].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_clip_vision_parity():
    cfg = clip_vision.tiny_config()
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        projection_dim=cfg.projection_dim,
        hidden_act="gelu",
    )
    torch.manual_seed(2)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()

    import jax

    template = clip_vision.init(0, cfg)

    def key_map(k):
        return k.replace("vision_model.visual_projection", "visual_projection")

    params = hf_import.import_tree(
        template, _flat_numpy(hf), prefix="vision_model.", key_map=key_map
    )

    rng = np.random.default_rng(3)
    pix = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ours = clip_vision.apply(params, cfg, jnp.array(pix), policy=FP32)
    with torch.no_grad():
        theirs = hf(torch.tensor(pix.transpose(0, 3, 1, 2)), output_hidden_states=True)

    np.testing.assert_allclose(
        np.asarray(ours["projected"]), theirs.image_embeds.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["penultimate"]),
        theirs.hidden_states[-2].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_clip_preprocess_matches_hf_processor():
    from PIL import Image

    rng = np.random.default_rng(4)
    img = Image.fromarray(rng.integers(0, 255, size=(300, 400, 3), dtype=np.uint8))
    ours = clip_vision.preprocess_numpy(img)
    proc = transformers.CLIPImageProcessor()
    theirs = proc(images=img, return_tensors="np").pixel_values.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_clip_skip_parity():
    """clip_skip conditions on an earlier layer: our penultimate at skip=k
    equals HF hidden_states[-(2+k)], our sd15-style 'last' equals
    final_layer_norm(hidden_states[-(1+k)]), and pooled stays the FULL
    tower's pooler output (diffusers clip_skip semantics)."""
    cfg = clip_text.tiny_config(num_layers=4)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu",
        eos_token_id=cfg.eos_token_id,
        bos_token_id=998,
    )
    torch.manual_seed(3)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    template = clip_text.init(0, cfg)
    params = hf_import.import_tree(template, _flat_numpy(hf), prefix="text_model.")
    ids = np.array([[998, 5, 6, 7, cfg.eos_token_id] + [0] * 11], np.int64)

    with torch.no_grad():
        theirs = hf(torch.tensor(ids), output_hidden_states=True)
        ln = hf.text_model.final_layer_norm

    for skip in (1, 2):
        ours = clip_text.apply(params, cfg, jnp.array(ids), policy=FP32,
                               clip_skip=skip)
        np.testing.assert_allclose(
            np.asarray(ours["penultimate"]),
            theirs.hidden_states[-(2 + skip)].numpy(), rtol=1e-4, atol=1e-4,
        )
        with torch.no_grad():
            want_last = ln(theirs.hidden_states[-(1 + skip)]).numpy()
        np.testing.assert_allclose(
            np.asarray(ours["last"]), want_last, rtol=1e-4, atol=1e-4,
        )
        # pooled is the FULL tower's pooler output regardless of skip
        np.testing.assert_allclose(
            np.asarray(ours["pooled"]), theirs.pooler_output.numpy(),
            rtol=1e-4, atol=1e-4,
        )

    import pytest
    with pytest.raises(ValueError, match="clip_skip"):
        clip_text.apply(params, cfg, jnp.array(ids), clip_skip=cfg.num_layers)
