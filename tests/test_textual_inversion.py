"""Textual inversion (diffusers load_textual_inversion role, beyond the
reference): learned placeholder embeddings appended to the text towers'
token tables, the placeholder registered as a literal tokenizer token that
bypasses BPE (multi-vector embeddings expand one prompt token to n ids)."""

import numpy as np
import pytest

from imagharmony_tpu.io import safetensors_io
from imagharmony_tpu.models import clip_text, tokenizer as tok_lib
from imagharmony_tpu.pipelines import HarmonyPipeline


@pytest.fixture(scope="module")
def pipe():
    return HarmonyPipeline.random_tiny(seed=0)


def test_tokenizer_added_tokens():
    tok = tok_lib.build_toy_tokenizer()
    v = len(tok.encoder)
    tok2 = __import__("copy").copy(tok)
    tok2.added_tokens = dict(tok2.added_tokens)
    tok2.add_token("<cat-toy>", [v, v + 1])

    base = tok.encode("a dog")
    # the original tokenizer is untouched
    assert tok.added_tokens == {}
    ids = tok2.encode("a <cat-toy> dog")
    # the placeholder expands to its two ids, in place, between the words
    a_ids = [i for i in tok.encode("a", pad_to_max=False)][1:-1]
    dog_ids = [i for i in tok.encode("dog", pad_to_max=False)][1:-1]
    want = [tok.bos_token_id] + a_ids + [v, v + 1] + dog_ids + [tok.eos_token_id]
    assert ids[: len(want)] == want
    # decode round-trips the placeholder name
    assert "<cat-toy>" in tok2.decode(ids)
    # longest-first matching: a token that is a prefix of another
    tok2.add_token("<cat-toy-2>", [v + 2])
    ids2 = tok2.encode("<cat-toy-2>", pad_to_max=False)
    assert ids2[1] == v + 2
    # guards
    with pytest.raises(ValueError, match="lower-case"):
        tok2.add_token("<Cat>", [v + 3])
    with pytest.raises(ValueError, match="already"):
        tok2.add_token("dog</w>", [v + 3])
    del base


def test_extend_token_embeddings():
    cfg = clip_text.tiny_config()
    params = clip_text.init(0, cfg)
    rows = np.random.default_rng(0).standard_normal((2, cfg.hidden_size)).astype(np.float32)
    new_p, new_c, first = clip_text.extend_token_embeddings(params, cfg, rows)
    assert first == cfg.vocab_size
    assert new_c.vocab_size == cfg.vocab_size + 2
    table = np.asarray(new_p["embeddings"]["token_embedding"]["weight"])
    np.testing.assert_array_equal(table[first:], rows)
    np.testing.assert_array_equal(table[:first], np.asarray(
        params["embeddings"]["token_embedding"]["weight"]))
    # the transformer weights are shared, not copied
    assert new_p["encoder_layers"] is params["encoder_layers"]
    with pytest.raises(ValueError, match="dim"):
        clip_text.extend_token_embeddings(params, cfg, rows[:, :-1])


def test_with_textual_inversion_sdxl(pipe, tmp_path):
    """SDXL dual-format install: the placeholder changes generation, the
    base pipeline is untouched, and the embedding rows land exactly where
    the new token ids point."""
    rng = np.random.default_rng(3)
    dl = pipe.cfgs.text_l.hidden_size
    dg = pipe.cfgs.text_g.hidden_size
    src = {
        "clip_l": rng.standard_normal((2, dl)).astype(np.float32),
        "clip_g": rng.standard_normal((2, dg)).astype(np.float32),
    }
    ti = pipe.with_textual_inversion(src, token="<cat-toy>")

    # tokenizer expansion: one prompt token -> two consecutive new ids
    v_l = pipe.cfgs.text_l.vocab_size
    ids = ti.tokenizers.tok1.encode("<cat-toy>", pad_to_max=False)
    assert ids[1:3] == [v_l, v_l + 1]
    table = np.asarray(
        ti.params["text_encoder"]["embeddings"]["token_embedding"]["weight"]
    )
    np.testing.assert_array_equal(table[v_l:], src["clip_l"])
    assert ti.cfgs.text_l.vocab_size == v_l + 2

    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3), np.uint8)
    kw = dict(pil_image=img, extra_text="six dogs", num_inference_steps=2,
              height=32, width=32, seed=7, output_type="np")
    with_tok = ti.generate(prompt="a <cat-toy> dog", **kw)
    without = ti.generate(prompt="a dog", **kw)
    assert np.abs(with_tok.astype(int) - without.astype(int)).max() > 0
    # prompts without the placeholder are unaffected by the install
    base = pipe.generate(prompt="a dog", **kw)
    np.testing.assert_array_equal(without, base)

    # chainable: a second concept composes
    src2 = {
        "clip_l": rng.standard_normal((1, dl)).astype(np.float32),
        "clip_g": rng.standard_normal((1, dg)).astype(np.float32),
    }
    ti2 = ti.with_textual_inversion(src2, token="<style>")
    both = ti2.generate(prompt="a <cat-toy> dog, <style>", **kw)
    assert np.isfinite(both.astype(np.float32)).all()

    # file round-trip through our safetensors codec
    path = str(tmp_path / "concept.safetensors")
    safetensors_io.save(path, src)
    ti3 = pipe.with_textual_inversion(path, token="<cat-toy>")
    np.testing.assert_array_equal(
        ti3.generate(prompt="a <cat-toy> dog", **kw), with_tok
    )

    # single-tensor source is rejected for the dual-tower family
    with pytest.raises(ValueError, match="dual-tower"):
        pipe.with_textual_inversion({"<x>": src["clip_l"]})


def test_with_textual_inversion_sd15():
    pipe = HarmonyPipeline.random_tiny_sd15(seed=0)
    d = pipe.cfgs.text_l.hidden_size
    vec = np.random.default_rng(1).standard_normal((1, d)).astype(np.float32)
    ti = pipe.with_textual_inversion({"<thing>": vec})
    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3), np.uint8)
    kw = dict(pil_image=img, num_inference_steps=2, height=32, width=32,
              seed=7, output_type="np")
    a = ti.generate(prompt="a <thing> dog", **kw)
    b = ti.generate(prompt="a dog", **kw)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_with_textual_inversion_a1111_pt(tmp_path):
    """A1111 ``.pt`` embeddings ({"string_to_param": {"*": tensor}},
    "name") load through the torch-pickle reader; the file's own name
    becomes the placeholder unless overridden."""
    import torch

    pipe = HarmonyPipeline.random_tiny_sd15(seed=0)
    d = pipe.cfgs.text_l.hidden_size
    vec = np.random.default_rng(5).standard_normal((2, d)).astype(np.float32)
    path = str(tmp_path / "emb.pt")
    torch.save(
        {"string_to_param": {"*": torch.tensor(vec)}, "name": "<thing>"},
        path,
    )
    ti = pipe.with_textual_inversion(path)
    v0 = pipe.cfgs.text_l.vocab_size
    assert ti.tokenizers.tok1.encode("<thing>", pad_to_max=False)[1:3] == [v0, v0 + 1]
    table = np.asarray(
        ti.params["text_encoder"]["embeddings"]["token_embedding"]["weight"]
    )
    np.testing.assert_allclose(table[v0:], vec, rtol=1e-6)
    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3), np.uint8)
    out = ti.generate(pil_image=img, prompt="a <thing>", num_inference_steps=2,
                      height=32, width=32, seed=1, output_type="np")
    assert out.shape == (1, 32, 32, 3)
