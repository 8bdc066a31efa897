"""Tokenizer parity vs HF CLIPTokenizer on a shared synthetic vocab."""

import json

import numpy as np
import pytest
import transformers

from imagharmony_tpu.models import tokenizer as tok_lib


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    toy = tok_lib.build_toy_tokenizer()
    (d / "vocab.json").write_text(json.dumps(toy.encoder))
    merges = sorted(toy.bpe_ranks, key=toy.bpe_ranks.get)
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n"
    )
    return str(d / "vocab.json"), str(d / "merges.txt")


@pytest.mark.parametrize(
    "text",
    [
        "a photo of eight sheep",
        "six dogs",
        "A PHOTO OF a DOG",  # lowercasing
        "  a   dog  ",  # whitespace cleanup
        "dog, cat! sheep?",  # punctuation splits
        "",
    ],
)
def test_matches_hf(vocab_files, text):
    vocab_json, merges_txt = vocab_files
    ours = tok_lib.CLIPTokenizer.from_files(vocab_json, merges_txt)
    hf = transformers.CLIPTokenizer(vocab_json, merges_txt)
    expected = hf(
        text, padding="max_length", truncation=True, max_length=77
    ).input_ids
    assert ours.encode(text) == expected


def test_truncation_keeps_eos(vocab_files):
    vocab_json, merges_txt = vocab_files
    ours = tok_lib.CLIPTokenizer.from_files(vocab_json, merges_txt)
    long = "dog " * 300
    ids = ours.encode(long)
    assert len(ids) == 77
    assert ids[-1] == ours.eos_token_id
    hf = transformers.CLIPTokenizer(vocab_json, merges_txt)
    assert ids == hf(long, padding="max_length", truncation=True, max_length=77).input_ids


def test_roundtrip_decode(vocab_files):
    vocab_json, merges_txt = vocab_files
    ours = tok_lib.CLIPTokenizer.from_files(vocab_json, merges_txt)
    text = "a photo of six dogs"
    ids = [i for i in ours.encode(text) if i != ours.pad_token_id]
    assert ours.decode(ids) == text


def test_batch_shape(vocab_files):
    vocab_json, merges_txt = vocab_files
    ours = tok_lib.CLIPTokenizer.from_files(vocab_json, merges_txt)
    ids = ours.encode_batch(["a dog", "eight sheep"])
    assert ids.shape == (2, 77)
    assert ids.dtype == np.int32


def test_decode_skips_specials_and_handles_bytes(vocab_files):
    vocab_json, merges_txt = vocab_files
    tok = tok_lib.CLIPTokenizer.from_files(vocab_json, merges_txt)
    # unicode goes through byte-level BPE and round-trips
    ids = [i for i in tok.encode("dog ému") if i != tok.pad_token_id]
    assert tok.decode(ids) == "dog ému"
    # specials dropped by default, kept when asked
    assert "<|startoftext|>" not in tok.decode(ids)
    assert "<|startoftext|>" in tok.decode(ids, skip_special=False)


def test_pad_token_variant(vocab_files):
    """tokenizer_2 pads with '!' (id differs from EOS) — both behaviors."""
    vocab_json, merges_txt = vocab_files
    t1 = tok_lib.CLIPTokenizer.from_files(vocab_json, merges_txt)
    assert t1.pad_token_id == t1.eos_token_id
    t2 = tok_lib.CLIPTokenizer.from_files(vocab_json, merges_txt, pad_token="!")
    assert t2.pad_token_id != t2.eos_token_id
    ids = t2.encode("a dog")
    assert ids[-1] == t2.pad_token_id
