"""Byte-level BPE tokenizer tests. Oracle: transformers.GPT2Tokenizer
instantiated OFFLINE from the same vocab/merges files — byte-identical ids
required."""

import json
import os

import pytest

from backpacks_flash_attn_tpu.utils.tokenizer import GPT2Tokenizer, bytes_to_unicode

CORPUS = [
    "The quick brown fox jumps over the lazy dog. ",
    "backpack language models decompose meaning into sense vectors, ",
    "I've said we'll don't can't 1234 567 hello hello hello world!!! ",
    "  spaces   and\nnewlines\t tabs",
]

TEXTS = [
    " hello world",
    "The quick brown fox",
    "I've got 99 problems, but a token ain't one!",
    "multi\nline\n\n  text   with   runs",
    "unicode: café naïve — emoji \U0001f680 ok",
    "'s 't 're contractions",
    "",
]


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    tok = GPT2Tokenizer.train_toy(CORPUS * 3, vocab_size=400)
    d = tmp_path_factory.mktemp("tok")
    vocab_path = os.path.join(d, "vocab.json")
    merges_path = os.path.join(d, "merges.txt")
    with open(vocab_path, "w", encoding="utf-8") as f:
        json.dump(tok.encoder, f, ensure_ascii=False)
    with open(merges_path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get):
            f.write(f"{a} {b}\n")
    return tok, vocab_path, merges_path


def test_byte_table_is_bijective():
    t = bytes_to_unicode()
    assert len(t) == 256
    assert len(set(t.values())) == 256


def test_roundtrip(toy):
    tok, _, _ = toy
    for text in TEXTS:
        assert tok.decode(tok.encode(text)) == text, text


def test_from_files_matches_trained(toy):
    tok, vp, mp = toy
    tok2 = GPT2Tokenizer.from_files(vp, mp)
    for text in TEXTS:
        assert tok.encode(text) == tok2.encode(text)


def test_matches_hf_gpt2_tokenizer(toy):
    transformers = pytest.importorskip("transformers")
    tok, vp, mp = toy
    hf = transformers.GPT2Tokenizer(vocab_file=vp, merges_file=mp)
    for text in TEXTS:
        got = tok.encode(text)
        want = hf(text)["input_ids"]
        assert got == want, (text, got, want)


def test_eos_token(toy):
    tok, _, _ = toy
    assert tok.eos_token_id == tok.encoder["<|endoftext|>"]
    # decoding the eos id yields the literal marker
    assert tok.decode([tok.eos_token_id]) == "<|endoftext|>"


def test_call_contract(toy):
    tok, _, _ = toy
    out = tok(" hello")
    assert isinstance(out, dict) and "input_ids" in out
