"""Native BPE encoder parity vs the pure-Python tokenizer (csrc/
bpe_tokenizer.cpp must produce bit-identical ids)."""

import random
import string

import pytest

from backpacks_flash_attn_tpu.utils.fast_tokenizer import FastGPT2Tokenizer
from backpacks_flash_attn_tpu.utils.tokenizer import GPT2Tokenizer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "hello world, hello tokenizer! it's working.",
    "backpack language models decompose meaning",
    "aaa aab abb bbb abab baba",
]


@pytest.fixture(scope="module")
def toks():
    slow = GPT2Tokenizer.train_toy(CORPUS * 4, vocab_size=400)
    fast = FastGPT2Tokenizer(slow)
    return slow, fast


def test_native_lib_builds(toks):
    _, fast = toks
    assert fast.native, "C++ tokenizer failed to build (g++ is baked in)"


@pytest.mark.parametrize("text", CORPUS + [
    "", " ", "   ", "unseen-Words; punct!!! 12345",
    "newlines\nand\ttabs", "café naïve über",   # non-ascii
    "日本語 \U0001f600",                            # CJK + emoji
    "it's we've they'll can't i'm you're he'd",
])
def test_parity_with_python(toks, text):
    slow, fast = toks
    assert fast.encode(text) == slow.encode(text), repr(text)


def test_parity_random_fuzz(toks):
    slow, fast = toks
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + " .,'!?\n\t" + "éü"
    for _ in range(50):
        text = "".join(rng.choice(alphabet)
                       for _ in range(rng.randrange(0, 80)))
        assert fast.encode(text) == slow.encode(text), repr(text)


def test_decode_roundtrip(toks):
    _, fast = toks
    text = "hello world, it's working"
    assert fast.decode(fast.encode(text)) == text


def test_call_interface_and_vocab(toks):
    slow, fast = toks
    assert fast("hello")["input_ids"] == slow("hello")["input_ids"]
    assert fast.vocab_size == slow.vocab_size
    assert fast.eos_token_id == slow.eos_token_id


def test_cache_grows_and_stays_correct(toks):
    slow, fast = toks
    if not fast.native:
        pytest.skip("native lib unavailable")
    before = fast.cache_entries
    text = "zqxj vvkp wmbr"   # words no earlier test encoded
    first = fast.encode(text)
    assert fast.cache_entries > before          # new words cached
    assert fast.encode(text) == first == slow.encode(text)  # cache hit parity


def test_empty_and_whitespace_only(toks):
    slow, fast = toks
    for text in ["", " \n ", "\t"]:
        assert fast.encode(text) == slow.encode(text)
