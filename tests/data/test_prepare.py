"""Parallel corpus preparation (data/prepare.py) vs the sequential oracle.

The reference prepares OWT with multiprocess tokenize + shared-memory concat
writers (training/src/datamodules/language_modeling_hf.py:154-229); these
tests pin the parallel path byte-identical to encode_corpus."""

import numpy as np
import pytest

from backpacks_flash_attn_tpu.data.lm_dataset import encode_corpus
from backpacks_flash_attn_tpu.data.prepare import encode_corpus_parallel


def _toy_tokenizer():
    """Deterministic, spawn-picklable stand-in: bytes as ids."""
    class Tok:
        def __call__(self, text):
            return {"input_ids": list(text.encode("utf-8"))}
    return Tok()


_TEXTS = [f"doc {i} " + "az" * (i % 37) for i in range(257)]


def test_parallel_matches_sequential(tmp_path):
    want = encode_corpus(_TEXTS, _toy_tokenizer(), eos_id=255,
                         dtype=np.uint16)
    got = encode_corpus_parallel(
        _TEXTS, str(tmp_path / "corpus.npy"),
        tokenizer_factory=_toy_tokenizer, eos_id=255, dtype=np.uint16,
        num_workers=3, chunk_docs=16)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_num_workers_zero_is_sequential(tmp_path):
    want = encode_corpus(_TEXTS[:20], _toy_tokenizer(), eos_id=255)
    got = encode_corpus_parallel(
        _TEXTS[:20], str(tmp_path / "corpus.npy"),
        tokenizer_factory=_toy_tokenizer, eos_id=255, num_workers=0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pretokenized_ids_no_factory(tmp_path):
    ids = [[1, 2, 3], [4, 5], [6]]
    got = encode_corpus_parallel(ids, str(tmp_path / "c.npy"), eos_id=9,
                                 num_workers=2, chunk_docs=2)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray([1, 2, 3, 9, 4, 5, 9, 6, 9], np.uint16))


def test_chunking_boundary_single_chunk(tmp_path):
    got = encode_corpus_parallel(
        _TEXTS[:5], str(tmp_path / "c.npy"), tokenizer_factory=_toy_tokenizer,
        eos_id=255, num_workers=4, chunk_docs=1024)   # 1 chunk, 4 workers
    want = encode_corpus(_TEXTS[:5], _toy_tokenizer(), eos_id=255)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_native_tokenizer_factory_end_to_end(tmp_path):
    """Offline native BPE (C++ merge loop) through the multiprocess pipeline:
    factory pickles into spawn workers, ids match the slow tokenizer."""
    import json

    from backpacks_flash_attn_tpu.data.prepare import native_tokenizer_factory
    from backpacks_flash_attn_tpu.utils.tokenizer import GPT2Tokenizer

    corpus = ["the quick brown fox", "hello hello world", "az " * 20]
    slow = GPT2Tokenizer.train_toy(corpus * 3, vocab_size=350)
    vocab_p, merges_p = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vocab_p.write_text(json.dumps(slow.encoder))
    merges = sorted(slow.bpe_ranks.items(), key=lambda kv: kv[1])
    merges_p.write_text("#version\n" + "\n".join(
        f"{a} {b}" for (a, b), _ in merges) + "\n")

    factory = native_tokenizer_factory(str(vocab_p), str(merges_p))
    want = encode_corpus(corpus, slow, eos_id=slow.eos_token_id,
                         dtype=np.uint16)
    got = encode_corpus_parallel(
        corpus, str(tmp_path / "c.npy"), tokenizer_factory=factory,
        eos_id=slow.eos_token_id, dtype=np.uint16, num_workers=2,
        chunk_docs=1)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_prepare_cli_text_file(tmp_path):
    """python -m ...data.prepare --text-file: offline raw-text -> corpus."""
    import json

    from backpacks_flash_attn_tpu.data import prepare as prep
    from backpacks_flash_attn_tpu.utils.tokenizer import GPT2Tokenizer

    corpus = ["aa bb cc", "bb cc dd"]
    slow = GPT2Tokenizer.train_toy(corpus * 3, vocab_size=320)
    (tmp_path / "vocab.json").write_text(json.dumps(slow.encoder))
    ms = sorted(slow.bpe_ranks.items(), key=lambda kv: kv[1])
    (tmp_path / "merges.txt").write_text(
        "#v\n" + "\n".join(f"{a} {b}" for (a, b), _ in ms) + "\n")
    (tmp_path / "docs.txt").write_text("\n".join(corpus) + "\n")
    out = tmp_path / "corpus.npy"
    prep.main(["--text-file", str(tmp_path / "docs.txt"), "--out", str(out),
               "--vocab", str(tmp_path / "vocab.json"),
               "--merges", str(tmp_path / "merges.txt"), "--workers", "0",
               "--eos-id", str(slow.eos_token_id)])
    got = np.load(str(out))
    want = encode_corpus(corpus, slow, eos_id=slow.eos_token_id)
    np.testing.assert_array_equal(got, want)


def test_prepare_cli_rejects_text_without_tokenizer(tmp_path):
    import pytest as _pytest

    from backpacks_flash_attn_tpu.data import prepare as prep
    (tmp_path / "d.txt").write_text("hello\n")
    with _pytest.raises(SystemExit):
        prep.main(["--text-file", str(tmp_path / "d.txt"),
                   "--out", str(tmp_path / "o.npy")])
