"""Data-pipeline tests (reference: training/tests/datamodules/
test_language_modeling_hf.py asserts exact split lengths/shapes; the
fault-tolerant samplers have no reference tests — closed here)."""

import numpy as np
import pytest

from backpacks_flash_attn_tpu.data import lm_dataset as lmd


def test_chunking_semantics():
    """item i = tokens[i*L : i*L+L+1] split into (x, y)
    (reference lm_dataset.py:24-32)."""
    tokens = np.arange(23, dtype=np.uint16)
    ds = lmd.LMDataset(tokens, seqlen=5)
    assert len(ds) == (23 - 1) // 5  # trailing partial chunk dropped
    x, y = ds[1]
    np.testing.assert_array_equal(x, np.arange(5, 10))
    np.testing.assert_array_equal(y, np.arange(6, 11))
    xb, yb = ds.batch(np.array([0, 2]))
    assert xb.shape == yb.shape == (2, 5)
    np.testing.assert_array_equal(yb, xb + 1)


def test_encode_corpus_appends_eos():
    toks = lmd.encode_corpus([[1, 2], [3]], eos_id=9)
    np.testing.assert_array_equal(toks, [1, 2, 9, 3, 9])
    assert toks.dtype == np.uint16


def test_corpus_cache_roundtrip(tmp_path):
    tokens = np.arange(100, dtype=np.uint16)
    path = lmd.save_corpus(tokens, str(tmp_path), "t")
    mm = lmd.load_corpus(path)
    assert isinstance(mm, np.memmap)
    np.testing.assert_array_equal(np.asarray(mm), tokens)


def test_fault_tolerant_resume_mid_epoch():
    """Resuming from a saved SamplerState must continue the exact same batch
    stream (reference fault_tolerant_sampler.py:94-121 semantics)."""
    ds = lmd.LMDataset(np.arange(401, dtype=np.uint16), seqlen=4)  # 100 items
    state = lmd.SamplerState(seed=7, epoch=0, counter=0)

    full, mid_state = [], None
    for i, (batch, nxt) in enumerate(lmd.epoch_batches(ds, 8, state)):
        full.append(batch[0])
        if i == 4:
            mid_state = nxt
    resumed = [b[0] for b, _ in lmd.epoch_batches(ds, 8, mid_state)]
    np.testing.assert_array_equal(np.concatenate(full[5:]),
                                  np.concatenate(resumed))


def test_epochs_reshuffle_deterministically():
    ds = lmd.LMDataset(np.arange(401, dtype=np.uint16), seqlen=4)
    def first_batch(epoch):
        st = lmd.SamplerState(seed=3, epoch=epoch, counter=0)
        (x, _), _ = next(lmd.epoch_batches(ds, 8, st))
        return x
    assert not np.array_equal(first_batch(0), first_batch(1))
    np.testing.assert_array_equal(first_batch(0), first_batch(0))


def test_sharding_partitions_examples():
    ds = lmd.LMDataset(np.arange(161, dtype=np.uint16), seqlen=4)  # 40 items
    seen = []
    for shard in range(4):
        st = lmd.SamplerState(seed=0, epoch=0, counter=0)
        for (x, _), _ in lmd.epoch_batches(ds, 5, st, shard=shard,
                                           num_shards=4):
            seen.extend(x[:, 0].tolist())
    # every example start is distinct across shards (disjoint partition)
    assert len(seen) == len(set(seen)) == 40


def test_rolling_batches_cross_epochs():
    ds = lmd.LMDataset(np.arange(81, dtype=np.uint16), seqlen=4)  # 20 items
    it = lmd.batches(ds, 10, lmd.SamplerState(seed=1))
    states = []
    for _ in range(5):
        (_, _), st = next(it)
        states.append((st.epoch, st.counter))
    assert states[1] == (0, 20)
