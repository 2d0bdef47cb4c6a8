"""BERT tests: golden-logit parity vs HuggingFace (the reference's own oracle
pattern, tests/models/test_bert.py in /root/reference), padding invariance,
and dense-seq-output equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.models import bert as bert_lib


@pytest.fixture(scope="module")
def hf_pair():
    """Random-init HF BertForPreTraining + imported params (offline — no hub
    access needed for random init)."""
    transformers = pytest.importorskip("transformers")
    import torch
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=64,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    hf = transformers.BertForPreTraining(hf_cfg).eval()
    cfg = bert_lib.bert_test(hidden_act="gelu", pad_vocab_size_multiple=8)
    params = bert_lib.remap_hf_bert(hf.state_dict(), cfg)
    return hf, cfg, params


def test_golden_parity_vs_hf(hf_pair):
    hf, cfg, params = hf_pair
    import torch
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 12))
    tt = rng.integers(0, 2, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), token_type_ids=torch.tensor(tt),
                 attention_mask=torch.tensor(mask))
    got = bert_lib.bert_for_pretraining(
        params, cfg, jnp.asarray(ids), token_type_ids=jnp.asarray(tt),
        attention_mask=jnp.asarray(mask), use_flash=False)

    want_mlm = out.prediction_logits.numpy()
    got_mlm = np.asarray(got.prediction_logits)[..., :cfg.vocab_size]
    # positions under the padding mask may differ; compare real tokens only
    m = mask.astype(bool)
    np.testing.assert_allclose(got_mlm[m], want_mlm[m], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.seq_relationship_logits),
                               out.seq_relationship_logits.numpy(),
                               rtol=1e-3, atol=2e-4)


def test_padding_mask_isolates_pad_tokens(hf_pair):
    _, cfg, params = hf_pair
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size,
                                                        (1, 10)))
    mask = jnp.asarray([[1] * 7 + [0] * 3])
    seq1, pooled1 = bert_lib.bert_forward(params, cfg, ids,
                                          attention_mask=mask,
                                          use_flash=False)
    ids2 = ids.at[:, 8].set((ids[:, 8] + 1) % cfg.vocab_size)
    seq2, pooled2 = bert_lib.bert_forward(params, cfg, ids2,
                                          attention_mask=mask,
                                          use_flash=False)
    # changing a PAD token must not affect real-token outputs
    np.testing.assert_allclose(np.asarray(seq1[:, :7]),
                               np.asarray(seq2[:, :7]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled1), np.asarray(pooled2),
                               atol=1e-5)


def test_bidirectional(hf_pair):
    _, cfg, params = hf_pair
    ids = jnp.asarray(np.random.default_rng(2).integers(0, cfg.vocab_size,
                                                        (1, 8)))
    seq1, _ = bert_lib.bert_forward(params, cfg, ids, use_flash=False)
    ids2 = ids.at[:, 7].set((ids[:, 7] + 1) % cfg.vocab_size)
    seq2, _ = bert_lib.bert_forward(params, cfg, ids2, use_flash=False)
    # BERT is bidirectional: changing the LAST token changes position 0 too
    assert np.abs(np.asarray(seq1[:, 0]) - np.asarray(seq2[:, 0])).max() > 1e-5


def test_dense_seq_output_matches_full_head(hf_pair):
    _, cfg_base, params = hf_pair
    import dataclasses
    cfg = dataclasses.replace(cfg_base, dense_seq_output=True)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
    labels = np.full((2, 12), -100)
    labels[0, [1, 4]] = [7, 9]
    labels[1, [2]] = [3]
    labels = jnp.asarray(labels)

    full = bert_lib.bert_for_pretraining(params, cfg_base, ids, labels=labels,
                                         use_flash=False)
    densed = bert_lib.bert_for_pretraining(params, cfg, ids, labels=labels,
                                           use_flash=False, masked_budget=6)
    np.testing.assert_allclose(float(densed.loss), float(full.loss),
                               rtol=1e-5)
    assert densed.prediction_logits.shape[0] == 6  # static gather size


def test_pretraining_loss_with_nsp(hf_pair):
    _, cfg, params = hf_pair
    ids = jnp.asarray(np.random.default_rng(4).integers(0, cfg.vocab_size,
                                                        (2, 8)))
    labels = jnp.full((2, 8), -100, jnp.int32).at[:, 2].set(5)
    out = bert_lib.bert_for_pretraining(
        params, cfg, ids, labels=labels,
        next_sentence_label=jnp.asarray([0, 1]), use_flash=False)
    assert np.isfinite(float(out.loss))
    assert out.seq_relationship_logits.shape == (2, 2)
