"""Intervention machinery tests (reference: training/src/models/
intervened_models.py — which has NO tests in the reference; SURVEY.md §4.4).

Oracles:
  * numpy re-derivations of the soft mask / annealing math
  * no-op interventions must reproduce the plain forward exactly
  * the incremental weighted decode must match the full-recompute
    weighted_forward token-for-token (the reference's only decode mode)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import interventions as iv


@pytest.fixture(scope="module")
def setup():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    return cfg, params, ids


def test_soft_sense_mask_math():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(32, 4)).astype(np.float32)
    ids = rng.integers(0, 32, (2, 5))
    scores = rng.uniform(0, 1, (2, 5, 4)).astype(np.float32)
    got = np.asarray(iv.soft_sense_mask(jnp.asarray(table), jnp.asarray(ids),
                                        jnp.asarray(scores)))
    want = table[ids] * scores + (1 - scores)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_annealing_scores_math(setup):
    cfg, params, ids = setup
    content = bp.content_forward(params, cfg, ids)
    E = np.asarray(iv.embedding_matrix(params["gpt"]), np.float32)
    got = np.asarray(iv.annealing_scores(jnp.asarray(E), ids, content,
                                         annealing_scale=0.1,
                                         upweight_nearby=True))
    c = np.asarray(content, np.float32)
    idn = np.asarray(ids)
    b, s = idn.shape
    want = np.zeros((b, s, cfg.num_senses), np.float32)
    for bi in range(b):
        tok_e = E[idn[bi]]                        # (s, d)
        sims = np.einsum("jkd,td->jkt", c[bi], tok_e)
        sat = np.maximum(sims, 0).sum(-1)         # (s, nv)
        sc = 1 / (1 + np.exp(0.1 * sat - 6))
        want[bi] = sc * (1 + np.arange(s) / 100)[:, None]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_weighted_identity_weights_noop(setup):
    """content_weights == 1 => w*s + (1-s) == 1 for any annealing score, so
    the weighted forward must equal the plain forward."""
    cfg, params, ids = setup
    base = bp.backpack_forward(params, cfg, ids, use_flash=False)
    table = jnp.ones((cfg.padded_vocab_size, cfg.num_senses))
    got = iv.weighted_forward(params, cfg, ids, table, anneal=True,
                              use_flash=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-4, atol=1e-4)


def test_weighted_changes_targeted_senses(setup):
    cfg, params, ids = setup
    base = bp.backpack_forward(params, cfg, ids, use_flash=False)
    table = jnp.ones((cfg.padded_vocab_size, cfg.num_senses)).at[:, 1].set(3.0)
    got = iv.weighted_forward(params, cfg, ids, table, anneal=False,
                              use_flash=False)
    assert np.abs(np.asarray(got) - np.asarray(base)).max() > 1e-3


def test_negative_weighted_identity_noop(setup):
    """weights == 1 => weighted logits == plain logits, the quantile mix is a
    no-op, and the per-sense-logit route must reproduce the standard
    combine-then-project logits (distributivity of the tied head)."""
    cfg, params, ids = setup
    base = np.asarray(bp.backpack_forward(params, cfg, ids, use_flash=False),
                      np.float32)
    table = jnp.ones((cfg.padded_vocab_size, cfg.num_senses))
    got = np.asarray(iv.negative_weighted_forward(
        params, cfg, ids, table, anneal=False, use_flash=False, key_chunk=5))
    np.testing.assert_allclose(got, base, rtol=2e-3, atol=2e-3)


def test_negative_weighted_suppresses(setup):
    cfg, params, ids = setup
    table = jnp.full((cfg.padded_vocab_size, cfg.num_senses), 4.0)
    base = np.asarray(bp.backpack_forward(params, cfg, ids, use_flash=False))
    got = np.asarray(iv.negative_weighted_forward(
        params, cfg, ids, table, anneal=False, use_flash=False, key_chunk=4))
    assert np.abs(got - base).max() > 1e-3
    # only the negative tail is amplified: max logit per row shouldn't explode
    assert got.max() < base.max() + np.abs(base).max()


def test_replaced_word_forward(setup):
    cfg, params, ids = setup
    # replacing a token's senses with its OWN senses is a no-op
    wid = int(np.asarray(ids)[0, 3])
    own = iv.senses_of_word(params, cfg, wid)
    base = bp.backpack_forward(params, cfg, ids, use_flash=False)
    same = iv.replaced_word_forward(params, cfg, ids,
                                    jnp.asarray([wid], jnp.int32), own[None],
                                    use_flash=False)
    np.testing.assert_allclose(np.asarray(same), np.asarray(base),
                               rtol=1e-4, atol=1e-4)
    # replacing with zeros changes predictions only at/after that token
    zeroed = iv.replaced_word_forward(params, cfg, ids,
                                      jnp.asarray([wid], jnp.int32),
                                      jnp.zeros_like(own)[None],
                                      use_flash=False)
    pos = np.where(np.asarray(ids)[0] == wid)[0]
    first = int(pos.min())
    diff = np.abs(np.asarray(zeroed[0]) - np.asarray(base[0])).max(axis=-1)
    assert diff[:first].max() < 1e-5 if first > 0 else True
    assert diff[first:].max() > 1e-4


def test_project_out_and_in():
    rng = np.random.default_rng(1)
    senses = rng.normal(size=(4, 16)).astype(np.float32)
    out_d = rng.normal(size=(16,)).astype(np.float32)
    in_d = rng.normal(size=(16,)).astype(np.float32)
    fixed = np.asarray(iv.project_out_and_in(jnp.asarray(senses),
                                             jnp.asarray(out_d),
                                             jnp.asarray(in_d)))
    # out_direction component removed up to the in_direction's own leakage
    dots = senses @ out_d / (out_d @ out_d)
    norm = (out_d @ out_d) / (in_d @ in_d)
    want = senses - dots[:, None] * out_d[None] + dots[:, None] * in_d[None] * norm
    np.testing.assert_allclose(fixed, want, rtol=1e-5, atol=1e-5)


def test_project_out_embeddings():
    rng = np.random.default_rng(2)
    E = rng.normal(size=(32, 8)).astype(np.float32)
    d = rng.normal(size=(8,)).astype(np.float32)
    # percent=0 fully removes the direction from the selected rows
    fixed = np.asarray(iv.project_out_embeddings(
        jnp.asarray(E), jnp.asarray(d), 0.0,
        word_ids=jnp.asarray([1, 5], jnp.int32)))
    np.testing.assert_allclose(fixed[[1, 5]] @ d, 0.0, atol=1e-4)
    np.testing.assert_allclose(fixed[0], E[0], rtol=1e-6)
    # percent=1 is a no-op
    noop = np.asarray(iv.project_out_embeddings(jnp.asarray(E),
                                                jnp.asarray(d), 1.0))
    np.testing.assert_allclose(noop, E, rtol=1e-6)


def test_counterfactual_forward(setup):
    cfg, params, ids = setup
    base = bp.backpack_forward(params, cfg, ids, use_flash=False)
    noop = iv.counterfactual_forward(params, cfg, ids,
                                     jnp.asarray([3], jnp.int32), 1, 1.0,
                                     use_flash=False)
    np.testing.assert_allclose(np.asarray(noop), np.asarray(base),
                               rtol=2e-3, atol=2e-3)
    wid = int(np.asarray(ids)[0, 2])
    changed = iv.counterfactual_forward(params, cfg, ids,
                                        jnp.asarray([wid], jnp.int32), 1, 0.0,
                                        use_flash=False)
    assert np.abs(np.asarray(changed) - np.asarray(base)).max() > 1e-4


def test_per_sense_logits(setup):
    cfg, params, _ = setup
    senses = iv.senses_of_word(params, cfg, 5)       # (nv, d)
    logits = np.asarray(iv.per_sense_logits(params, cfg, senses))
    assert logits.shape == (cfg.num_senses, cfg.padded_vocab_size)
    E = np.asarray(iv.embedding_matrix(params["gpt"]), np.float32)
    np.testing.assert_allclose(logits, np.asarray(senses, np.float32) @ E.T,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("anneal", [False, True])
def test_weighted_decode_matches_full_recompute(setup, anneal):
    """The O(t)-per-step incremental weighted decode must match the
    full-recompute weighted_forward (= the reference's decode semantics,
    intervened_models.py:70-105 + training/src/utils/generation.py)
    token-for-token."""
    cfg, params, _ = setup
    table = (1.0 + 0.5 * jax.random.uniform(jax.random.PRNGKey(3),
                                            (cfg.padded_vocab_size,
                                             cfg.num_senses)))
    batch, prompt_len, steps, max_len = 2, 4, 5, 16
    ids = jax.random.randint(jax.random.PRNGKey(4), (batch, prompt_len), 0,
                             cfg.vocab_size)

    # full-recompute path: greedy, re-running weighted_forward on the prefix
    full_ids = ids
    full_last = []
    for _ in range(steps):
        logits = iv.weighted_forward(params, cfg, full_ids, table,
                                     anneal=anneal, use_flash=False)
        nxt = jnp.argmax(logits[:, -1], -1)
        full_last.append(np.asarray(logits[:, -1]))
        full_ids = jnp.concatenate([full_ids, nxt[:, None].astype(ids.dtype)],
                                   axis=1)

    # incremental path
    cache = bp.init_backpack_cache(cfg, batch, max_len, dtype=jnp.float32)
    state = iv.init_weighted_decode_state(cfg, batch, max_len,
                                          dtype=jnp.float32)
    logits, cache, state = iv.weighted_decode_step(
        params, cfg, ids, cache, state, table, anneal=anneal, use_flash=False)
    inc_ids = ids
    for i in range(steps):
        np.testing.assert_allclose(np.asarray(logits[:, -1]), full_last[i],
                                    rtol=2e-3, atol=2e-3)
        nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(ids.dtype)
        np.testing.assert_array_equal(np.asarray(nxt[:, 0]),
                                      np.asarray(full_ids[:, prompt_len + i]))
        inc_ids = jnp.concatenate([inc_ids, nxt], axis=1)
        if i < steps - 1:
            logits, cache, state = iv.weighted_decode_step(
                params, cfg, nxt, cache, state, table, anneal=anneal,
                use_flash=False)


@pytest.mark.parametrize("anneal", [False, True])
def test_negative_decode_matches_full_recompute(setup, anneal):
    """The O(t)-per-step incremental negative-weighted decode must match the
    full-recompute negative_weighted_forward (= the reference's toxicity
    decode semantics, intervened_models.py:108-165 + test_toxicity.py)
    token-for-token. Weight table strictly positive (the validity condition
    of the quantile factorization; all reference tables are positive)."""
    cfg, params, _ = setup
    table = (0.4 + 1.2 * jax.random.uniform(jax.random.PRNGKey(5),
                                            (cfg.padded_vocab_size,
                                             cfg.num_senses)))
    quantile = 0.05
    batch, prompt_len, steps, max_len = 2, 4, 4, 16
    ids = jax.random.randint(jax.random.PRNGKey(6), (batch, prompt_len), 0,
                             cfg.vocab_size)

    full_ids = ids
    full_last = []
    for _ in range(steps):
        logits = iv.negative_weighted_forward(params, cfg, full_ids, table,
                                              anneal=anneal,
                                              quantile=quantile,
                                              use_flash=False, key_chunk=8)
        nxt = jnp.argmax(logits[:, -1], -1)
        full_last.append(np.asarray(logits[:, -1]))
        full_ids = jnp.concatenate([full_ids, nxt[:, None].astype(ids.dtype)],
                                   axis=1)

    cache = bp.init_backpack_cache(cfg, batch, max_len, dtype=jnp.float32)
    state = iv.init_negative_decode_state(cfg, batch, max_len,
                                          quantile=quantile)
    logits, cache, state = iv.negative_decode_step(
        params, cfg, ids, cache, state, table, anneal=anneal,
        quantile=quantile, use_flash=False)
    for i in range(steps):
        np.testing.assert_allclose(np.asarray(logits[:, -1]), full_last[i],
                                   rtol=2e-3, atol=2e-3)
        nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(ids.dtype)
        np.testing.assert_array_equal(np.asarray(nxt[:, 0]),
                                      np.asarray(full_ids[:, prompt_len + i]))
        if i < steps - 1:
            logits, cache, state = iv.negative_decode_step(
                params, cfg, nxt, cache, state, table, anneal=anneal,
                quantile=quantile, use_flash=False)


def test_negative_decode_mask_rows_decode_plain(setup):
    """negative_mask=False rows must produce the PLAIN incremental logits
    (per-slot mixing for the serving engine)."""
    cfg, params, ids = setup
    table = (0.5 + jax.random.uniform(jax.random.PRNGKey(7),
                                      (cfg.padded_vocab_size,
                                       cfg.num_senses)))
    b, s = ids.shape
    max_len = 16
    cache = bp.init_backpack_cache(cfg, b, max_len, dtype=jnp.float32)
    state = iv.init_negative_decode_state(cfg, b, max_len)
    mask = jnp.asarray([True, False])
    logits, _, _ = iv.negative_decode_step(
        params, cfg, ids, cache, state, table, anneal=False,
        use_flash=False, negative_mask=mask)
    plain_cache = bp.init_backpack_cache(cfg, b, max_len, dtype=jnp.float32)
    plain, _ = bp.backpack_forward_with_cache(params, cfg, ids, plain_cache,
                                              use_flash=False)
    np.testing.assert_allclose(np.asarray(logits[1]),
                               np.asarray(plain[1], np.float32),
                               rtol=1e-4, atol=1e-4)
    neg = iv.negative_weighted_forward(params, cfg, ids, table, anneal=False,
                                       use_flash=False, key_chunk=8)
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(neg[0]),
                               rtol=2e-3, atol=2e-3)
