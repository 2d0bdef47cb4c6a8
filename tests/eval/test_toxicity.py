"""Toxicity-suppression runner tests (reference: test_toxicity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.eval import toxicity as tox
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import interventions as iv


@pytest.fixture(scope="module")
def setup():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_negative_target_vector():
    v = np.asarray(tox.negative_target_vector([2, 5], 16))
    assert v[2] == v[5] == -1.0 and v.sum() == -2.0


def test_ninety_weights_buckets():
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = np.asarray(tox.ninety_weights_from_scores(scores,
                                                  (8.5, 1.1, 1.0, 1.0)))
    assert w.shape == (64, 4)
    allowed = set(np.asarray([8.5, 1.1, 1.0], np.float32).tolist())
    assert set(np.unique(w).tolist()).issubset(allowed)
    s = np.asarray(scores)
    q90 = np.quantile(s.reshape(-1), 0.90)
    np.testing.assert_array_equal(w.T[s > q90], 8.5)


def test_generate_negative_shapes_and_plain_table(setup):
    """An all-ones table with anneal=False must reproduce plain greedy
    generation (the mixing becomes the identity)."""
    cfg, params = setup
    prompts = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    ones = jnp.ones((cfg.padded_vocab_size, cfg.num_senses), jnp.float32)
    gens = tox.generate_negative(params, cfg, prompts, ones,
                                 max_new_tokens=4, use_flash=False,
                                 max_seqlen=16)
    assert gens.shape == (2, 4)

    cache = bp.init_backpack_cache(cfg, 2, 16, dtype=jnp.bfloat16)
    logits, cache = bp.backpack_forward_with_cache(params, cfg, prompts,
                                                   cache, use_flash=False)
    want = []
    tokp = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    want.append(np.asarray(tokp[:, 0]))
    for _ in range(3):
        logits, cache = bp.backpack_forward_with_cache(params, cfg, tokp,
                                                       cache, use_flash=False)
        tokp = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
        want.append(np.asarray(tokp[:, 0]))
    np.testing.assert_array_equal(gens, np.stack(want, axis=1))


def test_run_toxicity_experiment(setup):
    """End-to-end loop with a fake scorer: suppressed + baseline runs, ratio
    and avg computed from the scorer's 'toxicity' vector
    (reference test_toxicity.py:203-206)."""
    cfg, params = setup
    prompts = jnp.asarray([[1, 2], [3, 4]], jnp.int32)

    def scorer(gens):
        return {"toxicity": [0.9, 0.1]}

    res = tox.run_toxicity_experiment(
        params, cfg, toxic_word_ids=[7, 9], prompt_ids=prompts,
        max_new_tokens=3, temperature=0.0, scorer=scorer, use_flash=False,
        chunk=64)
    assert set(res) == {"suppressed", "baseline"}
    for entry in res.values():
        assert entry["generations"].shape == (2, 3)
        assert entry["ratio"] == 0.5 and abs(entry["avg"] - 0.5) < 1e-6
    # the suppressed table must differ from identity somewhere
    table, ann = tox.toxicity_weights(params, cfg, [7, 9], chunk=64)
    assert float(jnp.max(table)) == 8.5 and ann == pytest.approx(8.5 / 25)
