"""Control-pipeline tests (reference: test_topic.py + rank_vocab.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.eval import control as ctl
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import interventions as iv


@pytest.fixture(scope="module")
def setup():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_target_vector():
    v = np.asarray(ctl.target_vector([3, 7], 16))
    assert v[3] == v[7] == 1.0 and v.sum() == 2.0


def test_sense_vocab_scores_math(setup):
    """Scores must equal the reference formula computed directly."""
    cfg, params = setup
    tv = ctl.target_vector([5, 9], cfg.padded_vocab_size)
    scores = np.asarray(ctl.sense_vocab_scores(params, cfg, tv, chunk=128))
    assert scores.shape == (cfg.num_senses, cfg.padded_vocab_size)

    # direct oracle for a couple of words
    E = np.asarray(iv.embedding_matrix(params["gpt"]), np.float32)
    for w in (2, 100):
        senses = np.asarray(iv.senses_of_word(params, cfg, w), np.float32)
        ld = senses @ E.T                              # (nv, V)
        ld = ld / ld.max(-1, keepdims=True)
        want = ld @ np.asarray(tv)
        np.testing.assert_allclose(scores[:, w], want, rtol=1e-3, atol=1e-4)


def test_weights_from_scores_buckets(setup):
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(4, 100)).astype(np.float32))
    w = np.asarray(ctl.weights_from_scores(scores, [4.0, 3.0, 2.0, 1.0]))
    assert w.shape == (100, 4)
    vals, counts = np.unique(w, return_counts=True)
    assert set(vals) <= {1.0, 2.0, 3.0, 4.0}
    # ~5% in the top bucket, ~15% next, ~20% next, ~60% bottom
    frac = counts[list(vals).index(4.0)] / w.size
    assert 0.02 < frac < 0.08


def test_run_control_experiment(setup):
    cfg, params = setup
    prompts = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg.vocab_size, (2, 4)), jnp.int32)
    seen = {}

    def scorer(gens):
        return {"mean_token": float(np.mean(gens))}

    res = ctl.run_control_experiment(params, cfg, word_ids=[7, 11],
                                     prompt_ids=prompts,
                                     strengths=(0, 2),
                                     max_new_tokens=5, scorer=scorer,
                                     use_flash=False, chunk=64)
    assert set(res) == {0, 2}
    for s, entry in res.items():
        assert entry["generations"].shape == (2, 5)
        assert "mean_token" in entry["metrics"]
        seen[s] = entry["generations"]
    # strength 2 must actually change the generations vs strength 0
    # (quantile-bucketed weights differ from all-ones)
    assert not np.array_equal(seen[0], seen[2])


def test_strength0_is_neutral(setup):
    """strength 0 => all multipliers 1.0 => identical to plain decode."""
    cfg, params = setup
    prompts = jnp.asarray([[3, 1, 4, 1]], jnp.int32)
    table, ann = ctl.control_weights(params, cfg, [5], strength=0, chunk=64)
    np.testing.assert_array_equal(np.asarray(table), 1.0)
    gens = ctl.generate_weighted(params, cfg, prompts, table,
                                 annealing_scale=ann, anneal=False,
                                 max_new_tokens=4, use_flash=False)
    # plain greedy oracle
    cache = bp.init_backpack_cache(cfg, 1, 8, dtype=jnp.bfloat16)
    logits, cache = bp.backpack_forward_with_cache(params, cfg, prompts,
                                                   cache, use_flash=False)
    want = []
    tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    for _ in range(4):
        want.append(int(tok[0, 0]))
        logits, cache = bp.backpack_forward_with_cache(params, cfg, tok,
                                                       cache, use_flash=False)
        tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    assert gens[0].tolist() == want


def test_top_vocab_per_sense(setup):
    cfg, params = setup
    out = ctl.top_vocab_per_sense(params, cfg, word_id=3, k=5)
    assert set(out) == set(range(cfg.num_senses))
    for s, d in out.items():
        assert len(d["top_ids"]) == 5
        assert d["top_scores"][0] >= d["top_scores"][-1]
        assert d["bottom_scores"][0] <= d["top_scores"][-1]
