"""Lexical-similarity eval tests: sim-fn math vs numpy/scipy oracles and an
end-to-end run on the reference's actual datasets when mounted
(reference: training/src/run_simlex.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.eval import similarity as sim
from backpacks_flash_attn_tpu.models import backpack as bp

DATA = "/root/reference/training/data"


def test_spearman_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(0)
    a = rng.normal(size=50)
    b = 0.5 * a + rng.normal(size=50)
    want = scipy_stats.spearmanr(a, b).statistic
    np.testing.assert_allclose(sim.spearman(a, b), want, rtol=1e-10)
    # with ties
    a2 = np.round(a, 0)
    want2 = scipy_stats.spearmanr(a2, b).statistic
    np.testing.assert_allclose(sim.spearman(a2, b), want2, rtol=1e-10)


def test_cosine_family():
    rng = np.random.default_rng(1)
    v1 = rng.normal(size=(4, 8)).astype(np.float32)
    v2 = rng.normal(size=(4, 8)).astype(np.float32)
    full = sim._all_cosines(v1, v2)
    assert sim.min_pairwise_cosines(v1, v2) == pytest.approx(np.diag(full).min())
    assert sim.max_all_cosines(v1, v2) == pytest.approx(full.max())
    assert sim.flat_cosine(v1[0], v1[0]) == pytest.approx(1.0, abs=1e-6)
    assert sim.sense_cosine(v1, v1, 2) == pytest.approx(1.0, abs=1e-6)


def test_dataset_loaders():
    if not os.path.isdir(DATA):
        pytest.skip("reference data not mounted")
    simlex = sim.load_simlex999(os.path.join(DATA, "SimLex-999/SimLex-999.txt"))
    assert len(simlex) == 999
    assert all(p.gold_score >= 0 for p in simlex)
    rg = sim.load_rg65(os.path.join(DATA, "RG65.csv"))
    assert len(rg) == 65
    ws = sim.load_ws353(os.path.join(DATA, "WS353.csv"))
    assert len(ws) > 300
    sv = sim.load_simverb3500(os.path.join(DATA, "SimVerb-3500.txt"))
    assert len(sv) == 3500


class _FakeTok:
    """Deterministic toy tokenizer: each word -> 1-2 'subword' ids."""

    def __init__(self, vocab_size):
        self.v = vocab_size

    def __call__(self, text):
        h = abs(hash(text))
        ids = [h % self.v]
        if h % 3 == 0:
            ids.append((h // 7) % self.v)
        return {"input_ids": ids}


def test_end_to_end_sense_similarity():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    tok = _FakeTok(cfg.vocab_size)
    pairs = [sim.WordPair(f"w{i}", f"w{i+1}", float(i % 5)) for i in range(20)]
    words = {p.word1 for p in pairs} | {p.word2 for p in pairs}

    vecs = sim.sense_vecs(params, cfg, sorted(words), tok)
    assert all(v.shape == (cfg.num_senses, cfg.n_embd) for v in vecs.values())
    fns = sim.similarity_fns(cfg.num_senses, multivec=True)
    res = sim.evaluate_all({"toy": pairs}, vecs, fns)
    for name, r in res["toy"].items():
        assert np.isfinite(r["spearmanr"]), name
        assert r["n"] == 20

    # softmax-embedding vectors too
    svecs = sim.softmax_vecs(params, sorted(words), tok)
    res2 = sim.evaluate_pairs(pairs, svecs, sim.flat_cosine)
    assert np.isfinite(res2["spearmanr"])


def test_sense_vecs_match_single_word_oracle():
    """Batched extraction must equal a direct per-word content pass."""
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    tok = _FakeTok(cfg.vocab_size)
    vecs = sim.sense_vecs(params, cfg, ["hello"], tok)
    ids = tok(" hello")["input_ids"]
    direct = np.asarray(bp.content_forward(
        params, cfg, jnp.asarray([ids], jnp.int32))[0], np.float32).mean(0)
    np.testing.assert_allclose(vecs["hello"], direct, rtol=1e-5, atol=1e-6)
