"""Native MAUVE metric (reference: training/src/run_mauve.py delegates to the
HF evaluate module; eval/mauve.py implements the pipeline itself)."""

import jax
import numpy as np
import pytest

from backpacks_flash_attn_tpu.eval import mauve as mv


def _gauss(rng, n, d, shift=0.0):
    return rng.normal(size=(n, d)).astype(np.float32) + shift


def test_identical_distributions_score_near_one():
    rng = np.random.default_rng(0)
    base = _gauss(rng, 200, 8)
    out = mv.compute_mauve(base[:100], base[100:], seed=1)
    assert out.mauve > 0.9
    assert out.frontier_integral < 0.05
    # curve is a proper frontier: endpoints present, values in [0, 1]
    assert (out.divergence_curve >= 0).all()
    assert (out.divergence_curve <= 1).all()


def test_disjoint_distributions_score_near_zero():
    rng = np.random.default_rng(1)
    p = _gauss(rng, 120, 8, shift=0.0)
    q = _gauss(rng, 120, 8, shift=25.0)
    out = mv.compute_mauve(p, q, seed=1)
    assert out.mauve < 0.1
    assert out.frontier_integral > 0.5


def test_monotone_in_distribution_shift():
    rng = np.random.default_rng(2)
    p = _gauss(rng, 150, 8)
    scores = [mv.compute_mauve(p, _gauss(rng, 150, 8, shift=s), seed=1).mauve
              for s in (0.0, 2.0, 8.0)]
    assert scores[0] > scores[1] > scores[2]


def test_histograms_are_distributions():
    rng = np.random.default_rng(3)
    p_hist, q_hist = mv.cluster_histograms(_gauss(rng, 80, 6),
                                           _gauss(rng, 60, 6),
                                           num_buckets=7, seed=4)
    assert p_hist.shape == (7,) and q_hist.shape == (7,)
    np.testing.assert_allclose(p_hist.sum(), 1.0, rtol=1e-9)
    np.testing.assert_allclose(q_hist.sum(), 1.0, rtol=1e-9)


def test_runner_equalizes_counts():
    """run_mauve truncates the longer side with a seeded shuffle
    (reference run_mauve.py:18-24)."""
    rng = np.random.default_rng(4)
    p = _gauss(rng, 60, 6)
    q = _gauss(rng, 200, 6, shift=0.5)
    out = mv.run_mauve(p, q, seed=0)
    assert 0.0 < out.mauve <= 1.0
    # deterministic under the same seed
    out2 = mv.run_mauve(p, q, seed=0)
    assert out.mauve == out2.mauve


@pytest.mark.parametrize("model", ["gpt", "backpack"])
def test_featurize_terminal_hidden(model):
    from backpacks_flash_attn_tpu.config import backpack_test, gpt2_test
    from backpacks_flash_attn_tpu.models import backpack as bp
    from backpacks_flash_attn_tpu.models import gpt as gpt_lib

    if model == "gpt":
        cfg = gpt2_test()
        params = gpt_lib.init_gpt_lm(cfg, jax.random.PRNGKey(0))
    else:
        cfg = backpack_test()
        params = bp.init_backpack(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(5)
    texts = [list(rng.integers(0, cfg.vocab_size, rng.integers(3, 12)))
             for _ in range(7)]
    feats = mv.featurize_terminal_hidden(params, cfg, texts, model=model,
                                         batch_size=4)
    assert feats.shape == (7, cfg.n_embd)
    assert np.isfinite(feats).all()
    # padding must not leak: re-featurizing with a larger max_len is identical
    feats2 = mv.featurize_terminal_hidden(params, cfg, texts, model=model,
                                          batch_size=4, max_len=16)
    np.testing.assert_allclose(feats, feats2, atol=2e-5)
    # identical corpora -> (near-)perfect score end-to-end
    out = mv.compute_mauve(feats, feats.copy(), num_buckets=3, seed=1)
    assert out.mauve > 0.95
