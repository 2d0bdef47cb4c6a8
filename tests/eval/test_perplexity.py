"""Perplexity runner tests against analytic oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.eval import perplexity as ppl
from backpacks_flash_attn_tpu.models import backpack as bp


def test_uniform_model_ppl_is_vocab_size():
    """A model emitting constant logits has ppl == V exactly."""
    V = 64
    fwd = lambda x: jnp.zeros(x.shape + (V,), jnp.float32)
    tokens = np.random.default_rng(0).integers(0, V, 1000).astype(np.uint16)
    out = ppl.evaluate_perplexity(fwd, tokens, seqlen=16, batch_size=4)
    np.testing.assert_allclose(out["ppl"], V, rtol=1e-6)
    assert out["num_tokens"] == (len(tokens) - 1) // 16 // 4 * 4 * 16


def test_matches_direct_numpy_nll():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    fwd = lambda x: bp.backpack_forward(params, cfg, x, use_flash=False)
    tokens = np.random.default_rng(1).integers(
        0, cfg.vocab_size, 16 * 8 + 1).astype(np.uint16)
    out = ppl.evaluate_perplexity(fwd, tokens, seqlen=16, batch_size=2)

    # direct oracle
    x = tokens[:-1].reshape(8, 16).astype(np.int32)
    y = tokens[1:].reshape(8, 16).astype(np.int32)
    # NB: that reshape is NOT the window layout; build windows properly
    xs, ys = [], []
    for i in range(8):
        w = tokens[i * 16: i * 16 + 17].astype(np.int64)
        xs.append(w[:-1]); ys.append(w[1:])
    x, y = np.stack(xs).astype(np.int32), np.stack(ys).astype(np.int32)
    logits = np.asarray(fwd(jnp.asarray(x)), np.float64)
    logits -= logits.max(-1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    nll = -np.take_along_axis(logp, y[..., None], -1)[..., 0].mean()
    np.testing.assert_allclose(out["nll"], nll, rtol=1e-4)
    np.testing.assert_allclose(out["ppl"], np.exp(nll), rtol=1e-4)


def test_max_batches_cap():
    fwd = lambda x: jnp.zeros(x.shape + (8,), jnp.float32)
    tokens = np.zeros(1000, np.uint16)
    out = ppl.evaluate_perplexity(fwd, tokens, seqlen=10, batch_size=2,
                                  max_batches=3)
    assert out["num_tokens"] == 3 * 2 * 10
