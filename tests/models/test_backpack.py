"""Backpack model tests: shapes, causality, sense-table equivalence, and the
incremental-decode-vs-full-recompute oracle (the reference has no Backpack unit
tests at all — SURVEY.md §4.4; these close that gap)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.utils import generation


@pytest.fixture(scope="module")
def setup():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 20), 0, cfg.vocab_size)
    return cfg, params, ids


def test_forward_shapes(setup):
    cfg, params, ids = setup
    logits, parts = bp.backpack_forward(params, cfg, ids, use_flash=False,
                                        return_parts=True)
    b, s = ids.shape
    assert logits.shape == (b, s, cfg.padded_vocab_size)
    assert parts["alpha"].shape == (b, cfg.num_senses, s, s)
    assert parts["content"].shape == (b, s, cfg.num_senses, cfg.n_embd)
    # alpha rows are a causal softmax: rows sum to 1, strictly-upper = 0
    alpha = np.asarray(parts["alpha"], np.float64)
    np.testing.assert_allclose(alpha.sum(-1), 1.0, atol=1e-3)
    triu = np.triu(np.ones((s, s)), k=1).astype(bool)
    assert np.abs(alpha[..., triu]).max() < 1e-6


def test_causality(setup):
    cfg, params, ids = setup
    logits = bp.backpack_forward(params, cfg, ids, use_flash=False)
    ids2 = ids.at[:, 9].set((ids[:, 9] + 1) % cfg.vocab_size)
    logits2 = bp.backpack_forward(params, cfg, ids2, use_flash=False)
    np.testing.assert_allclose(np.asarray(logits[:, :9]),
                               np.asarray(logits2[:, :9]), atol=1e-5)
    assert np.abs(np.asarray(logits[:, 9:]) -
                  np.asarray(logits2[:, 9:])).max() > 1e-3


def test_content_is_per_token(setup):
    """Sense vectors depend only on the token id (reference exploits this in
    modulate_generate.py:66-71): same token in different positions/contexts
    must produce identical senses."""
    cfg, params, _ = setup
    tok = jnp.array([[7, 3, 7], [7, 7, 7]])
    content = bp.content_forward(params, cfg, tok)
    np.testing.assert_allclose(np.asarray(content[0, 0]),
                               np.asarray(content[0, 2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(content[0, 0]),
                               np.asarray(content[1, 1]), atol=1e-6)


def test_sense_table_matches_content(setup):
    cfg, params, ids = setup
    table = bp.sense_table(params, cfg, chunk=256)
    assert table.shape == (cfg.padded_vocab_size, cfg.num_senses, cfg.n_embd)
    content = bp.content_forward(params, cfg, ids)
    gathered = np.asarray(table)[np.asarray(ids)]
    np.testing.assert_allclose(np.asarray(content), gathered, atol=1e-5)


def test_cached_forward_matches_full(setup):
    cfg, params, ids = setup
    full_logits = bp.backpack_forward(params, cfg, ids, use_flash=False)
    cache = bp.init_backpack_cache(cfg, 2, 24, dtype=jnp.float32)
    pre_logits, cache = bp.backpack_forward_with_cache(
        params, cfg, ids[:, :16], cache, use_flash=False)
    np.testing.assert_allclose(np.asarray(pre_logits),
                               np.asarray(full_logits[:, :16]),
                               atol=2e-4, rtol=1e-4)
    for t in range(16, 20):
        step_logits, cache = bp.backpack_forward_with_cache(
            params, cfg, ids[:, t:t + 1], cache, use_flash=False)
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   atol=2e-4, rtol=1e-4)


def test_generate_matches_recompute_oracle(setup):
    """Token-for-token parity of the incremental decode vs the reference-style
    full-prefix recompute (the pattern of reference tests/models/
    test_gpt_generation.py:21-70, applied to Backpack)."""
    cfg, params, ids = setup
    prompt = ids[:, :8]
    max_length = 20
    oracle = generation.generate_backpack_recompute(params, cfg, prompt,
                                                    max_length)
    out = generation.generate_backpack(params, cfg, prompt, max_length,
                                       use_flash=False,
                                       cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(oracle), np.asarray(out.sequences))


def test_sense_weights_hook(setup):
    """Zeroing all senses must zero the output head's input -> uniform-ish
    logits shift; doubling weights must change logits."""
    cfg, params, ids = setup
    base = bp.backpack_forward(params, cfg, ids, use_flash=False)
    w = jnp.ones((cfg.num_senses,))
    same = bp.backpack_forward(params, cfg, ids, use_flash=False,
                               sense_weights=w)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-5)
    w2 = w.at[0].set(0.0)
    changed = bp.backpack_forward(params, cfg, ids, use_flash=False,
                                  sense_weights=w2)
    assert np.abs(np.asarray(base) - np.asarray(changed)).max() > 1e-4


@pytest.mark.parametrize("cache_bits,kv_bits",
                         [(4, None), (4, 8), (8, None), (8, 4)])
def test_int4_cached_decode_tracks_full_forward(setup, cache_bits, kv_bits):
    """INT4 pair-packed caches (and the int4-senses/int8-KV hybrid) must stay
    within quantization-noise distance of the fp full forward, and the
    write/read machinery must be finite through prefill + chunked
    continuation + decode."""
    cfg, params, ids = setup
    full = bp.backpack_forward(params, cfg, ids, use_flash=False)
    cache = bp.init_backpack_cache(cfg, 2, 24, dtype=jnp.int8,
                                   bits=cache_bits, kv_bits=kv_bits)
    assert cache.bits == cache_bits
    assert cache.gpt.bits == (kv_bits or cache_bits)
    pre, cache = bp.backpack_forward_with_cache(params, cfg, ids[:, :8],
                                                cache, use_flash=False)
    # chunked continuation at an even offset
    pre2, cache = bp.backpack_forward_with_cache(params, cfg, ids[:, 8:16],
                                                 cache, use_flash=False)
    got = [np.asarray(pre, np.float32), np.asarray(pre2, np.float32)]
    for t in range(16, 20):
        sl, cache = bp.backpack_forward_with_cache(
            params, cfg, ids[:, t:t + 1], cache, use_flash=False)
        got.append(np.asarray(sl, np.float32))
    got = np.concatenate(got, axis=1)
    ref = np.asarray(full, np.float32)
    assert np.isfinite(got).all()
    # quantization-noise bound: int4 caches at the test scale stay within
    # ~1e-2 of fp logits (measured ~1.5e-3; int8 an order tighter)
    assert np.abs(got - ref).max() < (5e-2 if cache_bits == 4 else 1e-2), \
        np.abs(got - ref).max()


@pytest.mark.parametrize("quant", [False, True, "int4"])
def test_windowed_decode_matches_full_window(setup, quant):
    """Static length-bucket `window` reads only a cache prefix; with
    window >= valid length the logits must match the full-window decode
    exactly (same stored-precision operands, just fewer masked columns)."""
    cfg, params, ids = setup
    dtype = jnp.int8 if quant else jnp.float32
    bits = 4 if quant == "int4" else 8
    if quant:
        from backpacks_flash_attn_tpu.models import quantized as qz
        params = qz.quantize_backpack_params(params, cfg, bits=8)
    cache_a = bp.init_backpack_cache(cfg, 2, 32, dtype=dtype, bits=bits)
    cache_b = bp.init_backpack_cache(cfg, 2, 32, dtype=dtype, bits=bits)
    _, cache_a = bp.backpack_forward_with_cache(params, cfg, ids[:, :8],
                                                cache_a, use_flash=False)
    _, cache_b = bp.backpack_forward_with_cache(params, cfg, ids[:, :8],
                                                cache_b, use_flash=False)
    for t in range(8, 14):
        la, cache_a = bp.backpack_forward_with_cache(
            params, cfg, ids[:, t:t + 1], cache_a, use_flash=False)
        lb, cache_b = bp.backpack_forward_with_cache(
            params, cfg, ids[:, t:t + 1], cache_b, use_flash=False,
            window=16)
        np.testing.assert_allclose(np.asarray(la, np.float32),
                                   np.asarray(lb, np.float32),
                                   atol=1e-5, rtol=1e-5)


def test_chunked_prefill_matches_one_shot(setup):
    """Prefill a prompt in two chunks (second chunk continues at a nonzero
    cache offset via q-offset causal masking) — logits and subsequent decode
    must match the one-shot prefill (roadmap: chunked prefill, serving long
    prompts in bounded-size pieces)."""
    cfg, params, ids = setup
    cache_a = bp.init_backpack_cache(cfg, 2, 32, dtype=jnp.float32)
    la, cache_a = bp.backpack_forward_with_cache(params, cfg, ids[:, :16],
                                                 cache_a, use_flash=False)
    cache_b = bp.init_backpack_cache(cfg, 2, 32, dtype=jnp.float32)
    lb1, cache_b = bp.backpack_forward_with_cache(params, cfg, ids[:, :9],
                                                  cache_b, use_flash=False)
    lb2, cache_b = bp.backpack_forward_with_cache(params, cfg, ids[:, 9:16],
                                                  cache_b, use_flash=False)
    got = np.concatenate([np.asarray(lb1), np.asarray(lb2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(la), atol=2e-4, rtol=1e-4)
    # decode after chunked prefill matches decode after one-shot prefill
    for t in range(16, 19):
        da, cache_a = bp.backpack_forward_with_cache(
            params, cfg, ids[:, t:t + 1], cache_a, use_flash=False)
        db, cache_b = bp.backpack_forward_with_cache(
            params, cfg, ids[:, t:t + 1], cache_b, use_flash=False)
        np.testing.assert_allclose(np.asarray(db), np.asarray(da),
                                   atol=2e-4, rtol=1e-4)


def test_top_p_sampling_restricts_support(setup):
    """Nucleus sampling: every sampled token lies in the smallest
    cumulative-top_p prefix; top_p=1.0 reproduces plain sampling."""
    import numpy as np
    from backpacks_flash_attn_tpu.utils.generation import _select_next

    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.default_rng(0).normal(0, 3.0, (64, 50)),
                         jnp.float32)
    probs = np.asarray(jax.nn.softmax(logits, -1), np.float64)
    top_p = 0.6
    # allowed set per row: descending-prob prefix with cum - p < top_p
    order = np.argsort(-probs, axis=-1)
    allowed = []
    for r in range(probs.shape[0]):
        cum = np.cumsum(probs[r][order[r]])
        keep_n = int(np.searchsorted(cum, top_p) + 1)
        allowed.append(set(order[r][:keep_n].tolist()))
    for seed in range(5):
        toks = np.asarray(_select_next(logits, jax.random.PRNGKey(seed),
                                       1.0, 0, top_p))
        for r, t in enumerate(toks):
            assert int(t) in allowed[r], (r, int(t))
    # top_p=1.0 is bit-identical to the unrestricted path
    a = _select_next(logits, jax.random.PRNGKey(9), 1.0, 0, 1.0)
    b = _select_next(logits, jax.random.PRNGKey(9), 1.0, 0)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_generate_with_top_p(setup):
    cfg, params, _ = setup
    from backpacks_flash_attn_tpu.utils import generation as gen
    ids = jnp.asarray([[3, 1, 4, 1]], jnp.int32)
    out = gen.generate_backpack(params, cfg, ids, 10,
                                rng=jax.random.PRNGKey(0), greedy=False,
                                temperature=1.0, top_p=0.8, use_flash=False,
                                cache_dtype=jnp.float32)
    assert out.sequences.shape == (1, 10)
    assert bool(jnp.all(out.sequences[:, :4] == ids))
