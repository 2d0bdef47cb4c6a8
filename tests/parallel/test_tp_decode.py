"""Overlapped TP decode (parallel/tp_decode.py) vs the unsharded oracle.

The shard_map + ppermute decode step re-derives every collective by hand
(ring psum for row-parallel projections, vocab-sharded lm head + all_gather,
sense-sharded contextualization); these tests pin it token-for-token against
models/backpack.backpack_forward_with_cache on the virtual 8-device CPU mesh
(data=2 x model=4) across cache dtypes, per-slot lengths, and windows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import BackpackConfig
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.parallel import tp_decode
from backpacks_flash_attn_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = BackpackConfig(vocab_size=512, n_positions=64, n_embd=64,
                         n_layer=2, n_head=4, num_senses=4,
                         pad_vocab_size_multiple=8)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh(data=2, model=4)
    return cfg, params, mesh


def _prefill(cfg, params, ids, max_len, dtype, per_slot=False):
    cache = bp.init_backpack_cache(cfg, ids.shape[0], max_len, dtype=dtype,
                                   per_slot=per_slot)
    logits, cache = bp.backpack_forward_with_cache(params, cfg, ids, cache,
                                                   use_flash=False)
    return logits, cache


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
def test_tp_decode_matches_unsharded(setup, dtype):
    cfg, params, mesh = setup
    b, p, steps, max_len = 4, 5, 4, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, p), 0, cfg.vocab_size)

    logits, cache = _prefill(cfg, params, ids, max_len, dtype)
    step, prepare = tp_decode.make_tp_decode_step(cfg, mesh)
    tp_params, tp_cache = prepare(params, cache)

    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    for _ in range(steps):
        want, cache = bp.backpack_forward_with_cache(params, cfg, tok, cache,
                                                     use_flash=False)
        got, tp_cache = step(tp_params, tok, tp_cache)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
        nxt_want = jnp.argmax(want[:, -1], -1)
        nxt_got = jnp.argmax(got[:, -1], -1)
        np.testing.assert_array_equal(np.asarray(nxt_got),
                                      np.asarray(nxt_want))
        tok = nxt_want[:, None].astype(jnp.int32)

    # updated caches must round-trip to the unsharded layout exactly
    back = tp_decode.from_tp_cache(jax.device_get(tp_cache), cfg)
    for a, b_ in zip(jax.tree.leaves(back), jax.tree.leaves(cache)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=2e-3, atol=2e-3)


def test_tp_decode_int8_weights_matches_quantized_unsharded(setup):
    """The flagship north-star config on the latency-optimized path: INT8
    QuantWeight trees + INT8 caches + the quantized sense table, oracle'd
    against the single-chip quantized decode. The TP body dequant-fuses each
    weight shard into its local dot, shards the sense table over 'model',
    and computes vocab-sharded logits straight from the INT8 wte shard."""
    from backpacks_flash_attn_tpu.models import quantized as qz

    cfg, params, mesh = setup
    qp = qz.quantize_backpack_params(params, cfg, bits=8)
    b, p, steps, max_len = 4, 5, 3, 16
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, p), 0, cfg.vocab_size)

    logits, cache = _prefill(cfg, qp, ids, max_len, jnp.int8)
    step, prepare = tp_decode.make_tp_decode_step(cfg, mesh)
    tp_params, tp_cache = prepare(qp, cache)

    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    for _ in range(steps):
        want, cache = bp.backpack_forward_with_cache(qp, cfg, tok, cache,
                                                     use_flash=False)
        got, tp_cache = step(tp_params, tok, tp_cache)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
        # greedy agreement up to exact ties: the TP logits come off a
        # different (vocab-sharded) reduction order, so a random-init near-tie
        # may flip argmax while both logits agree to ~1e-5
        w, g = np.asarray(want)[:, -1], np.asarray(got)[:, -1]
        picked = np.take_along_axis(w, g.argmax(-1)[:, None], -1)[:, 0]
        np.testing.assert_allclose(picked, w.max(-1), rtol=0, atol=1e-4)
        tok = jnp.argmax(want[:, -1], -1)[:, None].astype(jnp.int32)


def test_tp_decode_per_slot_lengths_and_window(setup):
    """Serving shapes: per-row length counters at different positions, with a
    static window bucket folded into the cache reads."""
    cfg, params, mesh = setup
    b, max_len, window = 4, 16, 8
    lengths = [2, 5, 3, 4]

    # build a per-slot cache by prefilling each row alone then inserting
    cache = bp.init_backpack_cache(cfg, b, max_len, dtype=jnp.float32,
                                   per_slot=True)
    last = []
    for i, ln in enumerate(lengths):
        ids = jax.random.randint(jax.random.PRNGKey(10 + i), (1, ln), 0,
                                 cfg.vocab_size)
        lg, small = _prefill(cfg, params, ids, max_len, jnp.float32)
        cache = bp.insert_cache_slot(cache, small, i)
        last.append(int(jnp.argmax(lg[0, -1])))
    tok = jnp.asarray(last, jnp.int32)[:, None]

    step, prepare = tp_decode.make_tp_decode_step(cfg, mesh, window=window)
    tp_params, tp_cache = prepare(params, cache)
    for _ in range(2):
        want, cache = bp.backpack_forward_with_cache(
            params, cfg, tok, cache, use_flash=False, window=window)
        got, tp_cache = step(tp_params, tok, tp_cache)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
        tok = jnp.argmax(want[:, -1], -1)[:, None].astype(jnp.int32)


def test_tp_decode_single_microbatch_fallback(setup):
    """dp=8 leaves one local row — the unstaggered schedule must also match."""
    cfg, params, _ = setup
    mesh = make_mesh(data=4, model=2)
    b, p, max_len = 4, 3, 16
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, p), 0, cfg.vocab_size)
    logits, cache = _prefill(cfg, params, ids, max_len, jnp.float32)
    step, prepare = tp_decode.make_tp_decode_step(cfg, mesh, microbatches=1)
    tp_params, tp_cache = prepare(params, cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    want, _ = bp.backpack_forward_with_cache(params, cfg, tok, cache,
                                             use_flash=False)
    got, _ = step(tp_params, tok, tp_cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
