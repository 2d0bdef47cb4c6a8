"""Per-slot (vector-length) cache tests: ragged continuous-batching decode
must match independent per-sequence decode token-for-token. This is the
correctness core of the serving engine (no reference analogue — the reference
decodes uniform batches only, training/src/utils/generation.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import backpack_test
from backpacks_flash_attn_tpu.models import backpack as bp

MAX_LEN = 24


@pytest.fixture(scope="module")
def setup():
    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _single_decode(cfg, params, prompt, steps):
    """Oracle: scalar-length batch-1 prefill + decode."""
    cache = bp.init_backpack_cache(cfg, 1, MAX_LEN, dtype=jnp.float32)
    logits, cache = bp.backpack_forward_with_cache(
        params, cfg, prompt[None], cache, use_flash=False)
    outs = [np.asarray(logits[0, -1])]
    tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    for _ in range(steps - 1):
        logits, cache = bp.backpack_forward_with_cache(
            params, cfg, tok, cache, use_flash=False)
        outs.append(np.asarray(logits[0, -1]))
        tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    return np.stack(outs)


@pytest.mark.parametrize("quant", [False, True])
def test_ragged_slots_match_independent_decode(setup, quant):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = [jnp.asarray(rng.integers(0, cfg.vocab_size, n), jnp.int32)
               for n in (3, 7, 5)]
    steps = 4
    dtype = jnp.int8 if quant else jnp.float32
    tol = dict(rtol=2e-2, atol=2e-1) if quant else dict(rtol=2e-3, atol=2e-3)

    want = []
    for p in prompts:
        cache1 = bp.init_backpack_cache(cfg, 1, MAX_LEN, dtype=dtype)
        logits, cache1 = bp.backpack_forward_with_cache(
            params, cfg, p[None], cache1, use_flash=False)
        outs = [np.asarray(logits[0, -1])]
        tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
        for _ in range(steps - 1):
            logits, cache1 = bp.backpack_forward_with_cache(
                params, cfg, tok, cache1, use_flash=False)
            outs.append(np.asarray(logits[0, -1]))
            tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
        want.append(np.stack(outs))

    # joint per-slot decode: prefill each prompt batch-1 then insert into slots
    big = bp.init_backpack_cache(cfg, 3, MAX_LEN, dtype=dtype, per_slot=True)
    first_tokens = []
    for i, p in enumerate(prompts):
        small = bp.init_backpack_cache(cfg, 1, MAX_LEN, dtype=dtype)
        logits, small = bp.backpack_forward_with_cache(
            params, cfg, p[None], small, use_flash=False)
        big = bp.insert_cache_slot(big, small, i)
        first_tokens.append(int(jnp.argmax(logits[0, -1])))
        np.testing.assert_allclose(np.asarray(logits[0, -1]), want[i][0],
                                   **tol)

    toks = jnp.asarray(first_tokens, jnp.int32)[:, None]
    for t in range(1, steps):
        logits, big = bp.backpack_forward_with_cache(
            params, cfg, toks, big, use_flash=False)
        for i in range(3):
            np.testing.assert_allclose(np.asarray(logits[i, -1]),
                                       want[i][t], **tol)
        toks = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
    # lengths advanced per slot
    np.testing.assert_array_equal(
        np.asarray(big.length),
        np.asarray([len(p) + steps - 1 for p in prompts]))


def test_vector_length_gpt_rotary(setup):
    """Per-slot decode with rotary offsets: each row rotates at its own
    position."""
    from backpacks_flash_attn_tpu.config import gpt2_test
    from backpacks_flash_attn_tpu.models import gpt as gpt_lib
    cfg = gpt2_test(rotary_emb_fraction=0.5, n_positions=0)
    params = gpt_lib.init_gpt_lm(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    prompts = [jnp.asarray(rng.integers(0, cfg.vocab_size, n), jnp.int32)
               for n in (2, 6)]

    # oracle: per-sequence scalar caches
    want = []
    for p in prompts:
        c = gpt_lib.init_kv_cache(cfg, 1, MAX_LEN, jnp.float32)
        h, c = gpt_lib.gpt_forward_with_cache(params, cfg, p[None], c,
                                              use_flash=False)
        tok = jnp.argmax(gpt_lib.lm_logits(params, cfg, h)[0, -1])
        h, c = gpt_lib.gpt_forward_with_cache(
            params, cfg, jnp.asarray([[tok]], jnp.int32), c, use_flash=False)
        want.append(np.asarray(gpt_lib.lm_logits(params, cfg, h)[0, -1]))

    big = gpt_lib.init_kv_cache(cfg, 2, MAX_LEN, jnp.float32, per_slot=True)
    toks = []
    nh = cfg.n_head
    for i, p in enumerate(prompts):
        small = gpt_lib.init_kv_cache(cfg, 1, MAX_LEN, jnp.float32)
        h, small = gpt_lib.gpt_forward_with_cache(params, cfg, p[None], small,
                                                  use_flash=False)
        toks.append(int(jnp.argmax(gpt_lib.lm_logits(params, cfg, h)[0, -1])))
        # flat-E layout: slot i's rows live at [i*n_head, (i+1)*n_head)
        big = big._replace(
            k=jax.lax.dynamic_update_slice(big.k, small.k, (0, i * nh, 0, 0)),
            v=jax.lax.dynamic_update_slice(big.v, small.v, (0, i * nh, 0, 0)),
            length=big.length.at[i].set(small.length))
    h, big = gpt_lib.gpt_forward_with_cache(
        params, cfg, jnp.asarray(toks, jnp.int32)[:, None], big,
        use_flash=False)
    got = np.asarray(gpt_lib.lm_logits(params, cfg, h)[:, -1])
    for i in range(2):
        np.testing.assert_allclose(got[i], want[i], rtol=2e-3, atol=2e-3)
