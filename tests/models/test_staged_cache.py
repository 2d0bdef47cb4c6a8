"""Staging-block serving cache (gpt/backpack `stage=`) vs the per-slot oracle.

The staged decode appends K/V/sense writes to a C-column block at a SCALAR
pointer and merges main+staged segments in one softmax; flush_cache folds the
block into the main cache. These tests pin the staged path token-for-token
against the plain per-slot cache across flushes, speculative-style rollbacks,
multi-token verification steps, and int8 quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import BackpackConfig
from backpacks_flash_attn_tpu.models import backpack as bp
from backpacks_flash_attn_tpu.models import gpt as g


@pytest.fixture(scope="module")
def setup():
    cfg = BackpackConfig(vocab_size=512, n_positions=64, n_embd=64,
                         n_layer=2, n_head=4, num_senses=4,
                         pad_vocab_size_multiple=8)
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.int8, 2e-3)])
def test_staged_decode_tracks_per_slot_oracle(setup, dtype, tol):
    cfg, params = setup
    b, p, S, C = 2, 5, 32, 8
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, p), 0, cfg.vocab_size)
    if dtype == jnp.int8:
        from backpacks_flash_attn_tpu.models import quantized as qz
        params = qz.quantize_backpack_params(params, cfg, bits=8)

    ref = bp.init_backpack_cache(cfg, b, S, dtype=dtype, per_slot=True)
    st = bp.init_backpack_cache(cfg, b, S, dtype=dtype, per_slot=True,
                                stage=C)
    lr, ref = bp.backpack_forward_with_cache(params, cfg, ids, ref,
                                             use_flash=False)
    ls, st = bp.backpack_forward_with_cache(params, cfg, ids, st,
                                            use_flash=False)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lr), atol=tol,
                               rtol=tol)
    tok = jnp.argmax(lr[:, -1:], -1).astype(jnp.int32)
    for step in range(6):
        wr, ref = bp.backpack_forward_with_cache(params, cfg, tok, ref,
                                                 use_flash=False)
        ws, st = bp.backpack_forward_with_cache(params, cfg, tok, st,
                                                use_flash=False)
        np.testing.assert_allclose(np.asarray(ws), np.asarray(wr), atol=tol,
                                   rtol=tol, err_msg=f"step {step}")
        if step == 1:  # mid-sequence flush must be transparent
            st = bp.flush_cache(st)
            assert int(st.gpt.stage_ptr) == 0
            np.testing.assert_array_equal(np.asarray(st.gpt.base_len),
                                          np.asarray(st.length))
        tok = jnp.argmax(wr[:, -1], -1)[:, None].astype(jnp.int32)
    # flushing at the end reproduces the oracle's MAIN cache contents
    st = bp.flush_cache(st)
    n = int(np.asarray(ref.length)[0])
    for a, b_ in ((st.ctx_k[:, :, :n], ref.ctx_k[:, :, :n]),
                  (st.content[:, :n], ref.content[:, :n]),
                  (st.gpt.k[..., :n], ref.gpt.k[..., :n]),
                  (st.gpt.v[:, :, :n], ref.gpt.v[:, :, :n])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=tol, rtol=tol)


def test_staged_multi_query_and_rollback(setup):
    """Speculative-verification shape: a (1+k)-token staged step whose
    lengths then roll back — the rolled-back staged entries must be masked
    out and safely overwritten by the next write."""
    cfg, params = setup
    b, p, S, C, k = 2, 4, 32, 8, 2
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, p), 0, cfg.vocab_size)
    ref = bp.init_backpack_cache(cfg, b, S, dtype=jnp.float32, per_slot=True)
    st = bp.init_backpack_cache(cfg, b, S, dtype=jnp.float32, per_slot=True,
                                stage=C)
    _, ref = bp.backpack_forward_with_cache(params, cfg, ids, ref,
                                            use_flash=False)
    _, st = bp.backpack_forward_with_cache(params, cfg, ids, st,
                                           use_flash=False)
    inp = jax.random.randint(jax.random.PRNGKey(3), (b, 1 + k), 0,
                             cfg.vocab_size)
    wr, ref_v = bp.backpack_forward_with_cache(params, cfg, inp, ref,
                                               use_flash=False)
    ws, st_v = bp.backpack_forward_with_cache(params, cfg, inp, st,
                                              use_flash=False)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(wr), atol=2e-5,
                               rtol=2e-5)
    # roll back to +1 accepted token (engine semantics: lengths rewind)
    roll = ref.length + 1
    ref_r = ref_v._replace(length=roll, gpt=ref_v.gpt._replace(length=roll))
    st_r = st_v._replace(length=roll, gpt=st_v.gpt._replace(length=roll))
    tok = inp[:, 1:2]
    wr2, _ = bp.backpack_forward_with_cache(params, cfg, tok, ref_r,
                                            use_flash=False)
    ws2, _ = bp.backpack_forward_with_cache(params, cfg, tok, st_r,
                                            use_flash=False)
    np.testing.assert_allclose(np.asarray(ws2), np.asarray(wr2), atol=2e-5,
                               rtol=2e-5)


def test_staged_insert_slot_invalidates(setup):
    """Admission into a staged cache: the fresh slot's flushed horizon is the
    prefill length, its staged entries are invalidated, and other slots'
    staged entries keep working."""
    cfg, params = setup
    b, S, C = 2, 32, 8
    st = bp.init_backpack_cache(cfg, b, S, dtype=jnp.float32, per_slot=True,
                                stage=C)
    ids = jax.random.randint(jax.random.PRNGKey(4), (b, 4), 0, cfg.vocab_size)
    lg, st = bp.backpack_forward_with_cache(params, cfg, ids, st,
                                            use_flash=False)
    tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
    _, st = bp.backpack_forward_with_cache(params, cfg, tok, st,
                                           use_flash=False)
    # admit a new request into slot 1
    pids = jax.random.randint(jax.random.PRNGKey(5), (1, 3), 0,
                              cfg.vocab_size)
    small = bp.init_backpack_cache(cfg, 1, S, dtype=jnp.float32,
                                   per_slot=True)
    plg, small = bp.backpack_forward_with_cache(params, cfg, pids, small,
                                                use_flash=False)
    st = bp.insert_cache_slot(st, small, 1)
    assert int(np.asarray(st.gpt.base_len)[1]) == 3
    assert (np.asarray(st.gpt.stage_pos)[1] == -1).all()
    # both slots keep decoding against a fresh per-slot oracle built the
    # same way
    ref = bp.init_backpack_cache(cfg, b, S, dtype=jnp.float32, per_slot=True)
    _, ref = bp.backpack_forward_with_cache(params, cfg, ids, ref,
                                            use_flash=False)
    _, ref = bp.backpack_forward_with_cache(params, cfg, tok, ref,
                                            use_flash=False)
    ref = bp.insert_cache_slot(ref, small, 1)
    nxt = jnp.concatenate([tok[:1], jnp.argmax(plg[:, -1:], -1).astype(
        jnp.int32)], axis=0)
    for _ in range(3):
        wr, ref = bp.backpack_forward_with_cache(params, cfg, nxt, ref,
                                                 use_flash=False)
        ws, st = bp.backpack_forward_with_cache(params, cfg, nxt, st,
                                                use_flash=False)
        np.testing.assert_allclose(np.asarray(ws), np.asarray(wr),
                                   atol=2e-5, rtol=2e-5)
        nxt = jnp.argmax(wr[:, -1], -1)[:, None].astype(jnp.int32)
