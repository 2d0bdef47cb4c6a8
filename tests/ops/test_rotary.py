"""Rotary/XPos tests (reference: tests/test_rotary.py — kernel vs
apply_rotary_emb_torch; here the oracle is the reference's own torch formula
plus structural properties the CUDA test can't check cheaply)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.config import gpt2_test
from backpacks_flash_attn_tpu.models import gpt as gpt_lib
from backpacks_flash_attn_tpu.ops import rotary

from tests.conftest import reference_available


def _torch_rotary_oracle(x, cos, sin):
    """The reference's pure-torch rotary (flash_attn/layers/rotary.py:18-28),
    run on CPU as the oracle."""
    import torch

    def rotate_half(t):
        t1, t2 = t.chunk(2, dim=-1)
        return torch.cat((-t2, t1), dim=-1)

    rotary_dim = cos.shape[-1] * 2
    cos = cos.repeat(1, 2)[:, None, :]          # (s, 1, rotary_dim)
    sin = sin.repeat(1, 2)[:, None, :]
    return torch.cat(
        [x[..., :rotary_dim] * cos + rotate_half(x[..., :rotary_dim]) * sin,
         x[..., rotary_dim:]], dim=-1)


@pytest.mark.skipif(not reference_available(), reason="no reference mounted")
@pytest.mark.parametrize("rotary_dim,head_dim", [(16, 16), (8, 16), (32, 64)])
def test_apply_rotary_matches_torch_reference(rotary_dim, head_dim):
    import torch
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 10, 3, head_dim)).astype(np.float32)
    pos = jnp.arange(10)
    cos, sin, _, _ = rotary.rotary_cos_sin(pos, rotary_dim)
    got = np.asarray(rotary.apply_rotary(jnp.asarray(x), cos, sin))
    want = _torch_rotary_oracle(torch.from_numpy(x),
                                torch.from_numpy(np.asarray(cos)),
                                torch.from_numpy(np.asarray(sin))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rotary_preserves_norm_and_passthrough():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 2, 32)).astype(np.float32))
    cos, sin, _, _ = rotary.rotary_cos_sin(jnp.arange(6), 16)
    out = rotary.apply_rotary(x, cos, sin)
    # rotation preserves the norm of the rotated slice
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[..., :16]), axis=-1),
        np.linalg.norm(np.asarray(x[..., :16]), axis=-1), rtol=1e-5)
    # channels past rotary_dim pass through untouched
    np.testing.assert_array_equal(np.asarray(out[..., 16:]),
                                  np.asarray(x[..., 16:]))


@pytest.mark.parametrize("scale_base", [0, 32])
def test_rotary_scores_are_relative(scale_base):
    """q.k^T after rotary (or XPos) depends only on pos_q - pos_k: shifting
    both by the same offset must not change the score."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 5, 1, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 5, 1, 16)).astype(np.float32))

    def scores(offset):
        qr, kr = rotary.apply_rotary_qk(q, k, 16, seqlen_offset=offset,
                                        scale_base=scale_base)
        return np.einsum("bthd,bshd->bts", np.asarray(qr), np.asarray(kr))

    np.testing.assert_allclose(scores(0), scores(7), rtol=1e-4, atol=1e-5)


def test_xpos_decays_with_distance():
    """XPos attenuates scores as |pos_q - pos_k| grows (the point of it)."""
    q = jnp.ones((1, 32, 1, 16), jnp.float32)
    k = jnp.ones((1, 32, 1, 16), jnp.float32)
    qr, kr = rotary.apply_rotary_qk(q, k, 16, scale_base=8)
    s = np.einsum("bthd,bshd->bts", np.asarray(qr), np.asarray(kr))[0]
    # fixed query at the last position: magnitude of score decays into the past
    mags = np.abs(s[31])
    assert mags[31] > mags[0]


@pytest.mark.parametrize("scale_base", [0, 16])
def test_gpt_rotary_cached_decode_matches_full(scale_base):
    """KV-cached decode with rotary must match the full forward token-for-token
    (the mha.py:425-440 protocol, with rotated keys in the cache)."""
    cfg = gpt2_test(rotary_emb_fraction=0.5,
                    rotary_emb_scale_base=scale_base,
                    n_positions=0)  # rotary replaces learned positions
    params = gpt_lib.init_gpt_lm(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, cfg.vocab_size)

    full = gpt_lib.gpt_lm_forward(params, cfg, ids, use_flash=False)

    cache = gpt_lib.init_kv_cache(cfg, 2, 16, jnp.float32)
    logits_p, cache = (lambda h, c: (gpt_lib.lm_logits(params, cfg, h), c))(
        *gpt_lib.gpt_forward_with_cache(params, cfg, ids[:, :4], cache,
                                        use_flash=False))
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, :4]),
                               rtol=2e-4, atol=2e-4)
    for t in range(4, 9):
        hidden, cache = gpt_lib.gpt_forward_with_cache(
            params, cfg, ids[:, t:t + 1], cache, use_flash=False)
        step_logits = gpt_lib.lm_logits(params, cfg, hidden)
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=2e-4, atol=2e-4)
