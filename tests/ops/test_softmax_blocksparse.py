"""Fused-softmax baseline ops + blocksparse flash attention tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops import softmax as sm
from backpacks_flash_attn_tpu.ops.attention import mha_reference
from backpacks_flash_attn_tpu.ops.flash_attention import (
    flash_attention, flash_blocksparse_attention)


def test_scaled_masked_softmax():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 8)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(2, 1, 8, 8)) < 0.3)
    got = np.asarray(sm.scaled_masked_softmax(x, mask, scale=0.5))
    want = jax.nn.softmax(jnp.where(mask, -10000.0, x * 0.5), axis=-1)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)
    # masked entries ~ 0
    assert got[np.broadcast_to(np.asarray(mask), got.shape)].max() < 1e-4


def test_scaled_upper_triang_softmax():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2, 6, 6))
                    .astype(np.float32))
    got = np.asarray(sm.scaled_upper_triang_masked_softmax(x, scale=2.0))
    triu = np.triu(np.ones((6, 6)), 1).astype(bool)
    assert np.abs(got[..., triu]).max() < 1e-4
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_fused_scale_mask_softmax_dispatcher():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 1, 4, 4))
                    .astype(np.float32))
    causal = sm.FusedScaleMaskSoftmax(causal=True, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(causal(x)),
        np.asarray(sm.scaled_upper_triang_masked_softmax(x)), rtol=1e-6)
    plain = sm.FusedScaleMaskSoftmax(causal=False, scale=1.0)
    np.testing.assert_allclose(np.asarray(plain(x, None)),
                               np.asarray(sm.scaled_masked_softmax(x, None)),
                               rtol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_blocksparse_matches_dense_masked(causal):
    """Blocksparse flash output == reference attention with the blockmask
    expanded to an elementwise mask (the reference's oracle strategy,
    tests/test_flash_attn.py blocksparse section)."""
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 256, 2, 64
    bq = bk = 128
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
               for _ in range(3))
    blockmask = jnp.asarray([[1, 0], [1, 1]], jnp.int32)     # (s/bq, s/bk)

    out = flash_blocksparse_attention(q, k, v, blockmask, causal=causal,
                                      block_q=bq, block_k=bk)

    # dense oracle with expanded mask
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
    em = np.kron(np.asarray(blockmask), np.ones((bq, bk))).astype(bool)
    if causal:
        em &= np.tril(np.ones((s, s), bool))
    scores = jnp.where(jnp.asarray(em)[None, None], scores, -1e9)
    p = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bhts,bshd->bthd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_blocksparse_full_mask_equals_dense():
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 256, 2, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
               for _ in range(3))
    ones = jnp.ones((2, 2), jnp.int32)
    sparse = flash_blocksparse_attention(q, k, v, ones, causal=True,
                                         block_q=128, block_k=128)
    dense = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               atol=1e-5)


def test_dropout_add_ln_rowscale_colscale():
    """rowscale (stochastic depth) and colscale (layerscale) semantics
    (reference ln_api.cpp rowscale/colscale; tests/ops/
    test_dropout_layer_norm.py)."""
    from backpacks_flash_attn_tpu.ops.norms import (dropout_add_layer_norm,
                                                    layer_norm)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    w, b = jnp.ones((8,)), jnp.zeros((8,))
    rows = jnp.asarray(rng.integers(0, 2, (2, 4)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0.5, 1.5, (8,)).astype(np.float32))
    got, new_res = dropout_add_layer_norm(x, res, w, b, 0.0,
                                          rowscale=rows, colscale=cols)
    want_res = (x * cols) * rows[..., None] + res
    np.testing.assert_allclose(np.asarray(new_res), np.asarray(want_res),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(layer_norm(want_res, w, b)),
                               rtol=1e-5)


def test_blocksparse_empty_row_and_ragged():
    """Compacted-table kernel edge cases: a q row with NO active tiles
    (zeros out), uneven per-row densities, and seq_lengths masking."""
    rng = np.random.default_rng(5)
    b, s, h, d = 2, 384, 2, 64
    bq = bk = 128
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
               for _ in range(3))
    blockmask = jnp.asarray([[0, 0, 0],
                             [1, 0, 0],
                             [1, 0, 1]], jnp.int32)
    lens = jnp.array([384, 200], jnp.int32)
    out = flash_blocksparse_attention(q, k, v, blockmask, causal=False,
                                      seq_lengths=lens, block_q=bq,
                                      block_k=bk)
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
    em = np.kron(np.asarray(blockmask), np.ones((bq, bk))).astype(bool)
    em = np.broadcast_to(em, (b, s, s)).copy()
    em[0, :, 384:] = False
    em[1, :, 200:] = False
    scores = jnp.where(jnp.asarray(em)[:, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.nan_to_num(p)       # fully-masked rows -> zeros like the kernel
    want = jnp.einsum("bhts,bshd->bthd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=3e-5, rtol=1e-4)
    assert np.abs(np.asarray(out[:, :128])).max() == 0.0  # empty q row


@pytest.mark.parametrize("causal", [False, True])
def test_blocksparse_backward_matches_dense_masked(causal):
    """Blocksparse grads == the dense-masked oracle's grads (the reference's
    bwd_block capability, csrc/flash_attn/fmha_api.cpp:631)."""
    rng = np.random.default_rng(5)
    b, s, h, d = 1, 256, 2, 64
    bq = bk = 128
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
               for _ in range(3))
    t = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    blockmask = jnp.asarray([[1, 0], [1, 1]], jnp.int32)
    scale = 1.0 / math.sqrt(d)

    def loss_sparse(q, k, v):
        out = flash_blocksparse_attention(q, k, v, blockmask, causal=causal,
                                          block_q=bq, block_k=bk)
        return jnp.sum(out * t)

    em = np.kron(np.asarray(blockmask), np.ones((bq, bk))).astype(bool)
    if causal:
        em &= np.tril(np.ones((s, s), bool))
    em = jnp.asarray(em)

    def loss_dense(q, k, v):
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
        scores = jnp.where(em[None, None], scores, -1e9)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", p, v)
        return jnp.sum(out * t)

    gs = jax.grad(loss_sparse, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gs, gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3, err_msg=name)
