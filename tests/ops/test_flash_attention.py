"""Flash-attention kernel correctness vs the fp32 reference implementation.

Follows the reference's flagship test pattern (reference:
tests/test_flash_attn.py:350-439): sweep dtype x causal x head_dim x seqlen
(including non-multiples of the block size), compare the kernel against an
fp32 reference, and require kernel error <= 2x the low-precision baseline
error rather than fixed tolerances. Also includes the determinism/"race
condition" test (reference :736): repeated invocations must agree bitwise.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from backpacks_flash_attn_tpu.ops.attention import mha_reference
from backpacks_flash_attn_tpu.ops.flash_attention import (
    flash_attention, flash_attention_with_lse)


def _make_qkv(key, b, s, h, d, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, s, h, d), dtype)
    k = jax.random.normal(k2, (b, s, h, d), dtype)
    v = jax.random.normal(k3, (b, s, h, d), dtype)
    return q, k, v


def _ref_fp32(q, k, v, causal, seq_lengths=None):
    mask = None
    if seq_lengths is not None:
        mask = (np.arange(k.shape[1])[None, :]
                < np.asarray(seq_lengths)[:, None])
        mask = jnp.asarray(mask)
    return mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), causal=causal,
                         key_padding_mask=mask)


def _baseline_lowp(q, k, v, causal, dtype):
    """Honest low-precision baseline: bf16 operands, fp32 accumulation, probs
    downcast before the PV contraction — the kernel's precision profile
    (mha_reference itself computes in fp32; reference test_flash_attn.py
    uses the same 'fp16 torch baseline' role)."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(dtype),
                        (k.astype(jnp.float32) * scale).astype(dtype),
                        preferred_element_type=jnp.float32)
    if causal:
        sq = q.shape[1]
        mask = jnp.tril(jnp.ones((sq, sq), bool))
        scores = jnp.where(mask[None, None], scores, -1e4)
    attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bhts,bshd->bthd", attn, v.astype(dtype),
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("s,d", [(128, 64), (200, 64), (384, 48), (97, 128)])
def test_flash_vs_reference(dtype, causal, s, d):
    q, k, v = _make_qkv(jax.random.PRNGKey(0), 2, s, 3, d, dtype)
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    ref = _ref_fp32(q, k, v, causal)
    baseline = _baseline_lowp(q, k, v, causal, dtype)
    err_kernel = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    err_base = np.abs(np.asarray(baseline, np.float32) - np.asarray(ref)).max()
    # reference acceptance rule: kernel error <= 2x baseline error (+eps)
    assert err_kernel <= 2 * err_base + 1e-5, (err_kernel, err_base)


def test_flash_seq_lengths():
    """Padded ragged batch: masked key positions must not contribute."""
    dtype = jnp.float32
    q, k, v = _make_qkv(jax.random.PRNGKey(1), 3, 160, 2, 64, dtype)
    lengths = jnp.array([160, 100, 37], jnp.int32)
    out = flash_attention(q, k, v, causal=True, seq_lengths=lengths,
                          block_q=128, block_k=128)
    ref = _ref_fp32(q, k, v, True, lengths)
    # only compare valid query rows
    for i, L in enumerate([160, 100, 37]):
        np.testing.assert_allclose(np.asarray(out[i, :L]),
                                   np.asarray(ref[i, :L]), atol=2e-5, rtol=1e-4)


def test_flash_lse():
    """LSE output must equal logsumexp of the masked score rows
    (the reference fwd's softmax_lse, fmha_api.cpp:277)."""
    q, k, v = _make_qkv(jax.random.PRNGKey(2), 1, 128, 2, 64, jnp.float32)
    scale = 1.0 / math.sqrt(64)
    _, lse = flash_attention_with_lse(q, k, v, causal=True)
    scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
    mask = np.tril(np.ones((128, 128))).astype(bool)
    scores = jnp.where(jnp.asarray(mask)[None, None], scores, -jnp.inf)
    ref_lse = jax.scipy.special.logsumexp(scores, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=1e-4, rtol=1e-4)


def test_flash_determinism():
    """Reference race-condition test (tests/test_flash_attn.py:736): repeated
    runs on identical inputs must be bitwise identical."""
    q, k, v = _make_qkv(jax.random.PRNGKey(3), 2, 256, 4, 64, jnp.bfloat16)
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
    out0 = np.asarray(f(q, k, v))
    for _ in range(5):
        np.testing.assert_array_equal(out0, np.asarray(f(q, k, v)))


def test_flash_grad():
    """custom_vjp backward matches autodiff through the fp32 reference."""
    q, k, v = _make_qkv(jax.random.PRNGKey(4), 1, 64, 2, 32, jnp.float32)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, causal=True, block_q=64, block_k=64).sum()

    def loss_ref(q, k, v):
        return mha_reference(q, k, v, causal=True).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
