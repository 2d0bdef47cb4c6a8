"""Multi-head attention ops: XLA reference path + dispatch to the Pallas flash kernel.

Covers the capability of the reference's SelfAttention/CrossAttention einsum path
(reference: flash_attn/modules/mha.py:179-276) and the FlashAttention CUDA kernel
(reference: csrc/flash_attn/fmha_api.cpp:190,338) via ops/flash_attention.py.

The reference handles ragged batches with cu_seqlens prefix sums
(fmha_api.cpp:190-196). XLA wants static shapes, so raggedness is expressed as
padded batches + boolean key-padding masks / per-sequence lengths here; the
serving layer (continuous batching) keeps shapes static across steps.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# Matches the reference's additive mask constant (mha.py:210,218). Large enough
# to zero out the softmax in fp32/bf16 without producing NaNs via inf-inf.
MASK_VALUE = -10000.0


def _apply_masks(scores: jax.Array, *, causal: bool,
                 key_padding_mask: Optional[jax.Array],
                 q_offset: int | jax.Array = 0) -> jax.Array:
    """scores: (b, h, sq, sk). key_padding_mask: (b, sk) True=keep.
    q_offset: scalar or (b,) per-sequence absolute position of q row 0."""
    b, h, sq, sk = scores.shape
    if key_padding_mask is not None:
        pad = jnp.where(key_padding_mask, 0.0, MASK_VALUE).astype(scores.dtype)
        scores = scores + pad[:, None, None, :]
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        off = jnp.asarray(q_offset, jnp.int32)
        if off.ndim == 1:                      # per-sequence offsets
            keep = k_pos[None] <= q_pos[None] + off[:, None, None]
            cmask = jnp.where(keep, 0.0, MASK_VALUE).astype(scores.dtype)
            scores = scores + cmask[:, None]
        else:
            cmask = jnp.where(k_pos <= q_pos + off, 0.0,
                              MASK_VALUE).astype(scores.dtype)
            scores = scores + cmask[None, None]
    return scores


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array, *,
                  causal: bool = True,
                  softmax_scale: Optional[float] = None,
                  key_padding_mask: Optional[jax.Array] = None,
                  q_offset: int | jax.Array = 0,
                  dropout_p: float = 0.0,
                  dropout_rng: Optional[jax.Array] = None,
                  deterministic: bool = True) -> jax.Array:
    """Reference attention, O(s^2) memory; oracle for the flash kernel.

    q: (b, sq, h, dh); k, v: (b, sk, h, dh)  ->  (b, sq, h, dh)
    Semantics follow flash_attn/modules/mha.py:195-224: scale applied to k,
    additive -10000 masks, softmax in fp32.
    """
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    # fp32 operands: this is the oracle/CPU path (flash is the TPU path), and
    # XLA:CPU's thunk runtime has no bf16 x bf16 dot kernel for the fused
    # transpose layouts the cached decode produces.
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32) * scale,
                        preferred_element_type=jnp.float32)
    scores = _apply_masks(scores, causal=causal,
                          key_padding_mask=key_padding_mask, q_offset=q_offset)
    attn = jax.nn.softmax(scores, axis=-1)
    if dropout_p > 0.0 and not deterministic and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_p), 0.0)
    return jnp.einsum("bhts,bshd->bthd", attn, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(q.dtype)


def mha(q: jax.Array, k: jax.Array, v: jax.Array, *,
        causal: bool = True,
        softmax_scale: Optional[float] = None,
        key_padding_mask: Optional[jax.Array] = None,
        seq_lengths: Optional[jax.Array] = None,
        dropout_p: float = 0.0,
        dropout_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        q_offset: int | jax.Array = 0,
        use_flash: bool = True) -> jax.Array:
    """Dispatching attention entry point (the analogue of FlashSelfAttention /
    SelfAttention selection in the reference's MHA, mha.py:328-329).
    q_offset: scalar or (b,) absolute position of q row 0 (chunked prefill
    over a pre-populated KV prefix)."""
    dropout_active = dropout_p > 0.0 and not deterministic
    has_offset = not (isinstance(q_offset, int) and q_offset == 0)
    if use_flash and (not dropout_active or dropout_rng is not None):
        from .flash_attention import flash_attention  # local import: avoids cycle
        if key_padding_mask is not None and seq_lengths is None:
            seq_lengths = key_padding_mask.sum(axis=-1).astype(jnp.int32)
        return flash_attention(
            q, k, v, causal=causal, softmax_scale=softmax_scale,
            seq_lengths=seq_lengths,
            dropout_p=dropout_p if dropout_active else 0.0,
            dropout_rng=dropout_rng if dropout_active else None,
            q_offsets=q_offset if has_offset else None)
    if seq_lengths is not None and key_padding_mask is None:
        sk = k.shape[1]
        key_padding_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, sk), 1)
                            < seq_lengths[:, None])
    return mha_reference(q, k, v, causal=causal, softmax_scale=softmax_scale,
                         key_padding_mask=key_padding_mask, dropout_p=dropout_p,
                         dropout_rng=dropout_rng, deterministic=deterministic,
                         q_offset=q_offset)


def mha_qkv_packed(qkv: jax.Array, *, causal: bool = True,
                   softmax_scale: Optional[float] = None,
                   dropout_p: float = 0.0,
                   dropout_rng: Optional[jax.Array] = None,
                   deterministic: bool = True,
                   use_flash: bool = True) -> jax.Array:
    """Fused-QKV self-attention entry: qkv (b, s, 3, h, dh) -> (b, s, h, dh).

    The packed analogue of mha() for the ordinary training/prefill case (no
    padding mask, no prefix offset): the flash path keeps qkv packed through
    ONE layout transform instead of three slice+transpose chains (reference:
    flash_attn_unpadded_qkvpacked_func keeps qkv packed into the kernel,
    flash_attn_interface.py:242-283)."""
    dropout_active = dropout_p > 0.0 and not deterministic
    if use_flash and (not dropout_active or dropout_rng is not None):
        from .flash_attention import flash_attention_qkv_packed
        return flash_attention_qkv_packed(
            qkv, causal=causal, softmax_scale=softmax_scale,
            dropout_p=dropout_p if dropout_active else 0.0,
            dropout_rng=dropout_rng if dropout_active else None)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    return mha_reference(q, k, v, causal=causal, softmax_scale=softmax_scale,
                         dropout_p=dropout_p, dropout_rng=dropout_rng,
                         deterministic=deterministic)


def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     cache_len: jax.Array, *,
                     softmax_scale: Optional[float] = None) -> jax.Array:
    """Single-step attention over a static-shaped KV cache.

    q: (b, 1, h, dh); k_cache/v_cache: (b, S, h, dh); cache_len: (b,) or scalar,
    number of valid positions (including the new token already written).

    The analogue of the reference's decode step (mha.py:432-440: q from the new
    token, cross-attn over cache slice with causal=False) but with a static
    cache shape + length masking so the step jits once for the whole decode.
    """
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bthd,bshd->bhts", q, k_cache * scale,
                        preferred_element_type=jnp.float32)
    s = k_cache.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
    valid = pos[None, :] < jnp.asarray(cache_len, jnp.int32).reshape(-1, 1)
    scores = jnp.where(valid[:, None, None, :], scores, MASK_VALUE)
    attn = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    return jnp.einsum("bhts,bshd->bthd", attn, v_cache,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def decode_attention_quant(q: jax.Array, k_cache: jax.Array,
                           k_scale: jax.Array, v_cache: jax.Array,
                           v_scale: jax.Array, cache_len: jax.Array, *,
                           softmax_scale: Optional[float] = None) -> jax.Array:
    """Single-step attention over an INT8 KV cache with dequant scales folded
    into the score/probability tensors (no dequantized cache is ever
    materialized in HBM — the reference has no quantized-cache analogue; this
    is the BASELINE.md INT8-KV-cache requirement).

    q: (b, 1, h, dh) bf16; k_cache/v_cache: (b, S, h, dh) int8;
    k_scale/v_scale: (b, S, h, 1) f32.
    """
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    # scores[b,h,t,s] = (q . k8) * k_scale[b,s,h]
    scores = jnp.einsum("bthd,bshd->bhts", q * scale,
                        k_cache.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.transpose(k_scale[..., 0], (0, 2, 1))[:, :, None, :]
    s = k_cache.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
    valid = pos[None, :] < jnp.asarray(cache_len, jnp.int32).reshape(-1, 1)
    scores = jnp.where(valid[:, None, None, :], scores, MASK_VALUE)
    attn = jax.nn.softmax(scores, axis=-1)
    # fold v_scale into the probabilities, then contract with int8 V
    attn = attn * jnp.transpose(v_scale[..., 0], (0, 2, 1))[:, :, None, :]
    attn = attn.astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", attn, v_cache.astype(q.dtype),
                      preferred_element_type=jnp.float32).astype(q.dtype)
