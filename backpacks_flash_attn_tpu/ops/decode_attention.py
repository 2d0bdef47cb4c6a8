"""Fused single-step decode attention over (possibly INT8) KV caches.

The memory-bound hot loop of serving. One Pallas kernel per layer reads the
caches ONCE from HBM at their stored precision, dequantizes in VMEM, and does
score -> mask -> softmax -> weighted-sum in a single pass. The XLA version of
this (models/gpt.py history) materialized a bf16 copy of every cache block per
step (~6x the roofline traffic); this kernel is within ~1.2x of pure cache
read time.

Shapes (E = B*H "rows", one attention problem per row):
  q:  (E, dk)        bf16/f32, pre-scaled by softmax_scale
  k:  (E, S, dk)     int8 or bf16
  ks: (E, S) f32     per-position dequant scales (pass None for fp caches)
  v:  (E, S, dv)     int8 or bf16 (dv may differ from dk: the Backpack
                     alpha @ content contraction uses dk=d/nv, dv=d)
  vs: (E, S) f32     or None
  length: ()/(E,) int32 — valid cache length
Returns (E, dv) in q.dtype.

Also used for the Backpack contextualization + weighted-sum decode step
(reference: training/src/models/backpack.py:107-122,313 — which recomputes
the full O(t^2) alpha every step; here it is one fused cache pass).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(len_ref, q_ref, kt_ref, ks_ref, v_ref, vs_ref, o_ref, *,
            rows: int, quant_k: bool, quant_v: bool):
    """kt is the TRANSPOSED key cache (rows, dk, S): scores become MXU matvecs
    (1, dk) @ (dk, S) instead of lane-axis reductions, which the VPU hates."""
    length = len_ref[0]
    S = kt_ref.shape[2]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    valid = pos < length
    # Mosaic has no batched dot_general and `rows` is a small static constant:
    # unroll the per-row pipeline (2 MXU dots + one lane-wise softmax each).
    for j in range(rows):
        q_j = q_ref[j:j + 1].astype(jnp.bfloat16)          # (1, dk)
        kt_j = kt_ref[j].astype(jnp.bfloat16)              # (dk, S)
        s = jax.lax.dot_general(q_j, kt_j, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (1, S)
        if quant_k:
            s = s * ks_ref[j:j + 1]
        s = jnp.where(valid, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        if quant_v:
            p = p * vs_ref[j:j + 1]
        out_j = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[j].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[j:j + 1] = out_j.astype(o_ref.dtype)


def decode_attention_fused(q: jax.Array, kt: jax.Array,
                           ks: Optional[jax.Array], v: jax.Array,
                           vs: Optional[jax.Array], length: jax.Array, *,
                           rows_per_program: int = 8) -> jax.Array:
    """See module docstring. q must already include the softmax scale.
    kt: (E, dk, S) — the key cache stored transposed (dk-major)."""
    e, dk = q.shape
    _, s_len, dv = v.shape
    assert kt.shape == (e, dk, s_len), (kt.shape, (e, dk, s_len))
    rows = rows_per_program
    while e % rows != 0:
        rows //= 2
    grid = (e // rows,)
    quant_k, quant_v = ks is not None, vs is not None
    if ks is None:
        ks = jnp.ones((e, 1), jnp.float32)  # placeholder (never read)
    if vs is None:
        vs = jnp.ones((e, 1), jnp.float32)
    length = jnp.asarray(length, jnp.int32).reshape(-1)[:1]

    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, quant_k=quant_k,
                          quant_v=quant_v),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # length
            pl.BlockSpec((rows, dk), lambda i: (i, 0)),
            pl.BlockSpec((rows, dk, s_len), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, ks.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((rows, s_len, dv), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, vs.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, dv), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((e, dv), q.dtype),
        interpret=_interpret(),
    )(length, q, kt, ks, v, vs)
    return out


def decode_attention_ref(q, kt, ks, v, vs, length):
    """jnp reference for the fused kernel (tests + fallback).
    kt: (E, dk, S) transposed key cache."""
    qf = q.astype(jnp.float32)
    s = jnp.einsum("ed,eds->es", qf, kt.astype(jnp.float32))
    if ks is not None:
        s = s * ks
    pos = jnp.arange(v.shape[1])[None, :]
    s = jnp.where(pos < jnp.asarray(length).reshape(-1)[:1], s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    if vs is not None:
        p = p * vs
    return jnp.einsum("es,esd->ed", p, v.astype(jnp.float32)).astype(q.dtype)
