"""Fused Backpack contextualization as Pallas TPU kernels.

The Backpack combine step (reference: training/src/models/backpack.py:107-122
ContextSelfAttn producing alpha, and :313 `torch.einsum('bkts,bskd->btd',
contextualization, senses)`) is structurally multi-head attention whose
"value" head dim is the FULL model width d (each sense k attends with
(dnv)-dim q/k but aggregates d-dim sense vectors), and whose per-head outputs
are SUMMED rather than concatenated:

    out[b,t,:] = sum_k softmax_j(q[b,t,k] . k[b,j,k]) @ content[b,j,k,:]

The unfused form materializes alpha = (b, nv, s, s) — the dominant training
activation (4.3 GB in bf16 at batch 32, s=512 for backpack-small) — and
streams it through HBM once in the forward and twice more in the backward.
These kernels run the whole contraction flash-attention-style (online softmax
per sense head, SURVEY.md §7.2 Phase 3): alpha only ever exists one
(block_q, block_k) tile at a time in VMEM, so HBM traffic drops from O(s^2)
to O(s * d).

Three kernels:
  * inference forward: per-head online softmax, the nv axis rides the
    innermost (sequential) grid dimension and accumulates straight into the
    (b, s, d) output block — per-head outputs are never materialized.
  * training forward: the same accumulation, additionally emitting the
    per-head LSE (b, nv, s). The residuals are just (q, k, content, lse) —
    NO per-head o_heads (b, nv, s, d) is saved; r2 measured that residual
    BIGGER than the alpha the kernel avoids whenever d > s, which made the
    kernel lose its training A/B (64.1k vs 67.8k tok/s).
  * backward: two tiled kernels in the style of ops/flash_attention.py
    (reference bwd recompute strategy: csrc/flash_attn/src/
    fmha_dgrad_kernel_1xN_loop.h) — one recomputes the softmax-jacobian
    correction delta_k[t] = dO[t].O_k[t] from the saved LSE and accumulates
    dq over key tiles (two passes), one accumulates dk and dcontent over
    query tiles consuming that delta.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import NEG_INF, _interpret, _round_up

# Shares flash_attention's FLASH_FIXEDMAX knob: replace the online row max
# with a precomputed Cauchy-Schwarz bound (VFA-style) — see the rationale in
# ops/flash_attention.py. The contextualization forward is the other
# VPU-softmax-bound training kernel.
_FIXEDMAX = os.environ.get("FLASH_FIXEDMAX", "0") == "1"


def _compute_dtype(ref_dtype):
    # bf16 MXU dots with f32 accumulation on TPU; f32 everywhere in interpret
    # mode / for the f32 exactness oracle (same policy as the flash kernel).
    return (jnp.float32 if _interpret() or ref_dtype == jnp.float32
            else jnp.bfloat16)


def _causal_kblocks(qi: int, block_q: int, block_k: int, kv_len: int):
    max_k = jnp.minimum((qi + 1) * block_q, kv_len)
    return pl.cdiv(max_k, block_k)


def _tile_mask(q0, k0, block_q, block_k, kv_len):
    q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    return jnp.logical_and(k_pos <= q_pos, k_pos < kv_len)


def _online_softmax_head(q, k_ref, c_ref, qi, block_q, block_k, kv_len, cdt):
    """Shared forward inner loop: returns (o_acc f32 (block_q, d), m, l).
    With _FIXEDMAX the running max is replaced by a precomputed per-row
    bound (see module header): tiles accumulate independently and m returns
    the bound (NEG_INF for fully-masked rows) so lse stays exact."""
    if _FIXEDMAX:
        kf = k_ref[0, 0].astype(jnp.float32)
        kmax = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=1)))
        M = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1)) * kmax \
            + 1e-6

    def body(j, carry):
        o_acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k)].astype(cdt)
        c = c_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = _tile_mask(qi * block_q, j * block_k, block_q, block_k, kv_len)
        s = jnp.where(mask, s, NEG_INF)
        if _FIXEDMAX:
            p = jnp.where(mask, jnp.exp(s - M[:, None]), 0.0)
            l_new = l_prev + jnp.sum(p, axis=1)
            pv = jax.lax.dot_general(p.astype(c.dtype), c,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return o_acc + pv, m_prev, l_new
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new[:, None]), 0.0)
        l_new = l_prev * corr + jnp.sum(p, axis=1)
        pv = jax.lax.dot_general(p.astype(c.dtype), c, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return o_acc * corr[:, None] + pv, m_new, l_new

    n_kb = _causal_kblocks(qi, block_q, block_k, kv_len)
    o0 = jnp.zeros((block_q, c_ref.shape[-1]), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    o_acc, m, l = jax.lax.fori_loop(0, n_kb, body, (o0, m0, l0))
    if _FIXEDMAX:
        m = jnp.where(l == 0.0, NEG_INF, M)
    return o_acc, m, l


def _fused_ctx_infer_kernel(q_ref, k_ref, c_ref, o_ref, *, block_q: int,
                            block_k: int, kv_len: int):
    """Grid (b, n_q, nv): nv innermost/sequential, accumulating per-head
    normalized outputs into the revisited (1, block_q, d) output block."""
    qi, hi = pl.program_id(1), pl.program_id(2)
    cdt = _compute_dtype(q_ref.dtype)
    q = q_ref[0, 0].astype(cdt)

    @pl.when(hi == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    o_acc, _, l = _online_softmax_head(q, k_ref, c_ref, qi, block_q, block_k,
                                       kv_len, cdt)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = o_ref[0] + (o_acc / l_safe[:, None]).astype(o_ref.dtype)


def _fused_ctx_fwd_lse_kernel(q_ref, k_ref, c_ref, o_ref, lse_ref, *,
                              block_q: int, block_k: int, kv_len: int):
    """Grid (b, n_q, nv): the inference accumulation (per-head outputs never
    exist) PLUS the per-head LSE the o_heads-free backward recomputes from.
    nv rides the innermost sequential axis, accumulating into the revisited
    (1, block_q, d) output block exactly like _fused_ctx_infer_kernel."""
    qi, hi = pl.program_id(1), pl.program_id(2)
    cdt = _compute_dtype(q_ref.dtype)
    q = q_ref[0, 0].astype(cdt)

    @pl.when(hi == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    o_acc, m, l = _online_softmax_head(q, k_ref, c_ref, qi, block_q, block_k,
                                       kv_len, cdt)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = o_ref[0] + (o_acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l_safe))[:, None]


def _fused_ctx_dq_delta_kernel(q_ref, k_ref, c_ref, do_ref, lse_ref,
                               dq_ref, delta_ref, *, block_q: int,
                               block_k: int, q_len: int, kv_len: int):
    """Grid (b, nv, n_q), two passes over the causal key tiles:

      pass 1: delta_k[t] = sum_j alpha[t,j] (dO[t].c[j])  (= dO[t].O_k[t])
      pass 2: dq[t]      = sum_j alpha[t,j] (dp[t,j] - delta_k[t]) k[j]

    This recomputes the softmax-jacobian correction from (q, k, content, lse)
    instead of reading a saved o_heads (b, nv, s, d) residual — the residual
    was BIGGER than the alpha the kernel avoids whenever d > s (the r2
    measured loss vs the einsum path). delta is emitted for the dk/dcontent
    kernel, which needs it complete per query row."""
    qi = pl.program_id(2)
    cdt = _compute_dtype(q_ref.dtype)
    q = q_ref[0, 0].astype(cdt)            # pre-scaled (block_q, dk)
    do = do_ref[0].astype(cdt)             # (block_q, d)
    lse = lse_ref[0, 0]                    # (block_q, 1) f32
    n_kb = _causal_kblocks(qi, block_q, block_k, kv_len)

    def tile(j):
        k = k_ref[0, 0, pl.ds(j * block_k, block_k)].astype(cdt)
        c = c_ref[0, 0, pl.ds(j * block_k, block_k)].astype(cdt)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = _tile_mask(qi * block_q, j * block_k, block_q, block_k, kv_len)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, c, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return k, p, dp

    def body_delta(j, acc):
        _, p, dp = tile(j)
        return acc + jnp.sum(p * dp, axis=1)

    delta = jax.lax.fori_loop(0, n_kb, body_delta,
                              jnp.zeros((block_q,), jnp.float32))

    def body_dq(j, dq_acc):
        k, p, dp = tile(j)
        ds = p * (dp - delta[:, None])
        return dq_acc + jax.lax.dot_general(
            ds.astype(cdt), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, n_kb, body_dq,
                           jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    delta_ref[0, 0] = delta[:, None]


def _fused_ctx_dkc_kernel(q_ref, k_ref, c_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dc_ref, *, block_q: int, block_k: int,
                          q_len: int, kv_len: int, n_q_blocks: int):
    """Grid (b, nv, n_k): for one key tile, loop query tiles from the causal
    diagonal accumulating dcontent = alpha^T dO and dk = ds^T q."""
    ki = pl.program_id(2)
    cdt = _compute_dtype(q_ref.dtype)
    k = k_ref[0, 0].astype(cdt)            # (block_k, dk)
    c = c_ref[0, 0].astype(cdt)            # (block_k, d)
    i0 = (ki * block_k) // block_q

    def body(i, carry):
        dk_acc, dc_acc = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q)].astype(cdt)
        do = do_ref[0, pl.ds(i * block_q, block_q)].astype(cdt)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = _tile_mask(i * block_q, ki * block_k, block_q, block_k, kv_len)
        mask = jnp.logical_and(
            mask, (i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)) < q_len)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dc_acc = dc_acc + jax.lax.dot_general(
            p.astype(cdt), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, c, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(cdt), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dc_acc

    dk, dc = jax.lax.fori_loop(
        i0, n_q_blocks, body,
        (jnp.zeros((block_k, q_ref.shape[-1]), jnp.float32),
         jnp.zeros((block_k, c_ref.shape[-1]), jnp.float32)))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dc_ref[0, 0] = dc.astype(dc_ref.dtype)


# ------------------------------------------------------------------ launch

def _prep(q, k, content, scale, block_q, block_k):
    """Common padding/layout: q,k (b, s, nv, dnv) -> (b, nv, s_pad, dk_pad),
    content (b, s, nv, d) -> (b, nv, s_pad, d_pad); scale folded into q.

    Everything is head-major (b, nv, s, d): Mosaic requires the LAST TWO
    block dims to be (8, 128)-divisible or full-size, so the size-1 blocked
    head axis must sit in a leading position (a (1, s, 1, d) block over a
    (b, s, nv, d) array fails hardware lowering; only interpret mode
    tolerated it)."""
    b, s, nv, dnv = q.shape
    d = content.shape[-1]
    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(s, 128))
    sq_pad = _round_up(s, block_q)
    sk_pad = _round_up(s, block_k)
    dk_pad = max(_round_up(dnv, 128), 128)
    d_pad = max(_round_up(d, 128), 128)
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qt = jnp.transpose(qs, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    ct = jnp.transpose(content, (0, 2, 1, 3))
    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_pad - s), (0, dk_pad - dnv)))
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, sk_pad - s), (0, dk_pad - dnv)))
    cp = jnp.pad(ct, ((0, 0), (0, 0), (0, sk_pad - s), (0, d_pad - d)))
    return qt, kt, cp, block_q, block_k, sq_pad, sk_pad, dk_pad, d_pad


def _fused_ctx_infer(q, k, content, scale, block_q, block_k):
    b, s, nv, dnv = q.shape
    d = content.shape[-1]
    qt, kt, cp, block_q, block_k, sq_pad, sk_pad, dk_pad, d_pad = _prep(
        q, k, content, scale, block_q, block_k)
    grid = (b, sq_pad // block_q, nv)
    out = pl.pallas_call(
        functools.partial(_fused_ctx_infer_kernel, block_q=block_q,
                          block_k=block_k, kv_len=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dk_pad),
                         lambda bi, qi, hi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk_pad, dk_pad),
                         lambda bi, qi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sk_pad, d_pad),
                         lambda bi, qi, hi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad),
                               lambda bi, qi, hi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, d_pad), content.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qt, kt, cp)
    return out[:, :s, :d]


def _fused_ctx_fwd_lse(q, k, content, scale, block_q, block_k):
    """-> (out (b, s, d), lse (b, nv, s)) — the o_heads-free training fwd."""
    b, s, nv, dnv = q.shape
    d = content.shape[-1]
    qt, kt, cp, block_q, block_k, sq_pad, sk_pad, dk_pad, d_pad = _prep(
        q, k, content, scale, block_q, block_k)
    grid = (b, sq_pad // block_q, nv)
    out, lse = pl.pallas_call(
        functools.partial(_fused_ctx_fwd_lse_kernel, block_q=block_q,
                          block_k=block_k, kv_len=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dk_pad),
                         lambda bi, qi, hi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk_pad, dk_pad),
                         lambda bi, qi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sk_pad, d_pad),
                         lambda bi, qi, hi: (bi, hi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad),
                         lambda bi, qi, hi: (bi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda bi, qi, hi: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_pad, d_pad), content.dtype),
            jax.ShapeDtypeStruct((b, nv, sq_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qt, kt, cp)
    return out[:, :s, :d], lse[:, :, :s, 0]


def _fused_ctx_bwd(q, k, content, lse, g, scale, block_q, block_k):
    """g: (b, s, d) cotangent of the summed output. Returns (dq, dk, dcontent)
    in the input layouts. The softmax-jacobian correction delta is recomputed
    in-kernel from (q, k, content, lse) — no o_heads residual is saved."""
    b, s, nv, dnv = q.shape
    d = content.shape[-1]
    qt, kt, cp, block_q, block_k, sq_pad, sk_pad, dk_pad, d_pad = _prep(
        q, k, content, scale, block_q, block_k)
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_pad - s)))[..., None]
    gp = jnp.pad(g, ((0, 0), (0, sq_pad - s), (0, d_pad - d)))

    n_qb, n_kb = sq_pad // block_q, sk_pad // block_k
    common = dict(block_q=block_q, block_k=block_k, q_len=s, kv_len=s)
    dq, delta = pl.pallas_call(
        functools.partial(_fused_ctx_dq_delta_kernel, **common),
        grid=(b, nv, n_qb),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dk_pad),
                         lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk_pad, dk_pad),
                         lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sk_pad, d_pad),
                         lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, block_q, d_pad),
                         lambda bi, hi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, dk_pad),
                         lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nv, sq_pad, dk_pad), q.dtype),
            jax.ShapeDtypeStruct((b, nv, sq_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qt, kt, cp, gp, lse_p)

    dk, dc = pl.pallas_call(
        functools.partial(_fused_ctx_dkc_kernel, n_q_blocks=n_qb, **common),
        grid=(b, nv, n_kb),
        in_specs=[
            pl.BlockSpec((1, 1, sq_pad, dk_pad),
                         lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_k, dk_pad),
                         lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, sq_pad, d_pad),
                         lambda bi, hi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, sq_pad, 1),
                         lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sq_pad, 1),
                         lambda bi, hi, ki: (bi, hi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, dk_pad),
                         lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda bi, hi, ki: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nv, sk_pad, dk_pad), k.dtype),
            jax.ShapeDtypeStruct((b, nv, sk_pad, d_pad), content.dtype),
        ],
        interpret=_interpret(),
    )(qt, kt, cp, gp, lse_p, delta)

    # un-pad, restore (b, s, nv, dnv) layouts; dq picks up the folded scale
    dq = jnp.transpose(dq[:, :, :s, :dnv], (0, 2, 1, 3))
    dq = (dq.astype(jnp.float32) * scale).astype(q.dtype)
    dk_out = jnp.transpose(dk[:, :, :s, :dnv], (0, 2, 1, 3))
    return dq, dk_out, jnp.transpose(dc[:, :, :s, :d], (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_contextualization(q: jax.Array, k: jax.Array, content: jax.Array,
                            scale: float, block_q: int = 256,
                            block_k: int = 256) -> jax.Array:
    """out[b,t,:] = sum_k causal_softmax_j(scale * q[b,t,k].k[b,j,k]) @
    content[b,j,k,:] without materializing alpha (b, nv, s, s)
    (reference: training/src/models/backpack.py:107-122, 313).

    q, k: (b, s, nv, dnv); content: (b, s, nv, d) -> (b, s, d).
    The primal accumulates over senses in-kernel — per-head outputs never
    exist, in inference OR training; under differentiation the fwd rule
    additionally emits the per-head LSE, and the tiled backward recomputes
    everything else (including the softmax-jacobian delta) from
    (q, k, content, lse).
    """
    return _fused_ctx_infer(q, k, content, scale, block_q, block_k)


def _fused_ctx_fwd_rule(q, k, content, scale, block_q, block_k):
    out, lse = _fused_ctx_fwd_lse(q, k, content, scale, block_q, block_k)
    return out, (q, k, content, lse)


def _fused_ctx_bwd_rule(scale, block_q, block_k, res, g):
    q, k, content, lse = res
    return _fused_ctx_bwd(q, k, content, lse,
                          g.astype(content.dtype), scale, block_q, block_k)


fused_contextualization.defvjp(_fused_ctx_fwd_rule, _fused_ctx_bwd_rule)


def contextualization_reference(q: jax.Array, k: jax.Array,
                                content: jax.Array,
                                scale: float) -> jax.Array:
    """fp32 O(s^2) oracle for the fused kernel (test + parity use)."""
    s = jnp.einsum("btkd,bjkd->bktj", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    sq = s.shape[-2]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 1)
    s = jnp.where((kpos <= qpos)[None, None], s, NEG_INF)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bktj,bjkd->btd", a,
                      content.astype(jnp.float32)).astype(content.dtype)
