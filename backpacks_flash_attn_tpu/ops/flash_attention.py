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
  * Backward: jax.custom_vjp with tiled Pallas kernels that recompute p per
    (block_q, block_k) tile from the saved LSE (same strategy as
    csrc/flash_attn/src/fmha_dgrad_kernel_1xN_loop.h): one kernel accumulates
    dq over K tiles, one accumulates dk/dv over Q tiles — see _flash_bwd.

Head dims are zero-padded to a multiple of 128 lanes outside the kernel; the
softmax scale is always computed from the logical head dim.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large negative instead of -inf: keeps exp(m_prev - m_new) well-defined for
# fully-masked tiles without NaN-producing inf - inf.
NEG_INF = -0.7 * float(np.finfo(np.float32).max)

# FLASH_EXP2=1 rewrites the in-kernel softmax exponentials as
# exp2(x * log2 e) — the CUDA reference's formulation (fmha kernels fold
# log2 e into the scale). Whether the TPU VPU favors exp2 over exp is an
# open measured question (bench_vpu.py); this env knob lets bench_train.py
# A/B the full training step without touching call signatures. Interfaces
# (LSE, gradients) stay in natural-log units either way.
_EXP2 = os.environ.get("FLASH_EXP2", "0") == "1"
_LOG2E = 1.4426950408889634

# FLASH_FIXEDMAX=1 replaces the forward's ONLINE row max with a precomputed
# per-row upper bound M >= max(s) (VFA, arxiv 2604.12798: "global maximum
# pre-computation"): with a fixed M the inner loop needs no running max, no
# exp(m_prev-m_new) correction, and no rescale of the (block_q, d)
# accumulator per K tile — the VPU chain the training profile blames — and
# K tiles become independent accumulations. M = |q_row| * max_k |k_row|
# overshoots the true max by some delta; every p shrinks by exp(-delta),
# which cancels exactly in o = acc/l and enters lse as M + log(l)
# (identical interface; the BACKWARD already recomputes p from the saved
# lse and needs no change). f32 accumulators keep ~80 nats of underflow
# headroom; bf16 p keeps f32's exponent range. Bias is not bounded —
# has_bias falls back to the online path.
_FIXEDMAX = os.environ.get("FLASH_FIXEDMAX", "0") == "1"


def _pexp(x):
    return jnp.exp2(x * _LOG2E) if _EXP2 else jnp.exp(x)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _head_pad(d: int) -> int:
    """Padded head dim for kernel blocks. d=64 stays 64: Mosaic accepts a
    full-dim minormost block (the vregs carry 64 dead lanes, but the dot
    FLOPs halve to match), while padding to 128 made every q/k/v/g tensor a
    REAL zero-padded HBM copy — 2x the kernel DMA plus explicit pad +
    slice-back passes (r3 train profile: 6.7 ms/step of 'pad' + the
    dq[:, :, :d] slices). Other non-multiples of 128 keep the old padding."""
    return d if d == 64 or d % 128 == 0 else max(_round_up(d, 128), 128)


# FLASH_HEAD_GROUP=G batches G heads into one kernel program (forward and
# scratch backward), amortizing per-program fetch/flush overhead. Dropout
# masks are invariant to the grouping (streams are indexed by the ABSOLUTE
# head id). Default 4 from the r4c/r4d on-chip A/Bs: -3.1 ms/step at
# 256-blocks, -0.7 at 512 (train_r4c_g4 / train_r4d_unpacked512g4 vs their
# G=1 twins); G=12 exceeds the 16MB scoped-VMEM limit in the backward.
_HEAD_GROUP = int(os.environ.get("FLASH_HEAD_GROUP", "4"))


def _head_group(h: int, disable: bool, cap: int = 8) -> int:
    """cap: the scratch backward holds G x (sq, d) + 2G x (block_k, d) f32
    accumulators in scoped VMEM (16 MB limit on v5e) — G=12 at the training
    shape measured 33 MB and failed to compile; the backward caps at 4."""
    if disable:
        return 1
    g = min(_HEAD_GROUP, h, cap)
    while g > 1 and h % g:
        g -= 1
    return max(g, 1)


# The attention-dropout hash measured 10.4ms of a 240ms train step (r3);
# 1 finalizer round halves the mix cost and measured +0.8% end-to-end train
# throughput — but the end-to-end learning test REGRESSED under it
# (backpack-test on the bigram corpus converged to ppl 14.5 vs the 13.0
# gate at rounds=1, passes at 2: one round leaves enough structure in the
# flat-counter masks of the per-token sites to hurt optimization even
# though the first-order statistics look clean). Correctness wins:
# default 2; the knob stays for experiments.
_DROPOUT_ROUNDS = int(os.environ.get("FLASH_DROPOUT_ROUNDS", "2"))


def _dropout_keep_positions(seed_ref, bh: jax.Array, q_pos: jax.Array,
                            k_pos: jax.Array, dropout_p: float,
                            rounds: Optional[int] = None) -> jax.Array:
    """Counter-based dropout mask from explicit GLOBAL position arrays.

    The TPU analogue of the reference's Philox counter offsets
    (csrc/flash_attn/fmha_api.cpp:313-318): bits are a pure function of
    (seed, batch*head, q_pos, k_pos), so any consumer — the Pallas forward,
    both backward kernels, an einsum-block ring step, or the per-token
    dropout sites (ops/norms.py) — regenerates identical masks regardless
    of tiling or sequence layout. murmur3-finalizer hash over the position
    counters — a few VPU ops per element, no cross-backend PRNG primitive
    needed. All of (bh, q_pos, k_pos) may be arrays; they broadcast
    together."""
    x = (seed_ref[0]
         ^ (q_pos.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
         ^ (k_pos.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
         ^ (bh.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)))
    x = x + seed_ref[1]
    for _ in range(_DROPOUT_ROUNDS if rounds is None else rounds):
        x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
        x = x * jnp.uint32(0x85EBCA6B)
        x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(13))
        x = x * jnp.uint32(0xC2B2AE35)
        x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    thr = jnp.uint32(min(int(round((1.0 - dropout_p) * 2**32), ), 2**32 - 1))
    return x < thr


def _dropout_keep(seed_ref, bh: jax.Array, q0, k0, block_q: int, block_k: int,
                  dropout_p: float) -> jax.Array:
    """Counter-based dropout mask for one (block_q, block_k) tile (the
    in-kernel form: positions from tile offsets + iota)."""
    q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    return _dropout_keep_positions(seed_ref, bh, q_pos, k_pos, dropout_p)


def _flash_fwd_kernel(lens_ref, qoff_ref, koff_ref, boff_ref, bmask_ref,
                      seed_ref, scale_ref, q_ref, k_ref, v_ref, bias_ref,
                      o_ref, lse_ref, *, block_k: int,
                      kv_len: int, causal: bool, block_q: int,
                      blocksparse: bool, dropout_p: float, has_bias: bool,
                      g_heads: int = 1, n_heads: int = 0):
    # softmax scale arrives as an SMEM scalar (it may be a traced per-layer
    # value, which a Pallas kernel cannot close over) and multiplies the
    # score tile in VMEM: folding it into q instead cost a full (b, h, s, d)
    # copy per layer per pass outside the kernel.
    #
    # g_heads > 1 processes a GROUP of heads per program (statically
    # unrolled): at (32, 12, 512, 64) each per-head program is ~2.7us of
    # work, so the grid of 384 tiny programs is bound by per-program
    # overhead (bench_results/flash_r4.json: fwd 1.0-1.2ms vs ~0.3ms of
    # DMA+compute); grouping divides the program count and amortizes the
    # fetch/flush latency. n_heads is the TOTAL head count so dropout
    # streams stay identical for every grouping.
    qi = pl.program_id(2)
    # bf16 inputs run bf16 MXU dots with f32 accumulation (f32 operands were
    # 4x slower on the MXU and dominated the training step); f32 inputs keep
    # f32 math for the exactness oracles and interpret mode.
    cdt = (jnp.float32 if _interpret() or q_ref.dtype == jnp.float32
           else jnp.bfloat16)
    seq_len = lens_ref[pl.program_id(0)]
    # per-sequence offsets: q row i sits at absolute position q_off + i and
    # key column u at k_off + u (chunked prefill / ring chunk pairs). The
    # causal mask only sees the RELATIVE offset; the dropout hash uses the
    # absolute positions so masks are a pure function of global coordinates
    # (ring == single-device).
    q_off = qoff_ref[pl.program_id(0)] - koff_ref[pl.program_id(0)]
    nh = n_heads if n_heads else pl.num_programs(1)
    dq0 = qoff_ref[pl.program_id(0)] + qi * block_q
    dk_off = koff_ref[pl.program_id(0)]

    num_k_blocks = pl.cdiv(kv_len, block_k)
    if causal:
        # K tiles strictly above the causal diagonal contribute nothing.
        max_k = jnp.minimum(q_off + (qi + 1) * block_q, kv_len)
        num_k_blocks = pl.cdiv(max_k, block_k)
    n_kb_total = pl.cdiv(kv_len, block_k)

    q_pos = (q_off + qi * block_q
             + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))

    fixedmax = _FIXEDMAX and not blocksparse and not has_bias

    for g in range(g_heads):
        q = q_ref[0, g].astype(cdt)                  # (block_q, d)
        # program_id inside a fori_loop body breaks interpret-mode lowering;
        # compute the dropout stream id at kernel top level. boff globalizes
        # the batch-row stream under data sharding (row b here is global row
        # boff + b).
        bh = ((pl.program_id(0) + boff_ref[0]) * nh
              + pl.program_id(1) * g_heads + g)
        if fixedmax:
            # per-row upper bound M >= max(s) (Cauchy-Schwarz): the K block
            # is already VMEM-resident, so the norm pre-pass costs no extra
            # HBM traffic
            kf = k_ref[0, g].astype(jnp.float32)
            kmax = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=1)))
            qf32 = q_ref[0, g].astype(jnp.float32)
            M = (jnp.sqrt(jnp.sum(qf32 * qf32, axis=1)) * kmax
                 * jnp.abs(scale_ref[0]) + 1e-6)

        def compute(j, carry, g=g, q=q, bh=bh, M=(M if fixedmax else None)):
            o_acc, m_prev, l_prev = carry
            k = k_ref[0, g, pl.ds(j * block_k, block_k)].astype(cdt)
            v = v_ref[0, g, pl.ds(j * block_k, block_k)]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * scale_ref[0]
            k_pos = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = k_pos < jnp.minimum(seq_len, kv_len)
            if causal:
                mask = jnp.logical_and(mask, k_pos <= q_pos)
            if has_bias:
                s = s + bias_ref[0, g, :, pl.ds(j * block_k, block_k)]
            s = jnp.where(mask, s, NEG_INF)
            if fixedmax:
                # no running max: tiles accumulate independently, no
                # correction multiplies on l or the (block_q, d) accumulator
                m_new = m_prev
                p = jnp.where(mask, _pexp(s - M[:, None]), 0.0)
                l_new = l_prev + jnp.sum(p, axis=1)
            else:
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
                correction = _pexp(m_prev - m_new)
                p = _pexp(s - m_new[:, None])
                p = jnp.where(mask, p, 0.0)
                l_new = l_prev * correction + jnp.sum(p, axis=1)
            if dropout_p > 0.0:
                # applied to the un-normalized probs; l/lse stay pre-dropout
                # so the bwd recompute sees the exact softmax (reference
                # semantics: dropout after softmax,
                # fmha_fprop_kernel_1xN.h). Positions are GLOBAL (absolute
                # q/k offsets included).
                keep = _dropout_keep(seed_ref, bh, dq0,
                                     dk_off + j * block_k,
                                     block_q, block_k, dropout_p)
                p = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
            pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if fixedmax:
                o_new = o_acc + pv
            else:
                o_new = o_acc * correction[:, None] + pv
            return o_new, m_new, l_new

        if blocksparse:
            # blocksparse FMHA (reference fwd_block, csrc/flash_attn/
            # src/fmha_block_fprop_kernel_1xN.h): tiles with a 0 blockmask
            # entry skip BOTH MXU dots — exact sparse attention, compute
            # scales with the active-block count. (K/V still stream whole
            # per program; a scalar-prefetch gather of active blocks is the
            # DMA upgrade path.)
            def body(j, carry, compute=compute):
                return jax.lax.cond(bmask_ref[qi * n_kb_total + j] != 0,
                                    lambda c: compute(j, c), lambda c: c,
                                    carry)
        else:
            body = compute

        o_acc = jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32)
        m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q,), jnp.float32)
        o_acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body,
                                        (o_acc, m0, l0))

        if fixedmax:
            # fully-masked rows keep the sentinel lse (ring merges weight by
            # exp(lse), so empty chunk pairs must stay ~-inf)
            m = jnp.where(l == 0.0, NEG_INF, M)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, g] = (o_acc / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[0, g] = (m + jnp.log(l_safe))[:, None]


def _flash_fwd(q, k, v, seq_lengths, scale, causal, block_q, block_k,
               blockmask=None, dropout_p=0.0, seed=None, q_offsets=None,
               bias=None, k_offsets=None, bh_offset=None, lse_4d=False):
    """q: (b, h, sq, d); k/v: (b, h, sk, d). Returns (out, lse).
    `scale` may be traced; it rides into the kernel as an SMEM scalar.
    blockmask: optional (n_q_blocks, n_k_blocks) {0,1} tile mask.
    seed: (2,) uint32 dropout counter seed (required when dropout_p > 0).
    q_offsets: (b,) absolute position of q row 0 per sequence (chunked
    prefill); causal masking becomes k_pos <= q_off + i.
    k_offsets: (b,) absolute position of key column 0 (ring chunk pairs);
    causality uses the relative offset, the dropout hash the absolute ones.
    bh_offset: scalar global index of batch row 0 (data-sharded dropout
    streams)."""
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1)
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    d_pad = _head_pad(d)
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
    if seed is None:
        seed = jnp.zeros((2,), jnp.uint32)
    if q_offsets is None:
        q_offsets = jnp.zeros((b,), jnp.int32)
    else:
        q_offsets = jnp.broadcast_to(
            jnp.asarray(q_offsets, jnp.int32).reshape(-1), (b,))
    if k_offsets is None:
        k_offsets = jnp.zeros((b,), jnp.int32)
    else:
        k_offsets = jnp.broadcast_to(
            jnp.asarray(k_offsets, jnp.int32).reshape(-1), (b,))
    bh_offset = jnp.reshape(
        jnp.asarray(0 if bh_offset is None else bh_offset, jnp.int32), (1,))

    has_bias = bias is not None
    if has_bias:
        # bias (b|1, h|1, sq, sk) f32, zero-padded to tile shapes; broadcast
        # dims resolved by the index map (reference: flash_attn_triton.py
        # bias_type 'vector'/'matrix')
        bias = jnp.asarray(bias, jnp.float32)
        if bias.ndim == 2:
            bias = bias[None, None]
        bb, bh = bias.shape[0], bias.shape[1]
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, sq_pad - bias.shape[2]),
                              (0, sk_pad - bias.shape[3])))
    else:
        bb = bh = 1
        bias = jnp.zeros((1, 1, 1, 1), jnp.float32)

    def bias_map(bi, hi, qi):
        return (bi if bb > 1 else 0, hi if bh > 1 else 0,
                qi if has_bias else 0, 0)

    bias_block = (1, 1, block_q if has_bias else 1,
                  sk_pad if has_bias else 1)

    # The K/V blockspecs stream the WHOLE key sequence per program, so the
    # per-program footprint scales with G * sk_pad: clamp G by the
    # double-buffered K+V bytes against a ~10MB share of the 16MB scoped
    # VMEM (long-context shapes that compile at G=1 must not fail at G=4;
    # the backward's block-sized K/V streams have their own cap=4).
    kv_bytes = 2 * 2 * sk_pad * d_pad * q.dtype.itemsize  # dbl-buf * (K+V)
    vmem_cap = max(1, (10 << 20) // max(kv_bytes, 1))
    G = _head_group(h, blocksparse or has_bias, cap=min(8, vmem_cap))
    grid = (b, h // G, sq_pad // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel, block_k=block_k, kv_len=sk,
        causal=causal, block_q=block_q, blocksparse=blocksparse,
        dropout_p=dropout_p, has_bias=has_bias, g_heads=G, n_heads=h)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (b,) lengths
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (b,) query offsets
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (b,) key offsets
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (1,) batch-row offset
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flat blockmask
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (2,) dropout seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (1,) softmax scale
            pl.BlockSpec((1, G, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, G, sk_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, G, sk_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec(bias_block, bias_map),
        ],
        out_specs=[
            pl.BlockSpec((1, G, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, G, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(seq_lengths, q_offsets, k_offsets, bh_offset, bm, seed, scale_arr,
      qp, kp, vp, bias)
    if lse_4d:
        # native kernel layout (b, h, sq_pad, 1): threading this straight
        # into _flash_bwd avoids the slice -> 3D -> pad -> reshape round
        # trip, which XLA materialized as per-layer layout-conversion
        # copies (r3 train profile: 3 x ~1.7 ms/step at 11 GB/s)
        return out[:, :, :sq, :d], lse
    return out[:, :, :sq, :d], lse[:, :, :sq, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash_attention_bhsd(q, k, v, seed, scale, bias, seq_lengths_static,
                          causal, block_q, block_k, dropout_p, has_bias):
    # seq_lengths threaded via a static marker-free path: see
    # flash_attention(). `scale` is a traced operand (SMEM scalar in the
    # kernels) so per-layer scan-carried scales need no q pre-scaling copy.
    out, _ = _flash_fwd(q, k, v, None, scale, causal, block_q, block_k,
                        dropout_p=dropout_p, seed=seed,
                        bias=bias if has_bias else None)
    return out


def _flash_ref(q, k, v, scale, causal):
    """fp32 O(s^2) reference (test oracle for the tiled backward)."""
    qf, kf, vf = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    s = jnp.einsum("bhtd,bhsd->bhts", qf * scale, kf)
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        qpos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        s = jnp.where((kpos <= qpos)[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, vf).astype(q.dtype)


def _bwd_mask(q0, k0, block_q, block_k, q_len, kv_len, causal, q_off=0):
    """Valid-position mask for one (block_q, block_k) tile of recomputed p.

    q_off shifts only the CAUSAL comparison (query row t sits at absolute
    position q_off + q0 + t, mirroring the forward's chunked-prefill
    q_offsets); the q_len/kv_len padding checks stay in local coordinates."""
    q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = jnp.logical_and(q_pos < q_len, k_pos < kv_len)
    if causal:
        mask = jnp.logical_and(mask, k_pos <= q_pos + q_off)
    return mask


def _flash_bwd_dq_kernel(seed_ref, qoff_ref, koff_ref, boff_ref, scale_ref,
                         q_ref, k_ref, v_ref, do_ref,
                         lse_ref, delta_ref, bias_ref, dq_ref, *dbias_ref,
                         block_q: int, block_k: int,
                         q_len: int, kv_len: int, causal: bool,
                         dropout_p: float, has_bias: bool, force_f32: bool):
    """Grid (b, h, n_q_blocks): recompute p tile-by-tile from the saved LSE and
    accumulate dq = sum_j ds_j @ k_j (reference bwd recompute strategy:
    csrc/flash_attn/src/fmha_dgrad_kernel_1xN_loop.h). qoff/koff: (b,)
    per-sequence absolute q/k offsets, same semantics as the forward's (ring
    backward; 0 for ordinary self-attention)."""
    qi = pl.program_id(2)
    bh = ((pl.program_id(0) + boff_ref[0]) * pl.num_programs(1)
          + pl.program_id(1))
    dq0 = qoff_ref[pl.program_id(0)] + qi * block_q
    dk_off = koff_ref[pl.program_id(0)]
    q_off = qoff_ref[pl.program_id(0)] - koff_ref[pl.program_id(0)]
    cdt = (jnp.float32 if force_f32 or q_ref.dtype == jnp.float32
           else jnp.bfloat16)
    q = q_ref[0, 0].astype(cdt)                       # (bq, d) pre-scaled
    do = do_ref[0, 0].astype(cdt)                     # (bq, d)
    lse = lse_ref[0, 0]                               # (bq, 1) f32
    delta = delta_ref[0, 0]                           # (bq, 1) f32

    num_k_blocks = pl.cdiv(kv_len, block_k)
    if causal:
        max_k = jnp.minimum(q_off + (qi + 1) * block_q, kv_len)
        num_k_blocks = pl.cdiv(max_k, block_k)
    if has_bias:
        # causal early-exit leaves later tiles unwritten: zero the strip first
        dbias_ref[0][0, 0] = jnp.zeros_like(dbias_ref[0][0, 0])

    def body(j, dq_acc):
        k = k_ref[0, 0, pl.ds(j * block_k, block_k)].astype(cdt)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k)].astype(cdt)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ) * scale_ref[0]
        if has_bias:
            s = s + bias_ref[0, 0, :, pl.ds(j * block_k, block_k)]
        mask = _bwd_mask(qi * block_q, j * block_k, block_q, block_k,
                         q_len, kv_len, causal, q_off=q_off)
        p = jnp.where(mask, _pexp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_p > 0.0:
            keep = _dropout_keep(seed_ref, bh, dq0, dk_off + j * block_k,
                                 block_q, block_k, dropout_p)
            dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_p)), 0.0)
        ds = p * (dp - delta)
        if has_bias:
            dbias_ref[0][0, 0, :, pl.ds(j * block_k, block_k)] = ds
        return dq_acc + jax.lax.dot_general(
            ds.astype(cdt), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(
        0, num_k_blocks, body,
        jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32))
    # ds is d(loss)/d(scaled scores); d(s)/dq carries the scale
    dq_ref[0, 0] = (dq * scale_ref[0]).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(seed_ref, qoff_ref, koff_ref, boff_ref, scale_ref,
                          q_ref, k_ref, v_ref, do_ref,
                          lse_ref, delta_ref, bias_ref, dk_ref, dv_ref, *,
                          block_q: int, block_k: int, q_len: int,
                          kv_len: int, n_q_blocks: int, causal: bool,
                          dropout_p: float, has_bias: bool, force_f32: bool):
    """Grid (b, h, n_k_blocks): for one K/V tile, loop over Q tiles (starting
    at the causal diagonal) accumulating dv = p^T dO and dk = ds^T q."""
    ki = pl.program_id(2)
    bh = ((pl.program_id(0) + boff_ref[0]) * pl.num_programs(1)
          + pl.program_id(1))
    dq_base = qoff_ref[pl.program_id(0)]
    dk0 = koff_ref[pl.program_id(0)] + ki * block_k
    q_off = qoff_ref[pl.program_id(0)] - koff_ref[pl.program_id(0)]
    cdt = (jnp.float32 if force_f32 or q_ref.dtype == jnp.float32
           else jnp.bfloat16)
    k = k_ref[0, 0].astype(cdt)                       # (bk, d)
    v = v_ref[0, 0].astype(cdt)                       # (bk, d)
    # First q tile that can see key column ki*block_k: absolute q position is
    # q_off + local row, so with q_off > 0 (ring full-attention chunk pairs)
    # the start moves up; with q_off < 0 it moves past n_q_blocks and the
    # whole tile contributes nothing.
    j0 = (jnp.maximum((ki * block_k - q_off) // block_q, 0)
          if causal else 0)

    def body(j, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(j * block_q, block_q)].astype(cdt)
        do = do_ref[0, 0, pl.ds(j * block_q, block_q)].astype(cdt)
        lse = lse_ref[0, 0, pl.ds(j * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(j * block_q, block_q)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ) * scale_ref[0]
        if has_bias:
            s = s + bias_ref[0, 0, pl.ds(j * block_q, block_q), :]
        mask = _bwd_mask(j * block_q, ki * block_k, block_q, block_k,
                         q_len, kv_len, causal, q_off=q_off)
        p = jnp.where(mask, _pexp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_p > 0.0:
            keep = _dropout_keep(seed_ref, bh, dq_base + j * block_q, dk0,
                                 block_q, block_k, dropout_p)
            scale_keep = 1.0 / (1.0 - dropout_p)
            p_v = jnp.where(keep, p * scale_keep, 0.0)
            dp = jnp.where(keep, dp * scale_keep, 0.0)
        else:
            p_v = p
        dv_acc = dv_acc + jax.lax.dot_general(
            p_v.astype(cdt), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(cdt), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    d_pad = q_ref.shape[-1]
    dk, dv = jax.lax.fori_loop(
        j0, n_q_blocks, body,
        (jnp.zeros((block_k, d_pad), jnp.float32),
         jnp.zeros((block_k, d_pad), jnp.float32)))
    dk_ref[0, 0] = (dk * scale_ref[0]).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_bwd_fused_kernel(seed_ref, qoff_ref, koff_ref, boff_ref,
                            scale_ref, q_ref,
                            k_ref, v_ref, do_ref, lse_ref, o_ref,
                            dq_ref, dk_ref, dv_ref, *, block_q: int,
                            block_k: int, q_len: int, kv_len: int,
                            causal: bool, dropout_p: float, force_f32: bool):
    """Single-pass backward: grid (b, h, n_k, n_q), qi innermost. The split
    dq and dk/dv kernels each recompute the (s, mask, dropout-hash, exp)
    tile — 2x the elementwise work and 7 MXU dots; this computes the tile
    ONCE and emits all three gradients (5 dots). dk/dv blocks are indexed by
    the second-to-innermost grid dim, so they stay VMEM-resident across the
    qi sweep and accumulate in f32; dq blocks are revisited once per kj
    (outer), read-modify-write, initialized at kj == 0."""
    kj = pl.program_id(2)
    qi = pl.program_id(3)
    bh = ((pl.program_id(0) + boff_ref[0]) * pl.num_programs(1)
          + pl.program_id(1))
    dq_base = qoff_ref[pl.program_id(0)]
    dk0 = koff_ref[pl.program_id(0)] + kj * block_k
    q_off = qoff_ref[pl.program_id(0)] - koff_ref[pl.program_id(0)]
    cdt = (jnp.float32 if force_f32 or q_ref.dtype == jnp.float32
           else jnp.bfloat16)

    # dk/dv blocks are indexed by kj only: with qi INNERMOST their revisits
    # are consecutive, the one accumulation pattern Pallas TPU supports on
    # output blocks (same as the fused-ctx inference kernel). dq would be
    # revisited non-consecutively (across the outer kj), so it is emitted as
    # per-kj PARTIALS instead — each block written exactly once — and summed
    # outside the kernel.
    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    if causal:
        # tile intersects the causal lower triangle (absolute q position is
        # q_off + local row; q_off < 0 ring pairs can be entirely inactive)
        active = (q_off + (qi + 1) * block_q - 1) >= kj * block_k
    else:
        active = qi >= 0

    @pl.when(active)
    def _():
        q = q_ref[0, 0].astype(cdt)
        do = do_ref[0, 0].astype(cdt)
        lse = lse_ref[0, 0]
        # delta_i = rowsum(dO_i * O_i), the softmax-jacobian correction,
        # computed here from the VMEM-resident o/do blocks: as an external
        # XLA pass it cost a full extra read of out+g per layer plus a
        # pathological (…, 1)-lane operand copy into the kernel
        delta = jnp.sum(o_ref[0, 0].astype(jnp.float32)
                        * do_ref[0, 0].astype(jnp.float32),
                        axis=1, keepdims=True)
        k = k_ref[0, 0].astype(cdt)
        v = v_ref[0, 0].astype(cdt)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ) * scale_ref[0]
        mask = _bwd_mask(qi * block_q, kj * block_k, block_q, block_k,
                         q_len, kv_len, causal, q_off=q_off)
        p = jnp.where(mask, _pexp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_p > 0.0:
            keep = _dropout_keep(seed_ref, bh, dq_base + qi * block_q, dk0,
                                 block_q, block_k, dropout_p)
            scale_keep = 1.0 / (1.0 - dropout_p)
            p_v = jnp.where(keep, p * scale_keep, 0.0)
            dp = jnp.where(keep, dp * scale_keep, 0.0)
        else:
            p_v = p
        dv_ref[0, 0] += jax.lax.dot_general(
            p_v.astype(cdt), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        ds = p * (dp - delta)
        dk_ref[0, 0] += (jax.lax.dot_general(
            ds.astype(cdt), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * scale_ref[0]).astype(dk_ref.dtype)
        dq_ref[0, 0, 0] = (jax.lax.dot_general(
            ds.astype(cdt), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * scale_ref[0]).astype(dq_ref.dtype)

    @pl.when(jnp.logical_not(active))
    def _():
        # dq partial blocks are write-once: inactive tiles must still zero
        # their slot so the outside sum sees no garbage
        dq_ref[0, 0, 0] = jnp.zeros_like(dq_ref[0, 0, 0])


def _flash_bwd_scratch_kernel(seed_ref, qoff_ref, koff_ref, boff_ref,
                              scale_ref, q_ref,
                              k_ref, v_ref, do_ref, lse_ref, o_ref,
                              dq_ref, dk_ref, dv_ref,
                              dq_acc, dk_acc, dv_acc, *, block_q: int,
                              block_k: int, q_len: int, kv_len: int,
                              causal: bool, dropout_p: float,
                              force_f32: bool, g_heads: int = 1,
                              n_heads: int = 0):
    """Fused backward with f32 VMEM scratch accumulators and low-precision
    HBM outputs. The partials-based fused kernel (_flash_bwd_fused_kernel)
    materializes dq as an (n_kb, b, h, sq, d) f32 tensor summed by XLA and
    emits f32 dk/dv cast outside — ~425 MB of HBM traffic per training layer
    at (32, 12, 512, 64). Here dq accumulates across the OUTER kj sweep in a
    persistent (G, sq_pad, d_pad) f32 scratch (read/modify in VMEM, the HBM
    block rewritten per visit, last write wins) and dk/dv accumulate in
    block-sized f32 scratch zeroed at qi == 0, so every gradient leaves the
    kernel already in the input dtype: ~100 MB per layer, no external sum or
    cast passes. Same tile math as _flash_bwd_fused_kernel. g_heads > 1
    processes a head GROUP per program (see _flash_fwd_kernel — the grid is
    per-program-overhead bound at the training shape)."""
    kj = pl.program_id(2)
    qi = pl.program_id(3)
    dq_base = qoff_ref[pl.program_id(0)]
    dk0 = koff_ref[pl.program_id(0)] + kj * block_k
    q_off = qoff_ref[pl.program_id(0)] - koff_ref[pl.program_id(0)]
    nh = n_heads if n_heads else pl.num_programs(1)
    cdt = (jnp.float32 if force_f32 or q_ref.dtype == jnp.float32
           else jnp.bfloat16)

    @pl.when(qi == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    if causal:
        active = (q_off + (qi + 1) * block_q - 1) >= kj * block_k
    else:
        active = qi >= 0

    qrows = pl.ds(qi * block_q, block_q)

    for g in range(g_heads):
        bh = ((pl.program_id(0) + boff_ref[0]) * nh
              + pl.program_id(1) * g_heads + g)

        @pl.when(active)
        def _(g=g, bh=bh):
            q = q_ref[0, g].astype(cdt)
            do = do_ref[0, g].astype(cdt)
            lse = lse_ref[0, g]
            delta = jnp.sum(o_ref[0, g].astype(jnp.float32)
                            * do_ref[0, g].astype(jnp.float32),
                            axis=1, keepdims=True)
            k = k_ref[0, g].astype(cdt)
            v = v_ref[0, g].astype(cdt)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * scale_ref[0]
            mask = _bwd_mask(qi * block_q, kj * block_k, block_q, block_k,
                             q_len, kv_len, causal, q_off=q_off)
            p = jnp.where(mask, _pexp(s - lse), 0.0)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if dropout_p > 0.0:
                keep = _dropout_keep(seed_ref, bh, dq_base + qi * block_q,
                                     dk0, block_q, block_k, dropout_p)
                scale_keep = 1.0 / (1.0 - dropout_p)
                p_v = jnp.where(keep, p * scale_keep, 0.0)
                dp = jnp.where(keep, dp * scale_keep, 0.0)
            else:
                p_v = p
            dv_acc[g] += jax.lax.dot_general(
                p_v.astype(cdt), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            dk_acc[g] += jax.lax.dot_general(
                ds.astype(cdt), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_tile = jax.lax.dot_general(
                ds.astype(cdt), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # select (not arithmetic) against the kj == 0 read: the scratch
            # block holds the previous (b, h)'s values there — possibly
            # non-finite — and a select never propagates them
            prev = jnp.where(kj == 0, jnp.zeros_like(dq_tile),
                             dq_acc[g, qrows])
            dq_acc[g, qrows] = prev + dq_tile

        @pl.when(jnp.logical_and(jnp.logical_not(active), kj == 0))
        def _(g=g):
            dq_acc[g, qrows] = jnp.zeros((block_q, q_ref.shape[-1]),
                                         jnp.float32)

        # every iteration leaves the CURRENT partial in the HBM-backed
        # blocks; revisits overwrite, so after the final kj (dq) / qi
        # (dk, dv) sweep the buffers hold the totals, already in the model
        # dtype. ds was taken w.r.t. the SCALED scores; dq/dk carry the
        # scale on the way out.
        dq_ref[0, g] = (dq_acc[g, qrows] * scale_ref[0]).astype(dq_ref.dtype)
        dk_ref[0, g] = (dk_acc[g] * scale_ref[0]).astype(dk_ref.dtype)
        dv_ref[0, g] = dv_acc[g].astype(dv_ref.dtype)


# default ON since the r3 on-chip A/B: +0.6% end-to-end train throughput
# (bench_results/train_fusedbwd_r3.json vs train_r3c.json) and fewer
# kernels to schedule; exact against the split kernels (tests).
_FUSED_BWD = os.environ.get("FLASH_FUSED_BWD", "1") == "1"
# scratch-accumulator fused backward (see _flash_bwd_scratch_kernel);
# FLASH_BWD_SCRATCH=0 falls back to the partials form for A/Bs.
_BWD_SCRATCH = os.environ.get("FLASH_BWD_SCRATCH", "1") == "1"


def _flash_bwd(q, k, v, out, lse, g, seed, scale, causal, block_q, block_k,
               dropout_p=0.0, bias=None, q_offsets=None, k_offsets=None,
               bh_offset=None):
    """Tiled Pallas backward: q/k/v/out/g (b, h, s, d); lse (b, h, sq) f32.
    Returns (dq, dk, dv) in the input dtypes. O(s*d) HBM traffic per pass like
    the forward — never materializes the s x s matrix (the previous XLA
    recompute backward did, and its O(s^2) graph hung the compiler at large
    batch). q_offsets: (b,) absolute q positions like the forward's — passing
    the GLOBAL lse/out of a longer attention plus an offset makes this compute
    the exact per-chunk-pair gradient contributions (the ring-attention
    backward building block)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    d_pad = _head_pad(d)
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)

    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1)

    def pad(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                           (0, d_pad - x.shape[3])))

    qp, kp, vp = pad(q, sq_pad), pad(k, sk_pad), pad(v, sk_pad)
    gp = pad(g, sq_pad)
    if lse.ndim == 4:
        # native fwd-kernel layout (b, h, sq_pad, 1) saved by the vjp rule:
        # flows into the kernels untouched (no slice/pad layout round trip)
        lse_p = (lse if lse.shape[2] == sq_pad else
                 jnp.pad(lse, ((0, 0), (0, 0), (0, sq_pad - lse.shape[2]),
                               (0, 0))))
    else:
        lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_pad - sq)))[..., None]

    if seed is None:
        seed = jnp.zeros((2,), jnp.uint32)
    if q_offsets is None:
        q_offsets = jnp.zeros((b,), jnp.int32)
    else:
        q_offsets = jnp.broadcast_to(
            jnp.asarray(q_offsets, jnp.int32).reshape(-1), (b,))
    if k_offsets is None:
        k_offsets = jnp.zeros((b,), jnp.int32)
    else:
        k_offsets = jnp.broadcast_to(
            jnp.asarray(k_offsets, jnp.int32).reshape(-1), (b,))
    bh_offset = jnp.reshape(
        jnp.asarray(0 if bh_offset is None else bh_offset, jnp.int32), (1,))
    has_bias = bias is not None
    if has_bias:
        bias = jnp.asarray(bias, jnp.float32)
        bb, bh = bias.shape[0], bias.shape[1]
        bias_p = jnp.pad(bias, ((0, 0), (0, 0), (0, sq_pad - bias.shape[2]),
                                (0, sk_pad - bias.shape[3])))
    else:
        bb = bh = 1
        bias_p = jnp.zeros((1, 1, 1, 1), jnp.float32)
    n_qb, n_kb = sq_pad // block_q, sk_pad // block_k
    common = dict(block_q=block_q, block_k=block_k, q_len=sq, kv_len=sk,
                  causal=causal, dropout_p=dropout_p, has_bias=has_bias,
                  force_f32=_interpret())
    qspec = pl.BlockSpec((1, 1, block_q, d_pad), lambda bi, hi, i: (bi, hi, i, 0))
    qfull = pl.BlockSpec((1, 1, sq_pad, d_pad), lambda bi, hi, i: (bi, hi, 0, 0))
    kspec = pl.BlockSpec((1, 1, block_k, d_pad), lambda bi, hi, i: (bi, hi, i, 0))
    kfull = pl.BlockSpec((1, 1, sk_pad, d_pad), lambda bi, hi, i: (bi, hi, 0, 0))
    rblk = pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, i: (bi, hi, i, 0))
    rfull = pl.BlockSpec((1, 1, sq_pad, 1), lambda bi, hi, i: (bi, hi, 0, 0))

    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def bias_q_map(bi, hi, i):
        return (bi if bb > 1 else 0, hi if bh > 1 else 0,
                i if has_bias else 0, 0)

    def bias_k_map(bi, hi, i):
        return (bi if bb > 1 else 0, hi if bh > 1 else 0, 0,
                i if has_bias else 0)

    bias_q_blk = pl.BlockSpec((1, 1, block_q if has_bias else 1,
                               sk_pad if has_bias else 1), bias_q_map)
    bias_k_blk = pl.BlockSpec((1, 1, sq_pad if has_bias else 1,
                               block_k if has_bias else 1), bias_k_map)
    dq_outs = [jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype)]
    dq_specs = [qspec]
    if has_bias:
        # per-program (block_q, sk_pad) strips of dbias; broadcast dims are
        # reduced by the caller (every (bi, hi) program writes a distinct
        # region of the full (b, h, ...) buffer — no write races)
        dq_outs.append(jax.ShapeDtypeStruct((b, h, sq_pad, sk_pad),
                                            jnp.float32))
        dq_specs.append(pl.BlockSpec((1, 1, block_q, sk_pad),
                                     lambda bi, hi, i: (bi, hi, i, 0)))
    # Footprint-aware head-group cap for the fused scratch backward: the
    # static cap=4 was tuned at the backpack-small shape (d_pad=64, bf16) —
    # at d_pad=128/f32 shapes (e.g. backpack-mini's dh=80 padded to 128 in
    # f32) G=4 measured 17.8MB of scoped VMEM and failed to compile.
    # Per-G bytes: scratch (sq_pad + 2*block_k rows of f32) +
    # double-buffered in blocks (q, g, out + k, v) + out blocks
    # (dq, dk, dv). The compiler's OBSERVED stack allocation runs ~2.4x
    # this estimate (measured: 17.61M vs 7.3M estimated at s=2048 G=4 —
    # bench_results/flashbwd_2k_diag.log; ~33M at G=12 s=512 in r4), so
    # the budget applies that multiplier. When even G=1 cannot fit (the
    # (G, sq_pad, d) dq scratch grows with sequence length; s >= ~32k at
    # d=64 bf16), fall back to the split two-kernel backward below, whose
    # per-program state is block/stream-sized.
    isz = q.dtype.itemsize
    per_g = ((sq_pad + 2 * block_k) * d_pad * 4
             + 2 * isz * (3 * block_q + 2 * block_k) * d_pad
             + 2 * isz * (block_q + 2 * block_k) * d_pad)
    bwd_cap = int((15 << 20) / (per_g * 2.4))
    scratch_ok = bwd_cap >= 1
    if (_FUSED_BWD and not has_bias
            and (scratch_ok or not _BWD_SCRATCH)):
        # single-pass fused backward: one (s, mask, hash, exp) recompute per
        # tile instead of two, 5 MXU dots instead of 7.
        G = _head_group(h, not _BWD_SCRATCH, cap=min(4, max(bwd_cap, 1)))
        grid4 = (b, h // G, n_kb, n_qb)
        q4 = pl.BlockSpec((1, G, block_q, d_pad),
                          lambda bi, hi, kj, qi: (bi, hi, qi, 0))
        k4 = pl.BlockSpec((1, G, block_k, d_pad),
                          lambda bi, hi, kj, qi: (bi, hi, kj, 0))
        r4 = pl.BlockSpec((1, G, block_q, 1),
                          lambda bi, hi, kj, qi: (bi, hi, qi, 0))
        common4 = dict(common)
        common4.pop("has_bias")
        if _BWD_SCRATCH:
            # f32 accumulation lives in VMEM scratch; outputs leave the
            # kernel in the model dtypes (no partials sum / cast passes)
            dq, dk, dv = pl.pallas_call(
                functools.partial(_flash_bwd_scratch_kernel, g_heads=G,
                                  n_heads=h, **common4),
                grid=grid4,
                in_specs=[sspec, sspec, sspec, sspec, sspec, q4, k4, k4,
                          q4, r4, q4],
                out_specs=[q4, k4, k4],
                out_shape=[jax.ShapeDtypeStruct((b, h, sq_pad, d_pad),
                                                q.dtype),
                           jax.ShapeDtypeStruct((b, h, sk_pad, d_pad),
                                                k.dtype),
                           jax.ShapeDtypeStruct((b, h, sk_pad, d_pad),
                                                v.dtype)],
                scratch_shapes=[
                    pltpu.VMEM((G, sq_pad, d_pad), jnp.float32),
                    pltpu.VMEM((G, block_k, d_pad), jnp.float32),
                    pltpu.VMEM((G, block_k, d_pad), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary", "arbitrary")),
                interpret=_interpret(),
            )(seed, q_offsets, k_offsets, bh_offset, scale_arr, qp, kp,
              vp, gp, lse_p, pad(out, sq_pad))
            dbias = None
        else:
            dq_part4 = pl.BlockSpec(
                (1, 1, 1, block_q, d_pad),
                lambda bi, hi, kj, qi: (kj, bi, hi, qi, 0))
            dq_parts, dkf, dvf = pl.pallas_call(
                functools.partial(_flash_bwd_fused_kernel, **common4),
                grid=grid4,
                in_specs=[sspec, sspec, sspec, sspec, sspec, q4, k4, k4,
                          q4, r4, q4],
                out_specs=[dq_part4, k4, k4],
                out_shape=[jax.ShapeDtypeStruct((n_kb, b, h, sq_pad, d_pad),
                                                jnp.float32),
                           jax.ShapeDtypeStruct((b, h, sk_pad, d_pad),
                                                jnp.float32),
                           jax.ShapeDtypeStruct((b, h, sk_pad, d_pad),
                                                jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary", "arbitrary")),
                interpret=_interpret(),
            )(seed, q_offsets, k_offsets, bh_offset, scale_arr, qp, kp,
              vp, gp, lse_p, pad(out, sq_pad))
            dq, dbias = dq_parts.sum(axis=0).astype(q.dtype), None
            dk, dv = dkf.astype(k.dtype), dvf.astype(v.dtype)
    else:
        # delta_i = rowsum(dO_i * O_i) — the softmax-jacobian correction
        # (the fused path computes it in-kernel from VMEM-resident blocks)
        delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32),
                        axis=-1)
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - sq)))[..., None]
        dq_res = pl.pallas_call(
            functools.partial(_flash_bwd_dq_kernel, **common),
            grid=(b, h, n_qb),
            in_specs=[sspec, sspec, sspec, sspec, sspec, qspec, kfull,
                      kfull, qspec, rblk, rblk, bias_q_blk],
            out_specs=dq_specs,
            out_shape=dq_outs,
            interpret=_interpret(),
        )(seed, q_offsets, k_offsets, bh_offset, scale_arr, qp, kp, vp,
          gp, lse_p, delta, bias_p)
        dq, dbias = (dq_res if has_bias else (dq_res[0], None))

        dk, dv = pl.pallas_call(
            functools.partial(_flash_bwd_dkv_kernel, n_q_blocks=n_qb,
                              **common),
            grid=(b, h, n_kb),
            in_specs=[sspec, sspec, sspec, sspec, sspec, qfull, kspec,
                      kspec, qfull, rfull, rfull, bias_k_blk],
            out_specs=[kspec, kspec],
            out_shape=[jax.ShapeDtypeStruct((b, h, sk_pad, d_pad), k.dtype),
                       jax.ShapeDtypeStruct((b, h, sk_pad, d_pad), v.dtype)],
            interpret=_interpret(),
        )(seed, q_offsets, k_offsets, bh_offset, scale_arr, qp, kp, vp,
          gp, lse_p, delta, bias_p)

    dq = dq[:, :, :sq, :d]
    if has_bias:
        dbias = dbias[:, :, :sq, :sk]
    return dq, dk[:, :, :sk, :d], dv[:, :, :sk, :d], dbias


def _flash_fwd_rule(q, k, v, seed, scale, bias, seq_lengths_static,
                    causal, block_q, block_k, dropout_p, has_bias):
    out, lse = _flash_fwd(q, k, v, None, scale, causal, block_q, block_k,
                          dropout_p=dropout_p, seed=seed,
                          bias=bias if has_bias else None, lse_4d=True)
    return out, (q, k, v, out, lse, seed, scale, bias)


def _flash_bwd_rule(seq_lengths_static, causal, block_q, block_k,
                    dropout_p, has_bias, res, g):
    q, k, v, out, lse, seed, scale, bias = res
    dq, dk, dv, dbias = _flash_bwd(q, k, v, out, lse, g, seed, scale, causal,
                                   block_q, block_k, dropout_p=dropout_p,
                                   bias=bias if has_bias else None)
    if has_bias:
        # reduce over broadcast dims back to the input bias shape
        b, h = q.shape[0], q.shape[1]
        if bias.shape[0] == 1 and b > 1:
            dbias = dbias.sum(axis=0, keepdims=True)
        if bias.shape[1] == 1 and h > 1:
            dbias = dbias.sum(axis=1, keepdims=True)
        dbias = dbias.astype(bias.dtype)
    else:
        dbias = jnp.zeros_like(bias)
    return dq, dk, dv, None, None, dbias


_flash_attention_bhsd.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = True,
                    softmax_scale: Optional[float] = None,
                    seq_lengths: Optional[jax.Array] = None,
                    dropout_p: float = 0.0,
                    dropout_rng: Optional[jax.Array] = None,
                    q_offsets: Optional[jax.Array] = None,
                    attn_bias: Optional[jax.Array] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None) -> jax.Array:
    """FlashAttention forward (differentiable in q/k/v/attn_bias;
    softmax_scale is NON-differentiable — see the stop_gradient below).

    Default blocks: 512x512 on the differentiable (training) path — with
    the scratch backward + no d-padding they beat the r3 256 default by
    ~25% at the kernel level and 5 ms/step end-to-end (flash_r4.json;
    train_r4d_unpacked512* vs train_r4b) — the r3 256-wins A/B was taken
    against the partials backward + d-padded kernels and is stale. The
    ragged/offset inference branch keeps its measured 256x256.
    FLASH_BLOCK_Q/FLASH_BLOCK_K env vars override for A/Bs.

    attn_bias: additive score bias (b|1, h|1, sq, sk), e.g. ALiBi slopes or
    relative-position bias — the capability of the reference's Triton kernel
    (flash_attn_triton.py:10-14); differentiable, with broadcast dims
    reduced in the bias gradient.

    q: (b, sq, h, dh); k, v: (b, sk, h, dh) -> (b, sq, h, dh), matching the
    layout of flash_attn_unpadded_qkvpacked_func after unpacking
    (reference: flash_attn/flash_attn_interface.py:242-334).

    dropout_p/dropout_rng: in-kernel attention dropout (reference FMHA's
    Philox-counter dropout, fmha_api.cpp:313-318): masks are a counter-based
    hash of (rng, batch*head, q_pos, k_pos), regenerated bit-identically in
    the backward. No O(s^2) mask is ever materialized.
    """
    # branch-resolved defaults (see docstring), then the bench A/B override
    trainable = seq_lengths is None and q_offsets is None
    if block_q is None:
        block_q = 512 if trainable else 256
    if block_k is None:
        block_k = 512 if trainable else 256
    block_q = int(os.environ.get("FLASH_BLOCK_Q", block_q))
    block_k = int(os.environ.get("FLASH_BLOCK_K", block_k))
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    # scale (possibly traced, e.g. per-layer) rides into the kernels as an
    # SMEM scalar operand — no q pre-scaling copy.
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if dropout_p > 0.0:
        assert dropout_rng is not None, "dropout_p > 0 requires dropout_rng"
        if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key):
            dropout_rng = jax.random.key_data(dropout_rng)
        seed = dropout_rng.astype(jnp.uint32).reshape(-1)[:2]
    else:
        seed = jnp.zeros((2,), jnp.uint32)
    has_bias = attn_bias is not None
    if seq_lengths is None and q_offsets is None:
        bias = (jnp.asarray(attn_bias, jnp.float32) if has_bias
                else jnp.zeros((1, 1, 1, 1), jnp.float32))
        if bias.ndim == 2:
            bias = bias[None, None]
        # softmax_scale is NON-differentiable: the custom_vjp rules return
        # no cotangent for it (models pass config constants; a learnable
        # temperature must be applied to q outside this call). stop_gradient
        # makes that explicit instead of silently yielding zero.
        out = _flash_attention_bhsd(qt, kt, vt, seed,
                                    jax.lax.stop_gradient(
                                        jnp.asarray(scale, jnp.float32)), bias,
                                    None, causal, block_q, block_k,
                                    dropout_p, has_bias)
    else:
        # padded/ragged/offset path is inference-only for now: no vjp needed.
        out, _ = _flash_fwd(qt, kt, vt, seq_lengths, scale, causal,
                            block_q, block_k, dropout_p=dropout_p, seed=seed,
                            q_offsets=q_offsets, bias=attn_bias)
    return jnp.swapaxes(out, 1, 2)


def _blocksparse_gathered_kernel(lens_ref, tbl_ref, cnt_ref, q_ref, k_ref,
                                 v_ref, o_ref, lse_ref, acc_ref, m_ref,
                                 l_ref, *, block_q: int, block_k: int,
                                 kv_len: int, causal: bool, n_jb: int):
    """Grid (b, h, n_qb, n_jb): j iterates the COMPACTED active-block list of
    this q row; the K/V index maps gather via the scalar-prefetched table, so
    inactive tiles are never DMA'd (they repeat the previous index, which the
    pallas pipeline recognizes as a revisit — no fetch, and compute is
    predicated off). Online-softmax state lives in VMEM scratch across the
    sequential j dimension."""
    qi, ji = pl.program_id(2), pl.program_id(3)
    seq_len = lens_ref[pl.program_id(0)]
    cnt = cnt_ref[qi]

    @pl.when(ji == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    cdt = (jnp.float32 if _interpret() or q_ref.dtype == jnp.float32
           else jnp.bfloat16)

    @pl.when(ji < cnt)
    def _():
        kb = tbl_ref[qi, ji]
        q = q_ref[0, 0].astype(cdt)
        k = k_ref[0, 0].astype(cdt)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = k_pos < jnp.minimum(seq_len, kv_len)
        if causal:
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)
        m_prev, l_prev = m_ref[:, 0], l_ref[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new[:, None]), 0.0)
        l_ref[:, 0] = l_prev * corr + jnp.sum(p, axis=1)
        m_ref[:, 0] = m_new
        pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * corr[:, None] + pv

    @pl.when(ji == n_jb - 1)
    def _():
        l = l_ref[:, 0]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_ref[:, 0] + jnp.log(l_safe))[:, None]


def _bs_active(blockmask, causal, n_qb, n_kb, block_q, block_k):
    """Active-tile mask with the causal pre-filter: tiles fully above the
    diagonal are dropped so they cost neither DMA nor a predicated step."""
    active = blockmask.astype(bool)
    if causal:
        reach = (jnp.arange(n_qb)[:, None] + 1) * block_q  # first q_pos + bq
        active = active & (jnp.arange(n_kb)[None, :] * block_k < reach)
    return active


def _bs_fwd(qp, kp, vp, seq_lengths, active, sq, sk, block_q, block_k,
            causal):
    """Gathered blocksparse forward on pre-padded (b, h, s_pad, d_pad)
    operands. Returns (out, lse) at padded shapes."""
    b, h, sq_pad, d_pad = qp.shape
    n_qb = sq_pad // block_q
    n_kb = kp.shape[2] // block_k
    order = jnp.argsort(jnp.where(active, 0, 1) * n_kb
                        + jnp.arange(n_kb)[None, :], axis=1)
    cnt = active.sum(axis=1).astype(jnp.int32)
    last = order[jnp.arange(n_qb), jnp.maximum(cnt - 1, 0)]
    tbl = jnp.where(jnp.arange(n_kb)[None, :] < cnt[:, None], order,
                    last[:, None]).astype(jnp.int32)

    grid = (b, h, n_qb, n_kb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # lens, table, counts
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda bi, hi, qi, ji, lens, tbl, cnt:
                         (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda bi, hi, qi, ji, lens, tbl, cnt:
                         (bi, hi, tbl[qi, ji], 0)),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda bi, hi, qi, ji, lens, tbl, cnt:
                         (bi, hi, tbl[qi, ji], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda bi, hi, qi, ji, lens, tbl, cnt:
                         (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda bi, hi, qi, ji, lens, tbl, cnt:
                         (bi, hi, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_blocksparse_gathered_kernel, block_q=block_q,
                          block_k=block_k, kv_len=sk, causal=causal,
                          n_jb=n_kb),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), qp.dtype),
            jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(seq_lengths, tbl, cnt, qp, kp, vp)
    return out, lse


def _bs_bwd_dq_kernel(bmask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, *, block_q: int, block_k: int,
                      q_len: int, kv_len: int, causal: bool, n_kb: int):
    """Blocksparse dq (reference bwd_block, csrc/flash_attn/fmha_api.cpp:631):
    the dense recompute loop with inactive tiles' MXU work predicated off."""
    qi = pl.program_id(2)
    cdt = (jnp.float32 if _interpret() or q_ref.dtype == jnp.float32
           else jnp.bfloat16)
    q = q_ref[0, 0].astype(cdt)
    do = do_ref[0, 0].astype(cdt)
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    def compute(j, dq_acc):
        k = k_ref[0, 0, pl.ds(j * block_k, block_k)].astype(cdt)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k)].astype(cdt)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = _bwd_mask(qi * block_q, j * block_k, block_q, block_k,
                         q_len, kv_len, causal)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq_acc + jax.lax.dot_general(
            ds.astype(cdt), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def body(j, acc):
        return jax.lax.cond(bmask_ref[qi * n_kb + j] != 0,
                            lambda a: compute(j, a), lambda a: a, acc)

    num_k_blocks = n_kb
    if causal:
        max_k = jnp.minimum((qi + 1) * block_q, kv_len)
        num_k_blocks = pl.cdiv(max_k, block_k)
    dq = jax.lax.fori_loop(
        0, num_k_blocks, body,
        jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bs_bwd_dkv_kernel(bmask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, *, block_q: int,
                       block_k: int, q_len: int, kv_len: int,
                       n_q_blocks: int, causal: bool, n_kb: int):
    ki = pl.program_id(2)
    cdt = (jnp.float32 if _interpret() or q_ref.dtype == jnp.float32
           else jnp.bfloat16)
    k = k_ref[0, 0].astype(cdt)
    v = v_ref[0, 0].astype(cdt)
    j0 = (ki * block_k) // block_q if causal else 0

    def compute(j, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(j * block_q, block_q)].astype(cdt)
        do = do_ref[0, 0, pl.ds(j * block_q, block_q)].astype(cdt)
        lse = lse_ref[0, 0, pl.ds(j * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(j * block_q, block_q)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = _bwd_mask(j * block_q, ki * block_k, block_q, block_k,
                         q_len, kv_len, causal)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(cdt), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(cdt), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    def body(j, carry):
        return jax.lax.cond(bmask_ref[j * n_kb + ki] != 0,
                            lambda c: compute(j, c), lambda c: c, carry)

    d_pad = q_ref.shape[-1]
    dk, dv = jax.lax.fori_loop(
        j0, n_q_blocks, body,
        (jnp.zeros((block_k, d_pad), jnp.float32),
         jnp.zeros((block_k, d_pad), jnp.float32)))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _blocksparse_bhsd(q, k, v, bmask_f, causal, block_q, block_k):
    out, _, _ = _bs_fwd_padded(q, k, v, bmask_f, causal, block_q, block_k)
    return out


def _bs_fwd_padded(q, k, v, bmask_f, causal, block_q, block_k):
    """(b, h, s, d) operands -> padded fwd + the active mask used."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    d_pad = max(_round_up(d, 128), 128)
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)
    n_qb, n_kb = sq_pad // block_q, sk_pad // block_k

    def pad(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                           (0, d_pad - d)))

    qp, kp, vp = pad(q, sq_pad), pad(k, sk_pad), pad(v, sk_pad)
    active = _bs_active(bmask_f, causal, n_qb, n_kb, block_q, block_k)
    lens = jnp.full((b,), sk, jnp.int32)
    out, lse = _bs_fwd(qp, kp, vp, lens, active, sq, sk, block_q, block_k,
                       causal)
    return out[:, :, :sq, :d], lse[:, :, :sq, 0], active


def _bs_fwd_rule(q, k, v, bmask_f, causal, block_q, block_k):
    out, lse, _ = _bs_fwd_padded(q, k, v, bmask_f, causal, block_q, block_k)
    return out, (q, k, v, bmask_f, out, lse)


def _bs_bwd_rule(causal, block_q, block_k, res, g):
    q, k, v, bmask_f, out, lse = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    d_pad = max(_round_up(d, 128), 128)
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)
    n_qb, n_kb = sq_pad // block_q, sk_pad // block_k

    def pad(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                           (0, d_pad - x.shape[3])))

    qp, kp, vp, gp = pad(q, sq_pad), pad(k, sk_pad), pad(v, sk_pad), pad(g, sq_pad)
    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - sq)))[..., None]
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_pad - sq)))[..., None]
    active = _bs_active(bmask_f, causal, n_qb, n_kb, block_q, block_k)
    bm = active.astype(jnp.int32).reshape(-1)

    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    qspec = pl.BlockSpec((1, 1, block_q, d_pad), lambda bi, hi, i: (bi, hi, i, 0))
    qfull = pl.BlockSpec((1, 1, sq_pad, d_pad), lambda bi, hi, i: (bi, hi, 0, 0))
    kspec = pl.BlockSpec((1, 1, block_k, d_pad), lambda bi, hi, i: (bi, hi, i, 0))
    kfull = pl.BlockSpec((1, 1, sk_pad, d_pad), lambda bi, hi, i: (bi, hi, 0, 0))
    rblk = pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, i: (bi, hi, i, 0))
    rfull = pl.BlockSpec((1, 1, sq_pad, 1), lambda bi, hi, i: (bi, hi, 0, 0))
    common = dict(block_q=block_q, block_k=block_k, q_len=sq, kv_len=sk,
                  causal=causal, n_kb=n_kb)
    dq = pl.pallas_call(
        functools.partial(_bs_bwd_dq_kernel, **common),
        grid=(b, h, n_qb),
        in_specs=[sspec, qspec, kfull, kfull, qspec, rblk, rblk],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
        interpret=_interpret(),
    )(bm, qp, kp, vp, gp, lse_p, delta)
    dk, dv = pl.pallas_call(
        functools.partial(_bs_bwd_dkv_kernel, n_q_blocks=n_qb, **common),
        grid=(b, h, n_kb),
        in_specs=[sspec, qfull, kspec, kspec, qfull, rfull, rfull],
        out_specs=[kspec, kspec],
        out_shape=[jax.ShapeDtypeStruct((b, h, sk_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b, h, sk_pad, d_pad), v.dtype)],
        interpret=_interpret(),
    )(bm, qp, kp, vp, gp, lse_p, delta)
    return (dq[:, :, :sq, :d], dk[:, :, :sk, :d], dv[:, :, :sk, :d],
            jnp.zeros_like(bmask_f))


_blocksparse_bhsd.defvjp(_bs_fwd_rule, _bs_bwd_rule)


def flash_blocksparse_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                                blockmask: jax.Array, *,
                                causal: bool = True,
                                softmax_scale: Optional[float] = None,
                                seq_lengths: Optional[jax.Array] = None,
                                block_q: int = 256,
                                block_k: int = 256) -> jax.Array:
    """Block-sparse FlashAttention, forward + backward (reference:
    fwd_block/bwd_block, csrc/flash_attn/fmha_api.cpp:507,631 +
    flash_blocksparse_attention.py:14).

    q: (b, sq, h, dh); blockmask: (ceil(sq/block_q), ceil(sk/block_k)) with 1
    for attended tiles. Semantics are exact: masked tiles contribute nothing
    (as if their scores were -inf), matching the reference's converted
    blockmask (flash_blocksparse_attn_interface.py:8). The forward's inactive
    tiles skip the K/V DMA entirely (compacted active-block tables via scalar
    prefetch), not just the MXU work — HBM traffic scales with density. The
    backward is differentiable w.r.t. q/k/v (blocksparse training parity with
    the reference's bwd_block): dense-layout tiled recompute kernels with
    inactive tiles' compute predicated off. No attention dropout on the
    blocksparse path (pass dropout_p=0 semantics; the dense kernel carries
    dropout)."""
    scale = (softmax_scale if softmax_scale is not None
             else 1.0 / math.sqrt(q.shape[-1]))
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    b, h, sq, d = qt.shape
    sk = kt.shape[2]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    n_qb = _round_up(sq, block_q) // block_q
    assert blockmask.shape == (n_qb, pl.cdiv(sk, block_k)), blockmask.shape
    n_kb = _round_up(sk, block_k) // block_k
    bm = jnp.zeros((n_qb, n_kb), jnp.float32)
    bm = bm.at[:, :blockmask.shape[1]].set(blockmask.astype(jnp.float32))
    if seq_lengths is None:
        out = _blocksparse_bhsd(qt, kt, vt, bm, causal, block_q, block_k)
    else:
        # ragged path is inference-only (same policy as flash_attention)
        d_pad = max(_round_up(d, 128), 128)
        sq_pad, sk_pad = n_qb * block_q, n_kb * block_k

        def pad(x, s_pad):
            return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                               (0, d_pad - d)))

        active = _bs_active(bm, causal, n_qb, n_kb, block_q, block_k)
        out, _ = _bs_fwd(pad(qt, sq_pad), pad(kt, sk_pad), pad(vt, sk_pad),
                         jnp.asarray(seq_lengths, jnp.int32), active, sq, sk,
                         block_q, block_k, causal)
        out = out[:, :, :sq, :d]
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_packed(qkv5, seed, scale, causal, block_q, block_k,
                            dropout_p):
    out, _ = _flash_fwd(qkv5[0], qkv5[1], qkv5[2], None, scale, causal,
                        block_q, block_k, dropout_p=dropout_p, seed=seed)
    return out


def _flash_packed_fwd_rule(qkv5, seed, scale, causal, block_q, block_k,
                           dropout_p):
    out, lse = _flash_fwd(qkv5[0], qkv5[1], qkv5[2], None, scale, causal,
                          block_q, block_k, dropout_p=dropout_p, seed=seed,
                          lse_4d=True)
    return out, (qkv5, out, lse, seed, scale)


def _flash_packed_bwd_rule(causal, block_q, block_k, dropout_p, res, g):
    qkv5, out, lse, seed, scale = res
    dq, dk, dv, _ = _flash_bwd(qkv5[0], qkv5[1], qkv5[2], out, lse, g, seed,
                               scale, causal, block_q, block_k,
                               dropout_p=dropout_p)
    return jnp.stack([dq, dk, dv]), None, None


_flash_attention_packed.defvjp(_flash_packed_fwd_rule,
                               _flash_packed_bwd_rule)


def flash_attention_qkv_packed(qkv: jax.Array, *, causal: bool = True,
                               softmax_scale=None,
                               dropout_p: float = 0.0,
                               dropout_rng: Optional[jax.Array] = None,
                               block_q: int = 512,
                               block_k: int = 512) -> jax.Array:
    """Fused-QKV self-attention: qkv (b, s, 3, h, d) -> (b, s, h, d).

    The analogue of the reference's flash_attn_unpadded_qkvpacked_func
    (flash_attn/flash_attn_interface.py:242-283), which keeps qkv packed all
    the way into the kernel. Layout-wise this is the load-bearing TPU form:
    ONE (b,s,3,h,d) -> (3,b,h,s,d) transpose feeds all three kernel operands
    (leading-dim slices are free), and its vjp is one stack + one transpose
    of the gradients. The unpacked flash_attention() entry costs three
    slice+swapaxes chains forward and a three-way transpose + concat
    backward — the r4 train profile attributed ~25 ms/step (batch 32) to
    exactly that formatting around the qkv reshape (models/gpt.py).
    Semantics (scale, causal mask, counter-hash dropout, LSE) are identical
    to flash_attention()."""
    b, s, three, h, d = qkv.shape
    assert three == 3, qkv.shape
    block_q = int(os.environ.get("FLASH_BLOCK_Q", block_q))
    block_k = int(os.environ.get("FLASH_BLOCK_K", block_k))
    scale = (softmax_scale if softmax_scale is not None
             else 1.0 / math.sqrt(d))
    if dropout_p > 0.0:
        assert dropout_rng is not None, "dropout_p > 0 requires dropout_rng"
        if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key):
            dropout_rng = jax.random.key_data(dropout_rng)
        seed = dropout_rng.astype(jnp.uint32).reshape(-1)[:2]
    else:
        seed = jnp.zeros((2,), jnp.uint32)
    qkv5 = jnp.transpose(qkv, (2, 0, 3, 1, 4))
    # softmax_scale is non-differentiable (see flash_attention)
    out = _flash_attention_packed(qkv5, seed,
                                  jax.lax.stop_gradient(
                                      jnp.asarray(scale, jnp.float32)),
                                  causal, block_q, block_k, dropout_p)
    return jnp.swapaxes(out, 1, 2)


def flash_attention_with_lse(q, k, v, *, causal=True, softmax_scale=None,
                             seq_lengths=None, block_q=256, block_k=512):
    """Forward-only variant that also returns the log-sum-exp per row, the
    analogue of the reference fwd's softmax_lse output (fmha_api.cpp:277)."""
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    out, lse = _flash_fwd(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                          jnp.swapaxes(v, 1, 2), seq_lengths, scale, causal,
                          block_q, block_k)
    return jnp.swapaxes(out, 1, 2), lse
