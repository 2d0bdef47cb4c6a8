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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(len_ref, q_ref, kt_ref, ks_ref, v_ref, vs_ref, o_ref, *,
            rows: int, quant_k: bool, quant_v: bool, force_f32: bool):
    """kt is the TRANSPOSED key cache (rows, dk, S): scores become MXU matvecs
    (1, dk) @ (dk, S) instead of lane-axis reductions, which the VPU hates."""
    S = kt_ref.shape[2]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    base = pl.program_id(0) * rows
    # fp32 inputs keep fp32 math (exactness oracles); bf16/int8 run bf16 MXU.
    # force_f32 covers interpret mode: XLA:CPU has no bf16 x bf16 dot thunk.
    cdt = (jnp.float32 if force_f32 or q_ref.dtype == jnp.float32
           else jnp.bfloat16)
    # Mosaic has no batched dot_general and `rows` is a small static constant:
    # unroll the per-row pipeline (2 MXU dots + one lane-wise softmax each).
    for j in range(rows):
        # per-row valid length (serving slots decode at different positions)
        valid = pos < len_ref[base + j]
        q_j = q_ref[j:j + 1].astype(cdt)                   # (1, dk)
        kt_j = kt_ref[j].astype(cdt)                       # (dk, S)
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
            p.astype(cdt), v_ref[j].astype(cdt),
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
    # scalar length -> broadcast to all rows; (E,) vector -> per-row lengths
    length = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (e,))

    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, quant_k=quant_k,
                          quant_v=quant_v, force_f32=_interpret()),
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
    """fp32 jnp reference for the fused kernel (tests).
    kt: (E, dk, S) transposed key cache."""
    qf = q.astype(jnp.float32)
    s = jnp.einsum("ed,eds->es", qf, kt.astype(jnp.float32))
    if ks is not None:
        s = s * ks
    pos = jnp.arange(v.shape[1])[None, :]
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                               (q.shape[0],))
    s = jnp.where(pos < lengths[:, None], s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    if vs is not None:
        p = p * vs
    return jnp.einsum("es,esd->ed", p, v.astype(jnp.float32)).astype(q.dtype)


def decode_attention_flat(q, kt, ks, v, vs, length, *,
                          length_buckets: bool = False):
    """XLA flat-layout decode attention — the production decode path.

    Same contract as decode_attention_fused. Measured on v5e (backpack-small
    shapes, E=384, dk=64, S=512): 42us int8 / 71us bf16 per layer for the
    full-window contraction, vs 105us+ for the per-row-matvec Pallas kernel
    and a 17/31us cache-read roofline — XLA's batched-matvec schedule
    pipelines the HBM streams better than the hand kernel, so it wins; the
    Pallas kernel is kept for future Mosaic work. int8 caches are consumed
    via bf16 casts that XLA fuses into the contractions (never an fp32
    materialization of the cache).

    length_buckets: pick the smallest of {S/4, S/2, S} covering max(length)
    with nested lax.cond, so early decode steps read only a prefix of the
    cache. In ISOLATION this wins big (26us at length<=S/4 vs 42us full) —
    but OFF by default: when the cache is a scan-carried buffer that the
    step also updates (the real decode loop), the cond branches force XLA
    into defensive full-cache copies and throughput drops 5x (measured
    30.2k -> 6.0k tok/s). Safe to enable when kt/v are loop-invariant
    (e.g. scoring a fixed prefix many times)."""
    compute = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
    S = v.shape[1]
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                               (q.shape[0],))

    def run(s_eff):
        s = jnp.einsum("ed,eds->es", q.astype(compute),
                       kt[:, :, :s_eff].astype(compute),
                       preferred_element_type=jnp.float32)
        if ks is not None:
            s = s * ks[:, :s_eff]
        pos = jnp.arange(s_eff)[None, :]
        s = jnp.where(pos < lengths[:, None], s, NEG)
        p = jax.nn.softmax(s, axis=-1)
        if vs is not None:
            p = p * vs[:, :s_eff]
        return jnp.einsum("es,esd->ed", p.astype(compute),
                          v[:, :s_eff].astype(compute),
                          preferred_element_type=jnp.float32).astype(q.dtype)

    if not length_buckets or S < 256 or S % 4 != 0:
        return run(S)
    lmax = jnp.max(lengths)
    return jax.lax.cond(
        lmax <= S // 4, lambda: run(S // 4),
        lambda: jax.lax.cond(lmax <= S // 2, lambda: run(S // 2),
                             lambda: run(S)))


def _gathered_kernel(lens_ref, cnt_ref, q_ref, kt_ref, ks_ref, v_ref, vs_ref,
                     o_ref, acc_ref, m_ref, l_ref, *, rows: int,
                     block_s: int, n_sb: int, quant_k: bool, quant_v: bool,
                     force_f32: bool):
    """Grid (E/rows, n_sb): cache blocks past this row-block's max valid
    length are neither DMA'd (their index maps repeat the previous block —
    a pipeline revisit) nor computed (predicated off). Online-softmax state
    rides VMEM scratch across the sequential block dimension."""
    ei, ji = pl.program_id(0), pl.program_id(1)
    cnt = cnt_ref[ei]
    cdt = (jnp.float32 if force_f32 or q_ref.dtype == jnp.float32
           else jnp.bfloat16)

    @pl.when(ji == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(ji < cnt)
    def _():
        base = ei * rows
        pos = ji * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
        for r in range(rows):
            valid = pos < lens_ref[base + r]
            q_r = q_ref[r:r + 1].astype(cdt)              # (1, dk)
            s = jax.lax.dot_general(q_r, kt_ref[r].astype(cdt),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if quant_k:
                s = s * ks_ref[r:r + 1]
            s = jnp.where(valid, s, NEG)
            # (1, 1)-shaped state ops: Mosaic cannot store scalars to VMEM
            m_prev, l_prev = m_ref[r:r + 1, :], l_ref[r:r + 1, :]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)  # (1, block_s)
            l_ref[r:r + 1, :] = (l_prev * corr
                                 + jnp.sum(p, axis=1, keepdims=True))
            m_ref[r:r + 1, :] = m_new
            if quant_v:
                p = p * vs_ref[r:r + 1]
            pv = jax.lax.dot_general(p.astype(cdt), v_ref[r].astype(cdt),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[r:r + 1] = acc_ref[r:r + 1] * corr + pv

    @pl.when(ji == n_sb - 1)
    def _():
        l = l_ref[:, 0]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[:] = (acc_ref[:] / l_safe[:, None]).astype(o_ref.dtype)


def decode_attention_gathered(q: jax.Array, kt: jax.Array,
                              ks: Optional[jax.Array], v: jax.Array,
                              vs: Optional[jax.Array], length: jax.Array, *,
                              rows_per_program: int = 8,
                              block_s: int = 128) -> jax.Array:
    """Length-adaptive decode attention: HBM traffic scales with each row
    block's actual valid length instead of the full cache width. Same
    contract as decode_attention_fused (q pre-scaled; kt transposed)."""
    e, dk = q.shape
    _, s_len, dv = v.shape
    assert kt.shape == (e, dk, s_len)
    rows = rows_per_program
    while e % rows != 0:
        rows //= 2
    while s_len % block_s != 0 and block_s > 128:
        block_s //= 2
    if s_len % block_s != 0:
        block_s = s_len
    n_eb, n_sb = e // rows, s_len // block_s
    quant_k, quant_v = ks is not None, vs is not None
    if ks is None:
        ks = jnp.ones((e, 1), jnp.float32)
    if vs is None:
        vs = jnp.ones((e, 1), jnp.float32)
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (e,))
    cnt = -(-lens.reshape(n_eb, rows).max(axis=1) // block_s)  # (E/rows,)

    def _jidx(ji, cnt_ei):
        # blocks past the valid prefix repeat the last valid index: the
        # pallas pipeline sees an unchanged block and skips the DMA
        return jnp.minimum(ji, jnp.maximum(cnt_ei - 1, 0))

    def sblk(width):
        # scale blocks: (rows, block_s) slices when scales are full-width,
        # else the (rows, 1) placeholder
        if width == s_len:
            return pl.BlockSpec((rows, block_s),
                                lambda ei, ji, lens, cnt:
                                (ei, _jidx(ji, cnt[ei])))
        return pl.BlockSpec((rows, width),
                            lambda ei, ji, lens, cnt: (ei, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # lens, cnt
        grid=(n_eb, n_sb),
        in_specs=[
            pl.BlockSpec((rows, dk), lambda ei, ji, lens, cnt: (ei, 0)),
            pl.BlockSpec((rows, dk, block_s),
                         lambda ei, ji, lens, cnt:
                         (ei, 0, _jidx(ji, cnt[ei]))),
            sblk(ks.shape[1]),
            pl.BlockSpec((rows, block_s, dv),
                         lambda ei, ji, lens, cnt:
                         (ei, _jidx(ji, cnt[ei]), 0)),
            sblk(vs.shape[1]),
        ],
        out_specs=pl.BlockSpec((rows, dv), lambda ei, ji, lens, cnt: (ei, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, dv), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gathered_kernel, rows=rows, block_s=block_s,
                          n_sb=n_sb, quant_k=quant_k, quant_v=quant_v,
                          force_f32=_interpret()),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, dv), q.dtype),
        interpret=_interpret(),
    )(lens, cnt.astype(jnp.int32), q, kt, ks, v, vs)


def _selector_kernel(lens_ref, q_ref, kt_ref, ks_ref, vt_ref, vs_ref,
                     o_ref, *, rows: int, quant_k: bool, quant_v: bool,
                     force_f32: bool):
    """Batched ragged matvecs via block-diagonal selector matmuls.

    The per-row score q_r . K_r is a matvec — M=1 starves the MXU, and a 3D
    broadcast-reduce crashes Mosaic. Instead (2D ops only):
      scores: elementwise q (R*dk, 1) * Kt (R*dk, S) on the VPU, then ONE
        (R, R*dk) @ (R*dk, S) dot with a constant 0/1 block-diagonal selector
        does every row's segment-sum on the MXU.
      PV:     probs p (R, S) are segment-REPEATED to (R*dv, S) by another
        selector dot, multiplied elementwise into the TRANSPOSED value cache
        (R*dv, S), and lane-reduced to the (R*dv, 1) output column.
    The int8 -> bf16 dequant happens on VMEM tiles, never in HBM (XLA's
    batched-matvec path materializes a bf16 copy of the cache instead).

    q arrives pre-flattened (R*dk, 1); vt is (R, dv, S); o is (R*dv, 1)."""
    R = rows
    _, dk, S = kt_ref.shape
    dv = vt_ref.shape[1]
    cdt = (jnp.float32 if force_f32 or q_ref.dtype == jnp.float32
           else jnp.bfloat16)
    lens = lens_ref[:]                                    # (R, 1) int32

    ktf = kt_ref[:].reshape(R * dk, S).astype(cdt)
    qf = q_ref[:].astype(cdt)                             # (R*dk, 1)
    seg = jax.lax.broadcasted_iota(jnp.int32, (R, R * dk), 1) // dk
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, R * dk), 0) == seg
           ).astype(cdt)
    s = jax.lax.dot_general(sel, ktf * qf, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (R, S)
    if quant_k:
        s = s * ks_ref[:]
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    s = jnp.where(pos < lens, s, NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    if quant_v:
        p = p * vs_ref[:]

    # segment-repeat p to (R*dv, S) with a selector dot (row i <- p[i // dv])
    seg2 = jax.lax.broadcasted_iota(jnp.int32, (R * dv, R), 0) // dv
    rep_sel = (seg2 == jax.lax.broadcasted_iota(jnp.int32, (R * dv, R), 1)
               ).astype(cdt)
    p_rep = jax.lax.dot_general(rep_sel, p.astype(cdt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(cdt)                     # (R*dv, S)
    vtf = vt_ref[:].reshape(R * dv, S).astype(cdt)
    out = jnp.sum((vtf * p_rep).astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] = out.astype(o_ref.dtype)


def decode_attention_selector(q: jax.Array, kt: jax.Array,
                              ks: Optional[jax.Array], v: jax.Array,
                              vs: Optional[jax.Array], length: jax.Array, *,
                              rows_per_program: int = 8,
                              v_transposed: bool = False) -> jax.Array:
    """Selector-matmul decode attention (see _selector_kernel). Same contract
    as decode_attention_fused; v may be passed pre-transposed (E, dv, S)
    with v_transposed=True (the production cache layout for this kernel)."""
    e, dk = q.shape
    if v_transposed:
        _, dv, s_len = v.shape
        vt = v
    else:
        _, s_len, dv = v.shape
        vt = jnp.swapaxes(v, 1, 2)
    assert kt.shape == (e, dk, s_len)
    rows = rows_per_program
    while e % rows != 0:
        rows //= 2
    grid = (e // rows,)
    quant_k, quant_v = ks is not None, vs is not None
    if ks is None:
        ks = jnp.ones((e, 1), jnp.float32)
    if vs is None:
        vs = jnp.ones((e, 1), jnp.float32)
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                            (e,))[:, None]
    # lane->sublane flattening is not a supported in-kernel shape cast:
    # pre-flatten q on the host (one tiny relayout per step)
    qf = q.reshape(e * dk, 1)

    out = pl.pallas_call(
        functools.partial(_selector_kernel, rows=rows, quant_k=quant_k,
                          quant_v=quant_v, force_f32=_interpret()),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 1), lambda i: (i, 0)),      # lengths
            pl.BlockSpec((rows * dk, 1), lambda i: (i, 0)),
            pl.BlockSpec((rows, dk, s_len), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, ks.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((rows, dv, s_len), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, vs.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows * dv, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((e * dv, 1), q.dtype),
        interpret=_interpret(),
    )(lens, qf, kt, ks, vt, vs)
    return out.reshape(e, dv)


def _blockdiag_kernel(lens_ref, q_ref, kt_ref, ks_ref, v_ref, vs_ref, o_ref,
                      *, rows: int, quant_k: bool, quant_v: bool,
                      force_f32: bool):
    """Batched ragged matvecs as block-diagonal MXU matmuls.

    Per-row decode attention is a matvec (M=1 starves the MXU). Build a
    block-diagonal Q matrix by lane-TILING q (R, dk) -> (R, R*dk) and masking
    off-diagonal segments (cheap VPU), then ONE (R, R*dk) @ (R*dk, S) dot
    computes every row's scores with the MXU doing the segment reduction.
    Same trick for PV: probs are lane-tiled to (R, R*S) block-diagonal form
    and hit V (R*S, dv) in one dot. R x redundant MXU MACs — irrelevant,
    the kernel is DMA-bound. int8 caches are cast bf16 on VMEM tiles only
    (XLA's batched-matvec path materializes a bf16 HBM copy instead); no
    VPU lane reductions anywhere."""
    R = rows
    _, dk, S = kt_ref.shape
    dv = v_ref.shape[2]
    cdt = (jnp.float32 if force_f32 or q_ref.dtype == jnp.float32
           else jnp.bfloat16)
    lens = lens_ref[:]                                    # (R, 1) int32

    q = q_ref[:].astype(cdt)                              # (R, dk)
    q_tiled = jnp.concatenate([q] * R, axis=1)            # (R, R*dk)
    seg = jax.lax.broadcasted_iota(jnp.int32, (R, R * dk), 1) // dk
    row = jax.lax.broadcasted_iota(jnp.int32, (R, R * dk), 0)
    q_bd = jnp.where(seg == row, q_tiled, 0)
    ktf = kt_ref[:].reshape(R * dk, S).astype(cdt)
    s = jax.lax.dot_general(q_bd, ktf, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (R, S)
    if quant_k:
        s = s * ks_ref[:]
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    s = jnp.where(pos < lens, s, NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    if quant_v:
        p = p * vs_ref[:]
    p = p.astype(cdt)

    p_tiled = jnp.concatenate([p] * R, axis=1)            # (R, R*S)
    seg2 = jax.lax.broadcasted_iota(jnp.int32, (R, R * S), 1) // S
    row2 = jax.lax.broadcasted_iota(jnp.int32, (R, R * S), 0)
    p_bd = jnp.where(seg2 == row2, p_tiled, 0)
    vf = v_ref[:].reshape(R * S, dv).astype(cdt)
    out = jax.lax.dot_general(p_bd, vf, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def decode_attention_blockdiag(q: jax.Array, kt: jax.Array,
                               ks: Optional[jax.Array], v: jax.Array,
                               vs: Optional[jax.Array], length: jax.Array, *,
                               rows_per_program: Optional[int] = None
                               ) -> jax.Array:
    """Block-diagonal-matmul decode attention (see _blockdiag_kernel). Same
    contract as decode_attention_fused."""
    e, dk = q.shape
    _, s_len, dv = v.shape
    assert kt.shape == (e, dk, s_len)
    if rows_per_program is None:
        # V block (rows*S, dv) is the VMEM budget driver; target <= ~2MB.
        # Floor 8 (Mosaic's sublane minimum for the (rows, 1) lens block)
        # and power-of-two (the E-divisibility halving below must not drop
        # under 8); big-dv shapes may then exceed VMEM — callers catch.
        cand = max(8, min(32, (2 << 20) // max(s_len * dv, 1)))
        rows_per_program = 1 << (cand.bit_length() - 1)
    rows = rows_per_program
    while e % rows != 0:
        rows //= 2
    grid = (e // rows,)
    quant_k, quant_v = ks is not None, vs is not None
    if ks is None:
        ks = jnp.ones((e, 1), jnp.float32)
    if vs is None:
        vs = jnp.ones((e, 1), jnp.float32)
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                            (e,))[:, None]

    return pl.pallas_call(
        functools.partial(_blockdiag_kernel, rows=rows, quant_k=quant_k,
                          quant_v=quant_v, force_f32=_interpret()),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 1), lambda i: (i, 0)),      # lengths
            pl.BlockSpec((rows, dk), lambda i: (i, 0)),
            pl.BlockSpec((rows, dk, s_len), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, ks.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((rows, s_len, dv), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, vs.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, dv), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((e, dv), q.dtype),
        interpret=_interpret(),
    )(lens, q, kt, ks, v, vs)


def decode_attention(q, kt, ks, v, vs, length, *, use_pallas: bool = False):
    """Dispatching entry point for the single-step cache attention (see
    module docstring for shapes)."""
    if use_pallas:
        return decode_attention_fused(q, kt, ks, v, vs, length)
    return decode_attention_flat(q, kt, ks, v, vs, length)


# ---------------------------------------------------------------- int4
#
# INT4-PACKED cache attention: the decode step is measured cache-stream-bound
# (NOTES.md: 665-790 of ~819 GB/s HBM with every cache int8), so halving the
# cache bytes attacks the roofline itself. Packing convention (see
# ops/quant.py pair-packing block): packed column j = positions (2j, 2j+1) in
# (lo, hi) nibbles; scales ride as (E, 2, S/2) f32 with parity on the middle
# axis. The kernels never interleave: scores for the even and odd halves are
# computed separately and softmaxed JOINTLY, so a window prefix of w
# positions is the first w/2 packed columns — the same static length
# bucketing as the int8 path.

def decode_attention_flat_int4(q, kt4, ks2, v4, vs2, length):
    """XLA even/odd-split int4 decode attention (correctness oracle + CPU
    path; XLA materializes the shifted nibble tensors, so on TPU the Pallas
    kernel below is the production path).

    q (E, dk) pre-scaled; kt4 (E, dk, S/2) packed; ks2 (E, 2, S/2) f32;
    v4 (E, S/2, dv) packed; vs2 (E, 2, S/2) f32; length ()/(E,).
    Returns (E, dv) in q.dtype."""
    from . import quant
    compute = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
    E, dk = q.shape
    S2 = v4.shape[1]
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                               (E,))
    k_lo, k_hi = quant.unpack_int4_pairs_split(kt4)
    s_e = jnp.einsum("ed,eds->es", q.astype(compute), k_lo.astype(compute),
                     preferred_element_type=jnp.float32) * ks2[:, 0, :]
    s_o = jnp.einsum("ed,eds->es", q.astype(compute), k_hi.astype(compute),
                     preferred_element_type=jnp.float32) * ks2[:, 1, :]
    j = jnp.arange(S2)[None, :]
    s_e = jnp.where(2 * j < lengths[:, None], s_e, NEG)
    s_o = jnp.where(2 * j + 1 < lengths[:, None], s_o, NEG)
    p = jax.nn.softmax(jnp.concatenate([s_e, s_o], axis=1), axis=-1)
    p_e = p[:, :S2] * vs2[:, 0, :]
    p_o = p[:, S2:] * vs2[:, 1, :]
    v_lo, v_hi = quant.unpack_int4_pairs_split(v4)
    out = jnp.einsum("es,esd->ed", p_e.astype(compute),
                     v_lo.astype(compute),
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("es,esd->ed", p_o.astype(compute),
                           v_hi.astype(compute),
                           preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _lowbit_decode_body(lens, q, keys, ks2, v4, vs2, o_ref, acc_ref,
                        m_ref, l_ref, *, split_keys: bool, rows: int,
                        n_sb: int, force_f32: bool,
                        mo_ref=None, lo_ref=None):
    """Shared math of the int4/mixed decode kernels on LOADED values.

    Block-diagonal MXU matmuls for scores and PV; even/odd position halves
    merged by ONE online softmax; the caller's grid dim 1 walks bs2-column
    blocks with flash-style (m, l, acc) scratch. keys: (R, dk, bs2)
    PAIR-PACKED int4 bytes (split_keys=False — the nibble unpack happens
    here on VMEM tiles, which XLA cannot express without materializing the
    shifted tensors) or (R, dk, 2, bs2) SPLIT int8 (split_keys=True).
    v4: (R, bs2, dv) pair-packed int4; scales (R, 2, bs2)."""
    R = rows
    ji = pl.program_id(1)
    bs2, dv = v4.shape[1], v4.shape[2]
    dk = q.shape[1]
    cdt = (jnp.float32 if force_f32 or q.dtype == jnp.float32
           else jnp.bfloat16)

    @pl.when(ji == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    if split_keys:
        k_lo = keys[:, :, 0, :].astype(cdt)               # (R, dk, bs2)
        k_hi = keys[:, :, 1, :].astype(cdt)
    else:
        u = keys.astype(jnp.int32)
        k_lo = jnp.right_shift(jnp.left_shift(u, 28), 28).astype(cdt)
        k_hi = jnp.right_shift(jnp.left_shift(u, 24), 28).astype(cdt)

    q = q.astype(cdt)                                     # (R, dk)
    q_tiled = jnp.concatenate([q] * R, axis=1)            # (R, R*dk)
    seg = jax.lax.broadcasted_iota(jnp.int32, (R, R * dk), 1) // dk
    row = jax.lax.broadcasted_iota(jnp.int32, (R, R * dk), 0)
    q_bd = jnp.where(seg == row, q_tiled, 0)
    s_e = jax.lax.dot_general(q_bd, k_lo.reshape(R * dk, bs2),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) * ks2[:, 0]
    s_o = jax.lax.dot_general(q_bd, k_hi.reshape(R * dk, bs2),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) * ks2[:, 1]
    j = ji * bs2 + jax.lax.broadcasted_iota(jnp.int32, (R, bs2), 1)
    ok_e = 2 * j < lens
    ok_o = 2 * j + 1 < lens
    s_e = jnp.where(ok_e, s_e, NEG)
    s_o = jnp.where(ok_o, s_o, NEG)
    m_prev, l_prev = m_ref[:], l_ref[:]
    m_new = jnp.maximum(m_prev,
                        jnp.maximum(jnp.max(s_e, axis=1, keepdims=True),
                                    jnp.max(s_o, axis=1, keepdims=True)))
    corr = jnp.exp(m_prev - m_new)
    # explicit where: an all-masked block keeps m at NEG and exp(NEG-NEG)=1
    p_e = jnp.where(ok_e, jnp.exp(s_e - m_new), 0.0)
    p_o = jnp.where(ok_o, jnp.exp(s_o - m_new), 0.0)
    l_ref[:] = (l_prev * corr + jnp.sum(p_e, axis=1, keepdims=True)
                + jnp.sum(p_o, axis=1, keepdims=True))
    m_ref[:] = m_new
    p_e = (p_e * vs2[:, 0]).astype(cdt)
    p_o = (p_o * vs2[:, 1]).astype(cdt)

    uv = v4.astype(jnp.int32)                             # (R, bs2, dv)
    v_lo = jnp.right_shift(jnp.left_shift(uv, 28), 28).astype(cdt)
    v_hi = jnp.right_shift(jnp.left_shift(uv, 24), 28).astype(cdt)
    seg2 = jax.lax.broadcasted_iota(jnp.int32, (R, R * bs2), 1) // bs2
    row2 = jax.lax.broadcasted_iota(jnp.int32, (R, R * bs2), 0)
    pe_bd = jnp.where(seg2 == row2, jnp.concatenate([p_e] * R, axis=1), 0)
    po_bd = jnp.where(seg2 == row2, jnp.concatenate([p_o] * R, axis=1), 0)
    pv = jax.lax.dot_general(pe_bd, v_lo.reshape(R * bs2, dv),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    pv = pv + jax.lax.dot_general(po_bd, v_hi.reshape(R * bs2, dv),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * corr + pv

    @pl.when(ji == n_sb - 1)
    def _():
        l = l_ref[:, 0]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[:] = (acc_ref[:] / l_safe[:, None]).astype(o_ref.dtype)
        if mo_ref is not None:
            # emit the segment's softmax state for flash-style combination
            # with an XLA-computed STAGE segment (staged low-bit decode)
            mo_ref[:] = m_ref[:]
            lo_ref[:] = l_ref[:]


def _blockdiag_int4_kernel(lens_ref, q_ref, kt4_ref, ks2_ref, v4_ref,
                           vs2_ref, o_ref, acc_ref, m_ref, l_ref, *,
                           rows: int, n_sb: int, force_f32: bool):
    _lowbit_decode_body(lens_ref[:], q_ref[:], kt4_ref[:], ks2_ref[:],
                        v4_ref[:], vs2_ref[:], o_ref, acc_ref, m_ref, l_ref,
                        split_keys=False, rows=rows, n_sb=n_sb,
                        force_f32=force_f32)


def decode_attention_int4_blockdiag(q: jax.Array, kt4: jax.Array,
                                    ks2: jax.Array, v4: jax.Array,
                                    vs2: jax.Array, length: jax.Array, *,
                                    rows_per_program: int = 8,
                                    block_s2: Optional[int] = None
                                    ) -> jax.Array:
    """Pallas int4 decode attention (see _blockdiag_int4_kernel). Contract of
    decode_attention_flat_int4."""
    e, dk = q.shape
    _, S2, dv = v4.shape
    assert kt4.shape == (e, dk, S2), (kt4.shape, (e, dk, S2))
    assert ks2.shape == (e, 2, S2) and vs2.shape == (e, 2, S2)
    rows = rows_per_program
    while e % rows != 0 and rows > 1:
        rows //= 2
    if block_s2 is None:
        # V-side VMEM per block ~= rows*block_s2*dv*(1 int8 + 2x2 bf16 +
        # int32 widen) ~ 9 bytes/value: keep it under ~6MB by halving
        # (S2 is a power of two: max_seqlen/2)
        target = max((6 << 20) // max(rows * dv * 9, 1), 128)
        block_s2 = S2
        while (block_s2 > target and block_s2 % 2 == 0
               and block_s2 // 2 >= 128):
            block_s2 //= 2
    # the kt4/scale blocks put block_s2 on LANES: it must be a multiple of
    # 128 or the whole axis (Mosaic tiling rule)
    if block_s2 % 128 != 0 or S2 % block_s2 != 0:
        block_s2 = S2
    n_sb = S2 // block_s2
    grid = (e // rows, n_sb)
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                            (e,))[:, None]
    return pl.pallas_call(
        functools.partial(_blockdiag_int4_kernel, rows=rows, n_sb=n_sb,
                          force_f32=_interpret()),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 1), lambda i, j: (i, 0)),      # lengths
            pl.BlockSpec((rows, dk), lambda i, j: (i, 0)),
            pl.BlockSpec((rows, dk, block_s2), lambda i, j: (i, 0, j)),
            pl.BlockSpec((rows, 2, block_s2), lambda i, j: (i, 0, j)),
            pl.BlockSpec((rows, block_s2, dv), lambda i, j: (i, j, 0)),
            pl.BlockSpec((rows, 2, block_s2), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((rows, dv), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((e, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, dv), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(lens, q, kt4, ks2, v4, vs2)


# BACKPACKS_INT4_KERNEL: 'xla' (default) | 'blockdiag' (Pallas).
#
# Default XLA after the r5 measurement ladder (probe_alias.py +
# decode_profile_r5*_kv4.json): the Pallas kernels win their microbench,
# but inside the decode scan ANY consumer relationship between the carried
# cache and a custom call costs full-buffer copies — slicing the operand
# materializes the slice (4x int8), passing the full buffer without
# aliasing copies it per layer (38 ms/step), and with pass-through
# input-output aliasing the READS go copy-free but every
# dynamic-update-slice WRITE to the alias-flowing buffer then loses
# in-place-ness (~0.35 ms full copy per write, 4 writes/layer). The XLA
# even/odd contractions fuse the cache slices (in-place writes keep
# working) and measure 3.6-3.7 ms/step vs int8's 2.96 — the nibble-shift
# operands still materialize, so low-bit does not yet BEAT int8
# end-to-end. The design that closes this is staging (decode appends ride
# a small separate block the kernel reads as a third softmax segment, so
# the main cache is read-only inside a scan segment and flushes
# amortized) — the int8 serving path already works exactly this way.
_INT4_KERNEL = os.environ.get("BACKPACKS_INT4_KERNEL", "xla")


def decode_attention_int4(q, kt4, ks2, v4, vs2, length):
    """Dispatching entry point for single-step attention over INT4-packed
    caches (shapes: decode_attention_flat_int4)."""
    if _INT4_KERNEL == "xla" or _interpret():
        return decode_attention_flat_int4(q, kt4, ks2, v4, vs2, length)
    return decode_attention_int4_blockdiag(q, kt4, ks2, v4, vs2, length)


# ------------------------------------------------------------- mixed
#
# MIXED-precision cache attention: keys INT8 in EVEN/ODD SPLIT layout
# (E, dk, 2, S/2), values INT4 pair-packed (E, S/2, dv). Motivation
# (gates_mini_r5 + the ctx-K isolation run): the Backpack contextualization
# keys are ~3% of the decode stream but int4 keys alone cost +1.19 ppl,
# while int4 SENSE VALUES cost only +0.065 — so keys stay int8 (stored
# split so the even/odd score algebra and the w/2 packed-column windowing
# are identical to the int4 path) and only the fat value stream packs.

def decode_attention_flat_mixed(q, k8, ks2, v4, vs2, length):
    """XLA mixed-precision decode attention (oracle + CPU path).

    q (E, dk) pre-scaled; k8 (E, dk, 2, S/2) int8 split; ks2 (E, 2, S/2);
    v4 (E, S/2, dv) int4 pair-packed; vs2 (E, 2, S/2). Returns (E, dv)."""
    from . import quant
    compute = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
    E, dk = q.shape
    S2 = v4.shape[1]
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                               (E,))
    s_e = jnp.einsum("ed,eds->es", q.astype(compute),
                     k8[:, :, 0, :].astype(compute),
                     preferred_element_type=jnp.float32) * ks2[:, 0, :]
    s_o = jnp.einsum("ed,eds->es", q.astype(compute),
                     k8[:, :, 1, :].astype(compute),
                     preferred_element_type=jnp.float32) * ks2[:, 1, :]
    j = jnp.arange(S2)[None, :]
    s_e = jnp.where(2 * j < lengths[:, None], s_e, NEG)
    s_o = jnp.where(2 * j + 1 < lengths[:, None], s_o, NEG)
    p = jax.nn.softmax(jnp.concatenate([s_e, s_o], axis=1), axis=-1)
    p_e = p[:, :S2] * vs2[:, 0, :]
    p_o = p[:, S2:] * vs2[:, 1, :]
    v_lo, v_hi = quant.unpack_int4_pairs_split(v4)
    out = jnp.einsum("es,esd->ed", p_e.astype(compute),
                     v_lo.astype(compute),
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("es,esd->ed", p_o.astype(compute),
                           v_hi.astype(compute),
                           preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _blockdiag_mixed_kernel(lens_ref, q_ref, k8_ref, ks2_ref,
                            v4_ref, vs2_ref, o_ref, acc_ref, m_ref, l_ref,
                            *, rows: int, n_sb: int, force_f32: bool):
    """_lowbit_decode_body with SPLIT int8 keys (the parity axis rides
    whole in the block — Mosaic's second-minor dim must be 8-divisible or
    full — and is sliced on the loaded value)."""
    _lowbit_decode_body(lens_ref[:], q_ref[:], k8_ref[:], ks2_ref[:],
                        v4_ref[:], vs2_ref[:], o_ref, acc_ref, m_ref, l_ref,
                        split_keys=True, rows=rows, n_sb=n_sb,
                        force_f32=force_f32)


def decode_attention_mixed_blockdiag(q, k8, ks2, v4, vs2, length, *,
                                     rows_per_program: int = 8,
                                     block_s2: Optional[int] = None
                                     ) -> jax.Array:
    """Pallas mixed-precision decode attention. Contract of
    decode_attention_flat_mixed."""
    e, dk = q.shape
    _, S2, dv = v4.shape
    assert k8.shape == (e, dk, 2, S2), (k8.shape, (e, dk, 2, S2))
    assert ks2.shape == (e, 2, S2) and vs2.shape == (e, 2, S2)
    rows = rows_per_program
    while e % rows != 0 and rows > 1:
        rows //= 2
    if block_s2 is None:
        target = max((6 << 20) // max(rows * dv * 9, 1), 128)
        block_s2 = S2
        while (block_s2 > target and block_s2 % 2 == 0
               and block_s2 // 2 >= 128):
            block_s2 //= 2
    if block_s2 % 128 != 0 or S2 % block_s2 != 0:
        block_s2 = S2
    n_sb = S2 // block_s2
    grid = (e // rows, n_sb)
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                            (e,))[:, None]
    return pl.pallas_call(
        functools.partial(_blockdiag_mixed_kernel, rows=rows, n_sb=n_sb,
                          force_f32=_interpret()),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 1), lambda i, j: (i, 0)),      # lengths
            pl.BlockSpec((rows, dk), lambda i, j: (i, 0)),
            pl.BlockSpec((rows, dk, 2, block_s2),
                         lambda i, j: (i, 0, 0, j)),           # split keys
            pl.BlockSpec((rows, 2, block_s2), lambda i, j: (i, 0, j)),
            pl.BlockSpec((rows, block_s2, dv), lambda i, j: (i, j, 0)),
            pl.BlockSpec((rows, 2, block_s2), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((rows, dv), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((e, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, dv), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(lens, q, k8, ks2, v4, vs2)


def decode_attention_mixed(q, k8, ks2, v4, vs2, length):
    """Dispatching entry point for mixed int8-split-key / int4-packed-value
    cache attention (shapes: decode_attention_flat_mixed)."""
    if _INT4_KERNEL == "xla" or _interpret():
        return decode_attention_flat_mixed(q, k8, ks2, v4, vs2, length)
    return decode_attention_mixed_blockdiag(q, k8, ks2, v4, vs2, length)


# ----------------------------------------------------------- stacked
#
# STACKED-cache kernel entry points: a pallas_call operand cannot fuse a
# dynamic_slice or windowed prefix slice the way an XLA contraction does —
# feeding the per-layer / per-window VIEW of a scan-carried cache into the
# kernels above materializes a full copy of the slice every decode step,
# which measured 4x SLOWER end-to-end than the int8 XLA path despite the
# kernels themselves winning (headline_r5d vs int4_kernels_r5b). These
# variants instead take the FULL layer-stacked buffers; the layer index
# rides as a scalar-prefetch operand into the blockspec index maps and the
# STATIC window trims the sequence grid, so the kernel's DMAs only ever
# touch the blocks it actually reads — no copies, no slice, traffic equals
# the valid prefix of one layer.

def _pick_block_s2(S2, rows, dv):
    target = max((6 << 20) // max(rows * dv * 9, 1), 128)
    block_s2 = S2
    while (block_s2 > target and block_s2 % 2 == 0
           and block_s2 // 2 >= 128):
        block_s2 //= 2
    if block_s2 % 128 != 0 or S2 % block_s2 != 0:
        block_s2 = S2
    return block_s2


def _stacked_int4_kernel(li_ref, lens_ref, q_ref, kt4_ref, ks2_ref, v4_ref,
                         vs2_ref, o_ref, ko_ref, kso_ref, vo_ref, vso_ref,
                         acc_ref, m_ref, l_ref, *,
                         rows: int, n_sb: int, force_f32: bool):
    # blocks carry a leading singleton layer dim, consumed at LOAD time —
    # an .at[0] sub-ref lowers to a tiling-unaligned memref_slice on
    # hardware (smoke_r5e). ko/kso/vo/vso are the PASS-THROUGH aliased
    # cache outputs (never touched): the cache buffers flow through the
    # kernel so XLA's carry-aliasing holds — a full-buffer custom-call
    # operand that is also dus-updated in the same scan body otherwise
    # forces a defensive copy of the whole stacked cache EVERY LAYER
    # (measured 38ms/step, decode_profile_r5_kv4.json).
    del ko_ref, kso_ref, vo_ref, vso_ref
    _lowbit_decode_body(lens_ref[:], q_ref[:], kt4_ref[0], ks2_ref[0],
                        v4_ref[0], vs2_ref[0], o_ref, acc_ref, m_ref, l_ref,
                        split_keys=False, rows=rows, n_sb=n_sb,
                        force_f32=force_f32)


def _stacked_mixed_kernel(li_ref, lens_ref, q_ref, k8_ref, ks2_ref, v4_ref,
                          vs2_ref, o_ref, ko_ref, kso_ref, vo_ref, vso_ref,
                          acc_ref, m_ref, l_ref, *,
                          rows: int, n_sb: int, force_f32: bool):
    del ko_ref, kso_ref, vo_ref, vso_ref
    _lowbit_decode_body(lens_ref[:], q_ref[:], k8_ref[0], ks2_ref[0],
                        v4_ref[0], vs2_ref[0], o_ref, acc_ref, m_ref, l_ref,
                        split_keys=True, rows=rows, n_sb=n_sb,
                        force_f32=force_f32)


def _stacked_int4_ml_kernel(li_ref, lens_ref, q_ref, kt4_ref, ks2_ref,
                            v4_ref, vs2_ref, o_ref, mo_ref, lo_ref, ko_ref,
                            kso_ref, vo_ref, vso_ref, acc_ref, m_ref, l_ref,
                            *, rows: int, n_sb: int, force_f32: bool):
    del ko_ref, kso_ref, vo_ref, vso_ref
    _lowbit_decode_body(lens_ref[:], q_ref[:], kt4_ref[0], ks2_ref[0],
                        v4_ref[0], vs2_ref[0], o_ref, acc_ref, m_ref, l_ref,
                        split_keys=False, rows=rows, n_sb=n_sb,
                        force_f32=force_f32, mo_ref=mo_ref, lo_ref=lo_ref)


def _stacked_call(kernel, layer, q, k_all, ks_all, v_all, vs_all, length,
                  *, window_cols, k_block_extra, rows_per_program=8,
                  return_ml=False):
    """Shared pallas_call builder for the stacked int4/mixed kernels.
    k_block_extra: () for packed int4 keys, (2,) for split int8 keys."""
    L = k_all.shape[0]
    e, dk = q.shape
    S2t, dv = v_all.shape[2], v_all.shape[3]
    w2 = S2t if window_cols is None else min(window_cols, S2t)
    rows = rows_per_program
    while e % rows != 0 and rows > 1:
        rows //= 2
    # the packed-column axis of the FULL-width array can only be blocked in
    # 128-lane multiples (no "equals the sliced axis" escape here): 128
    # keeps the finest window granularity; windows below 256 positions
    # over-read up to one block (masked by length — correct, just traffic)
    block_s2 = S2t if (S2t <= 128 or S2t % 128) else 128
    n_sb = max(1, min(-(-w2 // block_s2), S2t // block_s2))
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                            (e,))[:, None]
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    kb = (1, rows, dk) + k_block_extra + (block_s2,)

    def kmap(i, j, li):
        return ((li[0], i, 0, 0, j) if k_block_extra
                else (li[0], i, 0, j))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // rows, n_sb),
        in_specs=[
            pl.BlockSpec((rows, 1), lambda i, j, li: (i, 0)),    # lengths
            pl.BlockSpec((rows, dk), lambda i, j, li: (i, 0)),
            pl.BlockSpec(kb, kmap),
            pl.BlockSpec((1, rows, 2, block_s2),
                         lambda i, j, li: (li[0], i, 0, j)),
            pl.BlockSpec((1, rows, block_s2, dv),
                         lambda i, j, li: (li[0], i, j, 0)),
            pl.BlockSpec((1, rows, 2, block_s2),
                         lambda i, j, li: (li[0], i, 0, j)),
        ],
        out_specs=([pl.BlockSpec((rows, dv), lambda i, j, li: (i, 0))]
                   + ([pl.BlockSpec((rows, 1), lambda i, j, li: (i, 0)),
                       pl.BlockSpec((rows, 1), lambda i, j, li: (i, 0))]
                      if return_ml else [])
                   # pass-through cache outputs: ANY memory space, never
                   # written — the aliased output IS the input buffer, so
                   # the cache threads through the kernel with no copy and
                   # no writeback
                   + [pl.BlockSpec(memory_space=pltpu.ANY)] * 4),
        scratch_shapes=[
            pltpu.VMEM((rows, dv), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
    )
    n_ml = 2 if return_ml else 0
    return pl.pallas_call(
        functools.partial(kernel, rows=rows, n_sb=n_sb,
                          force_f32=_interpret()),
        grid_spec=grid_spec,
        out_shape=([jax.ShapeDtypeStruct((e, dv), q.dtype)]
                   + ([jax.ShapeDtypeStruct((e, 1), jnp.float32)] * n_ml)
                   + [jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
                      jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
                      jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
                      jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype)]),
        # flat input numbering includes the scalar-prefetch leaf (li=0):
        # lens=1, q=2, k=3, ks=4, v=5, vs=6
        input_output_aliases={3: 1 + n_ml, 4: 2 + n_ml, 5: 3 + n_ml,
                              6: 4 + n_ml},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(li, lens, q, k_all, ks_all, v_all, vs_all)


def decode_attention_int4_stacked(layer, q, k_all, ks_all, v_all, vs_all,
                                  length, *, window_cols=None):
    """Single-step int4 attention over layer li of STACKED full-width packed
    caches: k_all (L, E, dk, S2), ks_all (L, E, 2, S2), v_all
    (L, E, S2, dv), vs_all (L, E, 2, S2); window_cols = static packed-column
    bucket (reads only the first window_cols columns, rounded up to a
    128-column block). Returns (out, k_all, ks_all, v_all, vs_all): the
    cache buffers are DONATED and flow through the kernel (input-output
    aliasing) — the caller must thread the returned buffers into its carry
    or XLA re-copies the cache defensively. Off-TPU falls back to the flat
    XLA form on (traced) layer slices."""
    if _INT4_KERNEL == "xla" or _interpret():
        li = jnp.asarray(layer, jnp.int32)
        sl = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, False)
        k, ks, v, vs = sl(k_all), sl(ks_all), sl(v_all), sl(vs_all)
        # round the packed-column slice UP to a 128-lane multiple: any
        # non-multiple lane slice (64 cols at window 128, 192 at window
        # 384) forces XLA into per-layer relayout copies of the cache
        # (measured 44 ms/step at w=128 vs 3.7 at w=256); the over-read is
        # masked by `length` and costs only traffic
        w2 = (-(-window_cols // 128) * 128 if window_cols is not None
              else None)
        if w2 is not None and w2 < v.shape[1]:
            k, ks = k[:, :, :w2], ks[:, :, :w2]
            v, vs = v[:, :w2], vs[:, :, :w2]
        out = decode_attention_flat_int4(q, k, ks, v, vs, length)
        return out, k_all, ks_all, v_all, vs_all
    return _stacked_call(_stacked_int4_kernel, layer, q, k_all, ks_all,
                         v_all, vs_all, length, window_cols=window_cols,
                         k_block_extra=())


def decode_attention_mixed_stacked(layer, q, k_all, ks_all, v_all, vs_all,
                                   length, *, window_cols=None):
    """Mixed variant of decode_attention_int4_stacked (same donated
    pass-through contract): k_all is the split int8 key cache
    (L, E, dk, 2, S2). The Backpack combine (no layer axis) calls this with
    L=1 via a leading-axis reshape (a bitcast, not a copy)."""
    if _INT4_KERNEL == "xla" or _interpret():
        li = jnp.asarray(layer, jnp.int32)
        sl = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, False)
        k, ks, v, vs = sl(k_all), sl(ks_all), sl(v_all), sl(vs_all)
        # same 128-lane rounding as the int4 fallback above
        w2 = (-(-window_cols // 128) * 128 if window_cols is not None
              else None)
        if w2 is not None and w2 < v.shape[1]:
            k, ks = k[:, :, :, :w2], ks[:, :, :w2]
            v, vs = v[:, :w2], vs[:, :, :w2]
        out = decode_attention_flat_mixed(q, k, ks, v, vs, length)
        return out, k_all, ks_all, v_all, vs_all
    return _stacked_call(_stacked_mixed_kernel, layer, q, k_all, ks_all,
                         v_all, vs_all, length, window_cols=window_cols,
                         k_block_extra=(2,))


def decode_attention_flat_multi(q, kt, ks, v, vs, length):
    """Flat-layout MULTI-query cache attention: q (E, t, dk) are t new rows
    per attention problem whose K/V were already written to the cache, with
    row u at absolute position length - t + u (the speculative-verification
    / small-chunk-prefill shape). Same stored-precision contraction as
    decode_attention_flat — the cache is never relayouted or dequantized to
    a materialized copy, unlike the generic (b, s, h, d) prefill branch,
    which costs a full cache relayout per verify step. Causality among the
    new rows rides the per-row length mask: row u sees pos < length-(t-1-u).
    Returns (E, t, dv) in q.dtype."""
    compute = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
    E, t, _ = q.shape
    S = v.shape[1]
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1),
                               (E,))
    s = jnp.einsum("etd,eds->ets", q.astype(compute), kt.astype(compute),
                   preferred_element_type=jnp.float32)
    if ks is not None:
        s = s * ks[:, None, :]
    pos = jnp.arange(S)[None, None, :]
    limit = lengths[:, None, None] - (t - 1 - jnp.arange(t))[None, :, None]
    s = jnp.where(pos < limit, s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    if vs is not None:
        p = p * vs[:, None, :]
    out = jnp.einsum("ets,esd->etd", p.astype(compute), v.astype(compute),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# --------------------------------------------------------------- staged

def decode_attention_flat_staged(q, kt, ks, v, vs, base_len,
                                 k_st, ks_st, v_st, vs_st, st_pos, length):
    """Two-segment decode attention for the STAGING-BLOCK serving cache.

    Per-slot cache writes cost a full window-prefix stream per step even
    scatter-free (the masked row write); the staging design instead appends
    each step's K/V to a small C-column block at a SCALAR pointer (an
    in-place dynamic_update_slice) and flushes every ~C steps. Decode then
    attends over two segments merged in ONE softmax:

      main:   kt (E, dk, W) columns, valid where pos < base_len (the length
              at the last flush — columns beyond it are stale),
      staged: k_st (E, C, dk) columns (C on SUBLANES so C=64 tiles cleanly),
              valid where 0 <= st_pos < length (st_pos carries each staged
              column's logical position; -1 = free; rollback-invalidated
              entries have pos >= length).

    Scales ks/vs (ks_st/vs_st) as in decode_attention_flat. Returns (E, dv).
    """
    compute = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
    E = q.shape[0]
    base = jnp.broadcast_to(jnp.asarray(base_len, jnp.int32).reshape(-1), (E,))
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (E,))

    s_m = jnp.einsum("ed,eds->es", q.astype(compute), kt.astype(compute),
                     preferred_element_type=jnp.float32)
    if ks is not None:
        s_m = s_m * ks
    pos = jnp.arange(kt.shape[-1])[None, :]
    s_m = jnp.where(pos < base[:, None], s_m, NEG)

    s_s = jnp.einsum("ed,ecd->ec", q.astype(compute), k_st.astype(compute),
                     preferred_element_type=jnp.float32)
    if ks_st is not None:
        s_s = s_s * ks_st
    st_ok = (st_pos >= 0) & (st_pos < lens[:, None])
    s_s = jnp.where(st_ok, s_s, NEG)

    p = jax.nn.softmax(jnp.concatenate([s_m, s_s], axis=1), axis=-1)
    p_m, p_s = p[:, :s_m.shape[1]], p[:, s_m.shape[1]:]
    if vs is not None:
        p_m = p_m * vs
    if vs_st is not None:
        p_s = p_s * vs_st
    out = jnp.einsum("es,esd->ed", p_m.astype(compute), v.astype(compute),
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("ec,ecd->ed", p_s.astype(compute),
                           v_st.astype(compute),
                           preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def decode_attention_flat_multi_staged(q, kt, ks, v, vs, base_len,
                                       k_st, ks_st, v_st, vs_st, st_pos,
                                       length):
    """Staged variant of decode_attention_flat_multi: q (E, t, dk) rows at
    absolute positions length-t+u. The t new rows live in the STAGED block
    (written before this call, layout k_st (E, C, dk)), so the main segment
    is valid below base_len for every query row, and the staged segment
    applies the per-row causal limit st_pos < length - (t-1-u).
    Returns (E, t, dv)."""
    compute = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
    E, t, _ = q.shape
    base = jnp.broadcast_to(jnp.asarray(base_len, jnp.int32).reshape(-1), (E,))
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (E,))

    s_m = jnp.einsum("etd,eds->ets", q.astype(compute), kt.astype(compute),
                     preferred_element_type=jnp.float32)
    if ks is not None:
        s_m = s_m * ks[:, None, :]
    pos = jnp.arange(kt.shape[-1])[None, None, :]
    s_m = jnp.where(pos < base[:, None, None], s_m, NEG)

    s_s = jnp.einsum("etd,ecd->etc", q.astype(compute), k_st.astype(compute),
                     preferred_element_type=jnp.float32)
    if ks_st is not None:
        s_s = s_s * ks_st[:, None, :]
    limit = lens[:, None, None] - (t - 1 - jnp.arange(t))[None, :, None]
    st_ok = (st_pos[:, None, :] >= 0) & (st_pos[:, None, :] < limit)
    s_s = jnp.where(st_ok, s_s, NEG)

    p = jax.nn.softmax(jnp.concatenate([s_m, s_s], axis=2), axis=-1)
    p_m, p_s = p[:, :, :s_m.shape[2]], p[:, :, s_m.shape[2]:]
    if vs is not None:
        p_m = p_m * vs[:, None, :]
    if vs_st is not None:
        p_s = p_s * vs_st[:, None, :]
    out = jnp.einsum("ets,esd->etd", p_m.astype(compute), v.astype(compute),
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("etc,ecd->etd", p_s.astype(compute),
                           v_st.astype(compute),
                           preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ------------------------------------------------------- staged low-bit
#
# STAGED low-bit decode: the copy-semantics ladder (NOTES.md round-5)
# showed that a scan-carried cache can be read copy-free by a pass-through
# aliased kernel ONLY if nothing writes it inside the scan. So decode
# appends ride the existing int8 STAGING block (small buffers, cheap
# in-place dus, never a kernel operand), the packed MAIN cache stays
# read-only within a scan segment (clean aliasing), and every step merges
# two online-softmax segments flash-style: the kernel's (out, m, l) over
# the main prefix + an XLA-computed segment over the staged columns. A
# flush every ~stage-cap steps packs the staged int8 values into the int4
# main cache (flush_kv_cache's packed path).

def decode_attention_int4_staged_ml(layer, q, k_all, ks_all, v_all, vs_all,
                                    base_len, *, window_cols=None):
    """Main-segment attention over the READ-ONLY packed caches of layer li:
    returns (out, m, l, k_all, ks_all, v_all, vs_all) — normalized output
    plus its softmax state, caches donated through. Valid horizon is
    base_len (the length at the last flush)."""
    if _INT4_KERNEL == "xla" or _interpret():
        out, k_all, ks_all, v_all, vs_all = decode_attention_int4_stacked(
            layer, q, k_all, ks_all, v_all, vs_all, base_len,
            window_cols=window_cols)
        # recover (m, l) via the XLA score pass (oracle path; off-TPU only)
        li = jnp.asarray(layer, jnp.int32)
        k = jax.lax.dynamic_index_in_dim(k_all, li, 0, False)
        ks = jax.lax.dynamic_index_in_dim(ks_all, li, 0, False)
        from . import quant
        k_lo, k_hi = quant.unpack_int4_pairs_split(k)
        compute = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
        s_e = jnp.einsum("ed,eds->es", q.astype(compute),
                         k_lo.astype(compute),
                         preferred_element_type=jnp.float32) * ks[:, 0, :]
        s_o = jnp.einsum("ed,eds->es", q.astype(compute),
                         k_hi.astype(compute),
                         preferred_element_type=jnp.float32) * ks[:, 1, :]
        lens = jnp.broadcast_to(
            jnp.asarray(base_len, jnp.int32).reshape(-1), (q.shape[0],))
        j = jnp.arange(s_e.shape[1])[None, :]
        s_e = jnp.where(2 * j < lens[:, None], s_e, NEG)
        s_o = jnp.where(2 * j + 1 < lens[:, None], s_o, NEG)
        m = jnp.maximum(jnp.max(s_e, axis=1, keepdims=True),
                        jnp.max(s_o, axis=1, keepdims=True))
        l = (jnp.sum(jnp.where(s_e > NEG / 2, jnp.exp(s_e - m), 0.0),
                     axis=1, keepdims=True)
             + jnp.sum(jnp.where(s_o > NEG / 2, jnp.exp(s_o - m), 0.0),
                       axis=1, keepdims=True))
        return out, m, l, k_all, ks_all, v_all, vs_all
    return _stacked_call(_stacked_int4_ml_kernel, layer, q, k_all, ks_all,
                         v_all, vs_all, base_len, window_cols=window_cols,
                         k_block_extra=(), return_ml=True)


def stage_segment_attention(q, k_st, ks_st, v_st, vs_st, st_pos, length):
    """(out, m, l) of the STAGE segment: k_st/v_st (E, C, d) int8 staged
    columns with (E, C) scales; st_pos (E, C) logical positions (-1 free,
    valid < length). Normalized out; all-masked rows return (0, NEG, 0) so
    merge_softmax_segments weighs them out."""
    compute = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
    E = q.shape[0]
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (E,))
    s = jnp.einsum("ed,ecd->ec", q.astype(compute), k_st.astype(compute),
                   preferred_element_type=jnp.float32)
    if ks_st is not None:
        s = s * ks_st
    ok = (st_pos >= 0) & (st_pos < lens[:, None])
    s = jnp.where(ok, s, NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.where(ok, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)
    if vs_st is not None:
        p = p * vs_st
    o = jnp.einsum("ec,ecd->ed", p.astype(compute), v_st.astype(compute),
                   preferred_element_type=jnp.float32)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (o / l_safe).astype(q.dtype), m, l


def merge_softmax_segments(o1, m1, l1, o2, m2, l2, dtype=None):
    """Flash-style combination of two normalized softmax segments."""
    dtype = dtype or o1.dtype
    m = jnp.maximum(m1, m2)
    w1 = l1 * jnp.exp(m1 - m)
    w2 = l2 * jnp.exp(m2 - m)
    tot = jnp.maximum(w1 + w2, 1e-30)
    out = (o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2) / tot
    return out.astype(dtype)
