"""Context-parallel (ring) attention over a 'seq' mesh axis.

The reference's long-context story is single-GPU FlashAttention O(s) memory
(flash_attn_README.md:93 claims 64K); it has no context parallelism
(SURVEY.md §2.7 "CP / ring attention: none"). This module goes beyond it:
the SEQUENCE is sharded across devices and K/V chunks travel a ppermute
ring, so max trainable context scales with the mesh instead of one chip's
HBM:

  device i holds q/k/v chunk i (c = s/S rows). At ring step r it holds
  K/V chunk j = (i - r) mod S, accumulates its q block's attention against
  that chunk with a running online softmax (m, l, acc) — the same math as
  the flash kernel's inner loop, lifted to the mesh level — then permutes
  the K/V buffers one hop. After S steps every q row has seen every key it
  may attend, and the merged output is bitwise-independent of S.

Causality across chunks falls out of absolute positions (chunk j's keys at
j*c + u vs chunk i's queries at i*c + t): j > i steps are fully masked and
contribute nothing — the classic causal-ring bubble, which the zigzag
layout at the bottom of this module removes (make_zigzag_ring_attention).

Two inner-block implementations:

  * impl="einsum" — blockwise jnp einsum, O(c^2) scores for ONE chunk pair
    at a time (already an S^2 memory reduction vs full attention), fully
    differentiable, with each ring step jax.checkpoint'ed so the backward
    recomputes score blocks instead of saving S of them. Supports distinct
    q/k vs value widths (the Backpack contextualization shape).
  * impl="flash" — the Pallas flash kernel per chunk pair with a custom
    ring backward (ring flash attention): the forward merges per-chunk
    (o_j, lse_j) partials with a mesh-level online softmax and never
    materializes even the per-pair score block in HBM; the backward re-runs
    the ring feeding the GLOBAL (out, lse) into the tiled per-pair flash
    backward kernels (ops/flash_attention._flash_bwd with q_offsets), so
    each step yields the exact additive gradient contribution, dq
    accumulates locally in f32 and dk/dv accumulators travel the ring back
    to their owner chunk. Cross-chunk causality rides the kernel's
    chunked-prefill q_offsets: pair (i, j) runs causal with
    q_off = (i - j) * c — j < i degrades to full attention, j == i is the
    diagonal, j > i masks everything (zero contribution).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_attention import (_dropout_keep_positions, _flash_bwd,
                                   _flash_fwd)

NEG = -1e30


def _einsum_seed(dropout_p, dropout_rng):
    """Normalize an optional PRNG key to the (2,) uint32 counter-hash seed
    (the same derivation as ring_flash_attention_local, so einsum and flash
    inner blocks produce IDENTICAL masks from the same key)."""
    if dropout_p <= 0.0:
        return jnp.zeros((2,), jnp.uint32)
    assert dropout_rng is not None, "dropout_p > 0 requires dropout_rng"
    if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key):
        dropout_rng = jax.random.key_data(dropout_rng)
    return dropout_rng.astype(jnp.uint32).reshape(-1)[:2]


def ring_attention_local(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         axis: str = "seq", causal: bool = True,
                         softmax_scale: Optional[float] = None,
                         remat: bool = True,
                         dropout_p: float = 0.0,
                         dropout_rng: Optional[jax.Array] = None,
                         bh_offset=0) -> jax.Array:
    """Per-device body (call inside shard_map): q, k, v (b, c, h, d) local
    sequence chunks -> (b, c, h, d) local outputs of GLOBAL attention.

    dropout_p/dropout_rng: attention-probability dropout via the flash
    kernel's counter-hash over GLOBAL (batch-row, q_pos, k_pos) — the masks
    are a pure function of global coordinates, so they match the Pallas
    kernel's (and are mesh-size/layout independent). dropout_rng must be
    replicated across the ring axis; bh_offset globalizes the batch-row
    stream under data sharding. Applied to the un-normalized probs with l
    accumulating the pre-dropout sum (reference semantics: dropout after
    softmax, fmha_fprop_kernel_1xN.h)."""
    S = lax.axis_size(axis)
    i = lax.axis_index(axis)
    b, c, h, d = q.shape
    dv = v.shape[-1]    # value width may differ (Backpack contextualization
    # uses dnv-dim q/k against d-dim sense-vector values)
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    perm = [(r, (r + 1) % S) for r in range(S)]
    qpos = i * c + jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    seed = _einsum_seed(dropout_p, dropout_rng)
    bh = ((jnp.arange(b) + jnp.asarray(bh_offset, jnp.int32))[:, None] * h
          + jnp.arange(h)[None, :])[:, :, None, None]      # (b, h, 1, 1)

    def step(carry, r):
        k_r, v_r, m_acc, l_acc, o_acc = carry
        j = (i - r) % S
        s_blk = jnp.einsum("bqhd,bkhd->bhqk", qf, k_r,
                           preferred_element_type=jnp.float32)
        kpos = j * c + jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
        mask = (kpos <= qpos) if causal else jnp.ones((c, c), bool)
        s_blk = jnp.where(mask[None, None], s_blk, NEG)
        m_new = jnp.maximum(m_acc, jnp.max(s_blk, axis=-1))
        p = jnp.where(mask[None, None], jnp.exp(s_blk - m_new[..., None]),
                      0.0)
        corr = jnp.exp(m_acc - m_new)
        l_new = l_acc * corr + jnp.sum(p, axis=-1)
        if dropout_p > 0.0:
            keep = _dropout_keep_positions(
                seed, bh, (i * c + jnp.arange(c))[:, None],
                (j * c + jnp.arange(c))[None, :], dropout_p)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
        pv = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v_r.dtype), v_r,
                        preferred_element_type=jnp.float32)
        o_new = o_acc * corr[..., None] + pv
        k_r = lax.ppermute(k_r, axis, perm)
        v_r = lax.ppermute(v_r, axis, perm)
        return (k_r, v_r, m_new, l_new, o_new), None

    step_fn = jax.checkpoint(step) if remat else step
    m0 = jnp.full((b, h, c), NEG, jnp.float32)
    l0 = jnp.zeros((b, h, c), jnp.float32)
    o0 = jnp.zeros((b, h, c, dv), jnp.float32)
    (_, _, _, l, o), _ = lax.scan(step_fn, (k, v, m0, l0, o0),
                                  jnp.arange(S))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = (o / l_safe[..., None]).astype(q.dtype)     # (b, h, c, d)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _ring_flash_core(q, k, v, seed, bh_off, axis, causal, block_q, block_k,
                     dropout_p):
    out, _ = _ring_flash_fwd(q, k, v, seed, bh_off, axis, causal, block_q,
                             block_k, dropout_p)[0]
    return out


def _ring_flash_fwd(q, k, v, seed, bh_off, axis, causal, block_q, block_k,
                    dropout_p):
    """Local (b, c, h, d) chunks -> ((out, lse), residuals). Per ring step
    one Pallas forward produces this chunk pair's normalized partial o_j and
    its lse_j; the mesh-level merge is the flash rescale
    o <- o*exp(m-m') + o_j*exp(lse_j-m') applied across steps."""
    S = lax.axis_size(axis)
    i = lax.axis_index(axis)
    b, c, h, d = q.shape
    qt = jnp.swapaxes(q, 1, 2)                       # (b, h, c, d) pre-scaled
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    perm = [(r, (r + 1) % S) for r in range(S)]

    def step(carry, r):
        k_r, v_r, m_acc, l_acc, o_acc = carry
        j = (i - r) % S
        # absolute offsets: causality uses their difference, the in-kernel
        # dropout hash the absolute values — masks are a pure function of
        # GLOBAL (row, q_pos, k_pos), so ring dropout == single-device
        # flash dropout with the same seed.
        qoff = jnp.full((b,), i * c, jnp.int32)
        koff = jnp.full((b,), j * c, jnp.int32)
        o_j, lse_j = _flash_fwd(qt, k_r, v_r, None, 1.0, causal,
                                block_q, block_k, q_offsets=qoff,
                                k_offsets=koff, dropout_p=dropout_p,
                                seed=seed, bh_offset=bh_off)
        m_new = jnp.maximum(m_acc, lse_j)            # (b, h, c)
        corr = jnp.exp(m_acc - m_new)
        w = jnp.exp(lse_j - m_new)                   # 0 for empty pairs
        o_acc = (o_acc * corr[..., None]
                 + o_j.astype(jnp.float32) * w[..., None])
        l_acc = l_acc * corr + w
        k_r = lax.ppermute(k_r, axis, perm)
        v_r = lax.ppermute(v_r, axis, perm)
        return (k_r, v_r, m_new, l_acc, o_acc), None

    m0 = jnp.full((b, h, c), NEG, jnp.float32)
    l0 = jnp.zeros((b, h, c), jnp.float32)
    o0 = jnp.zeros((b, h, c, d), jnp.float32)
    (_, _, m, l, o), _ = lax.scan(step, (kt, vt, m0, l0, o0), jnp.arange(S))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out_t = (o / l_safe[..., None]).astype(q.dtype)  # (b, h, c, d)
    lse = m + jnp.log(l_safe)                        # GLOBAL row lse
    out = jnp.swapaxes(out_t, 1, 2)
    return (out, lse), (q, k, v, seed, bh_off, out, lse)


def _ring_flash_fwd_rule(q, k, v, seed, bh_off, axis, causal, block_q,
                         block_k, dropout_p):
    (out, _), res = _ring_flash_fwd(q, k, v, seed, bh_off, axis, causal,
                                    block_q, block_k, dropout_p)
    return out, res


def _ring_flash_bwd_rule(axis, causal, block_q, block_k, dropout_p, res, g):
    """Re-run the ring: each (q_i, k_j, v_j) pair's tiled flash backward is
    fed the GLOBAL out/lse, so p recomputed as exp(s - lse) is the true
    global softmax restricted to this chunk — its dq/dk/dv are exact additive
    contributions. dk/dv accumulators rotate WITH k/v and are home after S
    hops."""
    q, k, v, seed, bh_off, out, lse = res
    S = lax.axis_size(axis)
    i = lax.axis_index(axis)
    b, c, h, d = q.shape
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    ot = jnp.swapaxes(out, 1, 2)
    gt = jnp.swapaxes(g, 1, 2)
    perm = [(r, (r + 1) % S) for r in range(S)]

    def step(carry, r):
        k_r, v_r, dk_r, dv_r, dq_acc = carry
        j = (i - r) % S
        qoff = jnp.full((b,), i * c, jnp.int32)
        koff = jnp.full((b,), j * c, jnp.int32)
        dq_p, dk_p, dv_p, _ = _flash_bwd(qt, k_r, v_r, ot, lse, gt, seed,
                                         1.0, causal, block_q, block_k,
                                         dropout_p=dropout_p,
                                         q_offsets=qoff, k_offsets=koff,
                                         bh_offset=bh_off)
        dq_acc = dq_acc + dq_p.astype(jnp.float32)
        dk_r = dk_r + dk_p.astype(jnp.float32)
        dv_r = dv_r + dv_p.astype(jnp.float32)
        k_r = lax.ppermute(k_r, axis, perm)
        v_r = lax.ppermute(v_r, axis, perm)
        dk_r = lax.ppermute(dk_r, axis, perm)
        dv_r = lax.ppermute(dv_r, axis, perm)
        return (k_r, v_r, dk_r, dv_r, dq_acc), None

    z = jnp.zeros((b, h, c, d), jnp.float32)
    (_, _, dk, dv, dq), _ = lax.scan(
        step, (kt, vt, z, z, z), jnp.arange(S))
    return (jnp.swapaxes(dq, 1, 2).astype(q.dtype),
            jnp.swapaxes(dk, 1, 2).astype(k.dtype),
            jnp.swapaxes(dv, 1, 2).astype(v.dtype), None, None)


_ring_flash_core.defvjp(_ring_flash_fwd_rule, _ring_flash_bwd_rule)


def ring_flash_attention_local(q: jax.Array, k: jax.Array, v: jax.Array, *,
                               axis: str = "seq", causal: bool = True,
                               softmax_scale: Optional[float] = None,
                               dropout_p: float = 0.0,
                               dropout_rng: Optional[jax.Array] = None,
                               bh_offset=0,
                               block_q: int = 512,
                               block_k: int = 512) -> jax.Array:
    """Per-device body (call inside shard_map): ring flash attention with the
    Pallas kernel inner block and an exact custom ring backward. q/k/v
    (b, c, h, d) local chunks -> (b, c, h, d) local outputs of GLOBAL
    attention. Requires equal q/k/v head widths (use impl='einsum' for the
    Backpack contextualization's d-wide values).

    dropout_p/dropout_rng: IN-KERNEL attention dropout. The counter-hash
    masks are a pure function of (seed, global row, global q_pos, global
    k_pos), so with the same rng the ring produces exactly the masks the
    single-device flash kernel would — CP attention dropout matches the
    unsharded model. dropout_rng must be REPLICATED across the ring axis
    (do not fold_in the seq index); bh_offset is the global index of local
    batch row 0 (fold in the data-shard offset so rows keep distinct
    streams under dp x cp meshes)."""
    scale = (softmax_scale if softmax_scale is not None
             else q.shape[-1] ** -0.5)
    # Fold the scale outside the custom_vjp so plain AD provides the
    # chain-rule factor on dq (same pattern as ops.flash_attention).
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    if dropout_p > 0.0:
        assert dropout_rng is not None, "dropout_p > 0 requires dropout_rng"
        if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key):
            dropout_rng = jax.random.key_data(dropout_rng)
        seed = dropout_rng.astype(jnp.uint32).reshape(-1)[:2]
    else:
        seed = jnp.zeros((2,), jnp.uint32)
    bh_off = jnp.asarray(bh_offset, jnp.int32)
    return _ring_flash_core(q, k, v, seed, bh_off, axis, causal, block_q,
                            block_k, dropout_p)


def make_ring_attention(mesh: Mesh, *, axis: str = "seq",
                        causal: bool = True,
                        softmax_scale: Optional[float] = None,
                        remat: bool = True, impl: str = "einsum",
                        block_q: int = 512, block_k: int = 512):
    """attn(q, k, v) over GLOBAL (b, s, h, d) arrays whose sequence axis is
    sharded P(axis) on `mesh`. Differentiable end-to-end (the ppermute
    transposes are the reverse ring; impl='flash' supplies its own exact
    ring backward). s must divide by mesh.shape[axis]."""
    if impl == "flash":
        local = lambda q, k, v: ring_flash_attention_local(
            q, k, v, axis=axis, causal=causal, softmax_scale=softmax_scale,
            block_q=block_q, block_k=block_k)
    elif impl == "einsum":
        local = lambda q, k, v: ring_attention_local(
            q, k, v, axis=axis, causal=causal,
            softmax_scale=softmax_scale, remat=remat)
    else:
        raise ValueError(f"unknown ring attention impl: {impl!r}")

    def attn(q, k, v):
        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, axis, None, None),) * 3,
            out_specs=P(None, axis, None, None), check_vma=False)
        return fn(q, k, v)

    return attn


# ---------------------------------------------------------------------------
# Zigzag (load-balanced) causal ring attention
#
# The plain causal ring leaves a bubble: at ring step r, device i's chunk
# pair (i, j) is fully masked whenever j > i, so device 0 idles S-1 of S
# steps while device S-1 works every step — the synchronous ring's step time
# is the busiest device's, and utilization is ~(S+1)/2S. The zigzag layout
# (each device owns sequence chunks i AND 2S-1-i of width s/(2S)) gives every
# device the same visible-key count at every step, so the causal early-exit
# inside the Pallas kernel turns the balance into real wall-clock: ~2x over
# the plain causal ring at large S.
#
# Data layout: zigzag_permute reorders the GLOBAL sequence so that a plain
# contiguous P(axis) shard of the permuted array is exactly (chunk_i,
# chunk_{2S-1-i}); for CP training you would keep ids/activations in zigzag
# order end-to-end and pay the gather once per batch.
# ---------------------------------------------------------------------------


def zigzag_order(s: int, S: int):
    """Permutation p with p[t_new] = t_old: position t of the permuted
    sequence holds old position p[t]. Device i's contiguous shard of the
    permuted sequence = (chunk_i, chunk_{2S-1-i}), chunks of width s/(2S)."""
    assert s % (2 * S) == 0, (s, S)
    c2 = s // (2 * S)
    idx = []
    for i in range(S):
        idx.extend(range(i * c2, (i + 1) * c2))
        idx.extend(range((2 * S - 1 - i) * c2, (2 * S - i) * c2))
    return jnp.asarray(idx, jnp.int32)


def zigzag_permute(x: jax.Array, S: int, axis: int = 1) -> jax.Array:
    return jnp.take(x, zigzag_order(x.shape[axis], S), axis=axis)


def zigzag_unpermute(x: jax.Array, S: int, axis: int = 1) -> jax.Array:
    order = zigzag_order(x.shape[axis], S)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=jnp.int32))
    return jnp.take(x, inv, axis=axis)


def _zz_chunk_ids(i, r, S):
    """Global chunk indices owned locally (q) and held at ring step r (kv)."""
    j = (i - r) % S
    return (i, 2 * S - 1 - i), (j, 2 * S - 1 - j)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _zigzag_core(q, k, v, seed, bh_off, axis, block_q, block_k, dropout_p):
    return _zigzag_fwd(q, k, v, seed, bh_off, axis, block_q, block_k,
                       dropout_p)[0][0]


def _zigzag_fwd(q, k, v, seed, bh_off, axis, block_q, block_k, dropout_p):
    """Local (b, 2*c2, h, d) zigzag shards -> GLOBAL causal attention
    outputs for the local rows. Per ring step, each of the 4 (q sub-chunk,
    kv sub-chunk) pairs is one Pallas forward with q_off = (Q - K) * c2;
    fully-masked pairs cost one early-exited kernel launch and contribute
    exp(NEG_INF) = 0 to the merge."""
    S = lax.axis_size(axis)
    i = lax.axis_index(axis)
    b, c2x2, h, d = q.shape
    c2 = c2x2 // 2
    qt = jnp.swapaxes(q, 1, 2)                     # (b, h, 2c2, d) pre-scaled
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    qs = [qt[:, :, :c2], qt[:, :, c2:]]
    perm = [(r, (r + 1) % S) for r in range(S)]

    def step(carry, r):
        k_r, v_r, m, l, o = carry
        (qa, qb), (ka, kb) = _zz_chunk_ids(i, r, S)
        m_n, l_n, o_n = list(m), list(l), list(o)
        for si, qc in enumerate((qa, qb)):
            for ki_, kc in enumerate((ka, kb)):
                # absolute offsets: causality uses the difference, the
                # dropout hash the absolute positions (layout-independent)
                qoff = jnp.full((b,), qc * c2, jnp.int32)
                koff = jnp.full((b,), kc * c2, jnp.int32)
                o_j, lse_j = _flash_fwd(
                    qs[si], k_r[:, :, ki_ * c2:(ki_ + 1) * c2],
                    v_r[:, :, ki_ * c2:(ki_ + 1) * c2], None, 1.0, True,
                    block_q, block_k, q_offsets=qoff, k_offsets=koff,
                    dropout_p=dropout_p, seed=seed, bh_offset=bh_off)
                m_new = jnp.maximum(m_n[si], lse_j)
                corr = jnp.exp(m_n[si] - m_new)
                w = jnp.exp(lse_j - m_new)
                o_n[si] = (o_n[si] * corr[..., None]
                           + o_j.astype(jnp.float32) * w[..., None])
                l_n[si] = l_n[si] * corr + w
                m_n[si] = m_new
        k_r = lax.ppermute(k_r, axis, perm)
        v_r = lax.ppermute(v_r, axis, perm)
        return (k_r, v_r, tuple(m_n), tuple(l_n), tuple(o_n)), None

    m0 = jnp.full((b, h, c2), NEG, jnp.float32)
    l0 = jnp.zeros((b, h, c2), jnp.float32)
    o0 = jnp.zeros((b, h, c2, d), jnp.float32)
    (_, _, m, l, o), _ = lax.scan(
        step, (kt, vt, (m0, m0), (l0, l0), (o0, o0)), jnp.arange(S))
    outs, lses = [], []
    for si in range(2):
        l_safe = jnp.where(l[si] == 0.0, 1.0, l[si])
        outs.append((o[si] / l_safe[..., None]).astype(q.dtype))
        lses.append(m[si] + jnp.log(l_safe))
    out_t = jnp.concatenate(outs, axis=2)          # (b, h, 2c2, d)
    lse = jnp.concatenate(lses, axis=2)            # (b, h, 2c2) GLOBAL
    out = jnp.swapaxes(out_t, 1, 2)
    return (out, lse), (q, k, v, seed, bh_off, out, lse)


def _zigzag_fwd_rule(q, k, v, seed, bh_off, axis, block_q, block_k,
                     dropout_p):
    (out, _), res = _zigzag_fwd(q, k, v, seed, bh_off, axis, block_q,
                                block_k, dropout_p)
    return out, res


def _zigzag_bwd_rule(axis, block_q, block_k, dropout_p, res, g):
    """Same 4-pair schedule with the tiled flash backward fed the GLOBAL
    out/lse per q sub-chunk; dk/dv accumulators for both kv sub-chunks
    rotate with k/v and are home after S hops."""
    q, k, v, seed, bh_off, out, lse = res
    S = lax.axis_size(axis)
    i = lax.axis_index(axis)
    b, c2x2, h, d = q.shape
    c2 = c2x2 // 2
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    ot = jnp.swapaxes(out, 1, 2)
    gt = jnp.swapaxes(g, 1, 2)
    sub = lambda x, si: x[:, :, si * c2:(si + 1) * c2]
    perm = [(r, (r + 1) % S) for r in range(S)]

    def step(carry, r):
        k_r, v_r, dk_r, dv_r, dq = carry
        (qa, qb), (ka, kb) = _zz_chunk_ids(i, r, S)
        dq_n = list(dq)
        for si, qc in enumerate((qa, qb)):
            for ki_, kc in enumerate((ka, kb)):
                qoff = jnp.full((b,), qc * c2, jnp.int32)
                koff = jnp.full((b,), kc * c2, jnp.int32)
                dq_p, dk_p, dv_p, _ = _flash_bwd(
                    sub(qt, si), sub(k_r, ki_), sub(v_r, ki_), sub(ot, si),
                    lse[:, :, si * c2:(si + 1) * c2], sub(gt, si), seed,
                    1.0, True, block_q, block_k, dropout_p=dropout_p,
                    q_offsets=qoff, k_offsets=koff, bh_offset=bh_off)
                dq_n[si] = dq_n[si] + dq_p.astype(jnp.float32)
                dk_r = dk_r.at[:, :, ki_ * c2:(ki_ + 1) * c2].add(
                    dk_p.astype(jnp.float32))
                dv_r = dv_r.at[:, :, ki_ * c2:(ki_ + 1) * c2].add(
                    dv_p.astype(jnp.float32))
        k_r = lax.ppermute(k_r, axis, perm)
        v_r = lax.ppermute(v_r, axis, perm)
        dk_r = lax.ppermute(dk_r, axis, perm)
        dv_r = lax.ppermute(dv_r, axis, perm)
        return (k_r, v_r, dk_r, dv_r, tuple(dq_n)), None

    z2 = jnp.zeros((b, h, 2 * c2, d), jnp.float32)
    z1 = jnp.zeros((b, h, c2, d), jnp.float32)
    (_, _, dk, dv, dq), _ = lax.scan(
        step, (kt, vt, z2, z2, (z1, z1)), jnp.arange(S))
    dq_full = jnp.concatenate(dq, axis=2)
    return (jnp.swapaxes(dq_full, 1, 2).astype(q.dtype),
            jnp.swapaxes(dk, 1, 2).astype(k.dtype),
            jnp.swapaxes(dv, 1, 2).astype(v.dtype), None, None)


_zigzag_core.defvjp(_zigzag_fwd_rule, _zigzag_bwd_rule)


def zigzag_ring_attention_local(q: jax.Array, k: jax.Array, v: jax.Array, *,
                                axis: str = "seq",
                                softmax_scale: Optional[float] = None,
                                dropout_p: float = 0.0,
                                dropout_rng: Optional[jax.Array] = None,
                                bh_offset=0,
                                block_q: int = 512,
                                block_k: int = 512) -> jax.Array:
    """Per-device body (call inside shard_map): load-balanced causal ring
    flash attention over ZIGZAG-ordered local shards (b, 2*s/(2S), h, d).
    Causal only — the balance trick is meaningless without the causal
    bubble (use impl='flash' for non-causal rings). In-kernel dropout is
    global-position-pure (see ring_flash_attention_local): the SAME masks as
    the single-device kernel, layout notwithstanding; dropout_rng must be
    replicated across the ring axis."""
    scale = (softmax_scale if softmax_scale is not None
             else q.shape[-1] ** -0.5)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    if dropout_p > 0.0:
        assert dropout_rng is not None, "dropout_p > 0 requires dropout_rng"
        if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key):
            dropout_rng = jax.random.key_data(dropout_rng)
        seed = dropout_rng.astype(jnp.uint32).reshape(-1)[:2]
    else:
        seed = jnp.zeros((2,), jnp.uint32)
    bh_off = jnp.asarray(bh_offset, jnp.int32)
    return _zigzag_core(q, k, v, seed, bh_off, axis, block_q, block_k,
                        dropout_p)


def make_zigzag_ring_attention(mesh: Mesh, *, axis: str = "seq",
                               softmax_scale: Optional[float] = None,
                               block_q: int = 512, block_k: int = 512,
                               permute_io: bool = True):
    """attn(q, k, v) over GLOBAL (b, s, h, d) arrays in NATURAL sequence
    order (permute_io=True pays a gather each way; pipelines that keep
    activations zigzag-ordered end-to-end should pass False and P(axis)-shard
    the permuted arrays themselves). s must divide by 2 * mesh.shape[axis]."""
    S = mesh.shape[axis]

    def attn(q, k, v):
        if permute_io:
            q, k, v = (zigzag_permute(x, S) for x in (q, k, v))
        fn = jax.shard_map(
            lambda q, k, v: zigzag_ring_attention_local(
                q, k, v, axis=axis, softmax_scale=softmax_scale,
                block_q=block_q, block_k=block_k),
            mesh=mesh,
            in_specs=(P(None, axis, None, None),) * 3,
            out_specs=P(None, axis, None, None), check_vma=False)
        out = fn(q, k, v)
        return zigzag_unpermute(out, S) if permute_io else out

    return attn


def zigzag_ring_attention_local_einsum(q: jax.Array, k: jax.Array,
                                       v: jax.Array, *, axis: str = "seq",
                                       softmax_scale: Optional[float] = None,
                                       remat: bool = True,
                                       dropout_p: float = 0.0,
                                       dropout_rng: Optional[jax.Array] = None,
                                       bh_offset=0) -> jax.Array:
    """Einsum inner-block zigzag ring (causal): local shards are ZIGZAG
    ordered (chunks i and 2S-1-i of width c2 = s/(2S), concatenated). Unlike
    the Pallas variant's 4 sub-pair kernel calls, the einsum block covers
    both sub-chunks at once — the causal mask just compares GLOBAL position
    vectors, and the mask density (hence useful MXU work) is equal on every
    device at every step, which is the whole point of the layout. Supports
    distinct q/k vs value widths (the Backpack contextualization shape), so
    it is the zigzag counterpart of ring_attention_local. Dropout hashes the
    same GLOBAL position vectors (see ring_attention_local), so masks are
    layout-independent: zigzag == natural == single-device."""
    S = lax.axis_size(axis)
    i = lax.axis_index(axis)
    b, c, h, d = q.shape
    c2 = c // 2
    dv = v.shape[-1]
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    perm = [(r, (r + 1) % S) for r in range(S)]
    ar = jnp.arange(c2)
    seed = _einsum_seed(dropout_p, dropout_rng)
    bh = ((jnp.arange(b) + jnp.asarray(bh_offset, jnp.int32))[:, None] * h
          + jnp.arange(h)[None, :])[:, :, None, None]      # (b, h, 1, 1)

    def posvec(idx):
        return jnp.concatenate([idx * c2 + ar, (2 * S - 1 - idx) * c2 + ar])

    qpos = posvec(i)

    def step(carry, r):
        k_r, v_r, m_acc, l_acc, o_acc = carry
        j = (i - r) % S
        kpos = posvec(j)
        s_blk = jnp.einsum("bqhd,bkhd->bhqk", qf, k_r,
                           preferred_element_type=jnp.float32)
        mask = kpos[None, :] <= qpos[:, None]
        s_blk = jnp.where(mask[None, None], s_blk, NEG)
        m_new = jnp.maximum(m_acc, jnp.max(s_blk, axis=-1))
        p = jnp.where(mask[None, None], jnp.exp(s_blk - m_new[..., None]),
                      0.0)
        corr = jnp.exp(m_acc - m_new)
        l_new = l_acc * corr + jnp.sum(p, axis=-1)
        if dropout_p > 0.0:
            keep = _dropout_keep_positions(
                seed, bh, qpos[:, None], kpos[None, :], dropout_p)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
        pv = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v_r.dtype), v_r,
                        preferred_element_type=jnp.float32)
        o_new = o_acc * corr[..., None] + pv
        k_r = lax.ppermute(k_r, axis, perm)
        v_r = lax.ppermute(v_r, axis, perm)
        return (k_r, v_r, m_new, l_new, o_new), None

    step_fn = jax.checkpoint(step) if remat else step
    m0 = jnp.full((b, h, c), NEG, jnp.float32)
    l0 = jnp.zeros((b, h, c), jnp.float32)
    o0 = jnp.zeros((b, h, c, dv), jnp.float32)
    (_, _, _, l, o), _ = lax.scan(step_fn, (k, v, m0, l0, o0),
                                  jnp.arange(S))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = (o / l_safe[..., None]).astype(q.dtype)
    return jnp.swapaxes(out, 1, 2)
