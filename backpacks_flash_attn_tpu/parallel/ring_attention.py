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
contribute nothing (the classic causal-ring bubble; a production schedule
would use striped/zigzag layout to balance it).

The per-step inner attention is blockwise jnp einsum — O(c^2) scores for
ONE chunk pair at a time (already an S^2 memory reduction vs full
attention), fully differentiable, with each ring step jax.checkpoint'ed so
the backward recomputes score blocks instead of saving S of them. Swapping
the inner block for the Pallas flash kernel needs a custom ring backward
(the kernel's LSE path is forward-only) — a known follow-up, not a
correctness gap.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

NEG = -1e30


def ring_attention_local(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         axis: str = "seq", causal: bool = True,
                         softmax_scale: Optional[float] = None,
                         remat: bool = True) -> jax.Array:
    """Per-device body (call inside shard_map): q, k, v (b, c, h, d) local
    sequence chunks -> (b, c, h, d) local outputs of GLOBAL attention."""
    S = lax.axis_size(axis)
    i = lax.axis_index(axis)
    b, c, h, d = q.shape
    dv = v.shape[-1]    # value width may differ (Backpack contextualization
    # uses dnv-dim q/k against d-dim sense-vector values)
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    perm = [(r, (r + 1) % S) for r in range(S)]
    qpos = i * c + jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)

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


def make_ring_attention(mesh: Mesh, *, axis: str = "seq",
                        causal: bool = True,
                        softmax_scale: Optional[float] = None,
                        remat: bool = True):
    """attn(q, k, v) over GLOBAL (b, s, h, d) arrays whose sequence axis is
    sharded P(axis) on `mesh`. Differentiable end-to-end (the ppermute
    transposes are the reverse ring). s must divide by mesh.shape[axis]."""

    def attn(q, k, v):
        fn = jax.shard_map(
            lambda q, k, v: ring_attention_local(
                q, k, v, axis=axis, causal=causal,
                softmax_scale=softmax_scale, remat=remat),
            mesh=mesh,
            in_specs=(P(None, axis, None, None),) * 3,
            out_specs=P(None, axis, None, None), check_vma=False)
        return fn(q, k, v)

    return attn
