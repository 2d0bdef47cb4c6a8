"""Rotary position embeddings (RoFormer) with optional XPos scaling.

TPU-native replacement for the reference's CUDA rotary kernel + module
(reference: csrc/rotary/rotary.cpp:35-36, flash_attn/layers/rotary.py:125-201).
The reference needs a custom kernel because torch eager would materialize the
rotate-half temporaries; under XLA the whole rotation fuses into the
surrounding attention ops, so this is plain jnp. Tables are computed on the
fly from the position vector — (s, rot/2) elementwise work that XLA
constant-folds for static offsets, replacing the reference's stateful
_cos_cached/_sin_cached buffers (rotary.py:154-180) with pure functions that
work under jit/scan for decode (`seqlen_offset`, rotary.py:184-201).

Convention (matches the reference / GPT-NeoX): the first `rotary_dim` channels
of each head are rotated, where x1 = first half, x2 = second half of that
slice; channels past rotary_dim pass through (partial rotary via
`rotary_emb_fraction`, reference mha.py:317-321).

XPos (scale_base > 0, Sun et al. 2212.10554): q is multiplied by
scale^((pos - center)/scale_base) and k by its inverse; the attention product
then depends only on pos_q - pos_k, so `center` is a free parameter (the
reference uses seqlen//2 of its cache, rotary.py:174-176 — the choice cancels
in q.k^T).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rotary_inv_freq(rotary_dim: int, base: float = 10000.0) -> jax.Array:
    """(rotary_dim/2,) inverse frequencies (reference rotary.py:142-144)."""
    return 1.0 / (base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32)
                           / rotary_dim))


def rotary_cos_sin(positions: jax.Array, rotary_dim: int,
                   base: float = 10000.0, scale_base: int = 0,
                   center: int = 0,
                   ) -> Tuple[jax.Array, jax.Array,
                              Optional[jax.Array], Optional[jax.Array]]:
    """cos/sin tables for the given (s,) or per-row (b, s) positions. Returns
    (cos_q, sin_q, cos_k, sin_k) of shape positions.shape + (rot/2,); the k
    pair is None unless XPos is on (reference rotary.py:154-180)."""
    inv_freq = rotary_inv_freq(rotary_dim, base)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    if scale_base <= 0:
        return cos, sin, None, None
    scale = ((jnp.arange(0, rotary_dim, 2, dtype=jnp.float32)
              + 0.4 * rotary_dim) / (1.4 * rotary_dim))
    power = (positions.astype(jnp.float32) - center) / scale_base
    scale = scale ** power[..., None]
    return cos * scale, sin * scale, cos / scale, sin / scale


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate the first 2*cos.shape[-1] channels of x (b, s, h, d)
    (reference apply_rotary_emb_torch, rotary.py:18-28; kernel
    csrc/rotary/rotary_cuda.cu). cos/sin: (s, rot/2) shared across the batch
    or (b, s, rot/2) per-row (serving: per-slot position offsets)."""
    rotary_dim = cos.shape[-1] * 2
    dtype = x.dtype
    x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
    half = rotary_dim // 2
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    o1 = x1f * c - x2f * s
    o2 = x2f * c + x1f * s
    out = jnp.concatenate([o1, o2], axis=-1).astype(dtype)
    if rotary_dim < x.shape[-1]:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


def apply_rotary_qk(q: jax.Array, k: jax.Array, rotary_dim: int, *,
                    seqlen_offset=0, base: float = 10000.0,
                    scale_base: int = 0
                    ) -> Tuple[jax.Array, jax.Array]:
    """Apply rotary (or XPos) to q and k (b, s, h, d) at positions
    seqlen_offset + [0, s) — the decode-aware entry point (reference
    RotaryEmbedding.forward, rotary.py:184-201, called from mha.py:426).
    seqlen_offset: scalar, or (b,) per-row offsets for serving slots."""
    if rotary_dim <= 0:
        return q, k
    offs = jnp.asarray(seqlen_offset)
    if offs.ndim == 1:
        positions = offs[:, None] + jnp.arange(q.shape[1])[None, :]
    else:
        positions = offs + jnp.arange(q.shape[1])
    cos_q, sin_q, cos_k, sin_k = rotary_cos_sin(positions, rotary_dim,
                                                base=base,
                                                scale_base=scale_base)
    q = apply_rotary(q, cos_q, sin_q)
    k = apply_rotary(k, cos_k if cos_k is not None else cos_q,
                     sin_k if sin_k is not None else sin_q)
    return q, k
