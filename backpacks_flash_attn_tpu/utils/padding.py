"""Padding/unpadding utilities: (b, s, ...) + mask <-> packed (total, ...).

Reference: flash_attn/bert_padding.py:97-132 — unpad_input/pad_input convert
between padded batches and the packed layout the CUDA varlen kernels consume
(with cu_seqlens prefix sums), via gather/scatter autograd Functions.

On TPU the attention kernels take padded batches + masks directly (static
shapes), so these utilities exist for the OTHER reason the reference uses
them: running per-token heads (MLM, dense-seq-output) on real tokens only.
XLA needs a static packed size, so `unpad_input` takes a `budget` (default:
the full b*s) and pads the packed dimension up to it — gathers/scatters are
jit-compatible and differentiable (pure jnp indexing).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Unpadded(NamedTuple):
    values: jax.Array       # (budget, ...) packed real tokens (then padding)
    indices: jax.Array      # (budget,) flat (b*s) source index per row
    valid: jax.Array        # (budget,) bool, False on budget padding
    cu_seqlens: jax.Array   # (b+1,) prefix sums of per-sequence lengths
    max_seqlen: jax.Array   # scalar int32


def unpad_input(x: jax.Array, mask: jax.Array,
                budget: Optional[int] = None) -> Unpadded:
    """Pack the True-masked tokens of x (b, s, ...) into (budget, ...),
    ordered batch-major like the reference (bert_padding.py:97-116).
    mask: (b, s) bool."""
    b, s = mask.shape
    budget = budget if budget is not None else b * s
    flat_mask = mask.reshape(-1)
    # stable order: real tokens first in batch-major order
    order = jnp.argsort(~flat_mask, stable=True)
    indices = order[:budget]
    valid = flat_mask[indices]
    values = x.reshape((b * s,) + x.shape[2:])[indices]
    values = jnp.where(valid.reshape((-1,) + (1,) * (values.ndim - 1)),
                       values, 0)
    seqlens = mask.sum(axis=1).astype(jnp.int32)
    cu = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens)])
    return Unpadded(values=values, indices=indices, valid=valid,
                    cu_seqlens=cu, max_seqlen=seqlens.max())


def pad_input(unpadded: Unpadded, batch: int, seqlen: int) -> jax.Array:
    """Scatter packed values back to (b, s, ...), zeros at padding
    (reference pad_input, bert_padding.py:118-132)."""
    values, indices, valid = (unpadded.values, unpadded.indices,
                              unpadded.valid)
    flat = jnp.zeros((batch * seqlen,) + values.shape[1:], values.dtype)
    safe_idx = jnp.where(valid, indices, batch * seqlen - 1)
    contrib = jnp.where(valid.reshape((-1,) + (1,) * (values.ndim - 1)),
                        values, 0)
    flat = flat.at[safe_idx].add(contrib)
    return flat.reshape((batch, seqlen) + values.shape[1:])


def index_first_axis(x: jax.Array, indices: jax.Array) -> jax.Array:
    """Differentiable gather on axis 0 (reference IndexFirstAxis,
    bert_padding.py:9-37 — an autograd.Function there; plain indexing here)."""
    return x[indices]
