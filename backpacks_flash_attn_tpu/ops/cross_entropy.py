"""Softmax cross-entropy, fused and vocab-parallel.

TPU-native equivalent of the reference's csrc/xentropy CUDA extension
(reference: csrc/xentropy/interface.cpp:56-58 — fwd returns per-row
(loss, logsumexp); label smoothing takes an explicit total_classes so
vocab-parallel smoothing stays correct) and of the vocab-parallel wrapper
(reference: flash_attn/losses/cross_entropy.py:61-90 — local (loss, lse),
all-gather of LSEs, global logsumexp, correction terms).

On TPU the fused form is just the logsumexp expression — XLA fuses it into two
passes over the logits without materializing the softmax; the vocab-parallel
form runs under shard_map with psum/pmax over the model axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array, *,
                  label_smoothing: float = 0.0,
                  ignore_index: int = -100,
                  total_classes: Optional[int] = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Per-token loss and lse. logits (..., V) fp32, labels (...) int.

    Matches the reference kernel semantics: smoothing distributes
    `label_smoothing` mass over `total_classes` (defaults to V — the arg
    exists so a vocab-parallel caller can pass the global vocab size,
    reference interface.cpp:56-58)."""
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    total = total_classes if total_classes is not None else v
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    ll = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = label_smoothing
        # (1-eps)*(-log p_y) + eps/K * sum_c (-log p_c)
        sum_logits = jnp.sum(logits, axis=-1)
        loss = ((1.0 - smooth) * (lse - ll)
                + smooth * (lse - sum_logits / total))
    else:
        loss = lse - ll
    loss = jnp.where(valid, loss, 0.0)
    return loss, lse


def cross_entropy_loss(logits: jax.Array, labels: jax.Array, *,
                       label_smoothing: float = 0.0,
                       ignore_index: int = -100) -> jax.Array:
    """Mean loss over non-ignored tokens (the reference CrossEntropyLoss with
    reduction='mean', flash_attn/losses/cross_entropy.py:107-129)."""
    loss, _ = cross_entropy(logits, labels, label_smoothing=label_smoothing,
                            ignore_index=ignore_index)
    valid = (labels != ignore_index).astype(jnp.float32)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1.0)


def vocab_parallel_cross_entropy(local_logits: jax.Array, labels: jax.Array,
                                 axis_name: str, *,
                                 label_smoothing: float = 0.0,
                                 ignore_index: int = -100) -> jax.Array:
    """Per-token loss with the vocab dimension sharded over `axis_name`.

    Call inside shard_map. local_logits: (..., V/mp); labels are GLOBAL ids.
    Math follows the reference (losses/cross_entropy.py:39-90): each rank
    computes the local lse and the local target log-prob (0 when the target
    falls outside its shard), then global lse = logsumexp over ranks and the
    target term is summed over ranks.
    """
    local_logits = local_logits.astype(jnp.float32)
    v_local = local_logits.shape[-1]
    rank = jax.lax.axis_index(axis_name)
    vocab_start = rank * v_local

    local_lse = jax.scipy.special.logsumexp(local_logits, axis=-1)
    # logsumexp over ranks: max-shift then psum of exps
    m = jax.lax.pmax(local_lse, axis_name)
    lse = m + jnp.log(jax.lax.psum(jnp.exp(local_lse - m), axis_name))

    valid = labels != ignore_index
    local_label = labels - vocab_start
    in_shard = (local_label >= 0) & (local_label < v_local) & valid
    safe = jnp.clip(local_label, 0, v_local - 1)
    ll_local = jnp.take_along_axis(local_logits, safe[..., None], axis=-1)[..., 0]
    ll = jax.lax.psum(jnp.where(in_shard, ll_local, 0.0), axis_name)

    if label_smoothing > 0.0:
        total = jax.lax.psum(jnp.float32(v_local), axis_name)
        sum_logits = jax.lax.psum(jnp.sum(local_logits, axis=-1), axis_name)
        loss = ((1.0 - label_smoothing) * (lse - ll)
                + label_smoothing * (lse - sum_logits / total))
    else:
        loss = lse - ll
    return jnp.where(valid, loss, 0.0)
