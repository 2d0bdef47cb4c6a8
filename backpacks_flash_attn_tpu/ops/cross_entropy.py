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

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _ce_fwd_math(logits, labels, label_smoothing, ignore_index, total):
    """Shared fwd math; logits upcast feeds straight into reductions so XLA
    fuses the f32 convert into the two passes (never a stored f32 copy)."""
    logits_f = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits_f, axis=-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    ll = jnp.take_along_axis(logits_f, safe_labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        sum_logits = jnp.sum(logits_f, axis=-1)
        loss = ((1.0 - label_smoothing) * (lse - ll)
                + label_smoothing * (lse - sum_logits / total))
    else:
        loss = lse - ll
    return jnp.where(valid, loss, 0.0), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _ce(logits, labels, label_smoothing, ignore_index, total):
    return _ce_fwd_math(logits, labels, label_smoothing, ignore_index, total)


def _ce_fwd(logits, labels, label_smoothing, ignore_index, total):
    loss, lse = _ce_fwd_math(logits, labels, label_smoothing, ignore_index,
                             total)
    # Residuals are the ORIGINAL (typically bf16) logits plus the per-row lse
    # — the memory-frugal backward of the reference xentropy kernel
    # (csrc/xentropy/interface.cpp:56-58, "inplace bwd" note at
    # xentropy_kernel.cu:1-2): naive autodiff would instead save an fp32 copy
    # of the whole (b, s, V) logits (3.3 GB at batch 32 x 50k vocab).
    return (loss, lse), (logits, labels, lse)


def _ce_bwd(label_smoothing, ignore_index, total, res, g):
    logits, labels, lse = res
    g_loss, g_lse = g
    valid = labels != ignore_index
    p = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    g_tok = jnp.where(valid, g_loss, 0.0)[..., None]
    # dloss/dlogit_c = p_c - [(1-eps) 1[c=y] + eps/total]
    dlogits = p * (g_tok + g_lse[..., None])
    onehot = jax.nn.one_hot(jnp.where(valid, labels, -1), logits.shape[-1],
                            dtype=jnp.float32)
    if label_smoothing > 0.0:
        dlogits = dlogits - g_tok * ((1.0 - label_smoothing) * onehot
                                     + label_smoothing / total)
    else:
        dlogits = dlogits - g_tok * onehot
    return dlogits.astype(logits.dtype), None


_ce.defvjp(_ce_fwd, _ce_bwd)


def cross_entropy(logits: jax.Array, labels: jax.Array, *,
                  label_smoothing: float = 0.0,
                  ignore_index: int = -100,
                  total_classes: Optional[int] = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Per-token loss and lse. logits (..., V), labels (...) int.

    Matches the reference kernel semantics: smoothing distributes
    `label_smoothing` mass over `total_classes` (defaults to V — the arg
    exists so a vocab-parallel caller can pass the global vocab size,
    reference interface.cpp:56-58). custom_vjp: the backward recomputes the
    softmax from the saved low-precision logits + lse instead of storing
    fp32 log-probs."""
    total = total_classes if total_classes is not None else logits.shape[-1]
    return _ce(logits, labels, label_smoothing, ignore_index, total)


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
