"""Megatron-style scaled masked softmax — the fast NON-flash attention
baseline.

Reference: csrc/fused_softmax/fused_softmax.cpp:128-146 (CUDA kernels
scaled_masked_softmax / scaled_upper_triang_masked_softmax) wrapped by
flash_attn/fused_softmax.py:97-204 (FusedScaleMaskSoftmax with kernel-
availability heuristics). On TPU there is nothing to hand-fuse — XLA fuses
scale + mask + softmax into a single pass over the scores — so these are the
semantics, not kernels; the dispatcher below keeps the reference's
input-dtype/softmax-in-fp32 policy knobs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MASK_FILL = -10000.0


def scaled_masked_softmax(x: jax.Array, mask: Optional[jax.Array],
                          scale: float = 1.0) -> jax.Array:
    """softmax(x * scale + mask_fill) over the last axis. x: (b, h, sq, sk);
    mask: (b, 1, sq, sk) True = MASKED OUT (the reference kernel's
    convention, fused_softmax.cpp:scaled_masked_softmax_forward)."""
    s = x.astype(jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask, MASK_FILL, s)
    return jax.nn.softmax(s, axis=-1).astype(x.dtype)


def scaled_upper_triang_masked_softmax(x: jax.Array,
                                       scale: float = 1.0) -> jax.Array:
    """Causal variant: softmax(x * scale) with the strict upper triangle
    masked (reference scaled_upper_triang_masked_softmax_forward)."""
    sq, sk = x.shape[-2], x.shape[-1]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
    s = jnp.where(kpos <= qpos, x.astype(jnp.float32) * scale, MASK_FILL)
    return jax.nn.softmax(s, axis=-1).astype(x.dtype)


class FusedScaleMaskSoftmax:
    """Dispatcher mirroring the reference module's policy knobs
    (flash_attn/fused_softmax.py:97-204): input dtype handling,
    softmax-in-fp32, causal vs padded masks. On TPU both paths are the same
    XLA fusion; the class exists for porting ease."""

    def __init__(self, *, causal: bool = False,
                 softmax_in_fp32: bool = True, scale: float = 1.0):
        self.causal = causal
        self.softmax_in_fp32 = softmax_in_fp32
        self.scale = scale

    def __call__(self, x: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        if self.causal:
            out = scaled_upper_triang_masked_softmax(x, self.scale)
        else:
            out = scaled_masked_softmax(x, mask, self.scale)
        return out if self.softmax_in_fp32 else out.astype(x.dtype)
