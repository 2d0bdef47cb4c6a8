"""LayerNorm and dropout+add+LayerNorm.

TPU-native equivalent of the reference's csrc/layer_norm fused CUDA extension
(reference: csrc/layer_norm/ln_api.cpp:83,454-457 and flash_attn/ops/layer_norm.py:207-216).
On TPU, XLA fuses the dropout + residual-add + normalization chain into a single
HBM pass on its own, so this is plain jnp written so the fusion is possible:
one expression tree, fp32 statistics, no intermediate host round-trips.

Semantics preserved from the reference:
  * prenorm mode returns (normalized, residual) where residual = dropout(x) + prev_residual
  * residual is carried in fp32 ("residual_in_fp32", reference gpt.py:231-240)
  * rowscale (stochastic depth) supported via an optional per-row multiplier
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float = 1e-5, out_dtype=None) -> jax.Array:
    """LayerNorm with fp32 statistics regardless of input dtype."""
    out_dtype = out_dtype if out_dtype is not None else x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _hash_mask(key_data, rate: float, shape, idx=None):
    """Keep-mask from the shared murmur counter hash over flat element
    positions (ops/flash_attention._dropout_keep_positions — the same
    position-seeded source the flash kernels regenerate in their backwards).
    ~3x cheaper on the VPU than threefry bernoulli, which the r3 profile
    measured at ~15ms/step across the per-token dropout sites.

    idx (optional, int32, broadcastable to shape): GLOBAL flat element
    positions. A sequence/batch-sharded caller (parallel/cp_train.py) passes
    the positions its local chunk occupies in the unsharded (B, S, D) tensor
    — the mask is then bit-identical to the single-device mask, the same
    global-counter trick the flash kernels use for attention dropout."""
    from .flash_attention import _dropout_keep_positions

    if idx is None:
        n = 1
        for d in shape:
            n *= d
        idx = jax.lax.iota(jnp.int32, n).reshape(shape)
    seed = key_data.astype(jnp.uint32).reshape(-1)[:2]
    zero = jnp.zeros((), jnp.uint32)
    return _dropout_keep_positions(seed, zero, idx, zero, rate)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _recompute_dropout(x, rate: float, shape, key_data, idx):
    """Dropout whose backward REGENERATES the mask from the rng key instead
    of saving it: a saved mask is otherwise a per-layer residual that the
    layer scan stacks into (n_layer, b, s, d) pred buffers — the r3 step
    profile measured ~8.5ms/step of dynamic-update-slice traffic at 45GB/s
    writing exactly those two stacked masks (plus their backward reads).
    The counter hash is a pure function of (key, element position), so the
    regenerated mask is BIT-IDENTICAL to the forward's."""
    keep = 1.0 - rate
    mask = _hash_mask(key_data, rate, shape, idx)
    return jnp.where(mask, x * (1.0 / keep), jnp.zeros_like(x))


def _recompute_dropout_fwd(x, rate, shape, key_data, idx):
    return _recompute_dropout(x, rate, shape, key_data, idx), (key_data, idx)


def _recompute_dropout_bwd(rate, shape, res, g):
    key_data, idx = res
    keep = 1.0 - rate
    mask = _hash_mask(key_data, rate, shape, idx)
    dx = jnp.where(mask, g * (1.0 / keep), jnp.zeros_like(g))
    zt = lambda a: (None if a is None
                    else np.zeros(np.shape(a), jax.dtypes.float0))
    return dx, zt(key_data), zt(idx)


_recompute_dropout.defvjp(_recompute_dropout_fwd, _recompute_dropout_bwd)


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array],
            deterministic: bool, idx: Optional[jax.Array] = None) -> jax.Array:
    """idx: optional GLOBAL flat element positions (see _hash_mask) for
    sharded callers that need the single-device masks bit-exactly."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)
    if idx is not None:
        idx = jnp.broadcast_to(idx, x.shape)
    return _recompute_dropout(x, float(rate), x.shape, rng, idx)


# BACKPACKS_DALN_BF16_SAVES=1 routes the common training configuration
# (prenorm, fp32 residual, no row/colscale) through a fused custom_vjp whose
# saved-for-backward copy of the fp32 residual stream is a BF16 cast: the
# layer scan stacks every block's saved residuals with dynamic-update-slice
# (r4e profile: 25.1 ms/step of save traffic at models/gpt.py's scan), and
# the f32 new_residual tensors are the widest entries in that stream. The
# compute stays f32 — only the saved copy narrows, so the backward's
# x_hat recompute sees a bf16-rounded residual (~2^-8 relative). Gated by
# the CPU bigram learning test (the r3 dropout-rounds=1 precedent: cheap
# save tricks can silently hurt optimization). Default ON from the r5 v5e
# A/B: 204.8 -> 194.8 ms/step (80.0k -> 84.1k tok/s, 41.4 -> 43.6% MFU,
# bench_results/train_r5_{base,daln}.json) with the learning gate green.
_DALN_BF16_SAVES = os.environ.get("BACKPACKS_DALN_BF16_SAVES", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _daln_fused(x, residual, weight, bias, key_data, idx,
                rate: float, eps: float, out_dtype, has_dropout: bool):
    """dropout(x) + residual -> LN, prenorm/fp32-residual configuration
    (residual must not be None — ln_0 keeps the plain path). Differentiable
    in x/residual/weight/bias; the dropout mask regenerates from key_data in
    the backward (never saved); the residual stream's saved-for-backward
    copy is bf16."""
    out, _ = _daln_fwd(x, residual, weight, bias, key_data, idx,
                       rate, eps, out_dtype, has_dropout)
    return out


def _daln_fwd(x, residual, weight, bias, key_data, idx, rate, eps,
              out_dtype, has_dropout):
    y = x
    if has_dropout:
        keep = 1.0 - rate
        mask = _hash_mask(key_data, rate, x.shape, idx)
        y = jnp.where(mask, x * (1.0 / keep), jnp.zeros_like(x))
    nr = y.astype(jnp.float32) + residual.astype(jnp.float32)
    mean = jnp.mean(nr, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(nr - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    normed = ((nr - mean) * rstd * weight.astype(jnp.float32)
              + bias.astype(jnp.float32)).astype(out_dtype)
    save = (nr.astype(jnp.bfloat16), mean, rstd, weight, key_data, idx)
    return (normed, nr), save


def _daln_bwd(rate, eps, out_dtype, has_dropout, save, g):
    nr_b, mean, rstd, weight, key_data, idx = save
    g_norm, g_nr = g
    x_hat = (nr_b.astype(jnp.float32) - mean) * rstd
    gn = g_norm.astype(jnp.float32)
    dxhat = gn * weight.astype(jnp.float32)
    dnr = rstd * (dxhat
                  - jnp.mean(dxhat, axis=-1, keepdims=True)
                  - x_hat * jnp.mean(dxhat * x_hat, axis=-1, keepdims=True))
    dnr = dnr + g_nr.astype(jnp.float32)
    red_axes = tuple(range(gn.ndim - 1))
    dw = jnp.sum(gn * x_hat, axis=red_axes).astype(weight.dtype)
    db = jnp.sum(gn, axis=red_axes).astype(weight.dtype)
    dx = dnr
    if has_dropout:
        keep = 1.0 - rate
        mask = _hash_mask(key_data, rate, nr_b.shape, idx)
        dx = jnp.where(mask, dx * (1.0 / keep), jnp.zeros_like(dx))
    dx = dx.astype(out_dtype)
    zt = lambda a: (None if a is None
                    else np.zeros(np.shape(a), jax.dtypes.float0))
    return dx, dnr, dw, db, zt(key_data), zt(idx)


_daln_fused.defvjp(_daln_fwd, _daln_bwd)


def dropout_add_layer_norm(
    x: jax.Array,
    residual: Optional[jax.Array],
    weight: jax.Array,
    bias: jax.Array,
    dropout_p: float = 0.0,
    eps: float = 1e-5,
    *,
    rowscale: Optional[jax.Array] = None,
    colscale: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    prenorm: bool = True,
    residual_in_fp32: bool = True,
    out_dtype=None,
    dropout_idx: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """dropout(x [*colscale]) [*rowscale] + residual -> LayerNorm.

    Matches flash_attn/ops/layer_norm.py:207-216 semantics: rowscale is the
    per-row stochastic-depth multiplier, colscale the per-channel layerscale
    (reference ln_api.cpp rowscale/colscale args; the reference's row-subset
    variants are covered by utils/padding.py gathers). Returns
    (normalized, new_residual) when prenorm else just normalized.
    """
    out_dtype = out_dtype if out_dtype is not None else x.dtype
    drop_active = (not deterministic and dropout_p > 0.0 and rng is not None)
    if (_DALN_BF16_SAVES and prenorm and residual_in_fp32
            and residual is not None and rowscale is None
            and colscale is None and out_dtype == x.dtype):
        key_data = None
        idx = dropout_idx
        if drop_active:
            key_data = rng
            if jnp.issubdtype(key_data.dtype, jax.dtypes.prng_key):
                key_data = jax.random.key_data(key_data)
            if idx is not None:
                idx = jnp.broadcast_to(idx, x.shape)
        return _daln_fused(x, residual, weight, bias, key_data, idx,
                           float(dropout_p), float(eps), out_dtype,
                           drop_active)
    if colscale is not None:
        x = x * colscale.astype(x.dtype)
    y = dropout(x, dropout_p, rng, deterministic, idx=dropout_idx)
    if rowscale is not None:
        y = y * rowscale[..., None].astype(y.dtype)
    res_dtype = jnp.float32 if residual_in_fp32 else y.dtype
    new_residual = y.astype(res_dtype)
    if residual is not None:
        new_residual = new_residual + residual.astype(res_dtype)
    normed = layer_norm(new_residual, weight, bias, eps, out_dtype=out_dtype)
    if prenorm:
        return normed, new_residual
    return normed


def init_layer_norm(dim: int, dtype=jnp.float32) -> dict:
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
