"""Single-pass Pallas MLP forward: x @ W1 + b1 -> act -> @ W2 + b2.

bench_mlp.py (bench_results/mlp_r2.json, v5e) shows the training MLP
forward stuck at ~45-47% MXU while the SAME shapes' fwd+bwd GEMM set runs
at ~70-72%: the forward is bound by streaming the (tokens, 4d)
intermediates through HBM (XLA materializes the fc1 output and the
activation output), not by the custom_vjp (raw jnp and ops/dense.mlp
measure identically). This kernel keeps the intermediate in VMEM: per
(token-tile, inner-tile) grid step it computes a (T_b, I_b) slab of the
hidden layer, applies the activation in-register, and accumulates into an
f32 (T_b, d) output scratch — the only (tokens, 4d)-sized HBM write left
is the PRE-activation, which the checkpoint-lvl-1 backward genuinely needs
(reference policy: flash_attn/ops/fused_dense.py:175-235; recomputing it
instead costs a full extra GEMM, a strictly worse trade at these shapes).

HBM traffic per forward (tokens=16384, d=768, bf16): 300MB (weights
re-streamed per token tile + x + h_pre + out) vs XLA's ~500MB+, with the
activation never materialized. The backward is unchanged
(ops/dense._mlp_fused_bwd) — it already sits at ~72% MXU.

Gated by BACKPACKS_FUSED_MLP=1 (default off until the on-chip A/B lands;
interpret-mode parity is tested either way). Cite: reference
csrc/fused_dense_lib/fused_dense.cpp:30-37 (the cuBLASLt epilogue-fusion
analogue of exactly this forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _interpret


def _act(name, x):
    if name in ("gelu_new", "gelu_fast"):
        return jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "sqrelu":
        return jnp.square(jax.nn.relu(x))
    raise ValueError(name)


def _mlp_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, hpre_ref,
                    acc_ref, *, activation: str, n_i: int, force_f32: bool):
    ii = pl.program_id(1)
    cdt = (jnp.float32 if force_f32 or x_ref.dtype == jnp.float32
           else jnp.bfloat16)

    @pl.when(ii == 0)
    def _():
        acc_ref[:] = (jnp.zeros_like(acc_ref)
                      + b2_ref[:].astype(jnp.float32))

    h = jax.lax.dot_general(x_ref[:].astype(cdt), w1_ref[:].astype(cdt),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    hp = h.astype(hpre_ref.dtype)
    hpre_ref[:] = hp
    # activation on the SAVED precision so fwd == what the unchanged
    # backward recomputes from h_pre (checkpoint-lvl-1 consistency)
    a = _act(activation, hp.astype(cdt) if cdt != jnp.float32
             else hp.astype(jnp.float32))
    acc_ref[:] += jax.lax.dot_general(a.astype(cdt), w2_ref[:].astype(cdt),
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ii == n_i - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def mlp_fwd_fused(x: jax.Array, w1: jax.Array, b1: jax.Array,
                  w2: jax.Array, b2: jax.Array, *,
                  activation: str = "gelu_new",
                  block_t: int = 1024, block_i: int = 512):
    """-> (out (..., d_out), h_pre (..., inner)) with the (…, inner)
    ACTIVATION output never leaving VMEM. Requires d_in/inner/d_out
    divisible by 128 (model dims; callers fall back to XLA otherwise)."""
    orig_shape = x.shape
    d_in = x.shape[-1]
    inner = w1.shape[1]
    d_out = w2.shape[1]
    xm = x.reshape(-1, d_in)
    t = xm.shape[0]
    # scoped-VMEM budget: the f32 accumulator is (block_t, d_out) and lives
    # on the kernel stack — at d_out=12288 (the content net's sense
    # projection) a 1024-row tile is a 48MB stack frame, 3x the 16MB scoped
    # limit (measured compile OOM, bench_results r3). Cap the accumulator at
    # 4MB; wide-output shapes are excluded by supported() anyway, so this is
    # defense-in-depth for direct callers.
    max_t = max(256, (4 * 2 ** 20 // (4 * d_out)) // 8 * 8)
    block_t = min(block_t, max_t, max(((t + 7) // 8) * 8, 8))
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        xm = jnp.pad(xm, ((0, t_pad - t), (0, 0)))
    block_i = min(block_i, inner)
    n_t, n_i = t_pad // block_t, inner // block_i

    out, hpre = pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, activation=activation, n_i=n_i,
                          force_f32=_interpret()),
        grid=(n_t, n_i),
        in_specs=[
            pl.BlockSpec((block_t, d_in), lambda ti, ii: (ti, 0)),
            pl.BlockSpec((d_in, block_i), lambda ti, ii: (0, ii)),
            pl.BlockSpec((1, block_i), lambda ti, ii: (0, ii)),
            pl.BlockSpec((block_i, d_out), lambda ti, ii: (ii, 0)),
            pl.BlockSpec((1, d_out), lambda ti, ii: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_t, d_out), lambda ti, ii: (ti, 0)),
            pl.BlockSpec((block_t, block_i), lambda ti, ii: (ti, ii)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, d_out), x.dtype),
            jax.ShapeDtypeStruct((t_pad, inner), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_t, d_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(xm, w1, b1.reshape(1, inner), w2, b2.reshape(1, d_out))
    out = out[:t].reshape(*orig_shape[:-1], d_out)
    hpre = hpre[:t].reshape(*orig_shape[:-1], inner)
    return out, hpre


def supported(params, activation: str) -> bool:
    """Static eligibility: bias-ful fp kernels with 128-aligned dims."""
    try:
        w1, w2 = params["fc1"]["kernel"], params["fc2"]["kernel"]
    except (KeyError, TypeError):
        return False
    if isinstance(w1, dict) or isinstance(w2, dict):
        return False
    if "bias" not in params["fc1"] or "bias" not in params["fc2"]:
        return False
    if activation not in ("gelu", "gelu_new", "gelu_fast", "relu", "sqrelu"):
        return False
    d_in, inner = w1.shape
    d_out = w2.shape[1]
    # wide-output projections (the Backpack content net's final sense
    # projection is 768 -> 3072 -> nv*d = 12288) blow the scoped-VMEM budget:
    # the (block_i, d_out) W2 block and the (block_t, d_out) f32 accumulator
    # both scale with d_out, and their (T, d_out)-sized output must hit HBM
    # regardless (it IS the senses tensor), so there is no streaming win to
    # chase there. Keep the kernel for transformer-MLP shapes (d_out ~ d_in).
    if d_out > max(2048, d_in):
        return False
    return (d_in % 128 == 0 and inner % 128 == 0 and d_out % 128 == 0
            and inner % min(512, inner) == 0)
