"""Dense (linear) layers and activations.

TPU-native equivalent of the reference's csrc/fused_dense_lib (cuBLASLt epilogue
fusions, reference: csrc/fused_dense_lib/fused_dense.cpp:30-37) and
flash_attn/ops/fused_dense.py. On TPU, XLA fuses bias-add and GELU into the
matmul epilogue automatically, so "FusedDense" and "FusedDenseGeluDense" are
plain compositions here; the value of this module is the uniform param layout
(kernels stored (in, out) so x @ W needs no transpose on the MXU) and fp32
accumulation via preferred_element_type.

Quantized (INT8/INT4 weight-only) variants live in ops/quant.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# Single-pass Pallas MLP forward (ops/fused_mlp.py): keeps the (tokens, 4d)
# activation in VMEM instead of streaming it through HBM — bench_mlp.py
# measured the XLA forward at ~45% MXU vs the bwd's ~72% for exactly this
# reason. Off until the on-chip A/B lands (bench_train.py picks it up).
_FUSED_MLP = os.environ.get("BACKPACKS_FUSED_MLP", "0") == "1"


def gelu(x: jax.Array, approximate: bool = True) -> jax.Array:
    """GELU; approximate=True matches the reference's 'gelu_new'/tanh approximation."""
    return jax.nn.gelu(x, approximate=approximate)


ACTIVATIONS = {
    "gelu": lambda x: gelu(x, approximate=False),
    "gelu_new": lambda x: gelu(x, approximate=True),
    "gelu_fast": lambda x: gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "sqrelu": lambda x: jnp.square(jax.nn.relu(x)),
}


_F32_DENSE = os.environ.get("BACKPACKS_F32_DENSE", "0") == "1"

# BACKPACKS_FLATTEN_M=1 reshapes (b, s, d) @ (d, n) GEMMs to an explicit
# (b*s, d) 2D form (and back). XLA usually folds the batch dim itself, but
# the r4e profile pinned the MLP/content GEMMs at 58-70% MXU — this is the
# layout A/B for whether the 3D form is what's costing the tiling.
_FLATTEN_M = os.environ.get("BACKPACKS_FLATTEN_M", "0") == "1"


def linear(x: jax.Array, params: dict, *, accum_dtype=jnp.float32) -> jax.Array:
    """x @ kernel + bias with fp32 accumulation on the MXU.

    params: {'kernel': (in, out), 'bias': (out,) optional}, or a quantized
    param dict from ops/quant.py (dispatched transparently so every model
    runs unchanged on INT8/INT4 weights).

    bf16 x bf16 GEMMs emit bf16 directly (the MXU still accumulates in f32
    internally; only the final store rounds) and add the bias in bf16: the
    r3 train profile showed the preferred_element_type=f32 form streaming a
    separate f32 buffer through standalone bias+convert passes
    (dense.py:58-59 loop fusions, ~7 ms/step at batch 32). The reference's
    cuBLASLt epilogue also stores fp16 right after the bias add
    (csrc/fused_dense_lib/fused_dense.cpp:30-37). BACKPACKS_F32_DENSE=1
    restores the f32-intermediate form for A/Bs.
    """
    from . import quant
    if quant.is_quantized(params):
        return quant.quant_linear(x, params)
    kernel = params["kernel"]
    bias = params.get("bias")
    if _FLATTEN_M and x.ndim > 2:
        y2 = linear(x.reshape(-1, x.shape[-1]), params,
                    accum_dtype=accum_dtype)
        return y2.reshape(*x.shape[:-1], y2.shape[-1])
    if (x.dtype == jnp.bfloat16 and kernel.dtype == jnp.bfloat16
            and accum_dtype == jnp.float32 and not _F32_DENSE):
        y = jnp.dot(x, kernel)
        return y + bias.astype(y.dtype) if bias is not None else y
    y = jnp.dot(x, kernel, preferred_element_type=accum_dtype)
    if bias is not None:
        y = y + bias.astype(accum_dtype)
    return y.astype(x.dtype)


def _mlp_fwd_math(x, params, activation):
    if _FUSED_MLP:
        from . import fused_mlp
        if fused_mlp.supported(params, activation):
            return fused_mlp.mlp_fwd_fused(
                x, params["fc1"]["kernel"], params["fc1"]["bias"],
                params["fc2"]["kernel"], params["fc2"]["bias"],
                activation=activation)
    act = ACTIVATIONS[activation]
    h_pre = linear(x, params["fc1"])
    return linear(act(h_pre), params["fc2"]), h_pre


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mlp_fused(x, params, activation):
    return _mlp_fwd_math(x, params, activation)[0]


def _mlp_fused_fwd(x, params, activation):
    out, h_pre = _mlp_fwd_math(x, params, activation)
    # Residuals: input + low-precision PRE-activation only — the reference's
    # FusedDenseGeluDense checkpoint_lvl=1 policy (flash_attn/ops/
    # fused_dense.py:175-235): gelu and its derivative are recomputed in the
    # backward. Plain autodiff instead saves ~6 (b, s, 4d) gelu intermediates
    # per layer (measured 6 x 1.12 GB stacked tensors at batch 32).
    return out, (x, h_pre, params)


def _mlp_fused_bwd(activation, res, g):
    x, h_pre, params = res
    act = ACTIVATIONS[activation]
    a, act_vjp = jax.vjp(act, h_pre)
    w2 = params["fc2"]["kernel"]
    g = g.astype(x.dtype)
    # bf16 dgrad GEMMs emit bf16 directly (same rationale as linear() above:
    # the f32-intermediate form streams a separate (tokens, 4d) f32 buffer
    # plus a convert pass per layer); f32 stays for the exactness oracles
    lowp = (x.dtype == jnp.bfloat16 and w2.dtype == jnp.bfloat16
            and not _F32_DENSE)
    g2 = g.reshape(-1, g.shape[-1]) if _FLATTEN_M else g
    if lowp:
        da = jnp.dot(g2, w2.T)
    else:
        da = jnp.dot(g2, w2.T,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    da = da.reshape(*g.shape[:-1], da.shape[-1]) if _FLATTEN_M else da
    dh = act_vjp(da)[0]
    xm = x.reshape(-1, x.shape[-1])
    am = a.reshape(-1, a.shape[-1])
    gm = g.reshape(-1, g.shape[-1])
    dhm = dh.reshape(-1, dh.shape[-1])
    dparams = {
        "fc1": {"kernel": jnp.dot(xm.T, dhm, preferred_element_type=jnp.float32
                                  ).astype(params["fc1"]["kernel"].dtype)},
        "fc2": {"kernel": jnp.dot(am.T, gm, preferred_element_type=jnp.float32
                                  ).astype(w2.dtype)},
    }
    if "bias" in params["fc1"]:
        dparams["fc1"]["bias"] = dhm.astype(jnp.float32).sum(0).astype(
            params["fc1"]["bias"].dtype)
    if "bias" in params["fc2"]:
        dparams["fc2"]["bias"] = gm.astype(jnp.float32).sum(0).astype(
            params["fc2"]["bias"].dtype)
    dh2 = dhm if _FLATTEN_M else dh
    if lowp:
        dx = jnp.dot(dh2, params["fc1"]["kernel"].T)
    else:
        dx = jnp.dot(dh2, params["fc1"]["kernel"].T,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    dx = dx.reshape(x.shape) if _FLATTEN_M else dx
    return dx, dparams


_mlp_fused.defvjp(_mlp_fused_fwd, _mlp_fused_bwd)


def mlp(x: jax.Array, params: dict, activation: str = "gelu_new") -> jax.Array:
    """fc1 -> act -> fc2 (reference: flash_attn/modules/mlp.py:13-31).

    XLA fuses the activation into the first GEMM's epilogue (the TPU analogue of
    fused_dense_lib.linear_gelu_forward, csrc/fused_dense_lib/fused_dense.cpp:194-197);
    the custom backward recomputes the activation from the saved pre-activation
    (reference checkpoint_lvl=1, ops/fused_dense.py:175-235).
    """
    from . import quant
    if quant.is_quantized(params.get("fc1", {})) or quant.is_quantized(
            params.get("fc2", {})):
        act = ACTIVATIONS[activation]
        return linear(act(linear(x, params["fc1"])), params["fc2"])
    return _mlp_fused(x, params, activation)


def init_linear(key: jax.Array, d_in: int, d_out: int, *, bias: bool = True,
                std: float = 0.02, dtype=jnp.float32) -> dict:
    p = {"kernel": (jax.random.normal(key, (d_in, d_out)) * std).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def init_mlp(key: jax.Array, d_in: int, d_hidden: int, d_out: Optional[int] = None,
             *, std: float = 0.02, out_std: Optional[float] = None,
             dtype=jnp.float32) -> dict:
    d_out = d_out if d_out is not None else d_in
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, d_in, d_hidden, std=std, dtype=dtype),
        "fc2": init_linear(k2, d_hidden, d_out,
                           std=out_std if out_std is not None else std, dtype=dtype),
    }
