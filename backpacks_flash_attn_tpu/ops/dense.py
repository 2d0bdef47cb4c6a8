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

from typing import Optional

import jax
import jax.numpy as jnp


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


def linear(x: jax.Array, params: dict, *, accum_dtype=jnp.float32) -> jax.Array:
    """x @ kernel + bias with fp32 accumulation on the MXU.

    params: {'kernel': (in, out), 'bias': (out,) optional}, or a quantized
    param dict from ops/quant.py (dispatched transparently so every model
    runs unchanged on INT8/INT4 weights).
    """
    from . import quant
    if quant.is_quantized(params):
        return quant.quant_linear(x, params)
    kernel = params["kernel"]
    y = jnp.dot(x, kernel, preferred_element_type=accum_dtype)
    bias = params.get("bias")
    if bias is not None:
        y = y + bias.astype(accum_dtype)
    return y.astype(x.dtype)


def mlp(x: jax.Array, params: dict, activation: str = "gelu_new") -> jax.Array:
    """fc1 -> act -> fc2 (reference: flash_attn/modules/mlp.py:13-31).

    XLA fuses the activation into the first GEMM's epilogue (the TPU analogue of
    fused_dense_lib.linear_gelu_forward, csrc/fused_dense_lib/fused_dense.cpp:194-197).
    """
    act = ACTIVATIONS[activation]
    h = linear(x, params["fc1"])
    h = act(h)
    return linear(h, params["fc2"])


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
