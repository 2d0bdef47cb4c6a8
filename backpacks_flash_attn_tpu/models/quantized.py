"""Param-tree quantization: fp checkpoints -> INT8/INT4 weight-only inference.

Implements the BASELINE.md north-star configuration: weight-only INT8/INT4 on
all dense layers, INT8 row-quantized embeddings, a quantized precomputed
(vocab, nv, d) sense table with per-token-per-sense scales, and an explicit
quantized lm_head (the tied-weight matmul reads the same information as the
embedding but needs the transposed (d, vocab) layout for the fused-dequant
GEMM). The quantized trees run through the *same* model functions
(models/gpt.py, models/backpack.py) via the dispatch in ops/dense.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import BackpackConfig, GPTConfig
from ..ops import quant
from . import backpack as bp

Params = Dict[str, Any]


def quantize_embedding_rows(wte: jax.Array) -> dict:
    """Per-row INT8 embedding table: {'q': (V, d) int8, 'row_scale': (V, 1)}."""
    q, scale = quant.quantize_activations_int8(wte, axis=-1)
    return {"q": q, "row_scale": scale.astype(jnp.float32)}


def _quantize_linear_tree(tree, bits: int, group_size: Optional[int]):
    """Recursively replace {'kernel','bias'?} leaves with QuantWeight params.
    Stacked (n_layer, in, out) kernels are quantized per layer via vmap
    (QuantWeight's bits/d_out are static metadata, so the batched result scans
    like any other layer-stacked leaf)."""
    import dataclasses as _dc

    if isinstance(tree, dict) and "kernel" in tree:
        kernel = tree["kernel"]
        if kernel.ndim == 3:  # stacked layers
            qp = jax.vmap(lambda w: quant.quantize_weight(w, bits, group_size)
                          )(kernel)
        else:
            qp = quant.quantize_weight(kernel, bits, group_size)
        return _dc.replace(qp, bias=tree.get("bias"))
    if isinstance(tree, dict):
        return {k: _quantize_linear_tree(v, bits, group_size)
                for k, v in tree.items()}
    return tree


def quantize_gpt_params(params: Params, cfg: GPTConfig, *, bits: int = 8,
                        group_size: Optional[int] = None,
                        head_bits: Optional[int] = None,
                        act_dtype=jnp.bfloat16) -> Params:
    """Quantize a GPT param tree. Layer norms stay fp32; embeddings go INT8
    per-row; lm_head becomes an explicit quantized (d, V) kernel.

    head_bits: precision of the tied lm_head projection. Defaults to
    max(bits, 8): logits read the tied embedding directly, and INT4 there
    costs +1.5 ppl while INT4 everywhere else is ~free (measured ablation
    on a trained backpack-micro; the head is ~29M of 170M params)."""
    head_bits = head_bits if head_bits is not None else max(bits, 8)
    out: Params = {
        "wte": quantize_embedding_rows(params["wte"]),
        "ln_0": jax.tree.map(lambda x: x.astype(jnp.float32), params["ln_0"]),
        "layers": _quantize_linear_tree(
            {k: v for k, v in params["layers"].items()
             if k in ("Wqkv", "out_proj", "mlp")}, bits, group_size),
        "lm_head": quant.quantize_weight(
            params["wte"].T.astype(jnp.float32), head_bits, group_size),
    }
    for norm in ("norm1", "norm2"):
        out["layers"][norm] = jax.tree.map(
            lambda x: x.astype(jnp.float32), params["layers"][norm])
    if "moe" in params["layers"]:
        # Switch-MoE expert FFNs: INT8 per-(expert, out-channel) — under the
        # dense-dispatch formulation ALL experts' weights stream from HBM
        # every decode step, so they take the same 2x byte cut as the dense
        # layers (the ops/moe.quantize_moe_params convert-fused einsum).
        # Experts stay INT8 even at bits=4 (packed-int4 einsums would need
        # the Pallas kernel path; see quantize_moe_params).
        from ..ops import moe as moe_lib
        out["layers"]["moe"] = moe_lib.quantize_moe_params(
            params["layers"]["moe"], act_dtype=act_dtype)
    if "wpe" in params:
        out["wpe"] = params["wpe"].astype(act_dtype)
    return out


def quantize_backpack_params(params: Params, cfg: BackpackConfig, *,
                             bits: int = 8,
                             group_size: Optional[int] = None,
                             sense_bits: Optional[int] = None,
                             head_bits: Optional[int] = None,
                             precompute_sense_table: bool = True,
                             act_dtype=jnp.bfloat16) -> Params:
    """Quantize a Backpack param tree for inference.

    head_bits: tied lm_head precision, default max(bits, 8) — see
    quantize_gpt_params.
    sense_bits: bits for the precomputed sense table (defaults to `bits`).
    When precompute_sense_table is set, content_forward becomes a pure gather
    of quantized senses (per-token-per-sense scales — the INT4 quality
    requirement from BASELINE.md).
    """
    sense_bits = sense_bits if sense_bits is not None else bits
    out: Params = {
        "gpt": quantize_gpt_params(params["gpt"], cfg, bits=bits,
                                   group_size=group_size,
                                   head_bits=head_bits, act_dtype=act_dtype),
        "ctx_attn": _quantize_linear_tree(params["ctx_attn"], bits, group_size),
        "content": {
            "ln_0": jax.tree.map(lambda x: x.astype(jnp.float32),
                                 params["content"]["ln_0"]),
            "blocks": _quantize_linear_tree(
                {"mlp": params["content"]["blocks"]["mlp"]}, bits, group_size
            ) | {norm: jax.tree.map(lambda x: x.astype(jnp.float32),
                                    params["content"]["blocks"][norm])
                 for norm in ("norm1", "norm2")},
            "final_mlp": _quantize_linear_tree(params["content"]["final_mlp"],
                                               bits, group_size),
        },
    }
    if precompute_sense_table:
        table = bp.sense_table(params, cfg)  # fp (V, nv, d)
        out["content"]["table"] = quantize_sense_table(table, sense_bits)
    return out


def quantize_sense_table(table: jax.Array, bits: int = 8,
                         group_size: Optional[int] = None) -> quant.QuantTable:
    """(V, nv, d) -> {'q': int8 (V, nv, d[/2]), 'scale': (V, nv, d/g), 'bits'}.

    Per-token-per-sense scales by default; group_size adds per-CHANNEL-group
    granularity along d (SURVEY.md §7.3: per-sense-per-channel scales are
    what hold INT4 within 0.5 ppl — senses feed both the output sum and,
    via the tied head, the logits). INT4 defaults to group_size=64."""
    if group_size is None and bits == 4:
        group_size = 64
    qmax = 127.0 if bits == 8 else 7.0
    tf = table.astype(jnp.float32)
    V, nv, d = tf.shape
    if group_size:
        assert d % group_size == 0 and group_size % 2 == 0
        g = tf.reshape(V, nv, d // group_size, group_size)
        absmax = jnp.max(jnp.abs(g), axis=-1)                # (V, nv, d/g)
        scale = jnp.maximum(absmax / qmax, 1e-10)
        q = jnp.clip(jnp.round(g / scale[..., None]), -qmax, qmax
                     ).astype(jnp.int8).reshape(V, nv, d)
    else:
        absmax = jnp.max(jnp.abs(tf), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax / qmax, 1e-10)
        q = jnp.clip(jnp.round(tf / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        q = quant.pack_int4_last(q)
    return quant.QuantTable(q=q, scale=scale, bits=bits)
