"""Device mesh + sharding rules: the pjit replacement for the reference's
process-group plumbing.

The reference threads apex process groups through every module constructor and
maintains Parallel* variants of each layer (ColumnParallelLinear/
RowParallelLinear ops/fused_dense.py:132-172, ParallelMHA mha.py:470-530,
ParallelGPT2Embeddings embedding.py:88-144). Here there is ONE model
definition; tensor/sequence/data parallelism is a pytree of PartitionSpecs
applied at the jit boundary, and XLA inserts the all-gathers/reduce-scatters
over ICI that the reference issues by hand (utils/distributed.py:18-74).

Axes: 'data' (batch / DP), 'model' (TP: heads, mlp inner dim, vocab, senses).
Megatron-style sequence parallelism falls out of sharding propagation: the
activations between TP regions are sharded on (b*s) when XLA finds it
profitable; there is nothing to hand-plumb.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BackpackConfig, GPTConfig
from ..ops.quant import QuantTable, QuantWeight


def make_mesh(data: int = 1, model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    assert len(devices) >= n, (len(devices), n)
    dev = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


def _linear_spec(col_parallel: bool, stacked: bool) -> Dict[str, P]:
    """Megatron TP: column-parallel shards the out dim (bias too); row-parallel
    shards the in dim with a replicated bias (reference ops/fused_dense.py:
    132-172)."""
    lead = (None,) if stacked else ()
    if col_parallel:
        return {"kernel": P(*lead, None, "model"), "bias": P(*lead, "model")}
    return {"kernel": P(*lead, "model", None), "bias": P(*lead, None)}


def _norm_spec(stacked: bool) -> Dict[str, P]:
    lead = (None,) if stacked else ()
    return {"weight": P(*lead), "bias": P(*lead)}


def gpt_param_specs(cfg: GPTConfig, params: Optional[Any] = None) -> Dict:
    """PartitionSpec tree matching models/gpt.py param layout.

    Vocab-sharded word embeddings + dim-sharded position table mirror
    ParallelGPT2Embeddings (reference embedding.py:88-144); Wqkv/fc1 are
    column-parallel, out_proj/fc2 row-parallel (reference mha.py:497-503,
    ops/fused_dense.py:405-445)."""
    specs = {
        "wte": P("model", None),
        "wpe": P(None, "model"),
        "ln_0": _norm_spec(False),
        "layers": {
            "Wqkv": _linear_spec(True, True),
            "out_proj": _linear_spec(False, True),
            "norm1": _norm_spec(True),
            "norm2": _norm_spec(True),
        },
    }
    if cfg.moe_experts > 0:
        # expert parallelism on the 'model' axis: expert-stacked FFN kernels
        # (n_layer, E, ...) shard their EXPERT dim; XLA inserts the
        # dispatch/combine all-to-alls from these annotations (ops/moe.py)
        specs["layers"]["moe"] = {
            "router": P(),
            "fc1": {"kernel": P(None, "model", None, None),
                    "bias": P(None, "model", None)},
            "fc2": {"kernel": P(None, "model", None, None),
                    "bias": P(None, "model", None)},
        }
    else:
        specs["layers"]["mlp"] = {"fc1": _linear_spec(True, True),
                                  "fc2": _linear_spec(False, True)}
    return specs


def backpack_param_specs(cfg: BackpackConfig) -> Dict:
    """Backpack TP: the contextualization Wqkv is column-parallel over the nv
    heads; the sense network's final expansion (d -> nv*d) is column-parallel
    over senses; the one no-mix block is TP'd like an MLP (reference
    backpack.py:320-337 only parallelizes lm_head — this scheme goes further
    because senses are the dominant memory)."""
    return {
        "gpt": gpt_param_specs(cfg),
        "ctx_attn": {"Wqkv": _linear_spec(True, False)},
        "content": {
            "ln_0": _norm_spec(False),
            "blocks": {
                "norm1": _norm_spec(True),
                "mlp": {"fc1": _linear_spec(True, True),
                        "fc2": _linear_spec(False, True)},
                "norm2": _norm_spec(True),
            },
            "final_mlp": {"fc1": _linear_spec(True, False),
                          "fc2": _linear_spec(True, False)},
        },
    }


def _match_spec_to_params(params, specs):
    """Prune/extend the spec tree to the actual param tree: drop specs for
    absent params (e.g. no wpe), replicate anything unspecified, and map
    QuantWeight leaves (q/scale share the kernel's out-dim sharding)."""
    if isinstance(params, QuantWeight):
        kspec = specs["kernel"] if isinstance(specs, dict) else specs
        ndims = kspec  # kernel spec, e.g. P(None, 'model') or P('model', None)
        out_axis = ndims[-1]
        lead = tuple(ndims[:-2])
        return QuantWeight(
            q=P(*lead, ndims[-2], out_axis),
            scale=P(*lead, None, out_axis),
            bias=(P(*lead, out_axis) if params.bias is not None else None),
            bits=params.bits, d_out=params.d_out)
    if isinstance(params, QuantTable):
        return QuantTable(q=P("model", None, None), scale=P("model", None, None),
                          bits=params.bits)
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            if isinstance(specs, dict) and k in specs:
                out[k] = _match_spec_to_params(v, specs[k])
            elif k == "q" or k == "row_scale":     # quantized embedding dict
                out[k] = P("model", None)
            elif k == "lm_head":
                out[k] = _match_spec_to_params(v, {"kernel": P(None, "model")})
            elif k == "table":
                out[k] = _match_spec_to_params(v, None)
            else:
                out[k] = jax.tree.map(lambda _: P(), v)
        return out
    if isinstance(specs, dict) and not isinstance(params, dict):
        # param is a bare leaf but spec says dict (e.g. bias absent) — replicate
        return P()
    return specs if specs is not None else jax.tree.map(lambda _: P(), params)


def param_shardings(params, cfg, mesh: Mesh):
    """NamedSharding tree for a (possibly quantized) param tree."""
    base = (backpack_param_specs(cfg) if isinstance(cfg, BackpackConfig)
            else gpt_param_specs(cfg))
    specs = _match_spec_to_params(params, base)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, cfg, mesh: Mesh):
    """device_put the param tree with TP shardings over the mesh."""
    return jax.device_put(params, param_shardings(params, cfg, mesh))
