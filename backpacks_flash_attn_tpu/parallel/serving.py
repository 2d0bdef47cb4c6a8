"""Multi-device serving: sharded decode over a mesh.

The reference scales inference the same way it scales training — Megatron TP
process groups threaded through module constructors (SURVEY.md §2.7). Here
the decode step jits over a Mesh with explicit shardings:

  * 'data' axis: serving slots (batch rows) shard across devices — each
    device owns its slots' cache rows (the flat-E layouts are batch-major,
    so a contiguous E split IS a batch split) and decodes them with zero
    collectives. This is the throughput parallelism for Backpack-scale
    models (170M params replicate comfortably; TP collectives would
    dominate a ~1.3ms step).
  * 'model' axis: weights TP-shard per parallel/mesh.py's Megatron specs
    (column/row-parallel dense, vocab-sharded embeddings) — XLA inserts the
    all-gather/reduce-scatters over ICI. Used when the model outgrows a chip;
    composable with the data axis.

Multi-host: the same code runs under jax.distributed.initialize(); the mesh
spans hosts and the 'data' axis rides DCN while 'model' stays intra-slice.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BackpackConfig
from ..models import backpack as bp
from .mesh import param_shardings


def cache_specs(cache: bp.BackpackCache) -> bp.BackpackCache:
    """PartitionSpecs sharding a per-slot cache's batch rows over 'data'.
    The flat E axes are batch-major, so P('data', ...) splits slots."""
    return bp.BackpackCache(
        gpt=cache.gpt._replace(
            k=P(None, "data", None, None),
            v=P(None, "data", None, None),
            length=P("data") if cache.gpt.length.ndim else P(),
            k_scale=(P(None, "data", None)
                     if cache.gpt.k_scale is not None else None),
            v_scale=(P(None, "data", None)
                     if cache.gpt.v_scale is not None else None)),
        ctx_k=P("data", None, None),
        content=P("data", None, None),
        length=P("data") if cache.length.ndim else P(),
        content_scale=(P("data", None)
                       if cache.content_scale is not None else None),
        ctx_k_scale=(P("data", None)
                     if cache.ctx_k_scale is not None else None))


def cache_shardings(cache: bp.BackpackCache, mesh: Mesh) -> Any:
    specs = cache_specs(cache)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s) if s is not None else None,
        specs, is_leaf=lambda x: isinstance(x, P) or x is None)


def shard_cache(cache: bp.BackpackCache, mesh: Mesh) -> bp.BackpackCache:
    return jax.device_put(cache, cache_shardings(cache, mesh))


def make_sharded_decode_step(cfg: BackpackConfig, mesh: Mesh, *,
                             use_flash: bool = True,
                             tp_params: bool = False):
    """Returns (decode_step, prepare) where decode_step(params, tokens, cache)
    -> (logits, cache) is jitted with slots sharded over 'data' and params
    either replicated (default — right for <=1B models) or TP-sharded over
    'model' (tp_params=True), and prepare(params, cache) commits both to the
    mesh."""
    def step(params, tokens, cache):
        return bp.backpack_forward_with_cache(params, cfg, tokens, cache,
                                              use_flash=use_flash)

    def prepare(params, cache):
        if tp_params:
            params = jax.device_put(params, param_shardings(params, cfg, mesh))
        else:
            replicate = NamedSharding(mesh, P())
            params = jax.device_put(params,
                                    jax.tree.map(lambda _: replicate, params))
        return params, shard_cache(cache, mesh)

    tok_sharding = NamedSharding(mesh, P("data", None))
    jit_step = jax.jit(step, in_shardings=(None, tok_sharding, None),
                       donate_argnums=(2,))
    return jit_step, prepare
