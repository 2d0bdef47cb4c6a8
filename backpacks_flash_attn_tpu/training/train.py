"""Training step: AdamW + linear warmup, DP/TP-sharded via pjit.

Replaces the reference's Lightning + apex FusedAdam harness
(reference: training/src/tasks/seq.py:20-192, configs/optimizer/adamw-apex.yaml,
configs/scheduler/linear-warmup.yaml, src/optim/param_grouping.py:15-60):

  * param grouping: no weight decay for biases, norms, embeddings
    (reference param_grouping.py:15-60) via an optax mask
  * linear warmup then constant/linear-decay schedule
  * the loss is the fused cross-entropy (ops/cross_entropy.py); the full
    train step jits over a Mesh with DP batch sharding + TP param sharding,
    which subsumes the reference's DDP allreduce + Megatron TP machinery
  * gradient accumulation by optax.MultiSteps when micro-batching is needed
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import BackpackConfig, GPTConfig
from ..models import backpack as bp
from ..models import gpt as gpt_lib
from ..ops.cross_entropy import cross_entropy_loss


def _decay_mask(params) -> Any:
    """True where weight decay applies: kernels only — biases, norms and
    embeddings excluded (reference src/optim/param_grouping.py:15-60)."""
    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        name = path[-1] if path else ""
        in_norm = any(p in ("norm1", "norm2", "ln_0") for p in path)
        is_embedding = name in ("wte", "wpe")
        return name == "kernel" and not in_norm and not is_embedding

    return walk(params)


def make_schedule(kind: str, *, lr: float, warmup_steps: int,
                  total_steps: int, final_lr_fraction: float = 0.1):
    """Linear warmup then decay — the reference's scheduler configs
    (configs/scheduler/*.yaml):
      linear  — linear decay to final_lr_fraction*lr (linear-warmup.yaml,
                the OWT experiments' default)
      cosine  — cosine decay to final_lr_fraction*lr
                (cosine-warmup-timm.yaml / cosine-warmup.yaml)
      invsqrt — lr * sqrt(warmup/step) (invsqrt.yaml)
    """
    decay_steps = max(total_steps - warmup_steps, 1)
    if kind == "linear":
        decay = optax.linear_schedule(lr, lr * final_lr_fraction, decay_steps)
    elif kind == "cosine":
        decay = optax.cosine_decay_schedule(
            lr, decay_steps, alpha=final_lr_fraction)
    elif kind == "invsqrt":
        w = max(warmup_steps, 1)
        decay = lambda step: lr * jnp.sqrt(w / jnp.maximum(step + w, w))
    else:
        raise ValueError(f"unknown schedule {kind!r}")
    return optax.join_schedules([
        optax.linear_schedule(0.0, lr, warmup_steps), decay], [warmup_steps])


def make_optimizer(params, *, lr: float = 6e-4, weight_decay: float = 0.1,
                   warmup_steps: int = 1000, total_steps: int = 100_000,
                   b1: float = 0.9, b2: float = 0.95, eps: float = 1e-8,
                   grad_clip: float = 1.0,
                   final_lr_fraction: float = 0.1,
                   accum_steps: int = 1,
                   schedule: str = "linear"):
    """AdamW with warmup + decay; schedule as in make_schedule."""
    schedule = make_schedule(schedule, lr=lr, warmup_steps=warmup_steps,
                             total_steps=total_steps,
                             final_lr_fraction=final_lr_fraction)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay, mask=_decay_mask(params)),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_loss_fn(cfg, *, model: str = "backpack", use_flash: bool = True,
                 label_smoothing: float = 0.0, remat=False,
                 scan_unroll: int = 1, fused_ctx=None) -> Callable:
    """batch: {'input_ids': (b, s+1)} — the LM splits x=ids[:, :-1],
    y=ids[:, 1:] (the reference's chunked LM dataset contract,
    training/src/datamodules/datasets/lm_dataset.py:10-32)."""
    fwd = (bp.backpack_forward if model == "backpack"
           else functools.partial(gpt_lib.gpt_lm_forward))
    extra = {"fused_ctx": fused_ctx} if model == "backpack" else {}

    def loss_fn(params, batch, rng):
        ids = batch["input_ids"]
        x, y = ids[:, :-1], ids[:, 1:]
        out = fwd(params, cfg, x, train=True, rng=rng, use_flash=use_flash,
                  remat=remat, scan_unroll=scan_unroll, **extra)
        if cfg.moe_experts > 0:
            logits, moe_aux = out
            return (cross_entropy_loss(logits, y,
                                       label_smoothing=label_smoothing)
                    + cfg.moe_aux_weight * moe_aux)
        return cross_entropy_loss(out, y, label_smoothing=label_smoothing)

    return loss_fn


def make_train_step(cfg, tx, *, model: str = "backpack",
                    use_flash: bool = True, remat=False, scan_unroll: int = 1,
                    donate: bool = True, grad_zero2_mesh=None,
                    fused_ctx=None) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics); jit it with
    the desired shardings (see make_sharded_train_step).

    grad_zero2_mesh: when a Mesh is given, gradients are constrained to the
    ZeRO data-axis shardings before the optimizer update — ZeRO-2: XLA turns
    the DP gradient allreduce into a reduce-scatter, the moment update runs
    on 1/data_size of each tensor, and the updated params are all-gathered by
    the apply step (the pjit analogue of the reference's gradient-sharding
    DDP strategy, training/src/utils/ddp_zero2.py:21-128)."""
    loss_fn = make_loss_fn(cfg, model=model, use_flash=use_flash, remat=remat,
                           scan_unroll=scan_unroll, fused_ctx=fused_ctx)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        if grad_zero2_mesh is not None:
            # grad shapes are static at trace time: reuse the zero1 rule
            grads = jax.lax.with_sharding_constraint(
                grads, zero1_opt_shardings(grads, grad_zero2_mesh))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss, "grad_norm": gnorm,
                 "ppl": jnp.exp(loss)})

    return train_step


def zero1_opt_shardings(opt_state, mesh):
    """ZeRO-1: shard every optimizer-moment leaf over the 'data' axis on its
    first divisible dimension (the pjit analogue of the reference's apex
    DistributedFusedAdam optimizer-state sharding, utils/ddp_zero1.py:19-91
    — XLA inserts the reduce-scatter/all-gather the reference issues by
    hand)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_size = mesh.shape["data"]

    def spec_for(leaf):
        if not hasattr(leaf, "shape") or data_size <= 1:
            return NamedSharding(mesh, P())
        for axis, dim in enumerate(leaf.shape):
            if dim >= data_size and dim % data_size == 0:
                return NamedSharding(mesh,
                                     P(*(None,) * axis + ("data",)))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, opt_state)


def fsdp_param_shardings(params, cfg, mesh):
    """ZeRO-3/FSDP: extend each param's TP spec with 'data' on its first
    free divisible axis — params live sharded across the data axis and XLA
    inserts the per-layer all-gathers (forward/backward) and gradient
    reduce-scatters that hand-written FSDP implementations issue manually.
    Goes beyond the reference, whose deepest sharding is ZeRO-2
    (utils/ddp_zero2.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import param_shardings

    base = param_shardings(params, cfg, mesh)
    data_size = mesh.shape["data"]

    def widen(leaf, shard):
        spec = shard.spec
        if not hasattr(leaf, "shape") or data_size <= 1:
            return shard
        parts = list(spec) + [None] * (len(leaf.shape) - len(spec))
        for axis, dim in enumerate(leaf.shape):
            if (parts[axis] is None and dim >= data_size
                    and dim % data_size == 0):
                parts[axis] = "data"
                return NamedSharding(mesh, P(*parts))
        return shard

    return jax.tree.map(widen, params, base)


def make_sharded_train_step(cfg, tx, mesh, *, model: str = "backpack",
                            use_flash: bool = True, zero1: bool = False,
                            zero2: bool = False, zero3: bool = False,
                            remat=False, scan_unroll: int = 1):
    """jit the train step over the mesh: batch sharded on 'data', params TP-
    sharded per parallel/mesh.py rules; optimizer state sharded like params,
    or additionally over 'data' with zero1=True (ZeRO-1). zero2=True also
    shards the GRADIENTS over 'data' (reduce-scatter instead of all-reduce)
    before the optimizer — implies zero1. zero3=True shards the PARAMS
    themselves over 'data' (FSDP; implies zero1 — moments shard with their
    params)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import param_shardings

    zero1 = (zero1 or zero2) and not zero3
    step_fn = make_train_step(cfg, tx, model=model, use_flash=use_flash,
                              remat=remat, scan_unroll=scan_unroll,
                              grad_zero2_mesh=mesh if zero2 else None)
    batch_sharding = {"input_ids": NamedSharding(mesh, P("data", None))}

    def _shard_like_params(opt_shapes, p_shard):
        """Shardings for an optimizer state: param-structured subtrees (the
        Adam moments) get the param shardings, everything else replicates."""
        pstruct = jax.tree.structure(p_shard)
        rep = NamedSharding(mesh, P())

        def walk(node):
            try:
                if jax.tree.structure(node) == pstruct:
                    return p_shard
            except Exception:
                pass
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return type(node)(*[walk(x) for x in node])
            if isinstance(node, (list, tuple)):
                return type(node)(walk(x) for x in node)
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            return rep

        return walk(opt_shapes)

    def sharded_init(params):
        p_shard = (fsdp_param_shardings(params, cfg, mesh) if zero3
                   else param_shardings(params, cfg, mesh))
        params = jax.device_put(params, p_shard)
        if zero3:
            # ZeRO-3: moments shard exactly like their (FSDP-sharded) params
            shapes = jax.eval_shape(tx.init, params)
            opt_state = jax.jit(
                tx.init, out_shardings=_shard_like_params(shapes, p_shard)
            )(params)
            return TrainState(params=params, opt_state=opt_state,
                              step=jnp.zeros((), jnp.int32))
        # optimizer moments inherit param shardings via propagation from the
        # committed param arrays (XLA keeps them aligned with the params);
        # zero1 overrides them with data-axis shards.
        if zero1:
            shapes = jax.eval_shape(tx.init, params)
            opt_state = jax.jit(
                tx.init, out_shardings=zero1_opt_shardings(shapes, mesh)
            )(params)
        else:
            opt_state = jax.jit(tx.init)(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    jit_step = jax.jit(step_fn, in_shardings=(None, batch_sharding, None),
                       donate_argnums=(0,))
    return jit_step, sharded_init
