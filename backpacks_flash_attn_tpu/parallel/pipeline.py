"""Pipeline-parallel (GPipe) Backpack training over a ('data', 'stage') mesh.

The reference explicitly skips pipeline parallelism (its README's scaling
table is DP/TP only — training/flash_attn_README.md:22-27); this module goes
beyond it: the GPT contextualization stack (the deep part of a Backpack) is
partitioned into `n_stages` layer groups, each held by one 'stage'-axis mesh
slot, and microbatches stream through a ppermute ring in a classic GPipe
schedule — the TPU-native analogue of send/recv pipelining:

  step t:  stage s runs microbatch j = t - s   (0 <= j < m valid, else bubble)
  transport: each stage's (hidden, residual) output ppermutes to stage s+1
  stage 0 injects embed(microbatch t); after m + S - 1 steps the last stage
  has produced every microbatch's contextual hidden states.

The Backpack tail (content network, fused contextualization combine, tied
lm_head, cross-entropy) is computed from the pipeline output and masked to
the LAST stage (the bubble slots of earlier stages run it into a zero mask —
a correctness-first schedule; an interleaved production schedule would
overlap it with the next wave). Everything lives inside ONE shard_map, so
jax.grad differentiates straight through the ppermute rings (their transpose
is the reverse ring) and the optimizer update runs on 'stage'-sharded layer
gradients.

Layout: gpt.layers leaves are reshaped (n_layer, ...) -> (S, n_layer/S, ...)
and sharded P('stage') on axis 0 (pp_params / pp_param_specs); all other
parameters are replicated. Batch shards over 'data' and splits into
`n_micro` microbatches locally.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BackpackConfig
from ..models import backpack as bp
from ..models import gpt as gpt_lib
from ..ops import norms
from ..ops.cross_entropy import cross_entropy_loss

Params = Any


# ------------------------------------------------------------ param layout

def pp_params(params: Params, cfg: BackpackConfig, n_stages: int) -> Params:
    """Reshape gpt.layers leaves (L, ...) -> (S, L/S, ...) for stage sharding
    (lossless; inverse unstage_params)."""
    assert cfg.n_layer % n_stages == 0, (cfg.n_layer, n_stages)
    out = dict(params)
    out["gpt"] = dict(params["gpt"])
    out["gpt"]["layers"] = jax.tree.map(
        lambda x: x.reshape((n_stages, cfg.n_layer // n_stages) + x.shape[1:]),
        params["gpt"]["layers"])
    return out


def unstage_params(params: Params, cfg: BackpackConfig) -> Params:
    out = dict(params)
    out["gpt"] = dict(params["gpt"])
    out["gpt"]["layers"] = jax.tree.map(
        lambda x: x.reshape((cfg.n_layer,) + x.shape[2:]),
        params["gpt"]["layers"])
    return out


def pp_param_specs(params: Params) -> Params:
    """PartitionSpecs for pp_params output: staged layers on 'stage', rest
    replicated."""
    specs = jax.tree.map(lambda _: P(), params)
    specs["gpt"]["layers"] = jax.tree.map(lambda _: P("stage"),
                                          params["gpt"]["layers"])
    return specs


# ------------------------------------------------------------ pipeline loss

def _make_local_loss(cfg: BackpackConfig, n_stages: int, n_micro: int, *,
                     use_flash: bool, label_smoothing: float = 0.0):
    """Per-device loss body (runs inside shard_map over ('data','stage'))."""
    S, m = n_stages, n_micro
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local_loss(params, ids):
        s_idx = lax.axis_index("stage")
        x_ids, y_ids = ids[:, :-1], ids[:, 1:]
        b_loc, s = x_ids.shape
        assert b_loc % m == 0, (b_loc, m)
        mbs = b_loc // m
        x_mb = x_ids.reshape(m, mbs, s)
        gp = params["gpt"]
        layers_loc = jax.tree.map(lambda x: x[0], gp["layers"])  # (L/S, ...)
        scales = gpt_lib._softmax_scales(cfg).reshape(S, -1)
        scales_loc = lax.dynamic_index_in_dim(scales, s_idx, 0,
                                              keepdims=False)
        dtype = gp["wte"].dtype

        def run_stage(hid, res):
            def body(c, xs):
                h, r = c
                lp, sc = xs
                h, r, _aux = gpt_lib._block(h, r, lp, sc, cfg, train=False,
                                            rngs=None, use_flash=use_flash,
                                            key_padding_mask=None)
                return (h, r), None
            (h, r), _ = lax.scan(body, (hid, res), (layers_loc, scales_loc))
            return h, r

        def embed_mb(t):
            j = jnp.clip(t, 0, m - 1)
            ids_t = lax.dynamic_index_in_dim(x_mb, j, 0, keepdims=False)
            emb = gpt_lib.embed(gp, cfg, ids_t, None)
            return norms.dropout_add_layer_norm(
                emb, None, gp["ln_0"]["weight"], gp["ln_0"]["bias"],
                0.0, cfg.layer_norm_epsilon)

        def step(carry, t):
            h_prev, r_prev = carry
            h_in = lax.ppermute(h_prev, "stage", perm)
            r_in = lax.ppermute(r_prev, "stage", perm)
            h0, r0 = embed_mb(t)
            is0 = s_idx == 0
            h_in = jnp.where(is0, h0, h_in)
            r_in = jnp.where(is0, r0, r_in)
            h_out, r_out = run_stage(h_in, r_in)
            return (h_out, r_out), h_out

        zero = (jnp.zeros((mbs, s, cfg.n_embd), dtype),
                jnp.zeros((mbs, s, cfg.n_embd), jnp.float32))
        _, ys = lax.scan(step, zero, jnp.arange(m + S - 1))
        # last stage's outputs: microbatch j completed at step j + S - 1
        contextl = ys[S - 1:].reshape(b_loc, s, cfg.n_embd)

        # Backpack tail from the pipeline output (backpack_forward's combine:
        # models/backpack.py). Masked to the last stage; earlier stages'
        # copies are bubble work feeding a zero mask.
        content = bp.content_forward(params, cfg, x_ids)
        q, ctx_k = bp.context_qk(params, cfg, contextl)
        scale = cfg.sense_head_dim ** -0.5
        if use_flash:
            from ..ops.backpack_kernels import fused_contextualization
            outputs = fused_contextualization(q, ctx_k, content, scale
                                              ).astype(contextl.dtype)
        else:
            a = bp.contextualization(params, cfg, contextl)
            outputs = jnp.einsum("bkts,bskd->btd", a, content,
                                 preferred_element_type=jnp.float32
                                 ).astype(contextl.dtype)
        logits = gpt_lib.lm_logits(gp, cfg, outputs)
        loss = cross_entropy_loss(logits, y_ids,
                                  label_smoothing=label_smoothing)
        loss = jnp.where(s_idx == S - 1, loss, 0.0)
        loss = lax.psum(loss, "stage")
        return lax.pmean(loss, "data")

    return local_loss


def make_pp_loss_fn(cfg: BackpackConfig, mesh: Mesh, *, n_micro: int = 2,
                    use_flash: bool = True, label_smoothing: float = 0.0):
    """loss(pp_params, ids (B, s+1)) -> scalar, with the GPT stack pipelined
    over mesh axis 'stage' and the batch sharded over 'data'. Differentiable:
    jax.grad flows back through the ppermute rings."""
    n_stages = mesh.shape["stage"]
    body = _make_local_loss(cfg, n_stages, n_micro, use_flash=use_flash,
                            label_smoothing=label_smoothing)

    def loss(params, ids):
        pspecs = pp_param_specs(params)
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(pspecs, P("data", None)),
                           out_specs=P(), check_vma=False)
        return fn(params, ids)

    return loss


def make_pp_train_step(cfg: BackpackConfig, tx, mesh: Mesh, *,
                       n_micro: int = 2, use_flash: bool = True):
    """Full pipeline-parallel train step (fwd + bwd + optimizer), jitted over
    `mesh`. Returns (step, prepare):

      prepare(params) -> (pp_params sharded, opt_state) — device_puts the
        staged layout with P('stage') layer shardings
      step(pp_params, opt_state, ids) -> (pp_params, opt_state, loss)
    """
    loss_fn = make_pp_loss_fn(cfg, mesh, n_micro=n_micro, use_flash=use_flash)

    def step(params, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jit_step = jax.jit(step, donate_argnums=(0, 1))

    def prepare(params):
        staged = pp_params(params, cfg, mesh.shape["stage"])
        specs = pp_param_specs(staged)
        staged = jax.device_put(
            staged, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                 is_leaf=lambda x: isinstance(x, P)))
        opt_state = jax.jit(tx.init)(staged)
        return staged, opt_state

    return jit_step, prepare
