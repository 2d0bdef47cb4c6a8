"""Context-parallel Backpack training: the whole forward sequence-sharded.

Builds on parallel/ring_attention.py (which the reference has no analogue
of — SURVEY.md §2.7 "CP: none"): every per-token computation (embeddings,
LayerNorms, MLPs, content network, lm_head, cross-entropy) runs on the local
sequence chunk, and BOTH attention-shaped contractions ride the K/V ppermute
ring:

  * the GPT stack's self-attention (q, k, v from the local chunk), and
  * the Backpack contextualization itself — alpha is attention whose values
    are the d-wide sense vectors (models/backpack.py combine), so the same
    ring primitive computes sum_k softmax_j(q_k . k_j) @ content_j with
    nv "heads" and per-head outputs summed.

Max trainable context therefore scales with mesh.shape['seq'] instead of
one chip's HBM — the CP counterpart of the reference's single-GPU 64K
FlashAttention claim (flash_attn_README.md:93).

Loss and gradients are exactly the single-device backpack_forward loss
(tests/parallel/test_cp_train.py) — INCLUDING under dropout: the step rng
is replicated and every site derives its key by the single-device chain
(backpack_forward -> gpt_forward -> _block), while masks come from the
shared global-position counter hash (ops/flash_attention
._dropout_keep_positions) — attention sites hash GLOBAL (q, k, batch*head)
coordinates inside the ring, per-token sites (embedding / residual /
content network) hash the chunk's element positions in the unsharded
(B, s, d) tensor (norms.dropout idx=). CP training is therefore
bit-identical to single-device under all dropout. Rotary embeddings are
supported
via per-chunk absolute offsets; attn_dwconv (a cross-token conv) is not.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import BackpackConfig
from ..models import backpack as bp
from ..models import gpt as gpt_lib
from ..ops import dense, norms, rotary
from ..ops.cross_entropy import cross_entropy_loss
from .ring_attention import (ring_attention_local,
                             ring_flash_attention_local,
                             zigzag_ring_attention_local,
                             zigzag_ring_attention_local_einsum)

Params = Any


def _make_local_loss(cfg, *, label_smoothing: float = 0.0,
                     attn_impl: str = "einsum", train: bool = False,
                     layout: str = "natural", model: str = "backpack"):
    assert not cfg.attn_dwconv, "attn_dwconv crosses chunk boundaries"
    use_attn_drop = train and cfg.attn_pdrop > 0.0
    eps = cfg.layer_norm_epsilon
    zigzag = layout == "zigzag"
    if layout not in ("natural", "zigzag"):
        raise ValueError(f"unknown layout: {layout!r}")
    # GPT self-attention can ride the Pallas ring (equal q/k/v widths);
    # the contextualization stage keeps the einsum ring (dnv-wide q/k
    # against d-wide sense values — see ring_flash_attention_local).
    # layout="zigzag" swaps in the load-balanced variants (each device owns
    # chunks i and 2S-1-i, so the causal mask density — the useful MXU
    # work — is equal on every device at every ring step).
    if attn_impl == "flash":
        impl = (zigzag_ring_attention_local if zigzag
                else ring_flash_attention_local)
        if use_attn_drop:
            self_attn = lambda q, k, v, sc, arng, boff: impl(
                q, k, v, axis="seq", softmax_scale=sc,
                dropout_p=cfg.attn_pdrop, dropout_rng=arng, bh_offset=boff)
        else:
            self_attn = lambda q, k, v, sc, arng, boff: impl(
                q, k, v, axis="seq", softmax_scale=sc)
    elif attn_impl == "einsum":
        eimpl = (zigzag_ring_attention_local_einsum if zigzag
                 else ring_attention_local)
        if use_attn_drop:
            # einsum blocks hash the same global positions as the Pallas
            # kernel (_dropout_keep_positions), so the masks — and hence the
            # CP loss/grads — match the single-device flash model exactly
            self_attn = lambda q, k, v, sc, arng, boff: eimpl(
                q, k, v, axis="seq", softmax_scale=sc,
                dropout_p=cfg.attn_pdrop, dropout_rng=arng,
                bh_offset=boff)
        else:
            self_attn = lambda q, k, v, sc, arng, boff: eimpl(
                q, k, v, axis="seq", softmax_scale=sc)
    else:
        raise ValueError(f"unknown attn_impl: {attn_impl!r}")
    cimpl = (zigzag_ring_attention_local_einsum if zigzag
             else ring_attention_local)
    ctx_attn = lambda q, k, v, sc: cimpl(q, k, v, axis="seq",
                                         softmax_scale=sc)

    def local_loss(params, ids, rng=None):
        i = lax.axis_index("seq")
        x, y = ids[:, :-1], ids[:, 1:]
        b, s = x.shape
        Sx = lax.axis_size("seq")
        if zigzag:
            c2 = s // (2 * Sx)
            c = 2 * c2
            off_a = i * c2
            off_b = (2 * Sx - 1 - i) * c2
            x_loc = jnp.concatenate(
                [lax.dynamic_slice(x, (0, off_a), (b, c2)),
                 lax.dynamic_slice(x, (0, off_b), (b, c2))], axis=1)
            y_loc = jnp.concatenate(
                [lax.dynamic_slice(y, (0, off_a), (b, c2)),
                 lax.dynamic_slice(y, (0, off_b), (b, c2))], axis=1)
            pos = jnp.concatenate([off_a + jnp.arange(c2),
                                   off_b + jnp.arange(c2)])
        else:
            c = s // Sx
            off = i * c
            x_loc = lax.dynamic_slice(x, (0, off), (b, c))
            y_loc = lax.dynamic_slice(y, (0, off), (b, c))
            pos = off + jnp.arange(c)

        boff = lax.axis_index("data") * b
        if train and rng is not None:
            # SINGLE-DEVICE rng derivation chain, REPLICATED across shards
            # (backpack_forward -> gpt_forward -> _block split(.,3)): every
            # dropout mask — attention (in-ring counter hash with global
            # q/k positions + bh_offset) and per-token (counter hash over
            # `gidx`, the chunk's element positions in the unsharded
            # (B, s, d) tensor) — is bit-identical to the unsharded model.
            r_gpt = (jax.random.split(rng)[0] if model == "backpack"
                     else rng)
            r_content = (jax.random.split(rng)[1] if model == "backpack"
                         else None)
            r_emb, r_layers = jax.random.split(r_gpt)
            layer_rngs = jax.random.split(r_layers, cfg.n_layer)
            # gidx is the element's flat position in the unsharded
            # (B, s, n_embd) tensor, in int32. Past 2**31 the hash inputs
            # would wrap and distant elements would share dropout masks,
            # so refuse rather than silently correlate.
            n_global = b * lax.axis_size("data") * s * cfg.n_embd
            if n_global >= 2**31:
                raise ValueError(
                    "CP per-token dropout indexes the global (B, S, n_embd) "
                    f"tensor in int32; B*S*n_embd = {n_global} >= 2**31 "
                    "would wrap. Reduce batch/seq or disable per-token "
                    "dropout (embd_pdrop=resid_pdrop=0).")
            gidx = (((jnp.arange(b, dtype=jnp.int32)[:, None] + boff) * s
                     + pos.astype(jnp.int32)[None, :])[:, :, None]
                    * cfg.n_embd + jnp.arange(cfg.n_embd, dtype=jnp.int32))
        else:
            r_emb = r_content = layer_rngs = gidx = None

        gp = params["gpt"] if model == "backpack" else params
        hidden = gpt_lib.embed(gp, cfg, x_loc, pos[None])
        hidden, residual = norms.dropout_add_layer_norm(
            hidden, None, gp["ln_0"]["weight"], gp["ln_0"]["bias"],
            cfg.embd_pdrop if train else 0.0, eps, rng=r_emb,
            deterministic=not train, dropout_idx=gidx)
        scales = gpt_lib._softmax_scales(cfg)

        def block(carry, xs):
            h, r = carry
            arng = None
            if layer_rngs is not None:
                lp, scale, lrng = xs
                r_attn, r1, r2 = jax.random.split(lrng, 3)
                if use_attn_drop:
                    arng = r_attn
            else:
                (lp, scale), r1, r2 = xs, None, None
            qkv = dense.linear(h, lp["Wqkv"]).reshape(
                b, c, 3, cfg.n_head, cfg.head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if cfg.rotary_emb_dim > 0:
                if zigzag:
                    # the two sub-chunks sit at different absolute offsets
                    qa, ka = rotary.apply_rotary_qk(
                        q[:, :c2], k[:, :c2], cfg.rotary_emb_dim,
                        seqlen_offset=off_a,
                        scale_base=cfg.rotary_emb_scale_base)
                    qb, kb = rotary.apply_rotary_qk(
                        q[:, c2:], k[:, c2:], cfg.rotary_emb_dim,
                        seqlen_offset=off_b,
                        scale_base=cfg.rotary_emb_scale_base)
                    q = jnp.concatenate([qa, qb], axis=1)
                    k = jnp.concatenate([ka, kb], axis=1)
                else:
                    q, k = rotary.apply_rotary_qk(
                        q, k, cfg.rotary_emb_dim, seqlen_offset=off,
                        scale_base=cfg.rotary_emb_scale_base)
            ctx = self_attn(q, k, v, scale, arng, boff)
            mixer_out = dense.linear(ctx.reshape(b, c, cfg.n_embd),
                                     lp["out_proj"])
            h, r = norms.dropout_add_layer_norm(
                mixer_out, r, lp["norm1"]["weight"], lp["norm1"]["bias"],
                cfg.resid_pdrop if train else 0.0, eps, rng=r1,
                deterministic=not train, dropout_idx=gidx)
            if "moe" in lp:
                from ..ops import moe as moe_lib
                # routing is per-token, so MoE is CP-local; capacity (and
                # hence train-mode drops) applies per sequence CHUNK —
                # drop-free when capacity_factor >= moe_experts
                mlp_out, aux = moe_lib.switch_moe(
                    h, lp["moe"],
                    capacity_factor=(cfg.moe_capacity_factor if train
                                     else float(cfg.moe_experts)),
                    activation=cfg.activation)
            else:
                mlp_out = dense.mlp(h, lp["mlp"], cfg.activation)
                aux = jnp.zeros((), jnp.float32)
            h, r = norms.dropout_add_layer_norm(
                mlp_out, r, lp["norm2"]["weight"], lp["norm2"]["bias"],
                cfg.resid_pdrop if train else 0.0, eps, rng=r2,
                deterministic=not train, dropout_idx=gidx)
            return (h, r), aux

        if layer_rngs is not None:
            xs = (gp["layers"], scales, layer_rngs)
        else:
            xs = (gp["layers"], scales)
        (contextl, _), auxs = lax.scan(block, (hidden, residual), xs)

        if model == "gpt":
            logits = gpt_lib.lm_logits(gp, cfg, contextl)
        else:
            # Backpack tail: contextualization = ring attention with the
            # d-wide sense vectors as values, per-sense outputs summed.
            content = bp.content_forward(params, cfg, x_loc, train=train,
                                         rng=r_content,
                                         dropout_idx=gidx)       # (b,c,nv,d)
            q_ctx, k_ctx = bp.context_qk(params, cfg, contextl)
            per_sense = ctx_attn(q_ctx, k_ctx, content,
                                 cfg.sense_head_dim ** -0.5)  # (b, c, nv, d)
            outputs = per_sense.astype(jnp.float32).sum(axis=2).astype(
                contextl.dtype)
            logits = gpt_lib.lm_logits(gp, cfg, outputs)
        loss = cross_entropy_loss(logits, y_loc,
                                  label_smoothing=label_smoothing)
        if cfg.moe_experts > 0:
            # per-shard Switch balance loss, layer- then shard-averaged
            loss = loss + cfg.moe_aux_weight * jnp.mean(auxs)
        # equal chunk sizes: global token-mean = mean of chunk means
        return lax.pmean(lax.pmean(loss, "seq"), "data")

    return local_loss


def make_cp_loss_fn(cfg, mesh: Mesh, *,
                    label_smoothing: float = 0.0,
                    attn_impl: str = "einsum", train: bool = False,
                    layout: str = "natural", model: str = "backpack"):
    """loss(params, ids (B, s+1)[, rng]) -> scalar with the sequence sharded
    over mesh axis 'seq' and the batch over 'data'; params replicated.
    Differentiable end-to-end (ring transposes are the reverse ring);
    s must divide by mesh.shape['seq'] (by 2x under layout='zigzag').
    train=True enables dropout and the loss takes a step rng as its third
    argument (replicated; masks regenerate from the single-device rng chain
    + global-position counter hash, bit-identical to unsharded training).
    layout='zigzag' uses the load-balanced chunk assignment
    (chunks i and 2S-1-i per device) for equal causal work per ring step."""
    body = _make_local_loss(cfg, label_smoothing=label_smoothing,
                            attn_impl=attn_impl, train=train,
                            layout=layout, model=model)

    def loss(params, ids, rng=None):
        pspecs = jax.tree.map(lambda _: P(), params)
        if train:
            fn = jax.shard_map(body, mesh=mesh,
                               in_specs=(pspecs, P("data", None), P()),
                               out_specs=P(), check_vma=False)
            return fn(params, ids, rng)
        fn = jax.shard_map(lambda p, x: body(p, x), mesh=mesh,
                           in_specs=(pspecs, P("data", None)),
                           out_specs=P(), check_vma=False)
        return fn(params, ids)

    return loss


def make_cp_train_step(cfg, tx, mesh: Mesh, *,
                       attn_impl: str = "einsum", train: bool = False,
                       layout: str = "natural", model: str = "backpack"):
    """Context-parallel train step (fwd + bwd + optimizer), jitted over
    `mesh` ('data', 'seq'). step(params, opt_state, ids[, rng]) ->
    (params, opt_state, loss). train=True runs the dropout sites with the
    given step rng."""
    loss_fn = make_cp_loss_fn(cfg, mesh, attn_impl=attn_impl,
                              train=train, layout=layout, model=model)

    if train:
        def step(params, opt_state, ids, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, ids, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
    else:
        def step(params, opt_state, ids):
            loss, grads = jax.value_and_grad(loss_fn)(params, ids)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_cp_sharded_train_step(cfg, tx, mesh: Mesh, *,
                               attn_impl: str = "flash",
                               layout: str = "natural",
                               label_smoothing: float = 0.0,
                               model: str = "backpack"):
    """Training-CLI-shaped CP step: step(TrainState, batch, rng) ->
    (TrainState, {'loss', 'grad_norm'}), jitted over a ('data', 'seq') mesh
    with ids sharded on 'data' and params replicated. Dropout runs in train
    mode with masks bit-identical to single-device training (global-position
    counter hash at every site — see the module docstring). The sequence
    axis must divide by mesh.shape['seq'] (2x under layout='zigzag')."""
    from jax.sharding import NamedSharding

    from ..training.train import TrainState

    loss_fn = make_cp_loss_fn(cfg, mesh, label_smoothing=label_smoothing,
                              attn_impl=attn_impl, layout=layout, train=True,
                              model=model)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch["input_ids"], rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss, "grad_norm": gnorm})

    rep = NamedSharding(mesh, P())
    batch_sharding = {"input_ids": NamedSharding(mesh, P("data", None))}
    jit_step = jax.jit(step, donate_argnums=(0,),
                       in_shardings=(rep, batch_sharding, rep))

    def sharded_init(params):
        def init(params):
            return TrainState(params, tx.init(params),
                              jnp.zeros((), jnp.int32))
        return jax.jit(init, out_shardings=rep, donate_argnums=(0,))(params)

    return jit_step, sharded_init
