"""Backpack language model (ACL 2023), TPU-native.

Re-design of the reference's BackpackLMHeadModel
(reference: training/src/models/backpack.py:94-351). Core equation:

    o_t = sum_{k=1..nv} sum_{j<=t} alpha[k, t, j] * C(x_j)[k],
    logits_t = E @ o_t  (E = tied word embedding)

Components:
  * contextualization network: a full GPT stack (backpack.py:291,303) — models/gpt.py
  * ContextSelfAttn: alpha in (b, nv, s, s) from a d->2d projection reshaped to
    nv heads of dim d/nv, causal softmax (backpack.py:94-122)
  * sense (content) network: word embeddings WITHOUT positions (backpack.py:258),
    one MLP-only "no-mix" block (backpack.py:130-143), then a final MLP
    expanding d -> nv*d (backpack.py:53-57,240-242). Purely per-token, so sense
    vectors are a function of the token id alone — sense_table() materializes
    the equivalent (vocab, nv, d) lookup table.
  * decode: the reference re-runs the full forward over the whole prefix every
    step (training/src/utils/generation.py — O(t^2) per token). Here decode is
    incremental: GPT KV cache + a cached contextualization K + cached per-token
    senses, computing only the new alpha row each step. Token-for-token parity
    with the full recompute is enforced by tests/models/test_backpack.py.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import BackpackConfig
from ..ops import dense, norms
from ..ops.attention import MASK_VALUE
from . import gpt as gpt_lib

Params = Dict[str, Any]


# ---------------------------------------------------------------- init

def init_backpack(cfg: BackpackConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    kg, kc, kb, kf = jax.random.split(key, 4)
    d = cfg.n_embd
    std = cfg.initializer_range
    # The reference applies the full-model _init_weights last
    # (backpack.py:333-334), so residual-out projections use the GPT depth.
    out_std = std / (2 * cfg.n_layer) ** 0.5
    inner = d if cfg.shrink_final_inner else cfg.inner_dim

    def init_nomix_block(k):
        return {
            "norm1": norms.init_layer_norm(d, dtype),
            "mlp": dense.init_mlp(k, d, cfg.inner_dim, std=std, out_std=out_std,
                                  dtype=dtype),
            "norm2": norms.init_layer_norm(d, dtype),
        }

    block_keys = jax.random.split(kb, cfg.content_n_layer)
    blocks = [init_nomix_block(k) for k in block_keys]
    return {
        "gpt": gpt_lib.init_gpt(cfg, kg, dtype),
        "ctx_attn": {"Wqkv": dense.init_linear(kc, d, 2 * d, std=std, dtype=dtype)},
        "content": {
            "ln_0": norms.init_layer_norm(d, dtype),
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
            "final_mlp": dense.init_mlp(kf, d, inner, cfg.num_senses * d,
                                        std=std, out_std=out_std, dtype=dtype),
        },
    }


# ---------------------------------------------------------------- pieces

def context_qk(params: Params, cfg: BackpackConfig,
               hidden: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Project contextualization hidden states to the nv-headed q, k
    (reference: ContextSelfAttn, backpack.py:107-117).
    Returns q, k each (b, s, nv, d/nv)."""
    b, s, d = hidden.shape
    qk = dense.linear(hidden, params["ctx_attn"]["Wqkv"])
    qk = qk.reshape(b, s, 2, cfg.num_senses, cfg.sense_head_dim)
    return qk[:, :, 0], qk[:, :, 1]


def contextualization(params: Params, cfg: BackpackConfig,
                      hidden: jax.Array) -> jax.Array:
    """alpha = causal softmax over nv-headed scores, materialized (b, nv, s, s)
    (reference: backpack.py:117-122). Training/prefill forwards use the fused
    Pallas kernel (ops/backpack_kernels.fused_contextualization) instead, which
    never materializes alpha; this einsum form remains the oracle and the
    return_parts path."""
    q, k = context_qk(params, cfg, hidden)
    scale = cfg.sense_head_dim ** -0.5
    scores = jnp.einsum("bthd,bshd->bhts", q, k * scale,
                        preferred_element_type=jnp.float32)
    s = scores.shape[-1]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    scores = scores + jnp.where(kpos <= qpos, 0.0, MASK_VALUE)[None, None]
    return jax.nn.softmax(scores, axis=-1).astype(hidden.dtype)


def content_forward(params: Params, cfg: BackpackConfig, input_ids: jax.Array,
                    *, train: bool = False,
                    rng: Optional[jax.Array] = None,
                    embedded: Optional[jax.Array] = None,
                    scan_unroll: int = 1,
                    dropout_idx: Optional[jax.Array] = None) -> jax.Array:
    """Sense network C(x): (b, s) -> (b, s, nv, d). Strictly per-token — no
    position embeddings, no mixing (reference: backpack.py:251-276).

    embedded: optional pre-gathered wte rows (b, s, d) — the TP decode path
    (parallel/tp_decode.py) psums its vocab-sharded embedding once and reuses
    it here instead of re-gathering.

    dropout_idx: optional GLOBAL flat positions of this chunk's elements in
    the unsharded (B, S, d) tensor — sharded callers (parallel/cp_train.py)
    pass it so every dropout mask is bit-identical to single-device."""
    b, s = input_ids.shape
    cp = params["content"]
    if "table" in cp:
        # Quantized precomputed sense table: a pure gather replaces the MLP
        # (valid by the per-token property; see sense_table()). Layout:
        # q (V, nv, d[/2]) int8; scale (V, nv, 1) per-token-per-sense, or
        # (V, nv, d/g) channel-grouped (INT4 quality, models/quantized.py).
        from ..ops import quant
        t = cp["table"]
        rows = jnp.take(t.q, input_ids, axis=0)
        if t.bits == 4:
            rows = quant.unpack_int4_last(rows)
        scales = jnp.take(t.scale, input_ids, axis=0)
        d = rows.shape[-1]
        if scales.shape[-1] not in (1, d):
            scales = jnp.repeat(scales, d // scales.shape[-1], axis=-1)
        return (rows.astype(jnp.float32) * scales).astype(jnp.bfloat16)
    hidden = (embedded if embedded is not None
              else gpt_lib.take_embedding(params["gpt"]["wte"], input_ids))
    n_blocks = jax.tree.leaves(cp["blocks"])[0].shape[0]
    if rng is not None:
        r_emb, r_rest = jax.random.split(rng)
        # independent masks per dropout site per block (the GPT stack splits
        # its rngs the same way, gpt._block)
        blk_rngs = jax.random.split(r_rest, (n_blocks, 2))
    else:
        r_emb, blk_rngs = None, None
    hidden, residual = norms.dropout_add_layer_norm(
        hidden, None, cp["ln_0"]["weight"], cp["ln_0"]["bias"],
        cfg.embd_pdrop, cfg.layer_norm_epsilon, rng=r_emb,
        deterministic=not train, dropout_idx=dropout_idx)

    def scan_body(carry, xs):
        hidden, residual = carry
        if blk_rngs is not None:
            blk, rngs = xs
            r1, r2 = rngs[0], rngs[1]
        else:
            blk, r1, r2 = xs, None, None
        # No-mix block: the Identity mixer still feeds `hidden` into the
        # residual stream (reference Block.forward with mixer=Identity,
        # modules/block.py:70-106 + backpack.py:125-135).
        hidden, residual = norms.dropout_add_layer_norm(
            hidden, residual, blk["norm1"]["weight"], blk["norm1"]["bias"],
            cfg.resid_pdrop, cfg.layer_norm_epsilon, rng=r1,
            deterministic=not train, dropout_idx=dropout_idx)
        mlp_out = dense.mlp(hidden, blk["mlp"], cfg.activation)
        hidden, residual = norms.dropout_add_layer_norm(
            mlp_out, residual, blk["norm2"]["weight"], blk["norm2"]["bias"],
            cfg.resid_pdrop, cfg.layer_norm_epsilon, rng=r2,
            deterministic=not train, dropout_idx=dropout_idx)
        return (hidden, residual), None

    xs = (cp["blocks"], blk_rngs) if blk_rngs is not None else cp["blocks"]
    (hidden, _), _ = jax.lax.scan(scan_body, (hidden, residual), xs,
                                  unroll=scan_unroll)
    senses = dense.mlp(hidden, cp["final_mlp"], cfg.activation)
    return senses.reshape(b, s, cfg.num_senses, cfg.n_embd)


def sense_table(params: Params, cfg: BackpackConfig,
                chunk: int = 4096) -> jax.Array:
    """Materialize the (vocab, nv, d) sense lookup table. Valid because the
    content network is position- and context-independent (the property the
    reference exploits in modulate_generate.py:66-71, visualize_vocab.py:135)."""
    v = cfg.padded_vocab_size
    ids = jnp.arange(v)

    def one_chunk(c):
        return content_forward(params, cfg, c[None, :])[0]

    n_chunks = -(-v // chunk)
    pad = n_chunks * chunk - v
    ids = jnp.pad(ids, (0, pad))
    out = jax.lax.map(one_chunk, ids.reshape(n_chunks, chunk))
    return out.reshape(n_chunks * chunk, cfg.num_senses, cfg.n_embd)[:v]


# ---------------------------------------------------------------- forward

def apply_sense_edit(content: jax.Array, input_ids: jax.Array,
                     sense_edit: Tuple[jax.Array, jax.Array]) -> jax.Array:
    """Replace sense vectors of edited tokens: content (b, s, nv, d),
    sense_edit = (edited_ids (m,), edited_senses (m, nv, d)). Vectorized form
    of the reference's per-position dict loop (intervened_models.py:175-181)."""
    edited_ids, edited_senses = sense_edit
    match = input_ids[..., None] == edited_ids[None, None, :]   # (b, s, m)
    hit = match.any(-1)
    idx = match.argmax(-1)
    repl = jnp.take(edited_senses, idx, axis=0)                 # (b, s, nv, d)
    return jnp.where(hit[..., None, None], repl.astype(content.dtype), content)


def backpack_forward(params: Params, cfg: BackpackConfig, input_ids: jax.Array,
                     *, train: bool = False, rng: Optional[jax.Array] = None,
                     use_flash: bool = True,
                     sense_weights: Optional[jax.Array] = None,
                     sense_edit: Optional[Tuple[jax.Array, jax.Array]] = None,
                     return_parts: bool = False, remat=False,
                     scan_unroll: int = 1,
                     fused_ctx: Optional[bool] = None):
    """Training-shape forward -> logits (b, s, vocab)
    (reference: BackpackLMHeadModel.forward, backpack.py:297-351).

    sense_weights: optional (b, s, nv) or (nv,) multiplicative reweighting of
    sense vectors — the hook for the intervention API (models/interventions.py).
    sense_edit: optional (edited_ids (m,), edited_senses (m, nv, d)) sense
    replacement (reference ReplacedWordLMHeadModel, intervened_models.py:168).
    return_parts: also return dict with alpha / content / contextual hidden for
    the control & visualization machinery (reference §2.4).
    remat (False / True / "dots", see gpt.remat_wrap) rematerializes GPT
    blocks AND the (b, nv, s, s) alpha tensor in the backward pass — alpha
    is the dominant training activation (0.5GB at batch 32 for
    backpack-small) and is cheap to recompute. scan_unroll unrolls the
    layer scans (see gpt.gpt_forward). fused_ctx overrides whether the
    combine uses the fused Pallas kernel (default: follows use_flash) —
    the A/B knob for bench_train.py's einsum-alpha baseline.
    """
    r_gpt, r_content = (jax.random.split(rng) if rng is not None else (None, None))
    contextl = gpt_lib.gpt_forward(params["gpt"], cfg, input_ids, train=train,
                                   rng=r_gpt, use_flash=use_flash, remat=remat,
                                   scan_unroll=scan_unroll)
    moe_aux = None
    if cfg.moe_experts > 0:
        # Switch-MoE GPT stack: forward also yields the balance loss, which
        # this function then returns alongside the logits
        contextl, moe_aux = contextl
    content = content_forward(params, cfg, input_ids, train=train,
                              rng=r_content,
                              scan_unroll=scan_unroll)        # (b, s, nv, d)
    if sense_edit is not None:
        content = apply_sense_edit(content, input_ids, sense_edit)
    if sense_weights is not None:
        if sense_weights.ndim == 1:
            content = content * sense_weights[None, None, :, None].astype(content.dtype)
        else:
            content = content * sense_weights[..., None].astype(content.dtype)

    # out[b,t,d] = sum_k alpha[b,k,t,j] content[b,j,k,d]  (backpack.py:313)
    if fused_ctx is None:
        # Measured on v5e (bench_results/train_r2.json, B=32 S=512
        # backpack-small): the r2 fused TRAINING kernel lost to the einsum
        # path 64.1k vs 67.8k tok/s — it saved a per-head o_heads residual
        # (b, nv, s, d), BIGGER than the alpha (b, nv, s, s) it avoids
        # whenever d > s. The r3 kernel dropped that residual (the backward
        # recomputes the softmax-jacobian delta from q/k/content/lse);
        # training stays on einsum-alpha until the re-run A/B
        # (bench_train.py none:1 vs none:1:fused) flips the measured
        # result. Inference keeps the fused kernel, whose in-kernel
        # sense accumulation caps prefill peak memory (no (b, nv, s, s)
        # spike under continuous-batching admission).
        fused_ctx = use_flash and not train
    if fused_ctx and not return_parts:
        # fused Pallas path: qk scores -> causal softmax -> alpha @ content
        # in one pass per sense head; alpha (b, nv, s, s) never exists
        # (SURVEY.md §7.2 Phase 3). The einsum below remains the oracle
        # (tests/ops/test_backpack_kernels.py) and the return_parts path.
        # No remat wrap: the kernel's residuals are its inputs plus the tiny
        # per-head LSE, so there is nothing worth dropping.
        from ..ops.backpack_kernels import fused_contextualization
        q, ctx_k = context_qk(params, cfg, contextl)
        scale = cfg.sense_head_dim ** -0.5
        alpha = None
        outputs = fused_contextualization(q, ctx_k, content, scale
                                          ).astype(contextl.dtype)
    else:

        def combine(ctx_params, contextl, content):
            a = contextualization(ctx_params, cfg, contextl)  # (b, nv, s, s)
            return jnp.einsum("bkts,bskd->btd", a, content,
                              preferred_element_type=jnp.float32
                              ).astype(contextl.dtype)

        if remat and not return_parts:
            # alpha never escapes the checkpoint: it is recomputed in the bwd
            # instead of being saved
            alpha = None
            outputs = jax.checkpoint(combine)({"ctx_attn": params["ctx_attn"]},
                                              contextl, content)
        else:
            alpha = contextualization(params, cfg, contextl)
            outputs = jnp.einsum("bkts,bskd->btd", alpha, content,
                                 preferred_element_type=jnp.float32
                                 ).astype(contextl.dtype)
    logits = gpt_lib.lm_logits(params["gpt"], cfg, outputs)
    if return_parts:
        return logits, {"alpha": alpha, "content": content,
                        "contextual": contextl, "outputs": outputs}
    if moe_aux is not None:
        return logits, moe_aux
    return logits


# ---------------------------------------------------------------- decode

def insert_cache_slot(big, small, slot) -> "BackpackCache":
    """Insert a batch-1 cache (a freshly prefilled request) into row `slot` of
    a per-slot batch cache — the continuous-batching admission primitive.
    The flat-E layouts put slot b's rows at [b*rows_per_slot, (b+1)*rows);
    `slot` may be a traced scalar."""
    g_big, g_small = big.gpt, small.gpt

    def put(buf, new, axis, rows_per_slot):
        start = [0] * buf.ndim
        start[axis] = jnp.asarray(slot, jnp.int32) * rows_per_slot
        return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                            tuple(start))

    h = g_small.k.shape[1]        # rows per slot in the gpt cache (= n_head)
    nv = small.ctx_k.shape[0]     # rows per slot in the backpack caches
    new_len_s = jnp.asarray(g_small.length).reshape(-1)[0]
    stage_kw = {}
    if g_big.staged:
        # the fresh slot's staged entries are stale: invalidate its
        # stage_pos row and advance its flushed horizon to the prefill
        # length (the prefill went into the MAIN cache rows)
        stage_kw = dict(
            stage_pos=jax.lax.dynamic_update_slice(
                g_big.stage_pos,
                jnp.full((1, g_big.stage_pos.shape[1]), -1, jnp.int32),
                (jnp.asarray(slot, jnp.int32), jnp.asarray(0, jnp.int32))),
            base_len=g_big.base_len.at[slot].set(new_len_s),
        )
    gpt_cache = g_big._replace(
        k=put(g_big.k, g_small.k, 1, h),
        v=put(g_big.v, g_small.v, 1, h),
        length=g_big.length.at[slot].set(new_len_s),
        k_scale=(put(g_big.k_scale, g_small.k_scale, 1, h)
                 if g_big.k_scale is not None else None),
        v_scale=(put(g_big.v_scale, g_small.v_scale, 1, h)
                 if g_big.v_scale is not None else None),
        **stage_kw,
    )
    return big._replace(
        gpt=gpt_cache,
        ctx_k=put(big.ctx_k, small.ctx_k, 0, nv),
        ctx_k_scale=(put(big.ctx_k_scale, small.ctx_k_scale, 0, nv)
                     if big.ctx_k_scale is not None else None),
        content=put(big.content, small.content, 0, nv),
        length=big.length.at[slot].set(
            jnp.asarray(small.length).reshape(-1)[0]),
        content_scale=(put(big.content_scale, small.content_scale, 0, nv)
                       if big.content_scale is not None else None),
    )


def flush_cache(cache: "BackpackCache",
                window=None) -> "BackpackCache":
    """Merge the staging blocks into the main caches (gpt.flush_kv_cache for
    the KV stack; the same one-hot MXU scatter for the contextualization-key
    and sense caches) and reset the stage. The serving engine calls this
    every ~C decode steps and before slot extraction / control-slot steps —
    the once-per-C amortization that makes staged decode cheap."""
    if not cache.staged:
        return cache
    g = cache.gpt
    b, C = g.stage_pos.shape
    e = cache.ctx_k.shape[0]
    nv = e // b
    S = cache.ctx_k.shape[-1]
    w = min(window, S) if window is not None else S
    valid = (g.stage_pos >= 0) & (g.stage_pos < cache.length[:, None])
    pos = jnp.arange(w, dtype=jnp.int32)
    onehot = ((pos[None, :, None] == g.stage_pos[:, None, :])
              & valid[:, None, :])
    oh = jnp.repeat(onehot, nv, axis=0).astype(jnp.float32)      # (E, w, C)
    wrote = oh.sum(axis=2) > 0.5                                 # (E, w)

    def merge(buf, st, layout):
        if buf is None:
            return None
        axis = 2 if layout == "kt" else 1
        view = jax.lax.slice_in_dim(buf, 0, w, axis=axis)
        stf = st.astype(jnp.float32)
        if layout == "kt":      # buf (E, dnv_pad, S); st (E, C, dnv_pad)
            delta = jnp.einsum("ewc,ecd->edw", oh, stf)
            m = wrote[:, None, :]
        elif layout == "v":     # buf (E, S, d); st (E, C, d)
            delta = jnp.einsum("ewc,ecd->ewd", oh, stf)
            m = wrote[..., None]
        else:                   # 'sc': buf (E, S); st (E, C)
            delta = jnp.einsum("ewc,ec->ew", oh, stf)
            m = wrote
        view = jnp.where(m, delta.astype(buf.dtype), view)
        return jax.lax.dynamic_update_slice(buf, view, (0,) * buf.ndim)

    return cache._replace(
        gpt=gpt_lib.flush_kv_cache(g, window=window),
        ctx_k=merge(cache.ctx_k, cache.ctx_k_stage, "kt"),
        content=merge(cache.content, cache.content_stage, "v"),
        ctx_k_scale=(merge(cache.ctx_k_scale, cache.ctx_ks_stage, "sc")
                     if cache.ctx_k_scale is not None else None),
        content_scale=(merge(cache.content_scale, cache.content_ss_stage,
                             "sc")
                       if cache.content_scale is not None else None))


def extract_cache_slot(big, row, cfg: "BackpackConfig") -> "BackpackCache":
    """Slice row `row` of a batch cache out as a batch-1 cache (scalar
    length) — inverse of insert_cache_slot. With insert_cache_slot this moves
    one request's state between caches in one jitted dispatch; the batched-
    prefill admission path uses it to scatter a packed (n, bucket) prefill
    into n serving slots. `row` may be a traced scalar."""
    g = big.gpt
    h, nv = cfg.n_head, cfg.num_senses

    def take(buf, axis, rows_per_slot):
        start = [0] * buf.ndim
        start[axis] = jnp.asarray(row, jnp.int32) * rows_per_slot
        sizes = list(buf.shape)
        sizes[axis] = rows_per_slot
        return jax.lax.dynamic_slice(buf, tuple(start), tuple(sizes))

    length = jnp.asarray(big.length).reshape(-1)
    scalar_len = length[row] if length.shape[0] > 1 else length[0]
    gpt_cache = g._replace(
        k=take(g.k, 1, h), v=take(g.v, 1, h), length=scalar_len,
        k_scale=take(g.k_scale, 1, h) if g.k_scale is not None else None,
        v_scale=take(g.v_scale, 1, h) if g.v_scale is not None else None)
    return big._replace(
        gpt=gpt_cache,
        ctx_k=take(big.ctx_k, 0, nv),
        ctx_k_scale=(take(big.ctx_k_scale, 0, nv)
                     if big.ctx_k_scale is not None else None),
        content=take(big.content, 0, nv),
        length=scalar_len,
        content_scale=(take(big.content_scale, 0, nv)
                       if big.content_scale is not None else None),
    )


class BackpackCache(NamedTuple):
    """Incremental-decode state: GPT KV cache + contextualization K cache +
    per-token sense cache, pre-flattened to decode-contraction operand shapes
    (E = batch * nv; see gpt.KVCache for why flat layouts are load-bearing):

      ctx_k:          (E, dnv_pad, S) — transposed contextualization keys,
                      head dim zero-padded to 64 (sense_head_dim_padded);
                      int8 with per-position ctx_k_scale when quantized
                      (profiled: the bf16 ctx_k stream was the last
                      non-int8 read on the decode path)
      content:        (E, S, d)    — per-token sense vectors
      content_scale:  (E, S) f32   — int8 dequant scales (int8 cache only)

    `length` is scalar or (b,) per-slot. The decode step then runs the entire
    alpha = causal-softmax(q k^T); out = sum_k alpha @ content contraction as
    one pass over the stored-precision caches."""
    gpt: gpt_lib.KVCache
    ctx_k: jax.Array
    content: jax.Array
    length: jax.Array
    content_scale: Optional[jax.Array] = None
    ctx_k_scale: Optional[jax.Array] = None
    # staging block (serving; mirrors gpt.KVCache staging — the scalar
    # pointer / positions / base_len live on the nested gpt cache):
    # ctx_k_stage (E, C, dnv_pad), content_stage (E, C, d), scales (E, C)
    ctx_k_stage: Optional[jax.Array] = None
    ctx_ks_stage: Optional[jax.Array] = None
    content_stage: Optional[jax.Array] = None
    content_ss_stage: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.content.dtype == jnp.int8

    @property
    def bits(self) -> int:
        """Stored precision of the ctx-K / sense caches: 16, 8, or 4
        (pair-packed — discriminated structurally by the scale layout,
        (E, 2, S/2) vs int8's (E, S); see gpt.KVCache.bits)."""
        if self.content.dtype != jnp.int8:
            return 16
        return 4 if (self.content_scale is not None
                     and self.content_scale.ndim == 3) else 8

    @property
    def staged(self) -> bool:
        return self.ctx_k_stage is not None


def init_backpack_cache(cfg: BackpackConfig, batch: int, max_seqlen: int,
                        dtype=jnp.bfloat16,
                        per_slot: bool = False,
                        stage: int = 0, bits: int = 8,
                        kv_bits: Optional[int] = None) -> BackpackCache:
    """per_slot=True gives each batch row its own length counter (continuous-
    batching serving slots); False is the uniform-batch scalar counter.
    stage > 0 adds `stage`-column staging blocks (see gpt.init_kv_cache).
    bits=4 (with dtype=int8) stores the ctx-K and sense caches PAIR-PACKED
    int4 (half the decode HBM stream; ops/decode_attention int4 block);
    kv_bits overrides the GPT KV cache precision separately (default: same
    as bits) — the int4-senses/int8-KV hybrid quality fallback."""
    kv_bits = bits if kv_bits is None else kv_bits
    packed4 = dtype == jnp.int8 and bits == 4
    if packed4:
        # MIXED mode (the gate-passing low-bit config): sense values pack
        # int4 pairwise, contextualization keys stay INT8 in even/odd SPLIT
        # layout (int4 keys alone measured +1.19 ppl on the trained mini —
        # bench_results/gates_mini_r5.json + the ctx-K isolation run — for
        # ~3% of the stream), GPT KV precision via kv_bits.
        assert stage == 0 and max_seqlen % 2 == 0, (stage, max_seqlen)
        len0 = jnp.zeros((batch,) if per_slot else (), jnp.int32)
        e = batch * cfg.num_senses
        S2 = max_seqlen // 2
        return BackpackCache(
            gpt=gpt_lib.init_kv_cache(cfg, batch, max_seqlen, jnp.int8,
                                      per_slot=per_slot, bits=kv_bits),
            ctx_k=jnp.zeros((e, cfg.sense_head_dim_padded, 2, S2),
                            jnp.int8),
            content=jnp.zeros((e, S2, cfg.n_embd), jnp.int8),
            length=len0,
            content_scale=jnp.ones((e, 2, S2), jnp.float32),
            ctx_k_scale=jnp.ones((e, 2, S2), jnp.float32),
        )
    content_dtype = dtype
    ctx_dtype = dtype
    len0 = jnp.zeros((batch,) if per_slot else (), jnp.int32)
    e = batch * cfg.num_senses
    stage_kw = {}
    if stage > 0:
        stage_kw = dict(
            ctx_k_stage=jnp.zeros((e, stage, cfg.sense_head_dim_padded),
                                  ctx_dtype),
            content_stage=jnp.zeros((e, stage, cfg.n_embd), content_dtype),
            ctx_ks_stage=(jnp.ones((e, stage), jnp.float32)
                          if dtype == jnp.int8 else None),
            content_ss_stage=(jnp.ones((e, stage), jnp.float32)
                              if dtype == jnp.int8 else None),
        )
    return BackpackCache(
        gpt=gpt_lib.init_kv_cache(cfg, batch, max_seqlen, dtype,
                                  per_slot=per_slot, stage=stage,
                                  bits=kv_bits),
        ctx_k=jnp.zeros((e, cfg.sense_head_dim_padded, max_seqlen),
                        ctx_dtype),
        content=jnp.zeros((e, max_seqlen, cfg.n_embd), content_dtype),
        length=len0,
        content_scale=(jnp.ones((e, max_seqlen), jnp.float32)
                       if dtype == jnp.int8 else None),
        ctx_k_scale=(jnp.ones((e, max_seqlen), jnp.float32)
                     if dtype == jnp.int8 else None),
        **stage_kw,
    )


def backpack_forward_with_cache(
    params: Params, cfg: BackpackConfig, input_ids: jax.Array,
    cache: BackpackCache, *, use_flash: bool = True,
    sense_weights: Optional[jax.Array] = None,
    sense_edit: Optional[Tuple[jax.Array, jax.Array]] = None,
    window: Optional[int] = None,
    return_ctx_q: bool = False,
):
    """Run `input_ids` (prefill s>1 at length 0, or decode s==1) through the
    incremental path. Returns logits (b, s, vocab) for the new tokens and the
    updated cache. This replaces the reference's full-prefix recompute decode
    (training/src/utils/generation.py) — per-step cost O(t) instead of O(t^2).

    window: STATIC length bucket (see gpt.gpt_forward_with_cache) — decode
    reads only the first `window` columns of every cache.
    return_ctx_q: also return the contextualization query q (b, s, nv, dnv)
    of the new tokens — the hook the incremental negative-weighted decode
    uses to rebuild its alpha row against the ctx_k cache
    (models/interventions.negative_decode_step).
    """
    b, s = input_ids.shape
    offset = cache.length
    vec = jnp.asarray(offset).ndim == 1   # per-row serving-slot lengths
    new_len = offset + s
    nv, d = cfg.num_senses, cfg.n_embd
    dnv = cfg.sense_head_dim
    e = b * nv
    q4 = cache.bits == 4                  # pair-packed int4 ctx/sense caches
    max_s = cache.ctx_k.shape[-1] * (2 if q4 else 1)
    if q4:
        assert s == 1 or not vec, \
            "int4 caches: multi-token writes need a uniform (scalar) offset"
    row_off = jnp.repeat(offset, nv) if vec else offset

    staged = (cache.staged and vec and s <= gpt_lib.FLAT_MULTI_MAX
              and s <= cache.ctx_k_stage.shape[1] if cache.staged else False)
    if staged:
        assert sense_edit is None, "staging does not take sense edits " \
            "(the engine flushes and disables staging for control slots)"
    stage_ptr0 = cache.gpt.stage_ptr if cache.staged else None
    contextl, gpt_cache = gpt_lib.gpt_forward_with_cache(
        params["gpt"], cfg, input_ids, cache.gpt, use_flash=use_flash,
        window=window)
    q, k_new = context_qk(params, cfg, contextl)  # (b, s, nv, dnv)
    # flat layouts: ctx_k (E, dnv_pad, S) / content (E, S, d) / scale (E, S)
    dnv_pad = cfg.sense_head_dim_padded
    senses_new = content_forward(params, cfg, input_ids)  # (b, s, nv, d)
    if sense_edit is not None:
        senses_new = apply_sense_edit(senses_new, input_ids, sense_edit)
    senses_t = senses_new.transpose(0, 2, 1, 3).reshape(e, s, d)
    ctx_k, ctx_k_scale = cache.ctx_k, cache.ctx_k_scale
    content, content_scale = cache.content, cache.content_scale
    ctx_k_stage, ctx_ks_stage = cache.ctx_k_stage, cache.ctx_ks_stage
    content_stage = cache.content_stage
    content_ss_stage = cache.content_ss_stage

    def _put_stage(buf, new):
        return jax.lax.dynamic_update_slice(
            buf, new.astype(buf.dtype), (0, stage_ptr0, 0))

    if staged:
        # append at the scalar stage pointer (see gpt.KVCache staging)
        k_st = k_new.transpose(0, 2, 1, 3).reshape(e, s, dnv)
        if dnv_pad != dnv:
            k_st = jnp.pad(k_st, ((0, 0), (0, 0), (0, dnv_pad - dnv)))
        if cache.quantized:
            from ..ops import quant
            k8s, kss = quant.quantize_activations_int8(k_st, axis=2)
            s8s, sss = quant.quantize_activations_int8(senses_t, axis=2)
            ctx_k_stage = _put_stage(ctx_k_stage, k8s)
            content_stage = _put_stage(content_stage, s8s)
            ctx_ks_stage = jax.lax.dynamic_update_slice(
                ctx_ks_stage, kss[..., 0], (0, stage_ptr0))
            content_ss_stage = jax.lax.dynamic_update_slice(
                content_ss_stage, sss[..., 0], (0, stage_ptr0))
        else:
            ctx_k_stage = _put_stage(ctx_k_stage, k_st)
            content_stage = _put_stage(content_stage, senses_t)
    else:
        k_flat = k_new.transpose(0, 2, 3, 1).reshape(e, dnv, s)
        if dnv_pad != dnv:
            k_flat = jnp.pad(k_flat, ((0, 0), (0, dnv_pad - dnv), (0, 0)))
        if q4:
            from ..ops import quant
            k8q, ksc = quant.quantize_activations_int8(k_flat, axis=1)
            s4q, ssc = quant.quantize_activations_int4(senses_t, axis=2)
            if s == 1:
                # int8 split store (keys) + int4 nibble RMW (values)
                ctx_k = gpt_lib.store_split8_step(cache.ctx_k, k8q,
                                                  row_off, window=window)
                content = gpt_lib.rmw_nibble_axis_windowed(
                    cache.content, s4q, row_off, axis=1, window=window)
                ctx_k_scale = gpt_lib.update_pair_scale(
                    ctx_k_scale, ksc[:, 0, 0], row_off, window=window)
                content_scale = gpt_lib.update_pair_scale(
                    content_scale, ssc[:, 0, 0], row_off, window=window)
            else:
                # prefill at a scalar EVEN offset: keys de-interleave into
                # the split planes; values pack pairs (odd s leaves a zero
                # high nibble — masked by length and overwritten by the
                # next step's RMW)
                def _split_write(buf, kq):
                    if s % 2:
                        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, 1)))
                    block = jnp.stack([kq[:, :, 0::2], kq[:, :, 1::2]],
                                      axis=2)
                    return jax.lax.dynamic_update_slice(
                        buf, block.astype(buf.dtype),
                        (0, 0, 0, offset // 2))

                def _pack_write(buf, nib, axis):
                    if s % 2:
                        pad = [(0, 0)] * nib.ndim
                        pad[axis] = (0, 1)
                        nib = jnp.pad(nib, pad)
                    packed = quant.pack_int4_pairs(nib, axis)
                    starts = [0] * buf.ndim
                    starts[axis] = offset // 2
                    return jax.lax.dynamic_update_slice(buf, packed,
                                                        tuple(starts))

                def _pack_scale_write(buf, sc):
                    if s % 2:
                        sc = jnp.pad(sc, ((0, 0), (0, 1)),
                                     constant_values=1.0)
                    sc2 = sc.reshape(e, -1, 2).swapaxes(1, 2)
                    return jax.lax.dynamic_update_slice(
                        buf, sc2.astype(buf.dtype), (0, 0, offset // 2))

                ctx_k = _split_write(cache.ctx_k, k8q)
                content = _pack_write(cache.content, s4q, axis=1)
                ctx_k_scale = _pack_scale_write(ctx_k_scale, ksc[:, 0, :])
                content_scale = _pack_scale_write(content_scale, ssc[..., 0])
        elif cache.quantized:
            from ..ops import quant
            k8, ksc = quant.quantize_activations_int8(k_flat, axis=1)
            ctx_k = gpt_lib.update_rows_axis_windowed(cache.ctx_k, k8,
                                                      row_off, axis=2,
                                                      window=window)
            ctx_k_scale = gpt_lib.update_rows_axis_windowed(
                ctx_k_scale, ksc[:, 0, :], row_off, axis=1, window=window)
            s8, ssc = quant.quantize_activations_int8(senses_t, axis=2)
            content = gpt_lib.update_rows_axis_windowed(
                cache.content, s8, row_off, axis=1, window=window)
            content_scale = gpt_lib.update_rows_axis_windowed(
                content_scale, ssc[..., 0], row_off, axis=1, window=window)
        else:
            ctx_k = gpt_lib.update_rows_axis_windowed(cache.ctx_k, k_flat,
                                                      row_off, axis=2,
                                                      window=window)
            content = gpt_lib.update_rows_axis_windowed(
                cache.content, senses_t, row_off, axis=1, window=window)

    scale = cfg.sense_head_dim ** -0.5

    def _weights_es() -> Optional[jax.Array]:
        """Resolve sense_weights to (E, S) multiplicative key weights."""
        if sense_weights is None:
            return None
        w = sense_weights.astype(jnp.float32)
        if w.ndim == 1:                     # (nv,)
            w = jnp.broadcast_to(w[None, :, None], (b, nv, max_s))
        elif w.ndim == 2:                   # (b, nv) per-request control
            w = jnp.broadcast_to(w[:, :, None], (b, nv, max_s))
        else:                               # (b, S, nv) per-position
            w = jnp.transpose(w, (0, 2, 1))
        return w.reshape(e, max_s)

    if s == 1 and q4:
        # mixed low-bit decode: one pass over int8 SPLIT keys + int4
        # PAIR-PACKED sense values — ~half the HBM stream of the int8 path
        # (the measured decode bottleneck). The STACKED entry point takes
        # the full-width buffers (leading L=1 axis is a bitcast) and trims
        # the sequence GRID by the static window — slicing a pallas
        # operand materializes a cache copy per step
        # (bench_results/headline_r5d.txt: 4x slower than int8).
        from ..ops.decode_attention import decode_attention_mixed_stacked
        lens = jnp.repeat(new_len, nv) if vec else new_len
        w2 = None
        if window is not None and window < max_s:
            w2 = -(-window // 2)
        vs2_r = content_scale
        w = _weights_es()
        if w is not None:
            # (E, S) per-position weights -> the (E, 2, S/2) parity layout
            wp = w.reshape(e, -1, 2).swapaxes(1, 2)
            vs2_r = vs2_r * wp
        q_flat = (q[:, 0].astype(jnp.float32) * scale).astype(q.dtype
                                                             ).reshape(e, dnv)
        if dnv_pad != dnv:
            q_flat = jnp.pad(q_flat, ((0, 0), (0, dnv_pad - dnv)))
        out, ck1, cks1, ct1, vs1 = decode_attention_mixed_stacked(
            0, q_flat, ctx_k[None], ctx_k_scale[None], content[None],
            vs2_r[None], lens, window_cols=w2)
        # rebind the donated-through buffers into the carry; when sense
        # weights were applied, vs2_r was a weighted TEMP — the original
        # content_scale was only read to build it and stays the carry
        ctx_k, ctx_k_scale, content = ck1[0], cks1[0], ct1[0]
        if w is None:
            content_scale = vs1[0]
        outputs = out.reshape(b, nv, d).sum(axis=1, keepdims=True
                                            ).astype(contextl.dtype)
    elif s == 1:
        # ONE pass: per-sense softmax over cached keys + the weighted content
        # contraction, reading the caches at stored precision (replaces the
        # reference's full O(t^2) alpha recompute, backpack.py:107-122,313).
        from ..ops.decode_attention import decode_attention
        vs = content_scale                  # (E, S) or None
        w = _weights_es()
        if w is not None:
            vs = w if vs is None else vs * w
        lens = jnp.repeat(new_len, nv) if vec else new_len
        ctx_k_r, content_r = ctx_k, content
        ks_r = ctx_k_scale
        if window is not None and window < max_s:
            ctx_k_r = ctx_k[:, :, :window]
            content_r = content[:, :window]
            vs = vs[:, :window] if vs is not None else None
            ks_r = ks_r[:, :window] if ks_r is not None else None
        q_flat = (q[:, 0].astype(jnp.float32) * scale).astype(q.dtype
                                                             ).reshape(e, dnv)
        if dnv_pad != dnv:
            q_flat = jnp.pad(q_flat, ((0, 0), (0, dnv_pad - dnv)))
        if staged:
            from ..ops.decode_attention import decode_attention_flat_staged
            assert w is None, "staging does not take sense weights"
            out = decode_attention_flat_staged(
                q_flat, ctx_k_r, ks_r, content_r, vs,
                jnp.repeat(gpt_cache.base_len, nv),
                ctx_k_stage, ctx_ks_stage, content_stage, content_ss_stage,
                jnp.repeat(gpt_cache.stage_pos, nv, axis=0), lens)
        else:
            out = decode_attention(q_flat, ctx_k_r, ks_r, content_r, vs,
                                   lens)
        outputs = out.reshape(b, nv, d).sum(axis=1, keepdims=True
                                            ).astype(contextl.dtype)
    elif s <= gpt_lib.FLAT_MULTI_MAX and not q4:
        # multi-query decode (speculative verification, small chunks): the
        # flat contraction over the stored-precision caches — no
        # (b, nv, ...) relayout per verify step (see gpt.FLAT_MULTI_MAX)
        from ..ops.decode_attention import decode_attention_flat_multi
        vs = content_scale
        w = _weights_es()
        if w is not None:
            vs = w if vs is None else vs * w
        lens = jnp.repeat(new_len, nv) if vec else new_len
        ctx_k_r, content_r, ks_r = ctx_k, content, ctx_k_scale
        if window is not None and window < max_s:
            ctx_k_r = ctx_k[:, :, :window]
            content_r = content[:, :window]
            vs = vs[:, :window] if vs is not None else None
            ks_r = ks_r[:, :window] if ks_r is not None else None
        q_s = (q.astype(jnp.float32) * scale).astype(q.dtype)
        if dnv_pad != dnv:
            q_s = jnp.pad(q_s, ((0, 0), (0, 0), (0, 0), (0, dnv_pad - dnv)))
        q_flat = q_s.transpose(0, 2, 1, 3).reshape(e, s, dnv_pad)
        if staged:
            from ..ops.decode_attention import \
                decode_attention_flat_multi_staged
            assert w is None, "staging does not take sense weights"
            out = decode_attention_flat_multi_staged(
                q_flat, ctx_k_r, ks_r, content_r, vs,
                jnp.repeat(gpt_cache.base_len, nv),
                ctx_k_stage, ctx_ks_stage, content_stage, content_ss_stage,
                jnp.repeat(gpt_cache.stage_pos, nv, axis=0), lens)
        else:
            out = decode_attention_flat_multi(q_flat, ctx_k_r, ks_r,
                                              content_r, vs, lens)  # (e,s,d)
        outputs = out.reshape(b, nv, s, d).astype(jnp.float32).sum(
            axis=1).astype(contextl.dtype)
    else:
        # prefill / multi-token continuation (large chunks): materialize the
        # alpha rows for the s new queries.
        # (E,)->(b,nv,...) relayouts happen once per prefill, not per step.
        ctx_k_r, content_r = ctx_k, content
        cks_r, cs_r = ctx_k_scale, content_scale
        fold8 = cache.quantized and not q4
        S = max_s
        if window is not None and window < max_s:
            # same caller guarantee as the decode branch: offset + s <= window
            S = window
            if q4:
                w2 = -(-S // 2)
                ctx_k_r, content_r = ctx_k[:, :, :, :w2], content[:, :w2]
                cks_r, cs_r = cks_r[:, :, :w2], cs_r[:, :, :w2]
            else:
                ctx_k_r, content_r = ctx_k[:, :, :S], content[:, :S]
                cks_r = cks_r[:, :S] if cks_r is not None else None
                cs_r = cs_r[:, :S] if cs_r is not None else None
        if q4:
            # prefill is compute-bound: dequantize the low-bit prefix once
            # (keys re-interleave from the split planes; values unpack)
            from ..ops import quant
            S2v = ctx_k_r.shape[-1]
            k_unp = ctx_k_r.transpose(0, 1, 3, 2).reshape(e, dnv_pad,
                                                          2 * S2v)
            ctx_k_r = (k_unp.astype(jnp.float32)
                       * quant.interleave_pair_scales(cks_r)[:, None, :]
                       ).astype(contextl.dtype)
            content_r = (quant.unpack_int4_pairs(content_r, axis=1
                                                 ).astype(jnp.float32)
                         * quant.interleave_pair_scales(cs_r)[..., None]
                         ).astype(contextl.dtype)
        ctx_k4 = ctx_k_r.reshape(b, nv, dnv_pad, S)
        content4 = content_r.reshape(b, nv, S, d)
        q_pad = (jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, dnv_pad - dnv)))
                 if dnv_pad != dnv else q)
        scores = jnp.einsum("bthd,bhds->bhts", q_pad,
                            ctx_k4.astype(q.dtype) * scale,
                            preferred_element_type=jnp.float32)
        if fold8:
            # per-position key dequant scales factor out of the contraction
            scores = scores * cks_r.reshape(b, nv, S)[:, :, None, :]
        qpos = jax.lax.broadcasted_iota(jnp.int32, (s, S), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (s, S), 1)
        if vec:
            causal = kpos[None] <= (qpos[None] + offset[:, None, None])
            scores = jnp.where(causal[:, None], scores, MASK_VALUE)
        else:
            scores = jnp.where((kpos <= qpos + offset)[None, None], scores,
                               MASK_VALUE)
        alpha = jax.nn.softmax(scores, axis=-1).astype(contextl.dtype)
        if fold8:
            # fold per-(sense, pos) dequant scales into alpha's key axis
            alpha = alpha * cs_r.reshape(b, nv, S)[:, :, None, :
                                                   ].astype(alpha.dtype)
        w = _weights_es()
        if w is not None:
            alpha = alpha * w.reshape(b, nv, max_s)[:, :, :S][:, :, None, :
                                                              ].astype(alpha.dtype)
        outputs = jnp.einsum("bkts,bksd->btd", alpha,
                             content4.astype(contextl.dtype),
                             preferred_element_type=jnp.float32
                             ).astype(contextl.dtype)
    logits = gpt_lib.lm_logits(params["gpt"], cfg, outputs)
    new_cache = BackpackCache(gpt=gpt_cache, ctx_k=ctx_k, content=content,
                              length=new_len, content_scale=content_scale,
                              ctx_k_scale=ctx_k_scale,
                              ctx_k_stage=ctx_k_stage,
                              ctx_ks_stage=ctx_ks_stage,
                              content_stage=content_stage,
                              content_ss_stage=content_ss_stage)
    if return_ctx_q:
        return logits, new_cache, q
    return logits, new_cache
