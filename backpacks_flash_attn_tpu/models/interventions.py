"""Sense-vector intervention / control machinery for Backpack LMs.

TPU-native re-design of the reference's intervened models and sense surgery
(reference: training/src/models/intervened_models.py:9-203,
training/src/modulate_generate.py:73-103, training/src/test_genderbias.py:71-167,
training/src/interactive.py:42-73). Instead of nn.Module wrappers around a
trained network, every intervention here is a pure function over the
functional Backpack params — jit/vmap/shard-compatible.

Capability map:
  * soft_sense_mask / annealing_scores   <- create_content_soft_mask,
    mask_annealing (intervened_models.py:9-53)
  * weighted_forward                     <- WeightedBackpackLMHeadModel (:58-105)
  * negative_weighted_forward            <- NegativeWeightedBackpackLMHeadModel
    (:108-165), with the (b, nv, s, vocab) per-sense logit tensor processed in
    key-position chunks so it is never materialized (the reference allocates
    ~800MB for it at seqlen 512)
  * replaced_word / sense_edit           <- ReplacedWordLMHeadModel (:168-203)
  * senses_of_word                       <- modulate_generate.senses_of_word
    (:66-71) — computed as a single-token content pass, valid by the
    per-token property of the sense network
  * project_out_and_in                   <- mogrify_word's knowledge-editing
    projection (modulate_generate.py:77-95)
  * project_out_embeddings               <- gender-debias baseline
    (test_genderbias.py:102-112)
  * counterfactual_forward               <- compute_counterfactual
    (test_genderbias.py:71-80, interactive.py) — scales one sense's
    contextualization columns at chosen token positions
  * per_sense_logits                     <- visualize_vocab.py:62-86 /
    rank_vocab localization (E @ C(x)[k])

Incremental decode: the reference runs every intervened generation through a
full-prefix recompute (O(t^2) per token). Here `WeightedDecodeState` +
`weighted_decode_step` maintain the annealing statistics incrementally —
running relu-logit sums per (position, sense) updated with one rank-1 relu
outer product per new token — so intervened decode has the same O(t) per-step
cost as plain decode.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import BackpackConfig
from . import backpack as bp
from . import gpt as gpt_lib

Params = Dict[str, Any]


# ------------------------------------------------------------- embeddings

def embedding_matrix(gpt_params: Params) -> jax.Array:
    """The (possibly padded) (V, d) tied embedding/unembedding matrix,
    dequantized if the param tree is INT8-quantized."""
    wte = gpt_params["wte"]
    if isinstance(wte, dict):
        return (wte["q"].astype(jnp.float32) * wte["row_scale"]).astype(
            jnp.bfloat16)
    return wte


# ------------------------------------------------------------- sense masks

def soft_sense_mask(content_weights: jax.Array, input_ids: jax.Array,
                    scores: jax.Array) -> jax.Array:
    """Interpolate per-(token, sense) multiplicative weights toward 1.0 by the
    annealing score (reference create_content_soft_mask,
    intervened_models.py:9-20).

    content_weights: (vocab, nv); input_ids: (b, s); scores: (b, s, nv).
    Returns (b, s, nv): w[x] * score + (1 - score).
    """
    w = jnp.take(content_weights, input_ids, axis=0)       # (b, s, nv)
    return w * scores + (1.0 - scores)


def annealing_scores(E: jax.Array, input_ids: jax.Array, content: jax.Array,
                     *, annealing_scale: float = 0.1,
                     upweight_nearby: bool = True) -> jax.Array:
    """Per-(position, sense) annealing scores in (0, 1]: how much of the
    intervention weight to keep, backing off (sigmoid) as the sense is already
    'satisfied' by the tokens in the sequence (reference mask_annealing,
    intervened_models.py:29-53).

    E: (V, d) tied embedding; content: (b, s, nv, d). Returns (b, s, nv).
    """
    b, s = input_ids.shape
    # non-negative per-sense logits of the sequence's own tokens:
    # sims[b, j, k, t] = relu(C(x_j)[k] . E[x_t])
    tok_emb = jnp.take(E, input_ids, axis=0)                # (b, s, d)
    sims = jnp.einsum("bjkd,btd->bjkt", content.astype(jnp.float32),
                      tok_emb.astype(jnp.float32))
    sims = jnp.maximum(sims, 0.0)
    sat = sims.sum(axis=-1)                                  # (b, s, nv)
    scores = jax.nn.sigmoid(-annealing_scale * sat + 6.0)
    if upweight_nearby:
        scores = scores * (1.0 + jnp.arange(s) / 100.0)[None, :, None]
    return scores


def _resolved_scores(params: Params, cfg: BackpackConfig, input_ids, content,
                     anneal: bool, annealing_scale: float,
                     upweight_nearby: bool) -> jax.Array:
    if anneal:
        E = embedding_matrix(params["gpt"])
        return annealing_scores(E, input_ids, content,
                                annealing_scale=annealing_scale,
                                upweight_nearby=upweight_nearby)
    b, s = input_ids.shape
    return jnp.ones((b, s, cfg.num_senses), jnp.float32)


# ------------------------------------------------------------- forwards

def weighted_forward(params: Params, cfg: BackpackConfig,
                     input_ids: jax.Array, content_weights: jax.Array, *,
                     anneal: bool = True, annealing_scale: float = 0.1,
                     upweight_nearby: bool = True,
                     use_flash: bool = True) -> jax.Array:
    """Topic/sentiment control: multiplicative per-(token, sense) reweighting
    of sense vectors with sigmoid annealing (reference
    WeightedBackpackLMHeadModel.forward, intervened_models.py:70-105).
    Returns logits (b, s, vocab)."""
    content = bp.content_forward(params, cfg, input_ids)
    scores = _resolved_scores(params, cfg, input_ids, content, anneal,
                              annealing_scale, upweight_nearby)
    weights = soft_sense_mask(content_weights, input_ids, scores)
    return bp.backpack_forward(params, cfg, input_ids, use_flash=use_flash,
                               sense_weights=weights)


def negative_weighted_forward(params: Params, cfg: BackpackConfig,
                              input_ids: jax.Array,
                              content_weights: jax.Array, *,
                              anneal: bool = True,
                              annealing_scale: float = 0.1,
                              upweight_nearby: bool = True,
                              quantile: float = 0.02,
                              use_flash: bool = True,
                              key_chunk: int = 64) -> jax.Array:
    """Toxicity/bias removal: mix per-sense *logits*, suppressing only the
    most-negative `quantile` of the weighted distribution (reference
    NegativeWeightedBackpackLMHeadModel.forward, intervened_models.py:120-165):

        cl        = C(x_j)[k] @ E^T                  per-sense logits
        wcl       = w[k, j] * cl
        mixed     = where(wcl < quantile_V(wcl), wcl, cl)
        logits_t  = sum_k alpha[k, t, :] @ mixed[k]

    The reference materializes cl as (b, nv, s, V) (~800MB at s=512); here the
    contraction is accumulated over key-position chunks of `key_chunk`, so
    peak extra memory is (b, nv, key_chunk, V).
    """
    logits, parts = bp.backpack_forward(params, cfg, input_ids,
                                        use_flash=use_flash,
                                        return_parts=True)
    del logits
    alpha, content = parts["alpha"], parts["content"]       # (b,nv,s,s), (b,s,nv,d)
    scores = _resolved_scores(params, cfg, input_ids, content, anneal,
                              annealing_scale, upweight_nearby)
    weights = soft_sense_mask(content_weights, input_ids, scores)  # (b, s, nv)
    E = embedding_matrix(params["gpt"])                      # (V, d)

    b, s = input_ids.shape
    pad = (-s) % key_chunk
    n_chunks = (s + pad) // key_chunk
    content_p = jnp.pad(content, ((0, 0), (0, pad), (0, 0), (0, 0)))
    weights_p = jnp.pad(weights, ((0, 0), (0, pad), (0, 0)))
    alpha_p = jnp.pad(alpha, ((0, 0), (0, 0), (0, 0), (0, pad)))
    content_c = content_p.reshape(b, n_chunks, key_chunk, cfg.num_senses,
                                  cfg.n_embd).transpose(1, 0, 2, 3, 4)
    weights_c = weights_p.reshape(b, n_chunks, key_chunk,
                                  cfg.num_senses).transpose(1, 0, 2, 3)
    alpha_c = alpha_p.reshape(b, cfg.num_senses, s, n_chunks,
                              key_chunk).transpose(3, 0, 1, 2, 4)

    def body(acc, xs):
        c_chunk, w_chunk, a_chunk = xs
        cl = jnp.einsum("bjkd,vd->bkjv", c_chunk.astype(jnp.float32),
                        E.astype(jnp.float32))              # (b, nv, c, V)
        wcl = jnp.transpose(w_chunk, (0, 2, 1))[..., None] * cl
        q = jnp.quantile(wcl, quantile, axis=-1, keepdims=True)
        mixed = jnp.where(wcl < q, wcl, cl)
        acc = acc + jnp.einsum("bktj,bkjv->btv", a_chunk.astype(jnp.float32),
                               mixed)
        return acc, None

    acc0 = jnp.zeros((b, s, E.shape[0]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (content_c, weights_c, alpha_c))
    return acc


def replaced_word_forward(params: Params, cfg: BackpackConfig,
                          input_ids: jax.Array, edited_ids: jax.Array,
                          edited_senses: jax.Array, *,
                          use_flash: bool = True) -> jax.Array:
    """Knowledge editing: swap the sense vectors of chosen words (reference
    ReplacedWordLMHeadModel, intervened_models.py:168-203 — there a Python
    dict + per-position loop; here a vectorized masked gather).

    edited_ids: (m,) token ids; edited_senses: (m, nv, d)."""
    return bp.backpack_forward(params, cfg, input_ids, use_flash=use_flash,
                               sense_edit=(edited_ids, edited_senses))


def counterfactual_forward(params: Params, cfg: BackpackConfig,
                           input_ids: jax.Array, word_ids: jax.Array,
                           sense_index: int, percent: float, *,
                           use_flash: bool = True) -> jax.Array:
    """Counterfactual contextualization scaling: multiply alpha's columns for
    sense `sense_index` by `percent` wherever the key token is in `word_ids`
    (reference compute_counterfactual, test_genderbias.py:71-80; the
    gender-debias knob uses sense 10). word_ids: (m,)."""
    _, parts = bp.backpack_forward(params, cfg, input_ids,
                                   use_flash=use_flash, return_parts=True)
    alpha, content = parts["alpha"], parts["content"]
    hit = (input_ids[..., None] == word_ids[None, None, :]).any(-1)  # (b, s)
    col_scale = jnp.where(hit, percent, 1.0)                 # (b, s) over keys
    alpha = alpha.at[:, sense_index].multiply(
        col_scale[:, None, :].astype(alpha.dtype))
    outputs = jnp.einsum("bkts,bskd->btd", alpha, content,
                         preferred_element_type=jnp.float32)
    return gpt_lib.lm_logits(params["gpt"], cfg,
                             outputs.astype(content.dtype))


# ------------------------------------------------------------- sense surgery

def senses_of_word(params: Params, cfg: BackpackConfig,
                   word_id) -> jax.Array:
    """(nv, d) sense vectors of one token. The reference feeds a 512-long
    constant sequence (modulate_generate.py:66-71); the per-token property
    makes a single-token pass equivalent."""
    ids = jnp.asarray(word_id, jnp.int32).reshape(1, 1)
    return bp.content_forward(params, cfg, ids)[0, 0]


def project_out_and_in(senses: jax.Array, out_direction: jax.Array,
                       in_direction: jax.Array) -> jax.Array:
    """Knowledge-editing projection: remove each sense's component along
    `out_direction` and add the equivalent component along `in_direction`,
    norm-corrected (reference project_out_and_in,
    modulate_generate.py:77-95). senses: (nv, d)."""
    senses = senses.astype(jnp.float32)
    out_d = out_direction.astype(jnp.float32)
    in_d = in_direction.astype(jnp.float32)
    dots = senses @ out_d / (out_d @ out_d)                  # (nv,)
    norm = (out_d @ out_d) / (in_d @ in_d)
    return senses - dots[:, None] * out_d[None] + dots[:, None] * in_d[None] * norm


def project_out_embeddings(E: jax.Array, direction: jax.Array,
                           percent: float,
                           word_ids: Optional[jax.Array] = None) -> jax.Array:
    """Gender-debias baseline: shrink the `direction` component of embedding
    rows by (1 - percent); if `word_ids` is given, only those rows change
    (reference project_out, test_genderbias.py:102-112)."""
    E32 = E.astype(jnp.float32)
    d = direction.astype(jnp.float32)
    dots = E32 @ d / (d @ d)                                 # (V,)
    fixed = E32 - (1.0 - percent) * dots[:, None] * d[None]
    if word_ids is not None:
        mask = jnp.zeros((E.shape[0],), bool).at[word_ids].set(True)
        fixed = jnp.where(mask[:, None], fixed, E32)
    return fixed.astype(E.dtype)


def mogrify_word(params: Params, cfg: BackpackConfig, word_id: int,
                 out_word_id: int, in_word_id: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """Build a (edited_ids, edited_senses) pair replacing `word_id`'s senses
    with their out->in projected versions (reference mogrify_word,
    modulate_generate.py:73-103) — feed to replaced_word_forward /
    bp.backpack_forward(sense_edit=...)."""
    E = embedding_matrix(params["gpt"])
    senses = senses_of_word(params, cfg, word_id)
    fixed = project_out_and_in(senses, E[out_word_id], E[in_word_id])
    return (jnp.asarray([word_id], jnp.int32),
            fixed[None].astype(senses.dtype))


# ------------------------------------------------------------- introspection

def per_sense_logits(params: Params, cfg: BackpackConfig,
                     senses: jax.Array) -> jax.Array:
    """E @ C(x)[k]: vocabulary scores per sense vector — the visualization /
    vocab-ranking primitive (reference visualize_vocab.py:62-86,
    rank_vocab.py). senses: (..., d) -> (..., V)."""
    E = embedding_matrix(params["gpt"])
    return jnp.einsum("...d,vd->...v", senses.astype(jnp.float32),
                      E.astype(jnp.float32))


# ------------------------------------------------------------- incremental
# intervened decode

class WeightedDecodeState(NamedTuple):
    """Running annealing statistics for O(t)-per-step weighted decode.

    sums[b, j, k] = sum_{j' <= t} relu(C(x_j)[k] . E[x_{j'}]) — the reference
    recomputes this (b, s, nv) tensor from scratch every step
    (intervened_models.py:29-53); here each new token adds one relu'd rank-1
    update. tok_emb caches the embedding rows of emitted tokens so the new
    *row* of sums (for position t itself) is one einsum over the prefix."""
    sums: jax.Array      # (b, max_s, nv) float32
    tok_emb: jax.Array   # (b, max_s, d)
    token_ids: jax.Array # (b, max_s) int32


def init_weighted_decode_state(cfg: BackpackConfig, batch: int,
                               max_seqlen: int,
                               dtype=jnp.bfloat16) -> WeightedDecodeState:
    return WeightedDecodeState(
        sums=jnp.zeros((batch, max_seqlen, cfg.num_senses), jnp.float32),
        tok_emb=jnp.zeros((batch, max_seqlen, cfg.n_embd), dtype),
        token_ids=jnp.zeros((batch, max_seqlen), jnp.int32),
    )


def insert_state_slot(big: WeightedDecodeState, small: WeightedDecodeState,
                      slot) -> WeightedDecodeState:
    """Admission: copy a batch-1 annealing state into row `slot` (the
    intervention analogue of bp.insert_cache_slot)."""
    def put(b, s):
        start = (jnp.asarray(slot, jnp.int32),) + (0,) * (b.ndim - 1)
        return jax.lax.dynamic_update_slice(b, s.astype(b.dtype), start)
    return WeightedDecodeState(sums=put(big.sums, small.sums),
                               tok_emb=put(big.tok_emb, small.tok_emb),
                               token_ids=put(big.token_ids, small.token_ids))


def _dequant_content_cache(cache: bp.BackpackCache) -> jax.Array:
    """-> (E, S, d) in a float dtype (flat cache layout per BackpackCache)."""
    if cache.quantized:
        return (cache.content.astype(jnp.float32)
                * cache.content_scale[..., None]).astype(jnp.bfloat16)
    return cache.content


def advance_weighted_state(params: Params, cfg: BackpackConfig,
                           input_ids: jax.Array, cache: bp.BackpackCache,
                           state: WeightedDecodeState,
                           content_weights: jax.Array, *,
                           anneal: bool = True, annealing_scale: float = 0.1,
                           upweight_nearby: bool = True,
                           token_mask: Optional[jax.Array] = None,
                           window: Optional[int] = None
                           ) -> Tuple[WeightedDecodeState, jax.Array]:
    """Advance the annealing statistics for the incoming tokens and return
    (state', weights (b, max_s, nv)) — the state update half of
    weighted_decode_step, exposed so the serving engine can mask weights
    per slot before the forward. Supports scalar or per-slot (b,) cache
    lengths. token_mask (b, s): False marks padding tokens (bucketed
    prefill) whose embeddings must not contribute to the annealing sums."""
    b, s = input_ids.shape
    offset = cache.length                       # scalar or (b,) per-slot
    vec = jnp.asarray(offset).ndim == 1
    off_col = offset[:, None] if vec else offset  # broadcast helper
    max_s = state.sums.shape[1]
    E = embedding_matrix(params["gpt"])

    from ..models.gpt import update_rows_axis
    c_new = bp.content_forward(params, cfg, input_ids)       # (b, s, nv, d)
    e_new = jnp.take(E, input_ids, axis=0)                   # (b, s, d)
    if token_mask is not None:
        # zeroed pad embeddings contribute relu(c . 0) = 0 everywhere
        e_new = e_new * token_mask[..., None].astype(e_new.dtype)
    token_ids = update_rows_axis(state.token_ids, input_ids, offset, axis=1)
    tok_emb = update_rows_axis(state.tok_emb,
                               e_new.astype(state.tok_emb.dtype), offset,
                               axis=1)

    if anneal:
        # (1) new columns: every cached position j < offset gains
        #     relu(C(x_j) . E[x_t]) for each new token t.
        content_all = _dequant_content_cache(cache)          # (E, S, d)
        nv = cfg.num_senses
        content_all = content_all.reshape(b, nv, max_s, -1)
        col = jnp.einsum("bkjd,btd->bjkt", content_all.astype(jnp.float32),
                         e_new.astype(jnp.float32))
        col = jnp.maximum(col, 0.0).sum(-1)                  # (b, max_s, nv)
        jpos = jnp.arange(max_s)[None, :]                    # (1, max_s)
        sums = state.sums + jnp.where((jpos < off_col)[..., None], col, 0.0)
        # (2) new rows: position t sums relu(C(x_t) . E[x_{j'}]) over all
        #     j' <= offset + s - 1 (incl. the other new tokens).
        row = jnp.einsum("btkd,bjd->btkj", c_new.astype(jnp.float32),
                         tok_emb.astype(jnp.float32))
        row = jnp.maximum(row, 0.0)
        valid = (jnp.arange(max_s)[None, :] < off_col + s)[:, None, None, :]
        row = jnp.where(valid, row, 0.0).sum(-1)             # (b, s, nv)
        sums = update_rows_axis(sums, row, offset, axis=1)
        scores = jax.nn.sigmoid(-annealing_scale * sums + 6.0)
        if upweight_nearby:
            scores = scores * (1.0 + jnp.arange(max_s) / 100.0)[None, :, None]
    else:
        sums = state.sums
        scores = jnp.ones((b, max_s, cfg.num_senses), jnp.float32)

    weights = soft_sense_mask(content_weights, token_ids, scores)
    return WeightedDecodeState(sums=sums, tok_emb=tok_emb,
                               token_ids=token_ids), weights


class NegativeDecodeState(NamedTuple):
    """O(t)-per-step state for negative-weighted (toxicity-removal) decode.

    The full forward (negative_weighted_forward / reference
    NegativeWeightedBackpackLMHeadModel, intervened_models.py:120-165) mixes
    per-sense *logits*: for key position j and sense k,

        mixed[k,j,v] = wcl  if wcl[k,j,v] < quantile_V(wcl[k,j,:])  else cl
        logits[t]    = sum_k alpha[k,t,:] @ mixed[k]

    with cl = C(x_j)[k] @ E^T and wcl = w[k,j] * cl. Because the annealed
    weight w[k,j] is a positive scalar over the vocab axis, the quantile is
    scale-equivariant: {wcl < quantile(wcl)} == {cl < quantile(cl)}. The
    suppressed vocab set per (position, sense) is therefore
    weight-INDEPENDENT and computable once when the token enters the cache,
    even though w itself keeps changing as the annealing statistics grow.
    Decomposing mixed = cl + (w-1) * cl * 1[cl < q_cl]:

        logits[t] = plain_decode_logits[t]
                    + sum_k sum_j alpha[k,t,j] (w[k,j]-1) * clneg[k,j,:]

    where clneg is sparse (the bottom `quantile` of the vocab, ~2%). The
    state caches that sparse set; each decode step costs one plain cached
    forward + an O(t * nv * quantile*V) sparse correction instead of the
    reference's full O(t^2) recompute with a (b, nv, s, V) logit tensor.

    Exactness requires w > 0 everywhere (all the reference's published
    weight tables are positive, e.g. test_toxicity.py modifier [8.5,1.1,1,1]).

    neg_vals/neg_idx: (b, S, nv, m) — bottom-m per-sense content logits and
    their vocab ids; thresh: (b, S, nv) — the exact jnp.quantile threshold
    (entries with val >= thresh inside the stored window are masked out, so
    the strict `<` of the reference is reproduced bit-for-bit)."""
    weighted: WeightedDecodeState
    neg_vals: jax.Array
    neg_idx: jax.Array
    thresh: jax.Array


def negative_m(vocab_size: int, quantile: float) -> int:
    """Entries strictly below a linear-interpolated quantile of n distinct
    values: at most floor(quantile * (n-1)) + 1."""
    return int(quantile * (vocab_size - 1)) + 1


def init_negative_decode_state(cfg: BackpackConfig, batch: int,
                               max_seqlen: int, *, quantile: float = 0.02
                               ) -> NegativeDecodeState:
    m = negative_m(cfg.padded_vocab_size, quantile)
    return NegativeDecodeState(
        weighted=init_weighted_decode_state(cfg, batch, max_seqlen),
        neg_vals=jnp.zeros((batch, max_seqlen, cfg.num_senses, m),
                           jnp.float32),
        neg_idx=jnp.zeros((batch, max_seqlen, cfg.num_senses, m), jnp.int32),
        thresh=jnp.zeros((batch, max_seqlen, cfg.num_senses), jnp.float32),
    )


def insert_negative_state_slot(big: NegativeDecodeState,
                               small: NegativeDecodeState,
                               slot) -> NegativeDecodeState:
    def put(b, s):
        start = (jnp.asarray(slot, jnp.int32),) + (0,) * (b.ndim - 1)
        return jax.lax.dynamic_update_slice(b, s.astype(b.dtype), start)
    return NegativeDecodeState(
        weighted=insert_state_slot(big.weighted, small.weighted, slot),
        neg_vals=put(big.neg_vals, small.neg_vals),
        neg_idx=put(big.neg_idx, small.neg_idx),
        thresh=put(big.thresh, small.thresh))


def negative_decode_step(params: Params, cfg: BackpackConfig,
                         input_ids: jax.Array, cache: bp.BackpackCache,
                         state: NegativeDecodeState,
                         content_weights: jax.Array, *,
                         anneal: bool = True, annealing_scale: float = 0.1,
                         upweight_nearby: bool = True, quantile: float = 0.02,
                         use_flash: bool = True,
                         negative_mask: Optional[jax.Array] = None,
                         sense_weights: Optional[jax.Array] = None,
                         token_mask: Optional[jax.Array] = None,
                         window: Optional[int] = None,
                         ) -> Tuple[jax.Array, bp.BackpackCache,
                                    NegativeDecodeState]:
    """One prefill (s >= 1 at offset 0) or decode (s == 1) step of
    negative-weighted generation at O(t) per step (see NegativeDecodeState;
    parity with negative_weighted_forward is enforced by
    tests/models/test_interventions.py).

    negative_mask (b,): rows with False decode plain (per-slot mixing in the
    serving engine). sense_weights: forwarded to the plain cached forward —
    for OTHER slots' weighted control sharing the batch, not for the negative
    rows themselves (the reference's negative model uses plain alpha/content,
    intervened_models.py:128-131). token_mask (b, s): False marks bucket
    padding (engine prefill). window: static length bucket (see
    backpack_forward_with_cache)."""
    b, s = input_ids.shape
    offset = cache.length
    vec = jnp.asarray(offset).ndim == 1
    E = embedding_matrix(params["gpt"])
    V = E.shape[0]
    m = state.neg_vals.shape[-1]
    nv, dnv = cfg.num_senses, cfg.sense_head_dim
    max_s = state.neg_vals.shape[1]

    wstate, weights = advance_weighted_state(
        params, cfg, input_ids, cache, state.weighted, content_weights,
        anneal=anneal, annealing_scale=annealing_scale,
        upweight_nearby=upweight_nearby, token_mask=token_mask,
        window=window)

    # sparse bottom-quantile content-logit sets of the incoming tokens
    from .gpt import update_rows_axis
    c_new = bp.content_forward(params, cfg, input_ids)       # (b, s, nv, d)
    cl = jnp.einsum("btkd,vd->btkv", c_new.astype(jnp.float32),
                    E.astype(jnp.float32))                   # (b, s, nv, V)
    thresh_new = jnp.quantile(cl, quantile, axis=-1)         # (b, s, nv)
    neg = jax.lax.top_k(-cl, m)
    vals_new, idx_new = -neg[0], neg[1]                      # (b, s, nv, m)
    neg_vals = update_rows_axis(state.neg_vals, vals_new, offset, axis=1)
    neg_idx = update_rows_axis(state.neg_idx, idx_new, offset, axis=1)
    thresh = update_rows_axis(state.thresh, thresh_new, offset, axis=1)

    # plain incremental forward (term 1: sum_k alpha @ cl == plain logits)
    logits, cache, q = bp.backpack_forward_with_cache(
        params, cfg, input_ids, cache, use_flash=use_flash,
        sense_weights=sense_weights, window=window, return_ctx_q=True)

    # rebuild the new alpha rows against the (updated) ctx_k cache,
    # reading only the `window` prefix when bucketed
    max_cache = cache.ctx_k.shape[-1]
    S = min(window, max_cache) if window is not None else max_cache
    dnv_pad = cfg.sense_head_dim_padded
    k4 = cache.ctx_k[:, :, :S].reshape(b, nv, dnv_pad, S)
    scale = dnv ** -0.5
    q_pad = (jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, dnv_pad - dnv)))
             if dnv_pad != dnv else q)
    scores = jnp.einsum("btkd,bkds->bkts",
                        (q_pad.astype(jnp.float32) * scale).astype(q.dtype),
                        k4.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    if cache.quantized:
        scores = scores * cache.ctx_k_scale[:, :S].reshape(b, nv, S
                                                           )[:, :, None, :]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (s, S), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (s, S), 1)
    off_b = offset[:, None, None] if vec else offset
    causal = kpos[None] <= (qpos[None] + off_b)              # (b|1, s, S)
    if not vec:
        causal = jnp.broadcast_to(causal, (b, s, S))
    from ..ops.attention import MASK_VALUE
    scores = jnp.where(causal[:, None], scores, MASK_VALUE)
    alpha = jax.nn.softmax(scores, axis=-1)                  # (b, nv, s, S)

    # term 2: sparse correction sum_j alpha * (w-1) * clneg
    w_jk = weights[:, :S].astype(jnp.float32)                # (b, S, nv)
    vals_eff = jnp.where(neg_vals < thresh[..., None],
                         neg_vals, 0.0)[:, :S]               # (b, S, nv, m)
    coeff = jnp.einsum("bkts,bsk->btsk", alpha, w_jk - 1.0)  # (b, s, S, nv)
    contrib = coeff[..., None] * vals_eff[:, None]           # (b, s, S, nv, m)
    if negative_mask is not None:
        contrib = contrib * negative_mask.astype(jnp.float32
                                                 )[:, None, None, None, None]
    flat_idx = neg_idx[:, :S].reshape(b, -1)                 # (b, S*nv*m)
    flat_contrib = contrib.reshape(b, s, -1)

    def scatter_one(vals, idx):                              # (s, N), (N,)
        return jnp.zeros((s, V), jnp.float32).at[:, idx].add(vals)

    correction = jax.vmap(scatter_one)(flat_contrib, flat_idx)
    logits = logits.astype(jnp.float32) + correction
    return logits, cache, NegativeDecodeState(
        weighted=wstate, neg_vals=neg_vals, neg_idx=neg_idx, thresh=thresh)


def weighted_decode_step(params: Params, cfg: BackpackConfig,
                         input_ids: jax.Array, cache: bp.BackpackCache,
                         state: WeightedDecodeState,
                         content_weights: jax.Array, *,
                         anneal: bool = True, annealing_scale: float = 0.1,
                         upweight_nearby: bool = True,
                         use_flash: bool = True
                         ) -> Tuple[jax.Array, bp.BackpackCache,
                                    WeightedDecodeState]:
    """One prefill (s >= 1 at offset 0) or decode (s == 1) step of
    weighted-Backpack generation with incrementally-maintained annealing.
    Matches weighted_forward token-for-token (tests/models/
    test_interventions.py) at O(t) per step instead of the reference's O(t^2)
    full-prefix recompute."""
    state, weights = advance_weighted_state(
        params, cfg, input_ids, cache, state, content_weights,
        anneal=anneal, annealing_scale=annealing_scale,
        upweight_nearby=upweight_nearby)
    logits, cache = bp.backpack_forward_with_cache(
        params, cfg, input_ids, cache, use_flash=use_flash,
        sense_weights=weights)
    return logits, cache, state
