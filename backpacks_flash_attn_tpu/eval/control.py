"""Topic / sentiment / toxicity control pipeline + sense-vocabulary
introspection.

Reference: training/src/test_topic.py:42-210 (generate with
WeightedBackpackLMHeadModel at strengths 0-3, score with an external
classifier), training/src/rank_vocab.py:37-99 (non_contextual_localize +
weights_from_scores), training/src/visualize_vocab.py:62-86 (top-k vocab per
sense). The external scorers (cardiffnlp tweet-topic classifier, GPT-2-large
NLL, MAUVE) need network/model downloads, so they are pluggable callables
here; everything up to scoring is self-contained.

The reference's control generation re-runs the full O(t^2) forward per token
(training/src/utils/generation.py); generate_weighted below rides the O(t)
incremental annealed decode (models/interventions.py).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackpackConfig
from ..models import backpack as bp
from ..models import interventions as iv

# strength -> quantile multipliers (reference test_topic.py modifier_dict)
STRENGTH_MODIFIERS: Dict[int, List[float]] = {
    0: [1.0, 1.0, 1.0, 1.0],
    1: [1.5, 1.5, 1.3, 1.0],
    2: [2.2, 2.2, 1.5, 1.0],
    3: [3.3, 3.3, 3.0, 1.0],
}


def target_vector(word_ids: Sequence[int], vocab_size: int) -> jax.Array:
    """One-hot bag-of-words target over the vocab (test_topic.py:160-166)."""
    v = np.zeros((vocab_size,), np.float32)
    if len(list(word_ids)):
        v[np.asarray(list(word_ids), np.int64)] = 1.0
    return jnp.asarray(v)


def sense_vocab_scores(params, cfg: BackpackConfig, target_vec: jax.Array,
                       *, chunk: int = 512,
                       eos_id: int = 50256) -> jax.Array:
    """Per-(sense, word) topic-affinity scores: for each vocabulary word w,
    score[k, w] = (E C(w)[k] / max_v E C(w)[k]_v) . target  — the max-
    normalized per-sense log-distribution dotted with the bag-of-words
    target (reference non_contextual_localize, rank_vocab.py:69-85).
    Returns (nv, vocab)."""
    V = cfg.padded_vocab_size
    nv = cfg.num_senses
    E = iv.embedding_matrix(params["gpt"]).astype(jnp.float32)

    def one_chunk(ids):
        content = bp.content_forward(params, cfg, ids[None])[0]   # (c, nv, d)
        ld = jnp.einsum("ckd,vd->ckv", content.astype(jnp.float32), E)
        ld = ld / jnp.max(ld, axis=-1, keepdims=True)
        return jnp.einsum("ckv,v->ck", ld, target_vec)             # (c, nv)

    n_chunks = -(-V // chunk)
    ids = jnp.pad(jnp.arange(V), (0, n_chunks * chunk - V),
                  constant_values=eos_id)
    scores = jax.lax.map(one_chunk, ids.reshape(n_chunks, chunk))
    return scores.reshape(-1, nv)[:V].T                            # (nv, V)


def weights_from_scores(scores: jax.Array,
                        quantile_weights: Sequence[float] = (1.4, 1.2, 1.0, 0.8)
                        ) -> jax.Array:
    """Bucket scores by their 95/80/60 quantiles into multiplicative weights
    (reference weights_from_scores, rank_vocab.py:37-68). scores: (nv, V);
    returns the (V, nv) table expected by the weighted-decode API."""
    s = scores.astype(jnp.float32)
    q95, q80, q60 = (jnp.quantile(s.reshape(-1), q) for q in (0.95, 0.80, 0.60))
    w = jnp.full_like(s, quantile_weights[3])
    w = jnp.where((q60 < s) & (s < q80), quantile_weights[2], w)
    w = jnp.where((q80 < s) & (s < q95), quantile_weights[1], w)
    w = jnp.where(q95 < s, quantile_weights[0], w)
    return w.T                                                     # (V, nv)


def control_weights(params, cfg: BackpackConfig, word_ids: Sequence[int],
                    strength: int = 1, *, chunk: int = 512):
    """End-to-end: target words -> localization -> quantile-bucketed
    (V, nv) weight table + the annealing scale (reference test_topic.py:
    162-171; annealing_scale = max(modifiers)/7.5)."""
    modifiers = STRENGTH_MODIFIERS[strength]
    tv = target_vector(word_ids, cfg.padded_vocab_size)
    scores = sense_vocab_scores(params, cfg, tv, chunk=chunk)
    table = weights_from_scores(scores, modifiers)
    return table, max(modifiers) / 7.5


def generate_weighted(params, cfg: BackpackConfig, prompt_ids, table, *,
                      max_new_tokens: int = 64, annealing_scale: float = 0.2,
                      anneal: bool = True, temperature: float = 0.0,
                      rng: Optional[jax.Array] = None,
                      max_seqlen: Optional[int] = None,
                      use_flash: bool = True) -> np.ndarray:
    """Controlled generation with the O(t) incremental annealed decode.
    prompt_ids: (b, p). Returns (b, max_new_tokens) token ids."""
    prompt_ids = jnp.asarray(prompt_ids, jnp.int32)
    b, p = prompt_ids.shape
    S = max_seqlen or (p + max_new_tokens)
    cache = bp.init_backpack_cache(cfg, b, S, dtype=jnp.bfloat16)
    state = iv.init_weighted_decode_state(cfg, b, S)
    logits, cache, state = iv.weighted_decode_step(
        params, cfg, prompt_ids, cache, state, table, anneal=anneal,
        annealing_scale=annealing_scale, use_flash=use_flash)
    out = []
    for i in range(max_new_tokens):
        last = logits[:, -1]
        if temperature > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            tok = jax.random.categorical(sub, last / temperature)
        else:
            tok = jnp.argmax(last, -1)
        tok = tok.astype(jnp.int32)[:, None]
        out.append(np.asarray(tok[:, 0]))
        if i < max_new_tokens - 1:
            logits, cache, state = iv.weighted_decode_step(
                params, cfg, tok, cache, state, table, anneal=anneal,
                annealing_scale=annealing_scale, use_flash=use_flash)
    return np.stack(out, axis=1)


def run_control_experiment(params, cfg: BackpackConfig,
                           word_ids: Sequence[int], prompt_ids, *,
                           strengths: Sequence[int] = (0, 1, 2, 3),
                           max_new_tokens: int = 32,
                           scorer: Optional[Callable] = None,
                           use_flash: bool = True,
                           chunk: int = 512) -> Dict[int, Dict]:
    """The test_topic.py experiment loop: for each strength, build weights,
    generate, and (optionally) score with a user-supplied
    scorer(generations (b, n) ids) -> dict of metrics (the reference scores
    with an external topic classifier + GPT-2-large NLL + MAUVE —
    network-gated, hence pluggable)."""
    results = {}
    for strength in strengths:
        table, ann = control_weights(params, cfg, word_ids, strength,
                                     chunk=chunk)
        gens = generate_weighted(params, cfg, prompt_ids, table,
                                 annealing_scale=ann,
                                 anneal=strength > 0,
                                 max_new_tokens=max_new_tokens,
                                 use_flash=use_flash)
        entry: Dict = {"generations": gens}
        if scorer is not None:
            entry["metrics"] = scorer(gens)
        results[strength] = entry
    return results


# ------------------------------------------------------------- introspection

def top_vocab_per_sense(params, cfg: BackpackConfig, word_id: int,
                        k: int = 10):
    """Top-k (and bottom-k) vocabulary items per sense of `word_id` — the
    sense-visualization primitive (reference visualize_vocab.py:62-86,
    'visualize_word'). Returns dict sense -> (top_ids, top_scores,
    bottom_ids, bottom_scores)."""
    senses = iv.senses_of_word(params, cfg, word_id)        # (nv, d)
    logits = np.asarray(iv.per_sense_logits(params, cfg, senses))
    out = {}
    for s in range(cfg.num_senses):
        order = np.argsort(logits[s])
        out[s] = {
            "top_ids": order[::-1][:k].tolist(),
            "top_scores": logits[s][order[::-1][:k]].tolist(),
            "bottom_ids": order[:k].tolist(),
            "bottom_scores": logits[s][order[:k]].tolist(),
        }
    return out
