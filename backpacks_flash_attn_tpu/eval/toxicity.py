"""Toxicity / sentiment suppression experiment runner.

Reference: training/src/test_toxicity.py:1-217 — build a bag-of-words target
over toxic tokens with weight -1, localize senses against it
(non_contextual_localize), bucket the scores into multiplicative weights
(ninety_weights_from_scores with modifier [8.5, 1.1, 1, 1]), decode with
NegativeWeightedBackpackLMHeadModel(anneal=False), and score generations with
an external toxicity classifier (evaluate/detoxify — network-gated here, so
the scorer is a pluggable callable, same policy as eval/control.py).

The reference generates with a full O(t^2) forward per token; here
generation rides the O(t)-per-step incremental negative-weighted decode
(models/interventions.negative_decode_step), which is parity-tested against
the full forward."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackpackConfig
from ..models import backpack as bp
from ..models import interventions as iv
from .control import sense_vocab_scores

# reference test_toxicity.py:166-184: modifier_dict[0]
TOXICITY_MODIFIERS: List[float] = [8.5, 1.1, 1.0, 1.0]

# reference test_toxicity.py:155-158: the toxic bag-of-words (tokenized with
# a leading space; ids resolved by the caller's tokenizer)
TOXIC_WORDS = (" hate", " ugly", " idiot", " terror", " fuck")


def negative_target_vector(word_ids: Sequence[int],
                           vocab_size: int) -> jax.Array:
    """-1 bag-of-words target (test_toxicity.py:155-159): senses ALIGNED with
    toxic tokens score low, so the top quantile buckets (upweighted 8.5x)
    are the anti-toxic senses."""
    v = np.zeros((vocab_size,), np.float32)
    if len(list(word_ids)):
        v[np.asarray(list(word_ids), np.int64)] = -1.0
    return jnp.asarray(v)


def ninety_weights_from_scores(scores: jax.Array,
                               quantile_weights: Sequence[float] =
                               tuple(TOXICITY_MODIFIERS)) -> jax.Array:
    """90/80/60-quantile bucketing (reference ninety_weights_from_scores,
    test_toxicity.py:78-96). scores: (nv, V) -> (V, nv) weight table."""
    s = scores.astype(jnp.float32)
    q90, q80, q60 = (jnp.quantile(s.reshape(-1), q) for q in (0.90, 0.80, 0.60))
    w = jnp.ones_like(s)
    w = jnp.where(q90 < s, quantile_weights[0], w)
    w = jnp.where((q80 < s) & (s < q90), quantile_weights[1], w)
    w = jnp.where((q60 < s) & (s < q80), quantile_weights[2], w)
    w = jnp.where(s < q60, quantile_weights[3], w)
    return w.T


def toxicity_weights(params, cfg: BackpackConfig,
                     toxic_word_ids: Sequence[int], *,
                     modifiers: Sequence[float] = tuple(TOXICITY_MODIFIERS),
                     chunk: int = 512):
    """Target words -> localization -> (V, nv) weight table + annealing scale
    (reference test_toxicity.py:159-195; annealing_scale = max(modifiers)/25)."""
    tv = negative_target_vector(toxic_word_ids, cfg.padded_vocab_size)
    scores = sense_vocab_scores(params, cfg, tv, chunk=chunk)
    table = ninety_weights_from_scores(scores, modifiers)
    return table, max(modifiers) / 25.0


def generate_negative(params, cfg: BackpackConfig, prompt_ids, table, *,
                      max_new_tokens: int = 64, quantile: float = 0.02,
                      anneal: bool = False, annealing_scale: float = 0.34,
                      temperature: float = 0.0,
                      rng: Optional[jax.Array] = None,
                      max_seqlen: Optional[int] = None,
                      use_flash: bool = True) -> np.ndarray:
    """Suppressed generation with the O(t) incremental negative-weighted
    decode. prompt_ids: (b, p). Returns (b, max_new_tokens) token ids.
    anneal=False matches the reference's toxicity configuration
    (test_toxicity.py:195)."""
    prompt_ids = jnp.asarray(prompt_ids, jnp.int32)
    b, p = prompt_ids.shape
    S = max_seqlen or (p + max_new_tokens)
    cache = bp.init_backpack_cache(cfg, b, S, dtype=jnp.bfloat16)
    state = iv.init_negative_decode_state(cfg, b, S, quantile=quantile)
    step = jax.jit(lambda ids, cache, state: iv.negative_decode_step(
        params, cfg, ids, cache, state, table, anneal=anneal,
        annealing_scale=annealing_scale, quantile=quantile,
        use_flash=use_flash))
    logits, cache, state = step(prompt_ids, cache, state)
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
            logits, cache, state = step(tok, cache, state)
    return np.stack(out, axis=1)


def run_toxicity_experiment(params, cfg: BackpackConfig,
                            toxic_word_ids: Sequence[int], prompt_ids, *,
                            modifiers: Sequence[float] =
                            tuple(TOXICITY_MODIFIERS),
                            max_new_tokens: int = 32,
                            temperature: float = 1.0,
                            rng: Optional[jax.Array] = None,
                            scorer: Optional[Callable] = None,
                            include_baseline: bool = True,
                            use_flash: bool = True,
                            chunk: int = 512) -> Dict[str, Dict]:
    """The test_toxicity.py experiment loop: localize -> weight table ->
    suppressed generation -> (optionally) score with
    scorer(generations (b, n) ids) -> {'toxicity': per-sample scores, ...}.
    The reference reports ratio (score > 0.5) and mean; those are computed
    here whenever the scorer returns a 'toxicity' vector
    (test_toxicity.py:203-206)."""
    table, ann = toxicity_weights(params, cfg, toxic_word_ids,
                                  modifiers=modifiers, chunk=chunk)
    results: Dict[str, Dict] = {}
    runs = {"suppressed": table}
    if include_baseline:
        runs["baseline"] = jnp.ones_like(table)
    for name, tbl in runs.items():
        gens = generate_negative(params, cfg, prompt_ids, tbl,
                                 anneal=False, annealing_scale=ann,
                                 max_new_tokens=max_new_tokens,
                                 temperature=temperature, rng=rng,
                                 use_flash=use_flash)
        entry: Dict = {"generations": gens}
        if scorer is not None:
            metrics = scorer(gens)
            entry["metrics"] = metrics
            tox = np.asarray(metrics.get("toxicity", []), np.float32)
            if tox.size:
                entry["ratio"] = float((tox > 0.5).mean())
                entry["avg"] = float(tox.mean())
        results[name] = entry
    return results
