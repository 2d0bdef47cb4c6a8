"""Generation: KV-cached greedy decode and sampling.

Replaces both reference decode paths:
  * flash_attn/utils/generation.py:23-57 (KV-cached greedy for GPT)
  * training/src/utils/generation.py (Backpack full-prefix-recompute sample/
    greedy — the O(t^2) path this engine eliminates)

The whole decode loop is a single jitted lax.while-free program: prefill once,
then lax.scan over decode steps with a static-shape cache, so generation
compiles once per (batch, prompt_len, max_length) signature.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import BackpackConfig, GPTConfig
from ..models import backpack as bp
from ..models import gpt as gpt_lib


class GenerationOutput(NamedTuple):
    sequences: jax.Array          # (b, max_length)
    scores: Optional[jax.Array]   # (b, n_generated, vocab) or None


def _select_next(logits: jax.Array, rng: Optional[jax.Array],
                 temperature: float, top_k: int,
                 top_p: float = 1.0) -> jax.Array:
    """Greedy if rng is None, else temperature (+ optional top-k and/or
    nucleus top-p) sampling. (The reference samples plain multinomial,
    training/src/utils/generation.py:22-47.)"""
    if rng is None:
        return jnp.argmax(logits, axis=-1)
    logits = logits / max(temperature, 1e-6)
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        # keep the smallest prefix of descending-prob tokens with cumulative
        # probability > top_p (the last kept token crosses the threshold)
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < top_p          # first token always kept
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                         keepdims=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def _decode_loop(step_fn: Callable, cache, first_logits, input_ids, max_length,
                 rng, temperature, top_k, top_p, output_scores):
    b, prompt_len = input_ids.shape
    n_steps = max_length - prompt_len
    next_token = _select_next(first_logits, rng if rng is None else
                              jax.random.fold_in(rng, 0), temperature, top_k,
                              top_p)

    def body(carry, i):
        cache, token = carry
        logits, cache = step_fn(token[:, None], cache)
        logits = logits[:, -1]
        step_rng = None if rng is None else jax.random.fold_in(rng, i + 1)
        new_token = _select_next(logits, step_rng, temperature, top_k,
                                 top_p)
        out = (token, logits) if output_scores else (token, ())
        return (cache, new_token), out

    (cache, last_token), (tokens, scores) = jax.lax.scan(
        body, (cache, next_token), jnp.arange(1, n_steps))
    sequences = jnp.concatenate(
        [input_ids, tokens.T, last_token[:, None]], axis=1)
    if output_scores:
        all_scores = jnp.concatenate([first_logits[:, None],
                                      jnp.swapaxes(scores, 0, 1)], axis=1)
    else:
        all_scores = None
    return GenerationOutput(sequences=sequences, scores=all_scores)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_length", "greedy", "temperature", "top_k", "top_p",
    "output_scores", "use_flash", "cache_dtype"))
def generate_backpack(params, cfg: BackpackConfig, input_ids: jax.Array,
                      max_length: int, *, rng: Optional[jax.Array] = None,
                      greedy: Optional[bool] = None, temperature: float = 1.0,
                      top_k: int = 0, top_p: float = 1.0,
                      output_scores: bool = False,
                      use_flash: bool = True,
                      sense_weights: Optional[jax.Array] = None,
                      sense_edit=None,
                      cache_dtype=jnp.bfloat16) -> GenerationOutput:
    """Incremental Backpack generation (the engine's flagship decode path).
    sense_weights / sense_edit thread the intervention hooks (§2.4) through
    every prefill/decode step."""
    if greedy is None:
        greedy = rng is None or temperature <= 0
    if temperature <= 0:
        temperature = 1.0
    b, prompt_len = input_ids.shape
    cache = bp.init_backpack_cache(cfg, b, max_length, cache_dtype)
    step_fn = functools.partial(bp.backpack_forward_with_cache, params, cfg,
                                use_flash=use_flash,
                                sense_weights=sense_weights,
                                sense_edit=sense_edit)
    logits, cache = step_fn(input_ids, cache)
    return _decode_loop(step_fn, cache, logits[:, -1], input_ids, max_length,
                        None if greedy else rng, temperature, top_k, top_p,
                        output_scores)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_length", "greedy", "temperature", "top_k", "top_p",
    "output_scores", "use_flash", "cache_dtype"))
def generate_gpt(params, cfg: GPTConfig, input_ids: jax.Array,
                 max_length: int, *, rng: Optional[jax.Array] = None,
                 greedy: bool = True, temperature: float = 1.0,
                 top_k: int = 0, top_p: float = 1.0,
                 output_scores: bool = False,
                 use_flash: bool = True,
                 cache_dtype=jnp.bfloat16) -> GenerationOutput:
    """KV-cached GPT generation (reference: flash_attn/utils/generation.py:23-57)."""
    b, prompt_len = input_ids.shape
    cache = gpt_lib.init_kv_cache(cfg, b, max_length, cache_dtype)
    hidden, cache = gpt_lib.gpt_forward_with_cache(
        params, cfg, input_ids, cache, use_flash=use_flash)
    logits = gpt_lib.lm_logits(params, cfg, hidden)

    def step(ids, c):
        h, c = gpt_lib.gpt_forward_with_cache(params, cfg, ids, c,
                                              use_flash=use_flash)
        return gpt_lib.lm_logits(params, cfg, h), c

    return _decode_loop(step, cache, logits[:, -1], input_ids, max_length,
                        None if greedy else rng, temperature, top_k, top_p,
                        output_scores)


def generate_backpack_recompute(params, cfg: BackpackConfig,
                                input_ids: jax.Array, max_length: int, *,
                                use_flash: bool = False) -> jax.Array:
    """Oracle decode that re-runs the full forward each step, mirroring the
    reference's behavior (training/src/utils/generation.py:50-76). Used only in
    tests to validate the incremental path token-for-token."""
    ids = input_ids
    while ids.shape[1] < max_length:
        logits = bp.backpack_forward(params, cfg, ids, use_flash=use_flash)
        next_token = jnp.argmax(logits[:, -1], axis=-1)
        ids = jnp.concatenate([ids, next_token[:, None]], axis=1)
    return ids
