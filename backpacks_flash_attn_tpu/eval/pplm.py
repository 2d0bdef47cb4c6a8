"""PPLM (Plug-and-Play LM) baseline: gradient-steered decoding.

Reference: training/run_pplm.py:96-266 — at each decode step, perturb the
GPT's past key/values by gradient ascent on a bag-of-words attribute loss of
the next-token distribution, anchored by a KL term against the unperturbed
distribution, with per-tensor gradient-norm normalization; then sample from
the geometric fusion p_pert^gm * p_unpert^(1-gm).

The torch original loops autograd through past_key_values with retain_graph
and manual .grad bookkeeping (~170 lines); here the perturbation is
jax.grad over a delta pytree on the KV cache — one jittable function.
Faithful to the core math; the reference's decay-window mask over past
positions (run_pplm.py:135-160) is approximated by perturbing only the last
`window` positions (the window's purpose).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GPTConfig
from ..models import gpt as gpt_lib

EPS = 1e-10


def _next_token_logprobs(params, cfg, token, cache):
    hidden, _ = gpt_lib.gpt_forward_with_cache(params, cfg, token, cache)
    logits = gpt_lib.lm_logits(params, cfg, hidden)[:, -1]
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def perturb_cache(params, cfg: GPTConfig, cache, token: jax.Array,
                  bow_vec: jax.Array, *, stepsize: float = 0.02,
                  num_iterations: int = 3, kl_scale: float = 0.01,
                  window: Optional[int] = None):
    """Gradient-ascend a (dk, dv) delta on the cache toward the bag-of-words
    loss  -log sum_{w in BoW} p(w | past + delta)  + kl_scale * KL(p || p0)
    (reference run_pplm.py:96-266). Returns the perturbed cache."""
    logp0 = _next_token_logprobs(params, cfg, token, cache)
    p0 = jnp.exp(logp0)

    S = cache.k.shape[-1]
    if window is not None:
        # perturb only the trailing `window` positions before cache.length
        pos = jnp.arange(S)
        live = ((pos < cache.length) &
                (pos >= cache.length - window)).astype(jnp.float32)
    else:
        live = (jnp.arange(S) < cache.length).astype(jnp.float32)
    k_mask = live[None, None, :]            # k: (L, E, dk, S)
    v_mask = live[None, :, None]            # v: (L, E, S, dv)

    def loss_fn(delta):
        dk, dv = delta
        pert = cache._replace(
            k=(cache.k.astype(jnp.float32) + dk * k_mask).astype(cache.k.dtype),
            v=(cache.v.astype(jnp.float32) + dv * v_mask).astype(cache.v.dtype))
        logp = _next_token_logprobs(params, cfg, token, pert)
        p = jnp.exp(logp)
        bow_loss = -jnp.log(jnp.sum(p * bow_vec[None, :], axis=-1) + EPS)
        kl = jnp.sum(p * (logp - logp0), axis=-1)
        return jnp.mean(bow_loss + kl_scale * kl)

    def one_iter(delta, _):
        grads = jax.grad(loss_fn)(delta)
        # per-tensor grad-norm normalization (run_pplm.py:217-224). The
        # normalization would amplify pure numerical noise into an
        # O(stepsize) push when the true gradient vanishes (e.g. an empty
        # BoW), so degenerate gradients are dropped.
        def upd(d, g):
            n = jnp.linalg.norm(g.reshape(-1))
            return jnp.where(n > 1e-6, d - stepsize * g / (n + EPS), d)
        return jax.tree.map(upd, delta, grads), None

    delta0 = (jnp.zeros(cache.k.shape, jnp.float32),
              jnp.zeros(cache.v.shape, jnp.float32))
    delta, _ = jax.lax.scan(one_iter, delta0, None, length=num_iterations)
    dk, dv = delta
    return cache._replace(
        k=(cache.k.astype(jnp.float32) + dk * k_mask).astype(cache.k.dtype),
        v=(cache.v.astype(jnp.float32) + dv * v_mask).astype(cache.v.dtype))


def pplm_generate(params, cfg: GPTConfig, prompt_ids, bow_ids: Sequence[int],
                  *, max_new_tokens: int = 20, stepsize: float = 0.02,
                  num_iterations: int = 3, kl_scale: float = 0.01,
                  gm_scale: float = 0.9, temperature: float = 0.0,
                  window: Optional[int] = None,
                  rng: Optional[jax.Array] = None,
                  max_seqlen: Optional[int] = None) -> np.ndarray:
    """PPLM decoding loop (reference full_text_generation/generate_text_pplm,
    run_pplm.py:389-560): per step, perturb the past, fuse the perturbed and
    unperturbed distributions geometrically, emit. Returns (b, n) ids."""
    prompt_ids = jnp.asarray(prompt_ids, jnp.int32)
    b, p = prompt_ids.shape
    S = max_seqlen or (p + max_new_tokens + 1)
    bow_vec = np.zeros((cfg.padded_vocab_size,), np.float32)
    if len(list(bow_ids)):
        bow_vec[np.asarray(list(bow_ids), np.int64)] = 1.0
    bow_vec = jnp.asarray(bow_vec)

    cache = gpt_lib.init_kv_cache(cfg, b, S, jnp.float32)
    # prefill on all but the last prompt token; the loop perturbs before
    # consuming the last token (the reference's protocol)
    if p > 1:
        _, cache = gpt_lib.gpt_forward_with_cache(params, cfg,
                                                  prompt_ids[:, :-1], cache)
    token = prompt_ids[:, -1:]

    step = functools.partial(perturb_cache, params, cfg,
                             stepsize=stepsize,
                             num_iterations=num_iterations,
                             kl_scale=kl_scale, window=window)
    out = []
    for i in range(max_new_tokens):
        pert = step(cache, token, bow_vec=bow_vec)
        logp_pert = _next_token_logprobs(params, cfg, token, pert)
        logp_unpert = _next_token_logprobs(params, cfg, token, cache)
        # geometric fusion (run_pplm.py:501-510)
        logp = gm_scale * logp_pert + (1.0 - gm_scale) * logp_unpert
        if temperature > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, logp / temperature)
        else:
            nxt = jnp.argmax(logp, -1)
        # advance the REAL (unperturbed-weights) cache with the chosen token
        _, cache = gpt_lib.gpt_forward_with_cache(params, cfg, token, cache)
        token = nxt.astype(jnp.int32)[:, None]
        out.append(np.asarray(token[:, 0]))
    return np.stack(out, axis=1)
