"""Gender-bias reduction experiment: sense-10 counterfactual scaling vs the
embedding-projection baseline.

Reference: training/src/test_genderbias.py — for career-noun prompts ending
just before a pronoun, measure the he/she probability ratio; reduce it by
(a) scaling the contextualization columns of sense 10 at the career-noun
positions by `percent` (modulate, :60-91) or (b) projecting the gender
direction out of the embedding rows (modulate_baseline, :83-140); pick
`percent` by Nelder-Mead over bias + |1-percent| regularization (:186-210);
report the side-effect divergence of the rest of the distribution (:168-185).

Everything here is tokenizer-agnostic: prompts arrive as token-id sequences;
the caller decides how words map to ids (the reference hardcodes GPT-2).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackpackConfig
from ..models import backpack as bp
from ..models import interventions as iv


def pronoun_logits(params, cfg: BackpackConfig, prompt_ids: Sequence[int], *,
                   job_ids: Sequence[int], sense_index: int = 10,
                   percent: float = 1.0,
                   use_flash: bool = True) -> jax.Array:
    """Next-token logits after counterfactually scaling `sense_index`'s
    contextualization at the career-noun positions (reference modulate,
    test_genderbias.py:60-91 — sense 10 carries gender association)."""
    ids = jnp.asarray(prompt_ids, jnp.int32)[None]
    logits = iv.counterfactual_forward(params, cfg, ids,
                                       jnp.asarray(list(job_ids), jnp.int32),
                                       sense_index, percent,
                                       use_flash=use_flash)
    return logits[0, -1]


def bias_score(params, cfg: BackpackConfig, prompts: Sequence[Sequence[int]],
               *, him_id: int, her_id: int, job_ids: Sequence[int],
               sense_index: int = 10, percent: float = 1.0,
               regularize: float = 0.0, use_flash: bool = True) -> float:
    """mean over prompts of max(p(he)/p(she), p(she)/p(he)) at the pronoun
    slot (reference bias_fn, test_genderbias.py:187-203). 1.0 = unbiased."""
    total = 0.0
    for p in prompts:
        lg = pronoun_logits(params, cfg, p, job_ids=job_ids,
                            sense_index=sense_index, percent=percent,
                            use_flash=use_flash)
        probs = jax.nn.softmax(lg.astype(jnp.float32))
        him, her = float(probs[him_id]), float(probs[her_id])
        total += max(him / max(her, 1e-20), her / max(him, 1e-20))
    score = total / len(prompts)
    return score + regularize * abs(1.0 - percent)


def divergence(params, cfg: BackpackConfig, prompts: Sequence[Sequence[int]],
               *, him_id: int, her_id: int, job_ids: Sequence[int],
               sense_index: int = 10, percent: float = 1.0,
               use_flash: bool = True) -> float:
    """Side-effect metric: mean |log p_modified - log p_original| over the
    vocab (pronoun entries excluded), averaged over prompts (reference
    divergence_fn, test_genderbias.py:168-185)."""
    total = 0.0
    for p in prompts:
        mod = jax.nn.log_softmax(pronoun_logits(
            params, cfg, p, job_ids=job_ids, sense_index=sense_index,
            percent=percent, use_flash=use_flash).astype(jnp.float32))
        orig = jax.nn.log_softmax(pronoun_logits(
            params, cfg, p, job_ids=job_ids, sense_index=sense_index,
            percent=1.0, use_flash=use_flash).astype(jnp.float32))
        ratio = np.abs(np.asarray(mod - orig))
        ratio[[him_id, her_id]] = 0.0
        total += float(ratio.mean())
    return total / len(prompts)


def estimate_percent(params, cfg: BackpackConfig,
                     prompts: Sequence[Sequence[int]], *, him_id: int,
                     her_id: int, job_ids: Sequence[int],
                     sense_index: int = 10, use_flash: bool = True,
                     maxiter: int = 25) -> float:
    """Nelder-Mead over the regularized bias objective (reference
    estimate_weight, test_genderbias.py:205-212)."""
    from scipy.optimize import minimize

    def fn(x):
        return bias_score(params, cfg, prompts, him_id=him_id, her_id=her_id,
                          job_ids=job_ids, sense_index=sense_index,
                          percent=float(x[0]), regularize=1.0,
                          use_flash=use_flash)

    res = minimize(fn, [1.0], method="Nelder-Mead",
                   options={"maxiter": maxiter})
    return float(res.x[0])


def run_genderbias_experiment(params, cfg: BackpackConfig,
                              train_prompts: Sequence[Sequence[int]],
                              test_prompts: Sequence[Sequence[int]], *,
                              him_id: int, her_id: int,
                              job_ids: Sequence[int],
                              sense_index: int = 10,
                              use_flash: bool = True,
                              maxiter: int = 25) -> Dict[str, float]:
    """Fit `percent` on train prompts, report bias before/after + divergence
    on test prompts (the reference's experiment loop)."""
    kw = dict(him_id=him_id, her_id=her_id, job_ids=job_ids,
              sense_index=sense_index, use_flash=use_flash)
    percent = estimate_percent(params, cfg, train_prompts, maxiter=maxiter,
                               **kw)
    return {
        "percent": percent,
        "bias_before": bias_score(params, cfg, test_prompts, percent=1.0,
                                  **kw),
        "bias_after": bias_score(params, cfg, test_prompts, percent=percent,
                                 **kw),
        "divergence": divergence(params, cfg, test_prompts, percent=percent,
                                 **kw),
    }


def baseline_projection_logits(params, cfg: BackpackConfig,
                               prompt_ids: Sequence[int], *, him_id: int,
                               her_id: int, percent: float,
                               use_flash: bool = True) -> jax.Array:
    """The non-Backpack baseline: project the (she - he) direction out of the
    embedding table by (1 - percent) and rerun (reference modulate_baseline,
    test_genderbias.py:124-160). Works on any tied-embedding model here."""
    E = iv.embedding_matrix(params["gpt"])
    direction = E[her_id] - E[him_id]
    fixed = iv.project_out_embeddings(E, direction, percent)
    patched = dict(params)
    patched["gpt"] = dict(params["gpt"])
    patched["gpt"]["wte"] = fixed
    ids = jnp.asarray(prompt_ids, jnp.int32)[None]
    return bp.backpack_forward(patched, cfg, ids, use_flash=use_flash)[0, -1]
